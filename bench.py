"""Benchmark: DOF-steps/sec on the compressible Navier-Stokes DG solver.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); its north star is
">=10x DOF-steps/sec over the CPU reference".  We take 1e6 DOF-steps/sec as
a generous estimate of the reference's CPU-core throughput on comparable
p=2 DG Navier-Stokes (O(1us)/dof/rhs with ~4 RHS per RK4 step), so the
baseline target is 1e7 DOF-steps/sec and vs_baseline = value / 1e7.
"""

import json
import time

import numpy as np

BASELINE_DOF_STEPS_PER_SEC = 1.0e7  # 10x assumed 1e6 reference CPU


def main():
    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.fused import maybe_build_fused
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_3d
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.physics.transport import DryAirTransport
    from tps_tpu.time.integrators import rk4
    from tps_tpu.utils.cases import uniform_state

    dtype = jnp.float32

    # 3-D viscous flow in a periodic box: the compute profile of the
    # reference's cyl3d case (hex elements, p=2, 5 equations, full NS).
    mix = DryAir(dim=3, nvel=3)
    n = 16
    mesh = box_3d(n, n, n, periodic=(True, True, True))
    tab_np = build_tables(mesh, order=2)
    tab = tab_np.to_jax(dtype)
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant, mix.specific_heat_ratio),
        eq_system="navier-stokes",
    )
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    # fused-minor-dim fast path (dg/fused.py): the production RHS on
    # structured periodic meshes; falls back to the slot path otherwise
    fused = maybe_build_fused(tab_np, ctx, dtype=dtype)

    xyz = tab.xyz_dof
    two_pi = 2 * np.pi
    Up = uniform_state(xyz, mix, 1.2, (10.0, 0.0, 0.0), 300.0)
    # superpose a Taylor-Green-like velocity so the flow is nontrivial
    Up = Up.at[..., 1].add(5.0 * jnp.sin(two_pi * xyz[..., 0]) * jnp.cos(two_pi * xyz[..., 1]))
    Up = Up.at[..., 2].add(-5.0 * jnp.cos(two_pi * xyz[..., 0]) * jnp.sin(two_pi * xyz[..., 1]))
    U = mix.conservatives(Up).astype(dtype)

    ndof_total = tab.ne * tab.ndof  # solution points (per equation)

    nsteps = 50

    rhs_fn = fused if fused is not None else (
        lambda uu, t2: compute_rhs(ctx, tab, uu, t2)
    )
    if fused is not None:
        U = fused.to_fused(U)

    @jax.jit
    def run(U_in, t, dt):
        # scan the whole step loop inside one executable: no per-step host
        # dispatch (the solver time loop does the same)
        def body(carry, _):
            u, tt = carry
            u2, aux = rk4(rhs_fn, u, tt, dt)
            return (u2, tt + dt), aux["max_char_speed"]

        (Uf, _), mcs = jax.lax.scan(body, (U_in, t), None, length=nsteps)
        return Uf, mcs[-1]

    dt = jnp.asarray(5e-6, dtype)
    t = jnp.asarray(0.0, dtype)

    # warmup + compile
    U1, mcs = run(U, t, dt)
    U1.block_until_ready()

    # timed steps
    t0 = time.perf_counter()
    Uc, mcs = run(U, t, dt)
    Uc.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = nsteps / elapsed
    dof_steps = ndof_total * steps_per_sec
    value = float(dof_steps)
    print(
        json.dumps(
            {
                "metric": "DOF-steps/sec/chip (3D NS p=2 hex, RK4, f32)",
                "value": value,
                "unit": "dof*steps/s",
                "vs_baseline": value / BASELINE_DOF_STEPS_PER_SEC,
                "detail": {
                    "elements": int(tab.ne),
                    "ndof_per_elem": int(tab.ndof),
                    "dofs": int(ndof_total),
                    "steps_per_sec": steps_per_sec,
                    "rk_substep_ms": 1e3 * elapsed / (nsteps * 4),
                    "max_char_speed": float(mcs),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
