"""A/B benchmark: slot-path compute_rhs vs fused-layout FusedRHS on the
bench config (3-D NS p=2, 16^3, RK4, f32).  Prints ms/substep for both."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
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
    fused = maybe_build_fused(tab_np, ctx, dtype=dtype)
    assert fused is not None

    xyz = tab.xyz_dof
    two_pi = 2 * np.pi
    Up = uniform_state(xyz, mix, 1.2, (10.0, 0.0, 0.0), 300.0)
    Up = Up.at[..., 1].add(5.0 * jnp.sin(two_pi * xyz[..., 0]) * jnp.cos(two_pi * xyz[..., 1]))
    Up = Up.at[..., 2].add(-5.0 * jnp.cos(two_pi * xyz[..., 0]) * jnp.sin(two_pi * xyz[..., 1]))
    U = mix.conservatives(Up).astype(dtype)

    nsteps = 50
    dt = jnp.asarray(5e-6, dtype)
    ndof_total = tab_np.ne * tab_np.ndof

    def timeit(run, U0):
        out = run(U0, jnp.asarray(0.0, dtype), dt)
        out[0].block_until_ready()
        t0 = time.perf_counter()
        out = run(U0, jnp.asarray(0.0, dtype), dt)
        out[0].block_until_ready()
        el = time.perf_counter() - t0
        return el, out

    @jax.jit
    def run_slot(U_in, t, dtv):
        def body(c, _):
            u, tt = c
            u2, aux = rk4(lambda uu, t2: compute_rhs(ctx, tab, uu, t2), u, tt, dtv)
            return (u2, tt + dtv), aux["max_char_speed"]
        (Uf, _), mcs = jax.lax.scan(body, (U_in, t), None, length=nsteps)
        return Uf, mcs[-1]

    @jax.jit
    def run_fused(U2_in, t, dtv):
        def body(c, _):
            u2, tt = c
            u22, aux = rk4(lambda uu, t2: fused(uu, t2), u2, tt, dtv)
            return (u22, tt + dtv), aux["max_char_speed"]
        (Uf, _), mcs = jax.lax.scan(body, (U2_in, t), None, length=nsteps)
        return Uf, mcs[-1]

    el_f, out_f = timeit(run_fused, fused.to_fused(U))
    el_s, out_s = timeit(run_slot, U)

    # agreement check after 50 steps
    Uf = np.asarray(fused.from_fused(out_f[0]))
    Us = np.asarray(out_s[0])
    rel = float(np.max(np.abs(Uf - Us)) / np.max(np.abs(Us)))

    res = {
        "slot_ms_per_substep": 1e3 * el_s / (nsteps * 4),
        "fused_ms_per_substep": 1e3 * el_f / (nsteps * 4),
        "slot_dof_steps_per_sec": ndof_total * nsteps / el_s,
        "fused_dof_steps_per_sec": ndof_total * nsteps / el_f,
        "state_rel_diff_after_50_steps": rel,
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
