"""Characteristic far-field BC + flow past a cylinder on the curved O-grid
(the reference's headline cyl case family, test/cyl3d.test /
input.cyl-2d.caseA.ini, rebuilt on the generator O-grid)."""

import os

import numpy as np

HERE = os.path.dirname(__file__)


def test_farfield_well_balanced_annulus():
    """Uniform free stream with far-field BCs on BOTH circles of the
    O-grid (no wall) is preserved to roundoff — inflow and outflow arcs
    both reproduce the interior exactly."""
    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.bc import FarFieldBC
    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import BCSlice, RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import annulus_2d
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.physics.transport import DryAirTransport
    from tps_tpu.utils.cases import uniform_state

    mix = DryAir(dim=2, nvel=2)
    mesh = annulus_2d(4, 24, r0=0.5, r1=4.0)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant, mix.specific_heat_ratio),
        eq_system="navier-stokes",
    )
    rho, u0, T0 = 1.2, 40.0, 300.0
    p0 = rho * mix.gas_constant * T0
    ff = FarFieldBC(input_state=(rho, u0, 0.0, p0))
    attrs = np.asarray(tab.f_bdr_attr)
    bcs = []
    for a in sorted(set(attrs.tolist())):
        rows = np.where(attrs == a)[0]
        bcs.append(BCSlice(bc=ff, start=int(rows.min()),
                           stop=int(rows.max()) + 1))
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl), bcs=tuple(bcs))
    U = mix.conservatives(uniform_state(tab.xyz_dof, mix, rho, (u0, 0.0), T0))
    dU, _ = jax.jit(lambda u: compute_rhs(ctx, tab, u))(U)
    assert float(jnp.max(jnp.abs(dU))) < 1e-8 * float(jnp.max(jnp.abs(U)))


def test_cylinder_flow_ini(tmp_path):
    """Short ini-driven run of the O-grid cylinder case: stable, a wake
    deficit forms behind the cylinder, stagnation pressure rises ahead."""
    from tps_tpu.harness import Tps

    ini = tmp_path / "cyl.ini"
    base = open(os.path.join(HERE, "..", "examples", "cases",
                             "cyl2d_ogrid.ini")).read()
    base = base.replace("maxIters = 200", "maxIters = 40")
    base = base.replace("nr = 12", "nr = 8").replace("ntheta = 48",
                                                     "ntheta = 32")
    base = base.replace("enableParaview = 1", "enableParaview = 0")
    base = base.replace("outdirBase = output_cyl2d",
                        f"outdirBase = {tmp_path / 'out'}")
    ini.write_text(base)

    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", str(ini)])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    s = tps.solver
    assert s.check_nan() == 0

    import jax.numpy as jnp

    Up = np.asarray(s.mixture.primitives(s.U))
    xyz = np.asarray(s.tables.xyz_dof)
    r = np.linalg.norm(xyz, axis=-1)
    u = Up[..., 1]
    # boundary layer forming: flow near the surface is strongly decelerated
    near = (r > 0.5) & (r < 1.0)
    assert u[near].mean() < 0.7 * 33.3
    # no-slip wall: velocity magnitude small at the innermost dof ring
    # (Gauss-Legendre dofs are interior, so use the closest ones)
    wall = r < r.min() + 0.08
    assert wall.any()
    speed = np.linalg.norm(Up[..., 1:3], axis=-1)
    assert speed[wall].mean() < 0.5 * 33.3
    # upstream stagnation: pressure ahead of the cylinder exceeds p_inf
    p = np.asarray(s.mixture.pressure(s.U))
    stag = (r < 0.75) & (xyz[..., 0] < 0) & (np.abs(xyz[..., 1]) < 0.25)
    assert stag.any()
    assert p[stag].mean() > 101300.0
    # far field stays near free stream
    far = r > 6.0
    assert abs(Up[..., 0][far].mean() - 1.2) < 0.05
    del jnp
