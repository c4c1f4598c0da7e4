"""LTE mixture tests: with perfect-gas tables, LTE must reproduce DryAir
exactly (the role of reference test_lte_mixture.cpp, whose golden tables
are unavailable LFS data)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.lte import LteMixture, LteTransport
from tps_tpu.physics.tables import LinearTable, Table2D


def perfect_gas_lte(dim=2, nvel=2, R=287.058, gamma=1.4):
    cv = R / (gamma - 1.0)
    T = np.linspace(50.0, 5000.0, 600)
    e = cv * T
    c = np.sqrt(gamma * R * T)
    return LteMixture(
        dim=dim, nvel=nvel,
        energy_table=LinearTable(x=T, f=e),
        R_table=LinearTable(x=T, f=np.full_like(T, R)),
        c_table=LinearTable(x=T, f=c),
        T_table=LinearTable(x=e, f=T),
    )


def test_lte_matches_dryair():
    mix_lte = perfect_gas_lte()
    mix_da = DryAir(dim=2, nvel=2)
    rng = np.random.RandomState(0)
    Up = jnp.asarray(
        np.stack(
            [1.0 + rng.rand(50), 30 * rng.randn(50), 30 * rng.randn(50),
             250 + 1000 * rng.rand(50)], axis=-1)
    )
    U_da = mix_da.conservatives(Up)
    U_lte = mix_lte.conservatives(Up)
    assert np.allclose(np.asarray(U_da), np.asarray(U_lte), rtol=1e-10)

    assert np.allclose(np.asarray(mix_lte.temperature(U_lte)),
                       np.asarray(Up[:, 3]), rtol=1e-9)
    assert np.allclose(np.asarray(mix_lte.pressure(U_lte)),
                       np.asarray(mix_da.pressure(U_da)), rtol=1e-9)
    # c(T) is tabulated: piecewise-linear interpolation of sqrt(T) gives
    # ~2e-5 relative error at this table resolution
    assert np.allclose(np.asarray(mix_lte.max_char_speed(U_lte)),
                       np.asarray(mix_da.max_char_speed(U_da)), rtol=1e-4)
    Up2 = mix_lte.primitives(U_lte)
    assert np.allclose(np.asarray(Up2), np.asarray(Up), rtol=1e-9)


def test_lte_euler_rhs_runs():
    """LTE mixture slots into the DG solver in place of DryAir."""
    import jax

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.utils.cases import uniform_state

    mix = perfect_gas_lte()
    mesh = box_2d(4, 4, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)

    # viscous with LTE table transport
    T = np.linspace(50.0, 5000.0, 100)
    tr = LteTransport(
        mu_table=LinearTable(x=T, f=1.8e-5 * (T / 300.0) ** 0.7),
        kappa_table=LinearTable(x=T, f=0.025 * (T / 300.0) ** 0.8),
        sigma_table=LinearTable(x=T, f=np.where(T > 3000, (T - 3000.0) * 2.0, 0.0)),
    )
    fl = Fluxes(mixture=mix, transport=tr, eq_system="navier-stokes")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    Up = uniform_state(tab.xyz_dof, mix, 1.2, (30.0, 0.0), 300.0)
    U = mix.conservatives(Up)
    y, aux = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab, U)
    scale = float(jnp.abs(U).max())
    assert float(jnp.abs(y).max()) / scale < 1e-8
    assert np.isfinite(float(aux["max_char_speed"]))


def test_table2d_lte_variant():
    """2-D (T, rho) tables work through the same interface."""
    R, gamma = 287.058, 1.4
    cv = R / (gamma - 1.0)
    T = np.linspace(100.0, 2000.0, 50)
    rho = np.linspace(0.01, 10.0, 20)
    e2d = Table2D(x=T, y=rho, f=np.outer(cv * T, np.ones_like(rho)))
    R2d = Table2D(x=T, y=rho, f=np.full((50, 20), R))
    c2d = Table2D(x=T, y=rho, f=np.outer(np.sqrt(gamma * R * T), np.ones_like(rho)))
    e = cv * T
    mix = LteMixture(
        dim=2, nvel=2,
        energy_table=e2d, R_table=R2d, c_table=c2d,
        T_table=Table2D(x=e, y=rho, f=np.outer(T, np.ones_like(rho))),
    )
    Up = jnp.asarray([[1.2, 10.0, -5.0, 600.0]])
    U = mix.conservatives(Up)
    assert abs(float(mix.temperature(U)[0]) - 600.0) < 1e-8
    assert abs(float(mix.pressure(U)[0]) - 1.2 * R * 600.0) < 1e-6


def _write_lte_h5(tmp_path):
    import h5py

    T = np.linspace(200.0, 20000.0, 400)
    R = 287.0
    e = (R / 0.4) * T
    c = np.sqrt(1.4 * R * T)
    thermo = tmp_path / "lte_thermo.h5"
    trans = tmp_path / "lte_trans.h5"
    with h5py.File(thermo, "w") as f:
        f["T_energy_R_c"] = np.stack(
            [T, e, np.full_like(T, R), c], axis=1)
    with h5py.File(trans, "w") as f:
        mu = 1.8e-5 * (T / 300.0) ** 0.7
        kap = 0.025 * (T / 300.0) ** 0.8
        sig = np.where(T > 6000.0, 50.0 * (T - 6000.0) / 14000.0, 0.0)
        f["T_mu_kappa_sigma"] = np.stack([T, mu, kap, sig], axis=1)
    return thermo, trans


def test_cli_lte_table_fluid(tmp_path):
    """[flow]/fluid = lte_table through the CLI: table_dim=1 HDF5 tables
    drive a compressible NS solve, and the transport sigma table feeds
    evaluate_plasma_conductivity (reference: parseFluidPreset LTE_FLUID,
    src/M2ulPhyS.cpp:164-260 + 2398-2403)."""
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.harness import Tps, main

    thermo, trans = _write_lte_h5(tmp_path)
    ini = tmp_path / "lte.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 3
outputFreq = 100
fluid = lte_table
equation_system = navier-stokes
[flow/lte]
table_dim = 1
thermo_table = {thermo}
transport_table = {trans}
[mesh]
generator = box2d
nx = 6
ny = 6
x1 = 1.0
y1 = 1.0
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk2
[initialConditions]
rho = 1.2
rhoU = 12.
rhoV = 0.
rhoW = 0.
pressure = 101300
[io]
outdirBase = {tmp_path}/out_lte
""")
    assert main(["tps", "--runFile", str(ini)]) == 0

    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", str(ini)])
    tps.parse_input()
    tps.config = parse_run_configuration(tps.iniput)
    tps.config.max_iters = 1
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    sol = tps.solver
    Up = sol.mixture.primitives(sol.U)
    Up = Up.at[..., sol.mixture.i_th].set(12000.0)
    sol.U = sol.mixture.conservatives(Up)
    sig = np.asarray(sol.evaluate_plasma_conductivity())
    # sigma table: 50*(T-6000)/14000 at 12000 K ~ 21.4 S/m
    assert abs(sig.max() - 50.0 * 6000.0 / 14000.0) < 0.5
