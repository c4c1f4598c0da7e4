"""Wall distance + mixing-length transport tests (reference:
test_distance_fcn.cpp + mixing_length_transport.cpp roles)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.discretization import build_tables
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.transport import DryAirTransport, MixingLengthTransport
from tps_tpu.utils.cases import uniform_state
from tps_tpu.utils.wall_distance import wall_distance


def test_wall_distance_channel():
    mesh = box_2d(8, 4, x1=2.0, y1=1.0)
    tab = build_tables(mesh, order=2)
    # walls at bottom (1) and top (3)
    d = wall_distance(tab, wall_attrs=[1, 3])
    y = np.asarray(tab.xyz_dof[..., 1])
    exact = np.minimum(y, 1.0 - y)
    # wall points are sampled at face quadrature points along x, so the
    # distance is exact for points directly above a sample; tolerance covers
    # the sampling gap
    assert np.abs(d - exact).max() < 0.05
    assert (d >= 0).all()


def test_mixing_length_adds_eddy_viscosity():
    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(6, 4, x1=2.0, y1=1.0)
    tab = build_tables(mesh, order=2)
    mol = DryAirTransport(mix.gas_constant, mix.specific_heat_ratio)
    ml = MixingLengthTransport(molecular=mol, max_mixing_length=0.1)

    Up = uniform_state(jnp.asarray(tab.xyz_dof), mix, 1.2, (10.0, 0.0), 300.0)
    U = mix.conservatives(Up)
    # shear profile gradient
    g = jnp.zeros(U.shape[:-1] + (4, 2))
    g = g.at[..., 1, 1].set(100.0)  # du/dy = 100
    d = jnp.asarray(wall_distance(tab, wall_attrs=[1, 3]))

    p_mol = mol.flux_properties(mix, U, Up, g)
    p_ml = ml.flux_properties(mix, U, Up, g, distance=d)
    dv = np.asarray(p_ml["visc"] - p_mol["visc"])
    assert (dv >= 0).all() and dv.max() > 0
    # mu_t = rho (0.41 d)^2 |S| capped at max length; check a center point
    rho, S = 1.2, 100.0
    lm = np.minimum(0.41 * np.asarray(d), 0.1)
    assert np.allclose(dv, rho * lm**2 * S, rtol=1e-10)
    assert (np.asarray(p_ml["kappa"]) > np.asarray(p_mol["kappa"])).all()

    # without distance, reduces to molecular
    p0 = ml.flux_properties(mix, U, Up, g)
    assert np.allclose(np.asarray(p0["visc"]), np.asarray(p_mol["visc"]))


def test_sgs_models():
    """Smagorinsky/Sigma eddy viscosities (reference sgsSmag/sgsSigma)."""
    import jax

    from tps_tpu.dg.sgs import Sigma, Smagorinsky

    mix = DryAir(dim=3, nvel=3)
    rng = np.random.RandomState(0)
    U = jnp.asarray(np.abs(rng.rand(10, 8, 5)) + 1.0)
    g = jnp.asarray(0.1 * rng.randn(10, 8, 5, 3))
    delta = jnp.asarray(0.1 * np.ones((10, 1)))

    smag = Smagorinsky(mixture=mix)(U, g, delta)
    assert smag.shape == (10, 8)
    assert (np.asarray(smag) >= 0).all() and np.asarray(smag).max() > 0
    # manual check at one point
    gv = np.asarray(g)[0, 0, 1:4, :]
    S = 0.5 * (gv + gv.T)
    expect = np.asarray(U)[0, 0, 0] * (0.12 * 0.1) ** 2 * np.sqrt(2 * (S * S).sum())
    assert abs(float(smag[0, 0]) - expect) < 1e-8

    sig = Sigma(mixture=mix)(U, g, delta)
    assert sig.shape == (10, 8)
    assert (np.asarray(sig) >= 0).all()
    # pure shear du/dy: sigma model must vanish (2D-like gradient)
    g2 = jnp.zeros_like(g).at[..., 1, 1].set(1.0)
    sig2 = Sigma(mixture=mix)(U, g2, delta)
    assert np.abs(np.asarray(sig2)).max() < 1e-10


def test_cli_compute_distance_and_mixing_length(tmp_path):
    """[flow]/computeDistance + useMixingLength through the CLI front
    door (reference: src/M2ulPhyS.cpp:371-437 distance field,
    :2701-2707 mixing-length options)."""
    from tps_tpu.harness import main

    ini = tmp_path / "ml.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 3
outputFreq = 100
fluid = dry_air
equation_system = navier-stokes
viscosityMultiplier = 100.
computeDistance = 1
useMixingLength = 1
[flow/mixing-length]
max-mixing-length = 0.1
Pr_ratio = 0.91
[mesh]
generator = box2d
nx = 8
ny = 4
x1 = 2.0
y1 = 1.0
periodic_x = 1
[time]
cfl = 0.1
integrator = rk2
[initialConditions]
rho = 1.2
rhoU = 12.
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/wall1]
patch = 1
type = viscous_adiabatic
[boundaryConditions/wall2]
patch = 3
type = viscous_isothermal
temperature = 300
[boundaryConditions]
numWalls = 2
[io]
outdirBase = {tmp_path}/out_ml
""")
    assert main(["tps", "--runFile", str(ini)]) == 0


def test_solver_distance_tables(tmp_path):
    """computeDistance fills dof + face-quadrature distance tables used by
    the viscous flux kernels (reference threads distance into
    evalFaceFlux, src/dgNonlinearForm.cpp)."""
    import numpy as np

    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.config.ini import IniInput
    from tps_tpu.solvers.compressible import CompressibleSolver

    ini = tmp_path / "d.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 1
fluid = dry_air
equation_system = navier-stokes
computeDistance = 1
[mesh]
generator = box2d
nx = 6
ny = 3
x1 = 2.0
y1 = 1.0
periodic_x = 1
[time]
cfl = 0.1
[initialConditions]
rho = 1.2
rhoU = 0.
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/wall1]
patch = 1
type = viscous_adiabatic
[boundaryConditions/wall2]
patch = 3
type = inviscid
[boundaryConditions]
numWalls = 2
[io]
outdirBase = {tmp_path}/out_d
""")
    rc = parse_run_configuration(IniInput.read(str(ini)))
    sol = CompressibleSolver(rc)
    sol.initialize()
    t = sol.tables_np
    # only the bottom wall (patch 1) is a distance wall: inviscid walls are
    # excluded (reference M2ulPhyS.cpp:393-398), so distance == y
    y = np.asarray(t.xyz_dof[..., 1])
    assert np.abs(np.asarray(t.distance) - y).max() < 0.05
    assert t.f_dist is not None and (np.asarray(t.f_dist) >= 0).all()
    if t.xyz_slot is not None:
        assert t.dist_slot is not None
        ys = np.asarray(t.xyz_slot[..., 1])
        assert np.abs(np.asarray(t.dist_slot) - ys).max() < 0.05
