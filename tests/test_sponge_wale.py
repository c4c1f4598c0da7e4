"""WALE SGS, viscous/geometric sponges, and loMach factory entries."""

import os

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d

HERE = os.path.dirname(__file__)


def test_wale_pure_shear_vanishes():
    """WALE's wall-adapting property: zero eddy viscosity in pure shear,
    positive under general strain (Nicoud & Ducros 1999)."""
    from tps_tpu.dg.sgs import Wale
    from tps_tpu.physics.gas import DryAir

    mix = DryAir(dim=3, nvel=3)
    w = Wale(mixture=mix)
    U = jnp.zeros((4, mix.num_equations)).at[:, 0].set(1.2)
    delta = jnp.ones(4)

    g = jnp.zeros((4, mix.num_equations, 3))
    g_shear = g.at[:, 1, 1].set(2.0)  # du/dy only
    assert np.allclose(np.asarray(w(U, g_shear, delta)), 0.0, atol=1e-14)

    g_strain = g.at[:, 1, 0].set(1.0).at[:, 2, 1].set(-1.0).at[:, 3, 2].set(0.5)
    nut = np.asarray(w(U, g_strain, delta))
    assert (nut > 0).all()


def test_lomach_wale_model():
    from tps_tpu.solvers.lomach.base import ConstantPropertyThermoChem
    from tps_tpu.solvers.lomach.turb import AlgebraicSubgridModel

    mesh = box_2d(6, 6)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)

    class _Flow:
        def velocity(self):
            x, y = tab.xyz[:, 0], tab.xyz[:, 1]
            return jnp.stack([x * y, -0.5 * y * y], axis=-1)

    turb = AlgebraicSubgridModel(tab, _Flow(), model="wale")
    turb.step(None, 1e-3)
    nut = np.asarray(turb.eddy_viscosity())
    assert np.isfinite(nut).all() and (nut >= 0).all() and nut.max() > 0


def test_planar_viscous_sponge():
    from tps_tpu.dg.fluxes import PlanarViscousSponge

    sp = PlanarViscousSponge(point=(1.0, 0.0), normal=(1.0, 0.0),
                             width=0.1, ratio=10.0)
    xyz = jnp.asarray([[0.0, 0.0], [2.0, 0.0]])
    w = np.asarray(sp(xyz))
    assert w[0] < 1.2  # upstream of the plane: ~unmodified
    assert abs(w[1] - 10.0) < 0.1  # deep in the sponge: full ratio


def test_geometric_sponge_field():
    from tps_tpu.solvers.lomach.sponge import (
        GeometricSponge,
        PlaneSponge,
    )

    mesh = box_2d(8, 8)
    tab = h1.build_h1(mesh, order=1).to_jax(jnp.float64)
    gs = GeometricSponge(
        tab,
        uniform_mult=2.0,
        plane=PlaneSponge(point=(0.8, 0.0), normal=(1.0, 0.0),
                          width=0.02, mult=50.0),
    )
    m = np.asarray(gs.multiplier())
    x = np.asarray(tab.xyz)[:, 0]
    assert (m >= 2.0 - 1e-12).all()  # uniform floor
    assert m[x > 0.95].min() > 25.0  # plane ramp active near x=1
    assert m[x < 0.5].max() < 2.0 + 1e-9  # uniform only away from the plane


def _run_lomach_ini(text, tmp_path, nsteps=3):
    from tps_tpu.harness import Tps

    ini = tmp_path / "run.ini"
    ini.write_text(text)
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    for _ in range(nsteps):
        tps.solve_step()
    return tps.solver


def test_lomach_factory_wale_and_sponge(tmp_path):
    s = _run_lomach_ini(
        """
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 6
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = constant-property
turb-model = wale
maxIters = 3
[time]
dt_fixed = 1e-3
[spongeMultiplier]
uniform = 1
uniformMult = 3.0
[boundaryConditions/wall1]
patch = 1
type = viscous
[boundaryConditions/wall2]
patch = 2
type = viscous
[boundaryConditions/wall3]
patch = 3
type = viscous
[boundaryConditions/wall4]
patch = 4
type = viscous
""",
        tmp_path,
    )
    assert s.sponge is not None
    assert np.allclose(np.asarray(s.sponge.multiplier()), 3.0)
    assert np.isfinite(np.asarray(s.flow.velocity())).all()


def test_lomach_factory_lte(tmp_path):
    import h5py

    T = np.linspace(200.0, 20000.0, 199)  # spacing 100 -> node at T=300
    data = np.stack(
        [T, 1.8e-5 * (T / 300.0) ** 0.7, 0.025 * (T / 300.0) ** 0.8,
         np.where(T > 6000, T - 6000.0, 0.0), np.full_like(T, 287.0),
         np.full_like(T, 1004.0)], axis=1)
    tf = tmp_path / "lte.h5"
    with h5py.File(tf, "w") as f:
        f["T_mu_kap_sig_R_Cp"] = data

    s = _run_lomach_ini(
        f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 4
ny = 4
periodic_x = 1
periodic_y = 1
[loMach]
order = 1
flow-solver = zero-flow
thermo-solver = lte-thermo-chem
maxIters = 3
[loMach/ltethermo]
table-file = {tf}
[initialConditions]
temperature = 300.0
[time]
dt_fixed = 1e-4
""",
        tmp_path,
    )
    assert np.isfinite(np.asarray(s.thermo.T)).all()
    assert abs(float(np.asarray(s.thermo.density()).mean())
               - 101325.0 / (287.0 * 300.0)) < 1e-2


def test_lomach_factory_reacting(tmp_path):
    s = _run_lomach_ini(
        """
[solver]
type = loMach
[mesh]
generator = box2d
nx = 4
ny = 4
periodic_x = 1
periodic_y = 1
[loMach]
order = 1
flow-solver = zero-flow
thermo-solver = reacting-flow
maxIters = 3
[initialConditions]
temperature = 400.0
[time]
dt_fixed = 1e-5
[atoms]
numAtoms = 1
[atoms/atom1]
name = X
mass = 0.03
[species]
numSpecies = 2
background_index = 2
[species/species1]
name = A
composition = '{X : 1}'
formation_energy = 5.0e4
initialMassFraction = 0.3
[species/species2]
name = B
composition = '{X : 1}'
formation_energy = 0.0
initialMassFraction = 0.7
[reactions]
numberOfReactions = 1
[reactions/reaction1]
equation = 'A => B'
model = arrhenius
reactant_stoichiometry = '1 0'
product_stoichiometry = '0 1'
[reactions/reaction1/arrhenius]
A = 20.0
b = 0.0
E = 0.0
""",
        tmp_path,
    )
    Y = np.asarray(s.thermo.Y)
    assert Y[:, 0].max() < 0.3  # A consumed
    assert np.abs(Y.sum(axis=1) - 1.0).max() < 1e-10
    assert (np.asarray(s.thermo.T) > 400.0).all()  # exothermic


def test_lomach_restart_roundtrip(tmp_path):
    ini = """
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 6
periodic_x = 1
periodic_y = 1
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = constant-property
maxIters = 4
[loMach/tomboulides]
ic = tgv2d
[time]
dt_fixed = 1e-3
[io]
outdirBase = %s
""" % tmp_path
    s1 = _run_lomach_ini(ini, tmp_path, nsteps=4)
    s1.write_restart()
    u1 = np.asarray(s1.flow.velocity())

    s2 = _run_lomach_ini(ini + "enableRestart = 1\n", tmp_path, nsteps=0)
    assert s2.iter == 4
    assert abs(s2.time - s1.time) < 1e-15
    assert np.array_equal(np.asarray(s2.flow.velocity()), u1)
    # continue stepping after restart without blowing up
    s2.solve_step()
    assert np.isfinite(np.asarray(s2.flow.velocity())).all()
