"""Low-Mach RANS + LTE thermo-chem model tests."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.radiation import NetEmission
from tps_tpu.physics.tables import LinearTable
from tps_tpu.solvers.lomach.base import (
    ConstantPropertyThermoChem,
    TemporalCoefficients,
    ZeroFlow,
)
from tps_tpu.solvers.lomach.lte_thermo import LteThermoChem
from tps_tpu.solvers.lomach.rans import AlgebraicRans, StaticRans
from tps_tpu.solvers.lomach.tomboulides import Tomboulides, VelocityDirichlet


def test_algebraic_rans_shear_layer():
    """Vorticity-based eddy viscosity grows with wall distance."""
    mesh = box_2d(8, 8)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=1e-3)
    flow = Tomboulides(tab, thermo, vel_bcs=[
        VelocityDirichlet(attrs=(1, 2, 3, 4), value=(0.0, 0.0))])
    # impose a shear field directly
    y = tab.xyz[:, 1]
    flow.u = jnp.stack([y * 2.0, jnp.zeros_like(y)], axis=-1)
    dist = np.minimum(np.asarray(y), 1.0 - np.asarray(y))
    rans = AlgebraicRans(tab, flow, thermo, wall_distance=dist)
    rans.step(TemporalCoefficients.bdf(1), 1e-3)
    nut = np.asarray(rans.eddy_viscosity())
    # nu_t = (0.41 d)^2 * |omega| with omega = -du/dy = -2
    expect = (0.41 * dist) ** 2 * 2.0
    assert np.allclose(nut, expect, atol=1e-8)

    st = StaticRans(tab, 0.5)
    assert np.allclose(np.asarray(st.eddy_viscosity()), 0.5)


def test_lte_thermo_joule_heating():
    """LTE energy equation: Joule heating raises T; radiation sinks it;
    Qt reflects table density variation."""
    mesh = box_2d(6, 6, periodic_x=True, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    T = np.linspace(200.0, 20000.0, 200)
    lte = LteThermoChem(
        tab,
        flow=ZeroFlow(tab),
        rho_table=LinearTable(x=T, f=101325.0 * 0.029 / (8.314 * T)),
        cp_table=LinearTable(x=T, f=np.full_like(T, 1004.0)),
        mu_table=LinearTable(x=T, f=1.8e-5 * (T / 300.0) ** 0.7),
        kappa_table=LinearTable(x=T, f=0.025 * (T / 300.0) ** 0.8),
        sigma_table=LinearTable(x=T, f=np.where(T > 6000, (T - 6000.0), 0.0)),
        T_init=300.0,
    )
    lte.set_joule_heating(jnp.full(tab.ndofs, 5.0e5))  # W/m^3
    dt = 1e-3
    for i in range(10):
        lte.step(TemporalCoefficients.bdf(min(i + 1, 2)), dt)
    T1 = np.asarray(lte.T)
    # dT/dt = q/(rho cp) ~ 5e5/(1.17*1004) ~ 425 K/s -> ~4.3 K in 10 ms
    assert 2.0 < T1.mean() - 300.0 < 8.0
    # heating => expansion => positive divergence constraint
    assert np.asarray(lte.Qt).mean() > 0
    assert np.allclose(np.asarray(lte.plasma_conductivity()), 0.0)  # cold

    # radiation sink reduces the heating rate
    lte2 = LteThermoChem(
        tab, flow=ZeroFlow(tab),
        rho_table=lte.rho_table, cp_table=lte.cp_table,
        mu_table=lte.mu_table, kappa_table=lte.kappa_table,
        radiation=NetEmission(LinearTable(x=[200.0, 20000.0], f=[2.0e4, 2.0e4])),
        T_init=300.0,
    )
    lte2.set_joule_heating(jnp.full(tab.ndofs, 5.0e5))
    for i in range(10):
        lte2.step(TemporalCoefficients.bdf(min(i + 1, 2)), dt)
    assert np.asarray(lte2.T).mean() < T1.mean()


def test_supg_damps_advective_oscillations():
    """Streamwise SUPG stabilization reduces under/overshoots of a sharp
    temperature front advected at high cell Peclet number (reference:
    loMach/calperfect/streamwise-stabilization)."""
    import jax.numpy as jnp

    from tps_tpu.solvers.lomach.thermo_chem import CaloricallyPerfectThermoChem

    mesh = box_2d(24, 2, x1=1.0, y1=0.1, periodic_x=True, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)

    class _Flow:
        def velocity(self):
            return jnp.stack(
                [jnp.ones(tab.ndofs), jnp.zeros(tab.ndofs)], axis=-1
            )

    def run(sw):
        th = CaloricallyPerfectThermoChem(
            tab, flow=_Flow(), constant_mu=1e-6, Pr=0.7, sw_stab=sw,
        )
        x = np.asarray(tab.xyz[:, 0])
        T0 = 300.0 + 100.0 * (np.tanh((0.3 - np.abs(x - 0.35)) / 0.03) * 0.5 + 0.5)
        th.set_temperature(jnp.asarray(T0))
        for i in range(40):
            th.step(TemporalCoefficients.bdf(min(i + 1, 2)), 5e-3)
        T = np.asarray(th.T)
        return max(T.max() - 400.0, 0.0) + max(300.0 - T.min(), 0.0)

    osc_plain = run(False)
    osc_supg = run(True)
    assert np.isfinite(osc_supg)
    assert osc_supg < 0.6 * osc_plain, (osc_plain, osc_supg)


def test_gravity_buoyancy_cavity():
    """loMach/gravity (reference: src/tomboulides.cpp:419-434, the
    lomach-lequere differentially-heated-cavity class of cases):

    1. uniform density + gravity: the hydrostatic head is a pure
       gradient the pressure projection absorbs — no flow develops;
    2. hot left / cold right walls + downward gravity: buoyancy drives
       a circulation with the hot-side gas rising."""
    from tps_tpu.harness import Tps

    def run(tmpdir, hot, cold, iters):
        import os
        import tempfile

        ini = os.path.join(tmpdir, f"cav{hot}.ini")
        with open(ini, "w") as f:
            f.write(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 10
ny = 10
x1 = 0.01
y1 = 0.01
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = calorically-perfect
gravity = '0.0 -9.81'
maxIters = {iters}
outputFreq = 1000
[initialConditions]
temperature = 300.0
[time]
dt_fixed = 1e-3
bdfOrder = 2
[boundaryConditions/wall1]
patch = 4
type = viscous
temperature = {hot}
[boundaryConditions/wall2]
patch = 2
type = viscous
temperature = {cold}
[boundaryConditions/wall3]
patch = 1
type = viscous
temperature = 300.0
[boundaryConditions/wall4]
patch = 3
type = viscous
temperature = 300.0
[io]
outdirBase = {tmpdir}/out{hot}
""")
        tps = Tps()
        tps.input_file = ini
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        tps.solve()
        return tps.solver

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # (1) no temperature difference: hydrostatics only, no flow
        s0 = run(td, 300.0, 300.0, 20)
        u0 = np.asarray(s0.flow.velocity())
        assert np.abs(u0).max() < 1e-6, np.abs(u0).max()

        # (2) differentially heated (Ra ~ 1e4 on the 1 cm cavity): hot
        # gas rises along the left wall, sinks along the cold right wall
        s1 = run(td, 400.0, 200.0, 80)
        u1 = np.asarray(s1.flow.velocity())
        xy = np.asarray(s1.tab.xyz) / 0.01  # relative coords
        assert np.isfinite(u1).all()
        assert np.abs(u1).max() > 1e-4  # flow actually developed
        mid = (xy[:, 1] > 0.3) & (xy[:, 1] < 0.7)
        left = mid & (xy[:, 0] > 0.02) & (xy[:, 0] < 0.35)
        right = mid & (xy[:, 0] > 0.65) & (xy[:, 0] < 0.98)
        assert u1[left, 1].mean() > 0.0, "hot side must rise"
        assert u1[right, 1].mean() < 0.0, "cold side must sink"
