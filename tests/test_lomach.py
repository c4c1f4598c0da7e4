"""Low-Mach solver family tests: TGV decay (lomach-flow analog), heat
equation (heatEq analog), lid-driven smoke (lomach.lid analog)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.fem import h1
from tps_tpu.harness import Tps
from tps_tpu.mesh.generators import box_2d
from tps_tpu.solvers.lomach.base import (
    ConstantPropertyThermoChem,
    TemporalCoefficients,
    ZeroFlow,
)
from tps_tpu.solvers.lomach.thermo_chem import (
    CaloricallyPerfectThermoChem,
    TemperatureDirichlet,
)
from tps_tpu.solvers.lomach.tomboulides import Tomboulides, VelocityDirichlet

HERE = os.path.dirname(__file__)


def test_tgv2d_harness_decay():
    """TGV kinetic energy decays at the analytic viscous rate."""
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "lomach_tgv2d.ini")
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    tab = s.tab
    u0 = s.flow.velocity()
    ke0 = float(h1.integrate(tab, jnp.sum(u0**2, -1)))
    tps.solve()
    nu = 0.01
    t = s.time
    # TGV on [0,2pi]^2 with k=1: u decays as exp(-2 nu t)
    decay = np.exp(-2 * nu * t)
    u = s.flow.velocity()
    ke = float(h1.integrate(tab, jnp.sum(u**2, -1)))
    assert abs(np.sqrt(ke / ke0) - decay) < 2e-3
    div = h1.divergence_at_dofs(tab, u)
    # the rotational (non-incremental) Tomboulides form enforces the
    # divergence constraint through the pressure Poisson, not an explicit
    # projection, so div(u) carries the splitting error (same property as
    # the reference scheme, src/tomboulides.cpp:1530-2036)
    assert float(jnp.abs(div).max()) < 5e-4


def test_heat_equation_decay():
    """Zero flow + calorically-perfect thermo = heat equation; analytic
    decay of a sine perturbation (reference heatEq.test analog)."""
    mesh = box_2d(8, 8, periodic_x=True, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    flow = ZeroFlow(tab)
    thermo = CaloricallyPerfectThermoChem(
        tab, flow=flow, constant_mu=1.68e-5, T_init=300.0,
    )
    x, y = tab.xyz[:, 0], tab.xyz[:, 1]
    two_pi = 2 * np.pi
    T0 = 300.0 + 10.0 * jnp.sin(two_pi * x) * jnp.sin(two_pi * y)
    thermo.set_temperature(T0)

    # alpha = kappa/(rho cp); rho ~ p/(R*300)
    kappa = float(np.asarray(thermo.conductivity())[0])
    rho = float(np.asarray(thermo.density())[0])
    cp = thermo.cp
    # NOTE: rho varies slightly with T; use mean-field alpha
    alpha = kappa / (rho * cp)

    dt = 0.05
    n = 40
    for i in range(n):
        thermo.step(TemporalCoefficients.bdf(min(i + 1, 3)), dt)
    t = n * dt
    decay = np.exp(-2 * two_pi**2 * alpha * t)
    T = np.asarray(thermo.T)
    amp = 0.5 * (T.max() - T.min()) / 10.0
    assert abs(amp - decay) < 0.05 * decay + 5e-3, (amp, decay)


def test_lid_driven_smoke():
    """Lid-driven cavity: runs stably, top-wall velocity enforced,
    interior flow develops (lomach.lid analog)."""
    mesh = box_2d(8, 8)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=0.01)
    # attrs: 1 bottom, 2 right, 3 top, 4 left
    bcs = [
        VelocityDirichlet(attrs=(1, 2, 4), value=(0.0, 0.0)),
        VelocityDirichlet(attrs=(3,), value=(1.0, 0.0)),
    ]
    flow = Tomboulides(tab, thermo, vel_bcs=bcs, cg_tol=1e-10, cg_maxiter=500)
    dt = 5e-3
    for i in range(30):
        flow.step(TemporalCoefficients.bdf(min(i + 1, 2)), dt)
    u = np.asarray(flow.velocity())
    assert np.isfinite(u).all()
    xyz = np.asarray(tab.xyz)
    top = xyz[:, 1] > 1 - 1e-10
    corner = top & ((xyz[:, 0] < 1e-10) | (xyz[:, 0] > 1 - 1e-10))
    assert np.allclose(u[top, 0], 1.0, atol=1e-12)
    # interior flow has developed and is bounded
    inner = (~top) & (xyz[:, 1] < 0.9)
    assert 1e-4 < np.abs(u[inner]).max() < 1.0


def test_thermo_buoyant_coupling_smoke():
    """Calorically-perfect thermo + Tomboulides two-way coupling runs and
    produces variable density (lequere-style differentially heated box)."""
    mesh = box_2d(6, 6)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    temp_bcs = [
        TemperatureDirichlet(attrs=(4,), value=350.0),  # hot left wall
        TemperatureDirichlet(attrs=(2,), value=250.0),  # cold right wall
    ]
    thermo = CaloricallyPerfectThermoChem(tab, temp_bcs=temp_bcs, T_init=300.0)
    vel_bcs = [VelocityDirichlet(attrs=(1, 2, 3, 4), value=(0.0, 0.0))]
    flow = Tomboulides(tab, thermo, vel_bcs=vel_bcs)
    thermo.flow = flow
    dt = 1e-3
    for i in range(10):
        coeff = TemporalCoefficients.bdf(min(i + 1, 2))
        thermo.step(coeff, dt)
        flow.step(coeff, dt)
    rho = np.asarray(thermo.density())
    assert np.isfinite(rho).all()
    assert rho.max() / rho.min() > 1.1  # hot/cold walls -> density contrast
    assert np.isfinite(np.asarray(flow.velocity())).all()


def test_channel_pressure_outlet_and_ramped_inlet():
    """Pressure-Dirichlet outlet (reference: pres_dbcs_,
    src/tomboulides.cpp:1865) with a time-ramped inlet: the flow
    establishes through-flow and the outlet pressure is pinned."""
    from tps_tpu.solvers.lomach.base import (
        ConstantPropertyThermoChem,
        TemporalCoefficients,
    )
    from tps_tpu.solvers.lomach.tomboulides import (
        PressureDirichlet,
        Tomboulides,
        VelocityDirichlet,
    )

    mesh = box_2d(12, 4, x1=1.0, y1=0.25)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=5e-3)
    # attrs: 1=bottom 2=right 3=top 4=left
    flow = Tomboulides(
        tab, thermo,
        vel_bcs=[
            VelocityDirichlet(attrs=(1, 3), value=(0.0, 0.0)),
            VelocityDirichlet(attrs=(4,), value=(1.0, 0.0), ramp_time=5e-3),
        ],
        pres_bcs=[PressureDirichlet(attrs=(2,), value=0.0)],
        cg_tol=1e-11, cg_maxiter=600, mesh=mesh,
    )
    assert not flow._ortho  # Dirichlet pressure disables orthogonalization
    flow.set_velocity(jnp.zeros((tab.ndofs, 2)))
    for i in range(20):
        flow.step(TemporalCoefficients.bdf(min(i + 1, 2)), 1e-3)
    u = np.asarray(flow.u)
    p = np.asarray(flow.p)
    assert np.isfinite(u).all() and np.isfinite(p).all()
    # outlet pressure pinned at 0
    out_dofs = h1.boundary_dofs(h1.build_h1(mesh, order=2), (2,))
    assert np.abs(p[out_dofs]).max() < 1e-12
    # through-flow established (inlet ramp finished at t=5e-3)
    assert u[:, 0].mean() > 0.2
    # pressure drives the flow: higher at the inlet side
    in_dofs = h1.boundary_dofs(h1.build_h1(mesh, order=2), (4,))
    assert p[in_dofs].mean() > p[out_dofs].mean()


def test_chunk_compile_failure_falls_back_per_step(monkeypatch):
    """If the chunked scan fails to compile (observed on the hosted-TPU
    XLA: SIGILL in the fusion pass on the reacting chunk), solve() must
    fall back to per-step stepping and still complete."""
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "lomach_tgv2d.ini")
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    s.max_iters_cfg = 12

    def boom(n):
        raise RuntimeError("planted chunk-compile failure")

    monkeypatch.setattr(s, "solve_chunk", boom)
    # TGV uses the constant-property thermo (no chunk_step), so force the
    # chunk decision on to exercise the solve-loop fallback
    monkeypatch.setattr(
        s, "_chunk_size",
        lambda: 1 if getattr(s, "_chunk_disabled", False) else 4)
    tps.solve()
    assert s.iter == s.max_iters == 12
    assert getattr(s, "_chunk_disabled", False) is True
