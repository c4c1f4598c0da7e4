"""Axisymmetric low-Mach flow (reference: tomboulides axisym/swirl path)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d
from tps_tpu.solvers.lomach.axisym import TomboulidesAxisym
from tps_tpu.solvers.lomach.base import (
    ConstantPropertyThermoChem,
    TemporalCoefficients,
)
from tps_tpu.solvers.lomach.tomboulides import VelocityDirichlet


def test_poiseuille_pipe():
    """Steady pipe flow driven by a body force: u_z(r) = F/(4 mu)(R^2-r^2).
    Domain (r, z) in [0, R] x [0, L], periodic in z; wall at r = R
    (attr 2 = right), axis at r = 0 handled by the axis mask + natural BC."""
    R, L = 1.0, 1.0
    mu, F = 0.1, 0.4  # u_max = 1 keeps the convective CFL ~ 0.25
    mesh = box_2d(10, 3, x1=R, y1=L, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=mu)
    flow = TomboulidesAxisym(
        tab, thermo,
        vel_bcs=[VelocityDirichlet(attrs=(2,), value=(0.0, 0.0))],
        body_force=lambda xyz: jnp.stack(
            [jnp.zeros(xyz.shape[0]), jnp.full(xyz.shape[0], F)], axis=-1
        ),
    )
    # start from the analytic profile scaled down; march to steady state
    r = tab.xyz[:, 0]
    uz_exact = F / (4.0 * mu) * (R**2 - r**2)
    flow.set_velocity(jnp.stack([jnp.zeros_like(r), 0.5 * uz_exact], -1))
    dt = 0.04
    for i in range(300):
        flow.step(TemporalCoefficients.bdf(min(i + 1, 3)), dt)
    u = np.asarray(flow.velocity())
    err = np.abs(u[:, 1] - np.asarray(uz_exact)).max() / float(uz_exact.max())
    assert err < 0.05, err
    assert np.abs(u[:, 0]).max() < 1e-3 * float(uz_exact.max())


def test_couette_swirl():
    """Circular Couette: inner cylinder rotating, outer fixed; steady
    u_theta(r) = A r + B / r with A, B from the Dirichlet values."""
    r1, r2 = 0.5, 1.5
    Om1 = 2.0  # u_theta(r1) = Om1 * r1
    mesh = box_2d(12, 3, x0=r1, x1=r2, y1=0.4, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=0.05)

    class _SwirlBC:
        def __init__(self, attrs, value):
            self.attrs = attrs
            self.value = value

    flow = TomboulidesAxisym(
        tab, thermo, swirl=True,
        vel_bcs=[VelocityDirichlet(attrs=(2, 4), value=(0.0, 0.0))],
        swirl_bcs=[_SwirlBC((4,), Om1 * r1), _SwirlBC((2,), 0.0)],
    )
    r = np.asarray(tab.xyz[:, 0])
    # analytic steady profile
    A = -Om1 * r1**2 / (r2**2 - r1**2)
    B = Om1 * r1 * r2**2 * r1 / (r2**2 - r1**2)
    ut_exact = A * r + B / r
    flow.set_swirl(jnp.asarray(0.5 * ut_exact))
    dt = 0.05
    for i in range(200):
        flow.step(TemporalCoefficients.bdf(min(i + 1, 3)), dt)
    ut = np.asarray(flow.swirl_velocity())
    err = np.abs(ut - ut_exact).max() / np.abs(ut_exact).max()
    assert err < 0.05, err
    # meridional flow stays negligible
    u = np.asarray(flow.velocity())
    assert np.abs(u).max() < 0.05 * np.abs(ut_exact).max()


def test_axisym_thermo_heat_conduction():
    """Axisymmetric heat conduction with a centerline source: the thermo
    r-weighted operators keep T finite and the axis hottest."""
    from tps_tpu.solvers.lomach.base import ZeroFlow
    from tps_tpu.solvers.lomach.thermo_chem import (
        CaloricallyPerfectThermoChem,
        TemperatureDirichlet,
    )

    mesh = box_2d(10, 3, x1=1.0, y1=0.5, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    r = np.asarray(tab.xyz[:, 0])
    thermo = CaloricallyPerfectThermoChem(
        tab, flow=ZeroFlow(tab), constant_mu=1e-3, Pr=0.7,
        temp_bcs=[TemperatureDirichlet(attrs=(2,), value=300.0)],
        weight_q=tab.xyz_q[..., 0],
        heat_source=lambda xyz: 1e5 * jnp.exp(-(xyz[:, 0] / 0.2) ** 2),
    )
    for i in range(30):
        thermo.step(TemporalCoefficients.bdf(min(i + 1, 2)), 5e-2)
    T = np.asarray(thermo.T)
    assert np.isfinite(T).all()
    axis_T = T[r < 1e-10].mean()
    wall_T = T[r > 1.0 - 1e-10].mean()
    assert axis_T > wall_T + 1.0  # centerline heated
    assert abs(wall_T - 300.0) < 1e-10  # Dirichlet held
