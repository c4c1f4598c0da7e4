"""Argon collision-integral transport tests.

The reference validates against golden HDF5 tables (unavailable LFS data);
here we check well-known physical values (neutral argon viscosity), internal
consistency (mass-flux correction, ambipolar zero current), and that the
full multi-species Navier-Stokes RHS runs stably with this transport.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.physics import collision_integrals as ci
from tps_tpu.physics.gas_transport import ArgonMinimalTransport
from tps_tpu.physics.perfect_mixture import PerfectMixture

MW_AR = 39.948e-3
MW_E = 5.4858e-07
HF_ARP = 1520.57e3


def argon3(ambipolar=False, two_temperature=False, nvel=2, dim=2):
    return PerfectMixture(
        dim=dim, nvel=nvel,
        mw=(MW_AR - MW_E, MW_E, MW_AR),
        charges=(1.0, -1.0, 0.0),
        formation_energy=(HF_ARP, 0.0, 0.0),
        molar_cv_over_R=(1.5, 1.5, 1.5),
        ambipolar=ambipolar, two_temperature=two_temperature,
    )


def plasma_state(mix, n=8, ionization=1e-4, T=5000.0, rng=None):
    rng = rng or np.random.RandomState(0)
    neq = mix.num_equations
    na = mix.num_active_species
    Up = np.zeros((n, neq))
    Up[:, 0] = 0.1
    Up[:, 1 : 1 + mix.nvel] = 10.0 * rng.randn(n, mix.nvel)
    Up[:, mix.i_th] = T * (0.9 + 0.2 * rng.rand(n))
    if mix.two_temperature:
        Up[:, mix.i_te] = 1.5 * T * (0.9 + 0.2 * rng.rand(n))
    n_total = 0.1 / MW_AR
    n_ion = ionization * n_total
    Up[:, mix.nvel + 2] = n_ion  # Ar+
    if not mix.ambipolar:
        Up[:, mix.nvel + 3] = n_ion  # e (quasineutral)
    return jnp.asarray(Up)


def test_neutral_argon_viscosity_physical():
    """Chapman-Enskog argon viscosity at 300 K is ~2.2e-5 Pa s."""
    from tps_tpu.physics.gas_transport import VISCOSITY_FACTOR
    from tps_tpu.constants import AVOGADRO_NUMBER

    m_ar = MW_AR / AVOGADRO_NUMBER
    for T, expected in [(300.0, 2.27e-5), (1000.0, 5.4e-5)]:
        mu = float(VISCOSITY_FACTOR * np.sqrt(m_ar * T) / ci.ArAr22(T))
        assert abs(mu - expected) / expected < 0.15, (T, mu)


def test_collision_integral_fits_positive():
    T = jnp.asarray([300.0, 1000.0, 10000.0, 30000.0])
    for f in [ci.ArAr11, ci.ArAr22, ci.ArAr1P11, ci.eAr11, ci.eAr12, ci.eAr13]:
        q = np.asarray(f(T))
        assert (q > 0).all() and (q < 1e-16).all(), (f, q)
    Tp = jnp.asarray([0.1, 1.0, 10.0, 100.0])
    for f in [ci.att11, ci.att22, ci.rep11, ci.rep22, ci.rep23, ci.rep24]:
        q = np.asarray(f(Tp))
        assert (q > 0).all(), (f, q)


@pytest.mark.parametrize("ambipolar", [False, True])
@pytest.mark.parametrize("two_temperature", [False, True])
def test_flux_properties_consistency(ambipolar, two_temperature):
    mix = argon3(ambipolar, two_temperature)
    tr = ArgonMinimalTransport(mixture=mix)
    Up = plasma_state(mix)
    U = mix.conservatives(Up)
    neq, dim = mix.num_equations, mix.dim
    rng = np.random.RandomState(1)
    grad_up = jnp.asarray(1e-3 * rng.randn(Up.shape[0], neq, dim))

    props = tr.flux_properties(mix, U, Up, grad_up)
    for key in ("visc", "kappa", "kappa_e"):
        v = np.asarray(props[key])
        assert np.isfinite(v).all() and (v > 0).all(), key
    dv = np.asarray(props["diff_vel"])
    X, Y, n_sp = mix.species_primitives(U)

    # mass-flux correction: sum_s Y_s V_s = 0
    drift = np.einsum("ns,nsd->nd", np.asarray(Y), dv)
    assert np.abs(drift).max() < 1e-12 * max(1.0, np.abs(dv).max())

    if ambipolar:
        # zero net current: sum_s z_s n_s V_s = 0
        cur = np.einsum("s,ns,nsd->nd", np.asarray(mix.charges), np.asarray(n_sp), dv)
        scale = np.abs(np.einsum("ns,nsd->nsd", np.asarray(n_sp), dv)).max()
        assert np.abs(cur).max() < 1e-10 * scale


def test_third_order_ke():
    """Strongly-ionized limit: 3rd-order (Devoto) ke is O(2x) the simple
    2nd-order Coulomb formula and lands on literature argon-plasma values
    (~2-4 W/m/K at ~20 kK)."""
    mix = argon3(False, True)
    Up = plasma_state(mix, ionization=0.3, T=15000.0)
    U = mix.conservatives(Up)
    grad0 = jnp.zeros(Up.shape[:-1] + (mix.num_equations, mix.dim))
    k3 = np.asarray(
        ArgonMinimalTransport(mixture=mix, third_order_electron_thermal_conductivity=True)
        .flux_properties(mix, U, Up, grad0)["kappa_e"])
    k2 = np.asarray(
        ArgonMinimalTransport(mixture=mix, third_order_electron_thermal_conductivity=False)
        .flux_properties(mix, U, Up, grad0)["kappa_e"])
    assert (k3 > 0).all() and np.isfinite(k3).all()
    ratio = k3 / k2
    assert (ratio > 1.0).all() and (ratio < 4.0).all(), ratio
    assert 1.0 < k3.mean() < 10.0  # W/m/K scale


def test_plasma_ns_rhs_runs():
    """Full multi-species NS residual with argon transport on a periodic box."""
    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.time.integrators import rk4

    mix = argon3(ambipolar=True, two_temperature=True)
    tr = ArgonMinimalTransport(mixture=mix)
    fl = Fluxes(mixture=mix, transport=tr, eq_system="navier-stokes")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))

    mesh = box_2d(6, 6, x1=0.01, y1=0.01, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    xy = tab.xyz_dof
    neq = mix.num_equations
    # hot ionized gaussian blob in cold argon
    r2 = ((xy[..., 0] - 0.005) ** 2 + (xy[..., 1] - 0.005) ** 2) / (0.002**2)
    hot = jnp.exp(-r2)
    ntot = 0.1 / MW_AR
    Up = jnp.zeros(xy.shape[:-1] + (neq,))
    Up = Up.at[..., 0].set(0.1)
    Up = Up.at[..., 1].set(50.0)
    Up = Up.at[..., mix.i_th].set(1000.0 + 8000.0 * hot)
    Up = Up.at[..., mix.nvel + 2].set(1e-4 * ntot * hot + 1e-8 * ntot)
    Up = Up.at[..., mix.i_te].set(1000.0 + 12000.0 * hot)
    U = mix.conservatives(Up)

    step = jax.jit(
        lambda u, t, dt: rk4(lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u, t, dt)
    )
    dt = 1e-9
    t = 0.0
    mcs = None
    for _ in range(5):
        U, aux = step(U, t, dt)
        t += dt
        mcs = aux["max_char_speed"]
    assert np.isfinite(np.asarray(U)).all()
    assert np.isfinite(float(mcs))
    # species stayed bounded & positive-ish (clipping active)
    rhoY = np.asarray(U[..., mix.nvel + 2])
    assert rhoY.max() < 1.0
