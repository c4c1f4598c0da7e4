"""Chemistry + source term tests (role of reference standalone_chemistry and
source-term pieces of test_perfect_mixture)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.physics.chemistry import Arrhenius, Chemistry, HoffertLien, TabulatedRate
from tps_tpu.physics.radiation import NetEmission
from tps_tpu.physics.tables import LinearTable, Table2D
from tps_tpu.dg.source_term import SourceTerm
from tps_tpu.physics.gas_transport import ArgonMinimalTransport

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_argon_transport import argon3, plasma_state  # noqa: E402


def argon_ionization_chem(mix):
    """Ar + E <=> Ar+ + 2E with Arrhenius + detailed balance
    (parameters from reference test/inputs/input.malamas.test.ini:262-275;
    stoichiometry in mixture order [Ar+, E, Ar])."""
    return Chemistry(
        mixture=mix,
        reactant_stoich=np.array([[0, 1, 1]]),  # Ar + E
        product_stoich=np.array([[1, 2, 0]]),  # Ar+ + 2E
        models=(Arrhenius(A=4.7, b=1.2, E=6.49e4),),
        reaction_energies=(1.521e4,),
        detailed_balance=(True,),
        equilibrium_params=((1.39, 0.7, 6.197e2),),
    )


def test_linear_table():
    t = LinearTable(x=[1.0, 2.0, 4.0], f=[10.0, 20.0, 10.0])
    assert abs(float(t(1.5)) - 15.0) < 1e-12
    assert abs(float(t(3.0)) - 15.0) < 1e-12
    # clamped-linear extrapolation
    assert abs(float(t(0.5)) - 5.0) < 1e-12
    # log-log behaves as power law
    tl = LinearTable(x=[1.0, 10.0, 100.0], f=[1.0, 100.0, 10000.0],
                     x_log=True, f_log=True)
    assert abs(float(tl(5.0)) - 25.0) < 1e-10


def test_table2d():
    t = Table2D(x=[0.0, 1.0], y=[0.0, 2.0], f=np.array([[0.0, 2.0], [1.0, 3.0]]))
    assert abs(float(t(0.5, 1.0)) - 1.5) < 1e-12
    assert abs(float(t(-1.0, 0.0)) - 0.0) < 1e-12  # clamped


def test_mass_conservation():
    mix = argon3(False, True)
    chem = argon_ionization_chem(mix)
    Up = plasma_state(mix, ionization=1e-3, T=12000.0)
    U = mix.conservatives(Up)
    n_sp = mix.number_densities(U)
    Th, Te = mix.temperatures(U)
    pr, cr = chem.source(n_sp, Th, Te)
    total = np.asarray(jnp.sum(cr, axis=-1))
    assert np.abs(total).max() < 1e-12 * np.abs(np.asarray(cr)).max()


def test_detailed_balance_equilibrium():
    """At the Saha-like equilibrium implied by keq, progress vanishes."""
    mix = argon3(False, False, nvel=2, dim=2)
    chem = argon_ionization_chem(mix)
    Th = jnp.asarray([8000.0, 12000.0])
    keq = chem.equilibrium_constants(Th, Th)[:, 0]
    # pick n_e = n_i = x, n_Ar = y with x^2/y = keq  => equilibrium
    y = jnp.asarray([1.0, 2.0])
    x = jnp.sqrt(keq * y)
    n_sp = jnp.stack([x, x, y], axis=-1)
    kf = chem.forward_rates(Th, Th)
    pr = chem.progress_rates(n_sp, kf, chem.equilibrium_constants(Th, Th))
    fwd_scale = np.asarray(kf[:, 0] * y * x)
    assert np.abs(np.asarray(pr)).max() < 1e-10 * fwd_scale.max()


def test_hoffert_lien_and_tabulated():
    hl = HoffertLien(A=1e-10, b=0.5, E=2.0e-18)
    T = jnp.asarray([5000.0, 15000.0])
    v = np.asarray(hl(T))
    assert (v > 0).all() and v[1] > v[0]
    tab = TabulatedRate(LinearTable(x=[1e3, 1e4, 1e5], f=[1.0, 10.0, 100.0]))
    assert abs(float(tab(jnp.asarray(1e4))) - 10.0) < 1e-12


def test_radiation_sink_sign():
    rad = NetEmission(LinearTable(x=[300.0, 30000.0], f=[0.0, 1e6]))
    s = float(rad.energy_sink(jnp.asarray(20000.0)))
    assert s < 0


def test_source_term_two_temperature():
    """Te > Th: elastic exchange must drain electron energy; ionization
    consumes electron energy via the reaction energy."""
    mix = argon3(False, True)
    tr = ArgonMinimalTransport(mixture=mix)
    chem = argon_ionization_chem(mix)
    src = SourceTerm(mixture=mix, transport=tr, chemistry=chem)

    Up = plasma_state(mix, ionization=1e-2, T=9000.0)
    # force Te well above Th
    Up = Up.at[..., mix.i_te].set(20000.0)
    U = mix.conservatives(Up)
    g0 = jnp.zeros(U.shape[:-1] + (mix.num_equations, mix.dim))
    out = np.asarray(src(0.0, None, U, Up, g0))
    assert np.isfinite(out).all()
    # electron energy equation must be a net sink here
    assert (out[:, mix.i_te] < 0).all()
    # ionization produces ions, consumes neutrals (active species = Ar+, e)
    assert (out[:, mix.nvel + 2] > 0).all()

    sigma = np.asarray(src.plasma_conductivity(U, Up))
    assert (sigma > 0).all() and np.isfinite(sigma).all()


def test_radiative_decay_rate():
    """Escape-factor radiative decay (reference: reaction.cpp RadiativeDecay):
    optically thin at low density (eta -> 1, k -> Boltzmann-avg A) and
    trapped (k much smaller) at high ground-state density."""
    import jax.numpy as jnp
    import numpy as np

    from tps_tpu.constants import UNIVERSAL_GAS_CONSTANT as R
    from tps_tpu.physics.radiative_decay import AJI, E_LVL, G_LVL, RadiativeDecay

    # species order: [Ar_r (upper), Ar (lower/ground)]
    rd = RadiativeDecay(upper="Ar_r", lower="Ar", i_upper=0, i_lower=1,
                        radius=0.01)
    Te = jnp.full(3, 12000.0)
    Th = jnp.full(3, 1000.0)

    # optically thin: tiny ground density -> no trapping
    n_thin = jnp.asarray([[1e-12, 1e-15]] * 3)
    k_thin = np.asarray(rd(Te, n_sp=n_thin, Th=Th, Te=Te))
    # expected: Boltzmann-weighted mean of the two resonance A coefficients
    E, g = E_LVL["Ar_r"], G_LVL["Ar_r"]
    w = g * np.exp(-E / R / 12000.0)
    A_mean = (w * AJI[("Ar_r", "Ar")][:, 0]).sum() / w.sum()
    assert np.allclose(k_thin, A_mean, rtol=1e-6)

    # optically thick: atmospheric ground-state density traps the photons
    n_thick = jnp.asarray([[1e-3, 40.0]] * 3)  # mol/m^3
    k_thick = np.asarray(rd(Te, n_sp=n_thick, Th=Th, Te=Te))
    assert (k_thick < 1e-3 * A_mean).all()
    assert (k_thick > 0).all()
