"""PerfectMixture EOS consistency tests, mirroring the strategy of the
reference test/test_perfect_mixture.cpp: random states, prim<->cons
roundtrips, pressure consistency, finite-difference gradient checks, across
all (ambipolar x two-temperature) configurations of the argon ternary
mixture (test/inputs/argonMinimal.ini species parameters)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.constants import UNIVERSAL_GAS_CONSTANT as R
from tps_tpu.physics.perfect_mixture import PerfectMixture

MW_AR = 39.948e-3
MW_E = 5.4858e-07
HF_ARP = 1520.57e3  # Ar+ formation energy [J/mol]


def argon3(ambipolar=False, two_temperature=False, nvel=3, dim=3):
    """Ternary argon mixture ordered [Ar+, E, Ar] (electron=ns-2, bg last)."""
    return PerfectMixture(
        dim=dim,
        nvel=nvel,
        mw=(MW_AR - MW_E, MW_E, MW_AR),
        charges=(1.0, -1.0, 0.0),
        formation_energy=(HF_ARP, 0.0, 0.0),
        molar_cv_over_R=(1.5, 1.5, 1.5),
        ambipolar=ambipolar,
        two_temperature=two_temperature,
    )


def random_primitive(mix, rng, n=50):
    """Random physical primitive state like the reference test (:20-45)."""
    na = mix.num_active_species
    neq = mix.num_equations
    Up = np.zeros((n, neq))
    Up[:, 1 : 1 + mix.nvel] = -0.5 + rng.rand(n, mix.nvel)
    Up[:, mix.i_th] = 300.0 * (0.9 + 0.2 * rng.rand(n))
    if mix.two_temperature:
        Up[:, mix.i_te] = 400.0 * (0.8 + 0.4 * rng.rand(n))
    # number densities ~ O(1) mol/m^3 with extra background
    nd = 1.0 + rng.rand(n, na)
    if not mix.ambipolar:
        # electron density from quasineutrality anyway (physical states)
        charges = np.array(mix.charges[: na])
        ion_ne = np.einsum("ns,s->n", nd, np.where(charges > 0, charges, 0.0))
        nd[:, mix.i_electron] = ion_ne
    Up[:, mix.nvel + 2 : mix.nvel + 2 + na] = nd
    # rho from n via quasineutral background addition
    n_sp = np.asarray(mix._n_sp_from_primitives(jnp.asarray(Up)))
    # ensure background positive by construction: add to rho
    mw = np.array(mix.mw)
    rho = np.einsum("ns,s->n", n_sp, mw) + 2.0 * MW_AR
    Up[:, 0] = rho
    return jnp.asarray(Up)


@pytest.mark.parametrize("ambipolar", [False, True])
@pytest.mark.parametrize("two_temperature", [False, True])
def test_roundtrip_and_pressure(ambipolar, two_temperature):
    mix = argon3(ambipolar, two_temperature)
    rng = np.random.RandomState(7)
    Up = random_primitive(mix, rng)
    U = mix.conservatives(Up)
    Up2 = mix.primitives(U)
    assert float(jnp.abs(Up - Up2).max() / jnp.abs(Up).max()) < 1e-12

    p1 = mix.pressure(U)
    p2 = mix.pressure_from_primitives(Up)
    assert float(jnp.abs(p1 - p2).max() / jnp.abs(p1).max()) < 1e-12

    # manual pressure: sum n_s R T (Dalton)
    n_sp = np.asarray(mix.number_densities(U))
    Th = np.asarray(Up[:, mix.i_th])
    Te = np.asarray(Up[:, mix.i_te]) if two_temperature else Th
    p_manual = R * (
        (n_sp[:, 0] + n_sp[:, 2]) * Th + n_sp[:, 1] * Te
    )
    assert np.allclose(np.asarray(p1), p_manual, rtol=1e-12)

    # wave speeds positive and ordered
    c = np.asarray(mix.speed_of_sound_from_conserved(U))
    assert (c > 0).all()
    assert (np.asarray(mix.max_char_speed(U)) >= c).all()


@pytest.mark.parametrize("ambipolar", [False, True])
def test_temperatures(ambipolar):
    mix = argon3(ambipolar, two_temperature=True)
    rng = np.random.RandomState(3)
    Up = random_primitive(mix, rng)
    U = mix.conservatives(Up)
    Th, Te = mix.temperatures(U)
    assert float(jnp.abs(Th - Up[:, mix.i_th]).max()) < 1e-9
    assert float(jnp.abs(Te - Up[:, mix.i_te]).max()) < 1e-9


@pytest.mark.parametrize("ambipolar", [False, True])
@pytest.mark.parametrize("two_temperature", [False, True])
def test_modify_energy_for_pressure(ambipolar, two_temperature):
    mix = argon3(ambipolar, two_temperature)
    rng = np.random.RandomState(11)
    Up = random_primitive(mix, rng)
    U = mix.conservatives(Up)
    p_target = 1.3 * np.asarray(mix.pressure(U))
    U2 = mix.modify_energy_for_pressure(U, jnp.asarray(p_target), True)
    p2 = np.asarray(mix.pressure(U2))
    assert np.allclose(p2, p_target, rtol=1e-10)


def test_stagnant_state_with_temp():
    mix = argon3(False, True)
    rng = np.random.RandomState(5)
    Up = random_primitive(mix, rng)
    U = mix.conservatives(Up)
    U2 = mix.stagnant_state_with_temp(U, 350.0)
    assert float(jnp.abs(U2[:, 1 : 1 + mix.nvel]).max()) == 0.0
    Th, Te = mix.temperatures(U2)
    assert np.allclose(np.asarray(Th), 350.0, rtol=1e-10)
    assert np.allclose(np.asarray(Te), 350.0, rtol=1e-10)


@pytest.mark.parametrize("ambipolar", [False, True])
def test_fraction_gradients_fd(ambipolar):
    """Mole/mass fraction gradients vs finite differences (reference
    test_perfect_mixture.cpp:244-400)."""
    mix = argon3(ambipolar, False, nvel=2, dim=2)
    rng = np.random.RandomState(13)
    Up = np.asarray(random_primitive(mix, rng, n=4))
    neq = mix.num_equations
    # synthetic primitive gradient along x only
    dUp = np.zeros((4, neq, 2))
    dUp[:, :, 0] = 0.01 * (rng.rand(4, neq) - 0.5)
    U = mix.conservatives(jnp.asarray(Up))
    X, Y, n_sp = mix.species_primitives(U)

    gX = np.asarray(mix.mole_fraction_gradient(n_sp, jnp.asarray(dUp)))
    gY = np.asarray(
        mix.mass_fraction_gradient(jnp.asarray(Up[:, 0]), n_sp, jnp.asarray(dUp))
    )

    eps = 1e-6
    Up_p = Up + eps * dUp[:, :, 0]
    U_p = mix.conservatives(jnp.asarray(Up_p))
    Xp, Yp, _ = mix.species_primitives(U_p)
    dX_fd = (np.asarray(Xp) - np.asarray(X)) / eps
    dY_fd = (np.asarray(Yp) - np.asarray(Y)) / eps
    assert np.allclose(gX[:, :, 0], dX_fd, atol=1e-5), np.abs(gX[:, :, 0] - dX_fd).max()
    assert np.allclose(gY[:, :, 0], dY_fd, atol=1e-5)
