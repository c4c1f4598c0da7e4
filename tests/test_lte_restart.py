"""LTE -> non-equilibrium restart.

Reference: io/restartFromLTE (src/io.cpp:421) +
M2ulPhyS::initilizeSpeciesFromLTE (src/M2ulPhyS.cpp:2388-2470) +
PerfectMixture::GetSpeciesFromLTE (src/equation_of_state.cpp:1894-1966),
driven end-to-end by test/lte2noneq-restart.test: start a non-equilibrium
(multi-species, two-temperature) run from a checkpoint that carries only
the bulk (rho, momentum, rhoE) fields, with the species populated from the
multi-level Saha/Boltzmann equilibrium.
"""

import os

import h5py
import numpy as np
import pytest

HERE = os.path.dirname(__file__)

MW_AR, MW_E = 39.948e-3, 5.478e-7
E_M, E_R, E_P, E_ION = (
    1116860.96186, 1130867.391486, 1269949.8858896866, 1520571.3883
)
from tps_tpu.constants import UNIVERSAL_GAS_CONSTANT as _RU  # noqa: E402


def _mix(ambipolar=False, two_t=False):
    """The reference's 6-species lumped argon system in mixture order
    [Ar.+1, Ar_m, Ar_r, Ar_p, E, Ar] (deck tests/inputs/argon_full.ini;
    degeneracies from reference test/inputs/argon.plasma.lte2noneq.ini)."""
    from tps_tpu.physics.perfect_mixture import PerfectMixture

    return PerfectMixture(
        dim=2, nvel=2,
        mw=(MW_AR - MW_E, MW_AR, MW_AR, MW_AR, MW_E, MW_AR),
        charges=(1.0, 0.0, 0.0, 0.0, -1.0, 0.0),
        formation_energy=(E_ION, E_M, E_R, E_P, 0.0, 0.0),
        molar_cv_over_R=(1.5,) * 6,
        degeneracy=(4.0, 6.0, 6.0, 36.0, 1.0, 1.0),
        ambipolar=ambipolar,
        two_temperature=two_t,
    )


def test_cold_gas_stays_neutral():
    from tps_tpu.physics.perfect_mixture import species_from_lte

    mix = _mix()
    n = np.asarray(species_from_lte(mix, np.float64(0.16), np.float64(300.0)))
    n_nuc = 0.16 / MW_AR
    assert n[0] < 1e-30 * n_nuc  # ion
    assert (n[1:4] < 1e-30 * n_nuc).all()  # excited levels
    assert n[4] == n[0]  # explicit electron = ion


def test_boltzmann_level_ratios_and_neutrality():
    from tps_tpu.physics.perfect_mixture import species_from_lte

    mix = _mix()
    T = 12000.0
    n = np.asarray(species_from_lte(mix, np.float64(0.16), np.float64(T)))
    n_ion, n_m, n_r, n_p, n_e = n[0], n[1], n[2], n[3], n[4]
    assert n_e == pytest.approx(n_ion, rel=1e-14)  # quasineutral
    # Boltzmann ratios between lumped levels (g_m = g_r = 6, g_p = 36)
    assert n_m / n_r == pytest.approx(np.exp(-(E_M - E_R) / (_RU * T)),
                                      rel=1e-12)
    assert n_p / n_m == pytest.approx(
        (36.0 / 6.0) * np.exp(-(E_P - E_M) / (_RU * T)), rel=1e-12)
    assert 0.0 < n_ion < 0.16 / MW_AR
    # ionization grows with T
    n_hot = np.asarray(species_from_lte(mix, np.float64(0.16),
                                        np.float64(15000.0)))
    assert n_hot[0] > n_ion


@pytest.mark.parametrize("ambipolar", [False, True])
@pytest.mark.parametrize("two_t", [False, True])
def test_state_from_lte_roundtrip(ambipolar, two_t):
    """Strip the species off a true LTE state; state_from_lte must recover
    it exactly (same T, same composition), preserving mass/momentum/energy."""
    import jax.numpy as jnp

    from tps_tpu.physics.perfect_mixture import species_from_lte, state_from_lte

    mix = _mix(ambipolar, two_t)
    rho, T_true = 0.16, 11000.0
    n_act = species_from_lte(mix, jnp.float64(rho), jnp.float64(T_true))
    vel = jnp.asarray([30.0, -4.0])
    up = jnp.concatenate([jnp.asarray([rho]), vel, jnp.asarray([T_true]),
                          n_act])
    if two_t:
        up = jnp.concatenate([up, jnp.asarray([T_true])])
    U_true = mix.conservatives(up)

    # bulk-only view: zero the species / electron-energy slots
    U_bulk = U_true.at[mix.nvel + 2:].set(0.0)
    U_rec = state_from_lte(mix, U_bulk)
    np.testing.assert_allclose(np.asarray(U_rec), np.asarray(U_true),
                               rtol=1e-9)


def test_state_from_lte_batched_shapes():
    import jax.numpy as jnp

    from tps_tpu.physics.perfect_mixture import state_from_lte

    mix = _mix(ambipolar=True, two_t=True)
    rng = np.random.default_rng(0)
    rho = 0.1 + 0.1 * rng.random((5, 7))
    T = 8000.0 + 4000.0 * rng.random((5, 7))
    n_eq = mix.num_equations
    Up = np.zeros((5, 7, n_eq))
    Up[..., 0] = rho
    Up[..., mix.i_th] = T
    Up[..., mix.i_te] = T
    U = mix.conservatives(jnp.asarray(Up))
    out = np.asarray(state_from_lte(mix, U))
    assert out.shape == (5, 7, n_eq)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[..., mix.i_th], np.asarray(U)[..., mix.i_th],
                               rtol=1e-9)


def test_lte2noneq_restart_cli(tmp_path):
    """The reference's lte2noneq-restart flow: place a bulk-only LTE
    checkpoint, run the deck with io/restartFromLTE = 1 and maxIters equal
    to the checkpoint iteration; tps must populate the species and
    immediately write the non-equilibrium restart (named rho-Y_<species>
    datasets + rhoE_e)."""
    import jax.numpy as jnp

    from tps_tpu.config.ini import IniInput
    from tps_tpu.harness import main
    from tps_tpu.physics.perfect_mixture import species_from_lte
    from tps_tpu.physics.plasma_config import build_plasma

    with open(os.path.join(HERE, "inputs", "argon_full.ini")) as f:
        deck = f.read()
    deck = deck.replace("outdirBase = /tmp/tps_tpu_argon_full",
                        f"outdirBase = {tmp_path}/out")
    deck += "\nrestartFromLTE = 1\nenableRestart = 1\n"
    deck = deck.replace("maxIters = 4", "maxIters = 7")
    ini = tmp_path / "deck.ini"
    ini.write_text(deck)

    mix = build_plasma(IniInput.read(str(ini)), dim=2, nvel=2).mixture
    assert mix.degeneracy == (4.0, 6.0, 6.0, 36.0, 1.0, 1.0)

    # bulk-only LTE checkpoint at uniform (rho, T): 4x4 box2d, order 1
    rho, T_true = 0.16, 10000.0
    ne, ndof = 16, 4
    n_act = species_from_lte(mix, jnp.float64(rho), jnp.float64(T_true))
    up = jnp.concatenate([jnp.asarray([rho, 0.0, 0.0, T_true]), n_act,
                          jnp.asarray([T_true])])
    U_true = np.asarray(mix.conservatives(up))
    outdir = tmp_path / "out"
    os.makedirs(outdir, exist_ok=True)
    with h5py.File(outdir / "restart_output.sol.h5", "w") as f:
        f.attrs["iteration"] = 7
        f.attrs["time"] = 1.4e-8
        f.attrs["dt"] = 2e-9
        f.attrs["order"] = 1
        f.attrs["nprocs"] = 1
        f.attrs["ne_global"] = ne
        f.attrs["dofs_global"] = ne * ndof
        g = f.create_group("solution")
        g.create_dataset("density", data=np.full(ne * ndof, U_true[0]))
        g.create_dataset("x-mom", data=np.full(ne * ndof, U_true[1]))
        g.create_dataset("y-mom", data=np.full(ne * ndof, U_true[2]))
        g.create_dataset("rho-E", data=np.full(ne * ndof, U_true[3]))

    status = main(["tps", "--runFile", str(ini)])
    assert status == 0

    with h5py.File(outdir / "restart_output.sol.h5", "r") as f:
        assert int(f.attrs["iteration"]) == 7
        sol = f["solution"]
        # named species datasets, reference spelling
        for name in ("rho-Y_Ar.+1", "rho-Y_Ar_m", "rho-Y_Ar_r",
                     "rho-Y_Ar_p", "rhoE_e"):
            assert name in sol, list(sol.keys())
        rho_ion = np.asarray(sol["rho-Y_Ar.+1"])
        # LTE composition recovered exactly (energy closure preserves T)
        n_ion_true = float(n_act[0])
        np.testing.assert_allclose(
            rho_ion, n_ion_true * (MW_AR - MW_E), rtol=1e-6)
        assert (np.asarray(sol["rhoE_e"]) > 0.0).all()
        assert np.isfinite(np.asarray(sol["rho-Y_Ar_m"])).all()


def test_restart_from_lte_requires_single_ion():
    from tps_tpu.physics.perfect_mixture import PerfectMixture, species_from_lte

    mix = PerfectMixture(
        dim=2, nvel=2,
        mw=(MW_AR - MW_E, MW_AR - MW_E, MW_E, MW_AR),
        charges=(1.0, 1.0, -1.0, 0.0),
        formation_energy=(E_ION, E_ION, 0.0, 0.0),
        molar_cv_over_R=(1.5,) * 4,
        ambipolar=True,
    )
    with pytest.raises(NotImplementedError, match="one positive ion"):
        species_from_lte(mix, np.float64(0.16), np.float64(9000.0))
