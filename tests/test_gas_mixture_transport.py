"""GasMixtureTransport: general N-species collision-integral transport.

Consistency with ArgonMinimalTransport on the argon ternary (same fits,
same formulas through a generic pair dispatch) plus finiteness/physicality
on a nitrogen plasma mixture (reference: src/gas_transport.cpp:874-1660)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.physics.gas_transport import (
    ArgonMinimalTransport,
    GasMixtureTransport,
)
from tps_tpu.physics.perfect_mixture import PerfectMixture

from test_argon_transport import MW_AR, MW_E, argon3, plasma_state  # noqa: F401


def test_matches_argon_minimal_on_ternary():
    mix = argon3(ambipolar=False, two_temperature=True)
    tr_min = ArgonMinimalTransport(mixture=mix)
    tr_gen = GasMixtureTransport(
        mixture=mix, species_names=("Ar.+1", "E", "Ar")
    )
    Up = plasma_state(mix)
    U = mix.conservatives(Up)
    g = jnp.asarray(
        np.random.RandomState(1).randn(*(U.shape + (mix.dim,))) * 1e-3
    )
    a = tr_min.flux_properties(mix, U, Up, g)
    b = tr_gen.flux_properties(mix, U, Up, g)
    for k in ("visc", "kappa", "kappa_e", "diffusivity", "diff_vel"):
        assert np.allclose(np.asarray(a[k]), np.asarray(b[k]),
                           rtol=1e-12, atol=1e-300), k
    sa = tr_min.source_properties(U, Up, g)
    sb = tr_gen.source_properties(U, Up, g)
    for k in ("sigma", "mf_freq"):
        assert np.allclose(np.asarray(sa[k]), np.asarray(sb[k]),
                           rtol=1e-12), k


def nitrogen4(two_temperature=True):
    """[N+, N, E, N2] mixture (ion, neutral atom, electron, background)."""
    MW_N2 = 28.0134e-3
    MW_N = 14.0067e-3
    return PerfectMixture(
        dim=2, nvel=2,
        mw=(MW_N - MW_E, MW_N, MW_E, MW_N2),
        charges=(1.0, 0.0, -1.0, 0.0),
        formation_energy=(1.402e6, 3.36e4, 0.0, 0.0),
        molar_cv_over_R=(1.5, 1.5, 1.5, 2.5),
        two_temperature=two_temperature,
    ), ("N.+1", "N", "E", "N2")


def test_nitrogen_mixture_transport_physical():
    mix, names = nitrogen4()
    tr = GasMixtureTransport(mixture=mix, species_names=names)
    n = 6
    rng = np.random.RandomState(2)
    Up = np.zeros((n, mix.num_equations))
    Up[:, 0] = 0.05
    Up[:, mix.i_th] = 8000.0
    Up[:, mix.i_te] = 12000.0
    ntot = 0.05 / 28.0134e-3
    Up[:, mix.nvel + 2] = 1e-4 * ntot  # N+
    Up[:, mix.nvel + 3] = 1e-3 * ntot  # N
    Up[:, mix.nvel + 4] = 1e-4 * ntot  # e
    Up = jnp.asarray(Up)
    U = mix.conservatives(Up)
    g = jnp.asarray(rng.randn(n, mix.num_equations, 2) * 1e-4)

    p = tr.flux_properties(mix, U, Up, g)
    # N2 viscosity at 8000 K: O(1e-4) Pa s
    visc = np.asarray(p["visc"])
    assert np.isfinite(visc).all() and (2e-5 < visc).all() and (visc < 1e-3).all()
    assert np.isfinite(np.asarray(p["kappa"])).all()
    assert (np.asarray(p["kappa_e"]) > 0).all()
    assert np.isfinite(np.asarray(p["diff_vel"])).all()
    # mass flux correction: sum_s Y_s V_s = 0
    _, Y_sp, _ = mix.species_primitives(U)
    drift = np.einsum("ns,nsd->nd", np.asarray(Y_sp), np.asarray(p["diff_vel"]))
    assert np.abs(drift).max() < 1e-12

    s = tr.source_properties(U, Up, g)
    assert (np.asarray(s["sigma"]) > 0).all()
    mf = np.asarray(s["mf_freq"])
    assert np.isfinite(mf).all() and (mf >= 0).all()
    # electron collides with every heavy species
    assert (mf[:, :2] > 0).all() and (mf[:, 3] > 0).all()


def test_unknown_pair_raises():
    mix, _ = nitrogen4()
    try:
        GasMixtureTransport(mixture=mix,
                            species_names=("N2.+1", "N", "E", "N2"))
    except NotImplementedError as e:
        assert "collision-integral" in str(e)
    else:
        raise AssertionError("expected NotImplementedError")
