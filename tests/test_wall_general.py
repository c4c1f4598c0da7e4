"""General wall BC (viscous_general) including the ion-sheath condition
(reference: src/wallBC.cpp VISC_GNRL, equation_of_state.cpp
computeSheathBdrFlux)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.bc import GeneralWallBC
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.rhs import RHSContext
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.physics.gas_transport import ArgonMinimalTransport

from test_argon_transport import argon3, plasma_state


def _setup(two_temperature=True, ambipolar=True):
    mix = argon3(ambipolar=ambipolar, two_temperature=two_temperature)
    tr = ArgonMinimalTransport(mixture=mix)
    fl = Fluxes(mixture=mix, transport=tr, eq_system="navier-stokes")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    return mix, ctx


def _face_batch(mix, n=6):
    Up = plasma_state(mix, n=n, ionization=1e-3, T=8000.0)
    UL = mix.conservatives(Up)
    rng = np.random.RandomState(3)
    grad = jnp.asarray(rng.randn(n, mix.num_equations, mix.dim) * 1e-2)
    nor = jnp.zeros((n, mix.dim)).at[:, 0].set(1.0)  # outward +x
    xyz = jnp.zeros((n, mix.dim))
    delta = jnp.full((n, 1), 1e-3)
    return UL, Up, grad, nor, xyz, delta


def test_sheath_wall_ion_outflux_and_electron_energy_loss():
    mix, ctx = _setup()
    UL, UpL, grad, nor, xyz, delta = _face_batch(mix)
    bc = GeneralWallBC(heavy="isothermal", electron="sheath", wall_temp=2000.0)
    flux = np.asarray(bc.flux(ctx, UL, mix.primitives(UL), grad, nor, xyz, delta, 0.0))
    assert np.isfinite(flux).all()
    # positive ions leave through the wall at the Bohm velocity: the ion
    # species normal flux must be positive (outward)
    i_ion_row = mix.nvel + 2
    assert (flux[:, i_ion_row] > 0).all()
    # sheath electron energy flux drains electron energy (positive outward)
    assert (flux[:, mix.num_equations - 1] > 0).all()


def test_sheath_bohm_velocity_magnitude():
    """The prescribed ion velocity equals sqrt((Th + Z Te) R / mw)."""
    from tps_tpu.constants import UNIVERSAL_GAS_CONSTANT as R

    mix, ctx = _setup()
    UL, UpL, grad, nor, xyz, delta = _face_batch(mix)
    bc = GeneralWallBC(heavy="isothermal", electron="sheath",
                       wall_temp=2000.0, wall_temp_e=2000.0)
    Uw, Upw = bc._wall_state(mix, UL, mix.primitives(UL))
    Vn, q_sheath = bc._sheath_flux(mix, Uw, Upw)
    Th = np.asarray(Upw[..., mix.i_th])
    Te = np.asarray(Upw[..., mix.i_te])
    VB_expect = np.sqrt((Th + Te) * R / mix.mw[0])
    assert np.allclose(np.asarray(Vn[..., 0]), VB_expect, rtol=1e-12)
    assert (np.asarray(q_sheath) > 0).all()
    # quasineutral ambipolar wall: electron velocity equals ion velocity
    # for a single positive-ion plasma (z=1, n_e = n_i)
    assert np.allclose(np.asarray(Vn[..., mix.i_electron]),
                       np.asarray(Vn[..., 0]), rtol=1e-10)


def test_general_wall_adiabatic_matches_zero_heat():
    """Adiabatic heavy condition: wall viscous energy flux has no
    conduction contribution (only stress work, which is zero at no-slip)."""
    mix, ctx = _setup(two_temperature=False, ambipolar=False)
    UL, UpL, grad, nor, xyz, delta = _face_batch(mix)
    bc = GeneralWallBC(heavy="adiabatic", electron="adiabatic")
    Uw, Upw = bc._wall_state(mix, UL, mix.primitives(UL))
    nhat = nor / np.linalg.norm(np.asarray(nor), axis=-1, keepdims=True)
    fv = np.asarray(
        bc._wall_visc_general(ctx, Uw, Upw, grad, nhat, xyz, delta)
    )
    # energy row: -q_h - q_e with both overridden to zero
    assert np.allclose(fv[:, mix.i_th], 0.0, atol=1e-16)
