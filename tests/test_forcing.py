"""Forcing terms: constant pressure gradient, sponge, MMS forcing."""

import jax
import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.forcing import ConstantPressureGradient, SpongeZone, make_mms_forcing
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.gas import DryAir
from tps_tpu.time.integrators import rk4
from tps_tpu.utils.cases import uniform_state


def _ctx(mix, forcings=()):
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")
    return RHSContext(fluxes=fl, riemann=Rusanov(fl), forcings=tuple(forcings))


def test_constant_pressure_gradient():
    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(4, 4, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=1).to_jax(jnp.float64)
    g = (50.0, 0.0)
    ctx = _ctx(mix, [ConstantPressureGradient(mixture=mix, press_grad=g)])
    Up = uniform_state(tab.xyz_dof, mix, 1.2, (10.0, 0.0), 300.0)
    U = mix.conservatives(Up)
    y, _ = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab, U)
    # uniform state: base RHS = 0; forcing gives d(rho u)/dt = -g,
    # d(rhoE)/dt = -u*g
    assert np.allclose(np.asarray(y[..., 1]), -50.0, atol=1e-8)
    assert np.allclose(np.asarray(y[..., 2]), 0.0, atol=1e-8)
    assert np.allclose(np.asarray(y[..., 3]), -500.0, atol=1e-7)


def test_sponge_damps_toward_target():
    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(6, 2, periodic_y=True, periodic_x=True)
    tab = build_tables(mesh, order=1).to_jax(jnp.float64)
    from tps_tpu.dg.forcing import sponge_target_conserved

    p_t = 1.0 * mix.gas_constant * 300.0
    target = sponge_target_conserved(mix, 1.0, (5.0, 0.0), p_t)
    # slab 0.5 < x < 1 with sigma ramping up toward x=1 (reference
    # convention: normal points from the p0 plane back into the domain)
    sz = SpongeZone(
        mixture=mix, target_u=target, normal=(-1.0, 0.0), p0=(1.0, 0.0),
        p_init=(0.5, 0.0), mult=0.1,
    )
    ctx = _ctx(mix, [sz])
    Up = uniform_state(tab.xyz_dof, mix, 1.0, (20.0, 0.0), 300.0)
    U = mix.conservatives(Up)
    y, _ = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab, U)
    y = np.asarray(y)
    x = np.asarray(tab.xyz_dof[..., 0])
    # upstream of the sponge: no forcing; inside: x-momentum pushed down
    assert np.allclose(y[..., 1][x < 0.5], 0.0, atol=1e-8)
    assert (y[..., 1][x > 0.9] < -1.0).all()


def test_mms_forcing_tracks_exact_solution():
    """With f = dU*/dt - RHS(U*), integrating from U*(0) stays on U*(t)."""
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(8, 8, x1=1.0, y1=1.0, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    two_pi = 2 * np.pi

    def exact(xy, t):
        x, y = xy[..., 0], xy[..., 1]
        rho = 1.0 + 0.1 * jnp.sin(two_pi * (x - 0.3 * t))
        u = 0.5 + 0.05 * jnp.cos(two_pi * y) * jnp.sin(two_pi * 0.2 * t)
        v = jnp.zeros_like(u)
        T = 1.0 + 0.05 * jnp.cos(two_pi * x)
        return jnp.stack([rho, u, v, T], axis=-1)

    base = _ctx(mix)
    f = make_mms_forcing(exact, base, tab)
    ctx = _ctx(mix, [f])

    U = mix.conservatives(exact(tab.xyz_dof, 0.0))
    step = jax.jit(
        lambda u, t, dt: rk4(lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u, t, dt)[0]
    )
    t, dt = 0.0, 2e-3
    for _ in range(25):
        U = step(U, t, dt)
        t += dt
    Uex = mix.conservatives(exact(tab.xyz_dof, t))
    err = float(jnp.sqrt(jnp.mean((U - Uex) ** 2)))
    assert err < 2e-4, err
