"""Forcing terms added to dU/dt after the inverse-mass apply.

Mirrors the reference ForcingTerms family (reference: src/forcing_terms.cpp):
ConstantPressureGradient (:88-172), SpongeZone planar damping (:637-710),
HeatSource, PassiveScalar injection, JouleHeating, and the MMS forcing hook.
Each forcing is a callable `(t, tab, U, Up, grad_up) -> dUdt contribution`
fused into the jitted RHS.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConstantPressureGradient:
    """Imposed pressure gradient driving (e.g. channel flow).

    d(rho u_d)/dt -= dp/dx_d ; d(rhoE)/dt -= u_d dp/dx_d + p d(u_d)/dx_d
    (reference: src/forcing_terms.cpp:115-172)
    """

    mixture: object
    press_grad: tuple  # dim components

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        dim = mix.dim
        g = jnp.asarray(self.press_grad[:dim], dtype=U.dtype)
        p = mix.pressure_from_primitives(Up)
        vel = Up[..., 1 : 1 + dim]
        out = jnp.zeros_like(U)
        out = out.at[..., 1 : 1 + dim].add(-g)
        grad_pV = -jnp.einsum("...d,d->...", vel, g)
        if grad_up is not None:
            divu = jnp.trace(grad_up[..., 1 : 1 + dim, :dim], axis1=-2, axis2=-1)
            grad_pV = grad_pV - p * divu
        out = out.at[..., mix.i_th].add(grad_pV)
        return out


@dataclass(frozen=True)
class HeatSource:
    """Uniform volumetric heat source inside a cylinder region
    (reference: src/forcing_terms.hpp:202, heatSource tests)."""

    mixture: object
    value: float
    point1: tuple
    point2: tuple
    radius: float

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        xyz = tab.xyz_dof
        p1 = jnp.asarray(self.point1[: xyz.shape[-1]], dtype=U.dtype)
        p2 = jnp.asarray(self.point2[: xyz.shape[-1]], dtype=U.dtype)
        axis = p2 - p1
        L2 = jnp.sum(axis * axis)
        s = jnp.einsum("...d,d->...", xyz - p1, axis) / L2
        proj = p1 + s[..., None] * axis
        r = jnp.linalg.norm(xyz - proj, axis=-1)
        inside = (s >= 0) & (s <= 1) & (r <= self.radius)
        out = jnp.zeros_like(U)
        out = out.at[..., mix.i_th].add(jnp.where(inside, self.value, 0.0))
        return out


def sponge_target_conserved(mixture, rho, vel, pressure, mass_fracs=(),
                            electron_temp=None, single_temperature=False):
    """Conserved sponge target from the deck's userDef primitives
    (reference: src/forcing_terms.cpp:486-518): density, velocity, species
    mass fractions, then total energy fixed by `modify_energy_for_pressure`.
    Returns a plain tuple (static data baked into the jitted forcing)."""
    nvel = getattr(mixture, "nvel", mixture.dim)
    cons = np.zeros(mixture.num_equations)
    cons[0] = rho
    for d in range(nvel):
        cons[1 + d] = rho * vel[d]
    for sp in range(mixture.num_active_species):
        cons[nvel + 2 + sp] = rho * mass_fracs[sp]
    modify_electron = True
    if mixture.two_temperature:
        modify_electron = bool(single_temperature)
        if not modify_electron:
            import jax.numpy as _jnp  # noqa: F401

            n_sp = np.asarray(mixture.number_densities(jnp.asarray(cons)))
            ne = n_sp[mixture.i_electron]
            cons[mixture.num_equations - 1] = (
                ne * float(mixture.molar_cv[mixture.i_electron]) * electron_temp
            )
    out = mixture.modify_energy_for_pressure(
        jnp.asarray(cons), jnp.asarray(pressure),
        modify_electron_energy=modify_electron,
    )
    return tuple(float(v) for v in np.asarray(out))


@dataclass(frozen=True)
class SpongeZone:
    """Sponge zone: damp the state toward a target between two planes
    (reference: src/forcing_terms.cpp:480-710).

    dU/dt -= c_target * mult * sigma(x) * (U - U_target)

    Planar: sigma = distInit / L^2 inside the slab between the plane through
    `p_init` and the plane through `p0` (normal `n` points from the p0 side
    toward p_init; distInit = -n.(x - p_init), distF = n.(x - p0), both > 0
    inside, L = distInit + distF).  Annulus: sigma = (R - r1)/(r2 - r1)^2 for
    radius R about the axis through `p_init` along n, and the target velocity
    is interpreted as cylindrical (V_r, V_theta, V_axial) components rotated
    into Cartesian per node (reference: src/forcing_terms.cpp:590-630,667-709).
    """

    mixture: object
    target_u: tuple | None  # conserved target (sponge_target_conserved);
    #                         None for the mixedOut dynamic target
    normal: tuple
    p0: tuple
    p_init: tuple
    mult: float = 1.0
    sz_type: str = "planar"  # "planar" | "annulus"
    r1: float = 0.0
    r2: float = 0.0
    sol_type: str = "userDef"  # "userDef" | "mixedOut"
    tol: float = 1e-5  # mixed-out plane node search tolerance
    fluxes: object = None  # convective flux evaluator (mixedOut only)
    axis_name: str | None = None  # device-mesh axis for sharded mixedOut

    def _mixed_out_target(self, tab, U, n, dist_init, R):
        """Per-step mixed-out target: mean convective normal flux over the
        nodes on the pInit plane (planar) / r1 cylinder (annulus), inverted
        to a conserved state (reference: SpongeZone::computeMixedOutValues,
        src/forcing_terms.cpp:712-744; the MPI_Allreduce over partitions
        becomes a psum over the device mesh)."""
        if self.sz_type == "planar":
            on_plane = jnp.abs(dist_init) < self.tol
        else:
            on_plane = jnp.abs(R - self.r1) < self.tol
        own = getattr(tab, "own_mask", None)
        if own is not None:
            on_plane = on_plane & (own[:, None] > 0.5)
        w = on_plane.astype(U.dtype)
        F = self.fluxes.convective(U)  # [..., neq, dim]
        Fn = jnp.einsum("...qd,d->...q", F[..., : len(n)], n)
        num = jnp.einsum("...q,...->q", Fn, w)
        den = jnp.sum(w)
        if self.axis_name is not None:
            num = jax.lax.psum(num, self.axis_name)
            den = jax.lax.psum(den, self.axis_name)
        mean_flux = num / den
        return self.mixture.conserved_from_convective_flux(mean_flux, n)

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        dtype = U.dtype
        dim = mix.dim
        n = np.asarray(self.normal[:dim], float)
        n = jnp.asarray(n / np.linalg.norm(n), dtype)
        p0 = jnp.asarray(self.p0[:dim], dtype)
        pi = jnp.asarray(self.p_init[:dim], dtype)
        xyz = tab.xyz_dof
        dist_init = -jnp.einsum("...d,d->...", xyz - pi, n)
        dist_f = jnp.einsum("...d,d->...", xyz - p0, n)
        inside = (dist_init > 0.0) & (dist_f > 0.0)

        R = None
        if self.sz_type == "annulus":
            radial = xyz - pi + dist_init[..., None] * n
            R = jnp.linalg.norm(radial, axis=-1)

        if self.sol_type == "mixedOut":
            target_vec = self._mixed_out_target(tab, U, n, dist_init, R)
        else:
            target_vec = jnp.asarray(self.target_u, dtype)

        U_t = target_vec
        if self.sz_type == "planar":
            L = dist_init + dist_f
            sigma = jnp.where(inside, dist_init / (L * L), 0.0)
        else:  # annulus
            inside = inside & (R > self.r1)
            dr = self.r2 - self.r1
            sigma = jnp.where(inside, (R - self.r1) / (dr * dr), 0.0)
            # rotate the cylindrical target velocity (V_r, V_theta, V_axial)
            # into Cartesian at each node: v = Vr*ur + Vt*uth + Vx*n
            ur = radial / jnp.maximum(R, 1e-300)[..., None]
            if dim == 3:
                uth = jnp.cross(jnp.broadcast_to(n, ur.shape), ur)
            else:
                uth = jnp.stack([-ur[..., 1], ur[..., 0]], axis=-1)
            mom = target_vec[1 : 1 + dim]
            v_cart = mom[0] * ur + mom[1] * uth
            if dim == 3:
                v_cart = v_cart + mom[2] * n
            U_t = jnp.broadcast_to(U_t, U.shape)
            U_t = U_t.at[..., 1 : 1 + dim].set(v_cart)

        up_t = mix.primitives(target_vec)
        c = mix.sound_speed_from_T(up_t[mix.i_th])
        return -(c * self.mult) * sigma[..., None] * (U - U_t)


@dataclass(frozen=True)
class AxisymmetricSource:
    """Geometric source terms of the axisymmetric (r, z) + swirl formulation
    (reference: src/forcing_terms.cpp:255-380):
       d(rho u_r)/dt     += (p + rho u_t^2 - tau_tt) / r
       d(rho u_theta)/dt += (-rho u_r u_theta + tau_tr) / r
    with tau_tt = 2 mu u_r/r + (mu_b - 2/3 mu) div(u),
         tau_tr = mu (du_t/dr - u_t/r).
    Nodal radii are strictly positive for Gauss-Legendre bases (nodes are
    element-interior)."""

    mixture: object
    fluxes: object  # for transport access (viscous terms); None for Euler

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        r = jnp.maximum(tab.xyz_dof[..., 0], 1e-14)
        rho = Up[..., 0]
        ur = Up[..., 1]
        ut = Up[..., 3]
        p = mix.pressure_from_primitives(Up)

        tau_tt = jnp.zeros_like(p)
        tau_tr = jnp.zeros_like(p)
        if self.fluxes is not None and self.fluxes.eq_system != "euler" \
                and grad_up is not None:
            props = self.fluxes.transport.flux_properties(mix, U, Up, grad_up)
            visc = props["visc"]
            bulk = props["bulk_visc"] - (2.0 / 3.0) * visc
            ur_r = grad_up[..., 1, 0]
            uz_z = grad_up[..., 2, 1]
            ut_r = grad_up[..., 3, 0]
            divV = ur_r + uz_z + ur / r
            tau_tt = 2.0 * visc * ur / r + bulk * divV
            tau_tr = visc * (ut_r - ut / r)

        out = jnp.zeros_like(U)
        out = out.at[..., 1].add((p + rho * ut * ut - tau_tt) / r)
        out = out.at[..., 3].add((-rho * ur * ut + tau_tr) / r)
        return out


@dataclass(frozen=True)
class PassiveScalar:
    """Passive-scalar injection: relax the last equation toward rho*Z inside
    a ball of given radius around `xyz`, at the local advective rate
    (reference: src/forcing_terms.cpp:820-842)."""

    mixture: object
    xyz: tuple
    radius: float
    value: float

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        dim = mix.dim
        x0 = jnp.asarray(self.xyz[:dim], dtype=U.dtype)
        dist = jnp.linalg.norm(tab.xyz_dof - x0, axis=-1)
        inside = dist <= self.radius
        vel = jnp.linalg.norm(Up[..., 1 : 1 + dim], axis=-1)
        scalar = U[..., -1]
        rate = -vel * (scalar - U[..., 0] * self.value) / self.radius
        out = jnp.zeros_like(U)
        return out.at[..., -1].add(jnp.where(inside, rate, 0.0))


@dataclass(frozen=True)
class JouleHeating:
    """EM Joule heating source read from the runtime `fields` dict
    ("joule_heating" [ne, ndof]); positive heating is added to total energy
    and, for two-temperature mixtures, to the electron energy
    (reference: src/forcing_terms.cpp:443-472)."""

    mixture: object

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        mix = self.mixture
        out = jnp.zeros_like(U)
        if not fields or "joule_heating" not in fields:
            return out
        q = jnp.maximum(fields["joule_heating"], 0.0)
        out = out.at[..., mix.i_th].add(q)
        if mix.two_temperature:
            out = out.at[..., mix.i_te].add(q)
        return out


def make_mms_forcing(exact_primitive_fn, ctx, tab):
    """Manufactured-solution forcing: f = dU*/dt - RHS(U*(t)).

    The TPU-native analog of the reference's MASA forcings
    (reference: src/forcing_terms.hpp:224, src/masa_handler.cpp): instead of
    linking the MASA library, the forcing is derived from any analytic
    primitive field with jax autodiff through the DG residual.
    """
    import dataclasses

    import jax

    from .rhs import compute_rhs

    ctx = dataclasses.replace(ctx, forcings=())  # avoid self-recursion
    mix = ctx.fluxes.mixture

    def exact_U(t):
        return mix.conservatives(exact_primitive_fn(tab.xyz_dof, t))

    def forcing(t, tab_in, U, Up, grad_up, fields=None):
        t = jnp.asarray(t, dtype=tab_in.xyz_dof.dtype)
        dUdt = jax.jacfwd(exact_U)(t)
        rhs_exact, _ = compute_rhs(ctx, tab_in, exact_U(t), t)
        return dUdt - rhs_exact

    return forcing
