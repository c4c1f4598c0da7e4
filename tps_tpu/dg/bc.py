"""Boundary conditions for the compressible DG solver.

Each BC object owns a static slice of the (attribute-sorted) boundary faces
and produces the boundary normal flux at its face quadrature points.
Mirrors reference behavior:
  walls:   src/wallBC.cpp:205-560 (inviscid mirror, viscous adiabatic,
           viscous isothermal via ghost states + one-sided viscous fluxes)
  inlets:  src/inletBC.cpp:729-756 (subsonic reflecting density-velocity)
  outlets: src/outletBC.cpp:731-737 (subsonic reflecting pressure)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def _unit(nor):
    mag = jnp.linalg.norm(nor, axis=-1, keepdims=True)
    return nor / mag, mag[..., 0]


def _interior_visc_dot_n(fluxes, U, Up, grad, nor, xyz, delta):
    Fv = fluxes.viscous(U, Up, grad, xyz=xyz, delta=delta)
    return jnp.einsum("...ed,...d->...e", Fv, nor)


@dataclass(frozen=True)
class WallBC:
    """Wall boundary (reference: src/wallBC.cpp)."""

    kind: str  # "inviscid" | "slip" | "viscous_adiabatic" | "viscous_isothermal"
    wall_temp: float = 0.0

    def ghost_primitive(self, mixture, UpL):
        """Exterior primitive state for the gradient operator (useBCinGrad)."""
        if self.kind == "viscous_isothermal":
            out = UpL.at[..., 1 : 1 + mixture.nvel].set(0.0)
            out = out.at[..., mixture.i_th].set(self.wall_temp)
            return out
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        dim = mix.dim
        nhat, mag = _unit(nor)

        if self.kind in ("inviscid", "slip"):
            vel = UL[..., 1 : 1 + nvel] / UL[..., 0:1]
            vn = jnp.einsum("...d,...d->...", vel[..., :dim], nhat)
            mirr_vel = vel.at[..., :dim].add(-2.0 * vn[..., None] * nhat)
            ghost = UL.at[..., 1 : 1 + nvel].set(UL[..., 0:1] * mirr_vel)
            flux = ctx.riemann(UL, ghost, nor)
            if ctx.fluxes.eq_system != "euler" and self.kind == "inviscid":
                # reference computeINVwallFlux also averages one-sided viscous
                # fluxes of interior and mirror states with the same gradient
                fv_in = _interior_visc_dot_n(ctx.fluxes, UL, UpL, gradL, nor, xyz, delta)
                Upm = mix.primitives(ghost)
                fv_m = _interior_visc_dot_n(ctx.fluxes, ghost, Upm, gradL, nor, xyz, delta)
                corr = 0.5 * (fv_in + fv_m)
                flux = flux.at[..., 1:].add(-corr[..., 1:])
            return flux

        if self.kind == "viscous_adiabatic":
            # stagnation ghost state (same internal energy)
            ke = 0.5 * jnp.sum(UL[..., 1 : 1 + nvel] ** 2, axis=-1) / UL[..., 0]
            ghost = UL.at[..., 1 : 1 + nvel].set(0.0)
            ghost = ghost.at[..., mix.i_th].set(UL[..., mix.i_th] - ke)
            flux = ctx.riemann(UL, ghost, nor)
            # wall viscous flux: stress from interior grad, zero heat flux,
            # energy advected with INTERIOR velocity (reference wallBC.cpp:430-470
            # -> fluxes.cpp ComputeBdrViscousFluxes with vel0 = interior vel)
            fv_wall = self._wall_visc(ctx, ghost, mix.primitives(ghost), gradL, nhat,
                                      xyz, delta, heat_on=False,
                                      vel0=UL[..., 1 : 1 + dim] / UL[..., 0:1])
            fv_in = _interior_visc_dot_n(ctx.fluxes, UL, UpL, gradL, nor, xyz, delta)
            corr = 0.5 * (fv_wall * mag[..., None] + fv_in)
            return flux.at[..., 1:].add(-corr[..., 1:])

        if self.kind == "viscous_isothermal":
            rho = UL[..., 0]
            ghost = UL.at[..., 1 : 1 + nvel].set(0.0)
            e_wall = (
                mix.gas_constant / (mix.specific_heat_ratio - 1.0) * rho * self.wall_temp
            )
            ghost = ghost.at[..., mix.i_th].set(e_wall)
            flux = ctx.riemann(UL, ghost, nor)
            fv_wall = self._wall_visc(ctx, ghost, mix.primitives(ghost), gradL, nhat,
                                      xyz, delta, heat_on=True,
                                      vel0=jnp.zeros_like(UL[..., 1 : 1 + dim]))
            fv_in = _interior_visc_dot_n(ctx.fluxes, UL, UpL, gradL, nor, xyz, delta)
            corr = 0.5 * (fv_wall * mag[..., None] + fv_in)
            return flux.at[..., 1:].add(-corr[..., 1:])

        raise ValueError(f"unknown wall kind: {self.kind}")

    def _wall_visc(self, ctx, Uw, Upw, grad, nhat, xyz, delta, heat_on, vel0):
        """One-sided wall viscous normal flux (unit normal), conservative form.

        Mirrors Fluxes::ComputeBdrViscousFluxes (src/fluxes.cpp) for
        single-temperature mixtures.
        """
        mix = ctx.fluxes.mixture
        dim = mix.dim
        props = ctx.fluxes.transport.flux_properties(mix, Uw, Upw, grad)
        visc = props["visc"]
        bulk = props["bulk_visc"] - (2.0 / 3.0) * visc
        kappa = props["kappa"] + props["kappa_e"]

        grad_vel = grad[..., 1 : 1 + dim, :dim]
        div_v = jnp.trace(grad_vel, axis1=-2, axis2=-1)
        stress = visc[..., None, None] * (grad_vel + jnp.swapaxes(grad_vel, -1, -2))
        diag = jnp.arange(dim)
        stress = stress.at[..., diag, diag].add((bulk * div_v)[..., None])
        sn = jnp.einsum("...ij,...j->...i", stress, nhat)

        neq = mix.num_equations
        out = jnp.zeros(Uw.shape[:-1] + (neq,), dtype=Uw.dtype)
        out = out.at[..., 1 : 1 + dim].set(sn)
        e_flux = jnp.einsum("...d,...d->...", sn, vel0)
        if heat_on:
            gradT = grad[..., mix.i_th, :]
            # normalPrimFlux heat slot = -k dT/dn; energy -= that slot
            e_flux = e_flux + kappa * jnp.einsum("...d,...d->...", gradT, nhat)
        out = out.at[..., mix.i_th].set(e_flux)
        return out


@dataclass(frozen=True)
class InletBC:
    """Subsonic reflecting density-velocity inlet (src/inletBC.cpp:729-756).

    input_state = (rho, u, v[, w], Y_1..Y_nactive)
    """

    input_state: tuple

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        p = mix.pressure(UL)
        rho = self.input_state[0]
        ghost = UL.at[..., 0].set(rho)
        for d in range(nvel):
            ghost = ghost.at[..., 1 + d].set(rho * self.input_state[1 + d])
        nact = mix.num_active_species
        for sp in range(nact):
            ghost = ghost.at[..., nvel + 2 + sp].set(self.input_state[1 + nvel + sp] * rho)
        # modifyEnergyForPressure: keep interior pressure
        ke = 0.5 * jnp.sum(ghost[..., 1 : 1 + nvel] ** 2, axis=-1) / ghost[..., 0]
        ghost = ghost.at[..., mix.i_th].set(p / (mix.specific_heat_ratio - 1.0) + ke)
        return ctx.riemann(UL, ghost, nor)


@dataclass(frozen=True)
class OutletBC:
    """Pressure outlets (reference: src/outletBC.cpp).

    kind = "subsonicPressure": reflecting ghost with target pressure and
    interior density/velocity (reference :731-737).
    kind = "nonReflectingPressure": characteristic (LODI) far-field ghost —
    outgoing invariants (entropy, tangential velocity, u_n + 2c/(gamma-1))
    taken from the interior, the incoming invariant set by the target
    pressure.  A stateless formulation of the role of the reference's
    time-integrated nonreflecting outlet (:739+)."""

    pressure: float
    kind: str = "subsonicPressure"

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        if self.kind == "subsonicPressure":
            ke = 0.5 * jnp.sum(UL[..., 1 : 1 + nvel] ** 2, axis=-1) / UL[..., 0]
            ghost = UL.at[..., mix.i_th].set(
                self.pressure / (mix.specific_heat_ratio - 1.0) + ke
            )
            return ctx.riemann(UL, ghost, nor)

        # characteristic far-field ghost: outgoing invariant + entropy from
        # the interior, incoming invariant from the quiescent far field at
        # the target pressure
        gam = mix.specific_heat_ratio
        nhat, _ = _unit(nor)
        rho = UL[..., 0]
        vel = UL[..., 1 : 1 + nvel] / rho[..., None]
        p_in = mix.pressure(UL)
        c_in = jnp.sqrt(gam * p_in / rho)
        un = jnp.einsum("...d,...d->...", vel[..., : mix.dim], nhat)
        Rplus = un + 2.0 * c_in / (gam - 1.0)
        s_ent = p_in / rho**gam

        p_inf = jnp.asarray(self.pressure, UL.dtype)
        rho_inf = (p_inf / s_ent) ** (1.0 / gam)  # far field on local isentrope
        c_inf = jnp.sqrt(gam * p_inf / rho_inf)
        Rminus = -2.0 * c_inf / (gam - 1.0)  # u_inf = 0

        un_g = 0.5 * (Rplus + Rminus)
        c_g = 0.25 * (gam - 1.0) * (Rplus - Rminus)
        rho_g = (c_g * c_g / (gam * s_ent)) ** (1.0 / (gam - 1.0))
        p_g = rho_g * c_g * c_g / gam
        vel_g = vel.at[..., : mix.dim].add((un_g - un)[..., None] * nhat)
        ke_g = 0.5 * rho_g * jnp.sum(vel_g * vel_g, axis=-1)
        ghost = UL.at[..., 0].set(rho_g)
        ghost = ghost.at[..., 1 : 1 + nvel].set(rho_g[..., None] * vel_g)
        ghost = ghost.at[..., mix.i_th].set(p_g / (gam - 1.0) + ke_g)
        return ctx.riemann(UL, ghost, nor)
