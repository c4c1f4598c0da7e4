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
class GeneralWallBC:
    """Multi-species no-slip wall with independently prescribed heavy and
    electron thermal conditions (reference: WallType VISC_GNRL,
    src/wallBC.cpp:100-141,510-560).

    heavy:    "isothermal" | "adiabatic"
    electron: "isothermal" | "adiabatic" | "sheath"
    The sheath condition prescribes Bohm outflow of positive ions, the
    current-balancing electron flux, a fully-catalytic background influx,
    and the sheath electron energy flux
    (reference: PerfectMixture::computeSheathBdrFlux,
    src/equation_of_state.cpp:1909-1945)."""

    heavy: str = "isothermal"
    electron: str = "isothermal"
    wall_temp: float = 300.0
    wall_temp_e: float = 300.0

    def ghost_primitive(self, mixture, UpL):
        out = UpL.at[..., 1 : 1 + mixture.nvel].set(0.0)
        if self.heavy == "isothermal":
            out = out.at[..., mixture.i_th].set(self.wall_temp)
        if mixture.two_temperature and self.electron == "isothermal":
            out = out.at[..., mixture.i_te].set(self.wall_temp_e)
        return out

    def _wall_state(self, mix, UL, UpL):
        """No-slip wall state at prescribed temperatures (conservative)."""
        Upw = self.ghost_primitive(mix, UpL)
        return mix.conservatives(Upw), Upw

    def _sheath_flux(self, mix, Uw, Upw):
        """Prescribed normal diffusion velocities + electron energy flux."""
        import numpy as np

        from ..constants import PI, UNIVERSAL_GAS_CONSTANT as R

        X, Y, n_sp = mix.species_primitives(Uw)
        Th = Upw[..., mix.i_th]
        Te = Upw[..., mix.i_te] if mix.two_temperature else Th
        charges = np.asarray(mix.charges)
        mw = np.asarray(mix.mw)
        nsp = mix.num_species
        ie, ib = mix.i_electron, nsp - 1

        Vn = [jnp.zeros_like(Th) for _ in range(nsp)]
        flux_e = jnp.zeros_like(Th)  # sum Z n VB
        mass_bg = jnp.zeros_like(Th)  # - sum m n VB
        for sp in range(nsp):
            if charges[sp] > 0.0:
                VB = jnp.sqrt((Th + charges[sp] * Te) * R / mw[sp])
                Vn[sp] = VB
                flux_e = flux_e + charges[sp] * n_sp[..., sp] * VB
                mass_bg = mass_bg - mw[sp] * n_sp[..., sp] * VB
        ne = n_sp[..., ie] + 1e-100
        Vn[ie] = flux_e / ne
        mass_bg = mass_bg - mw[ie] * ne * Vn[ie]
        Vn[ib] = mass_bg / (mw[ib] * (n_sp[..., ib] + 1e-100))

        q_sheath = None
        if mix.two_temperature:
            vTe = jnp.sqrt(8.0 * R * Te / PI / mw[ie])
            gam = -jnp.log(jnp.maximum(4.0 / vTe * Vn[ie], 1e-100))
            q_sheath = Vn[ie] * (gam + 2.0) * ne * R * Te
        return jnp.stack(Vn, axis=-1), q_sheath

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        dim = mix.dim
        nhat, mag = _unit(nor)

        Uw, Upw = self._wall_state(mix, UL, UpL)
        flux = ctx.riemann(UL, Uw, nor)
        if ctx.fluxes.eq_system == "euler":
            return flux

        fv_wall = self._wall_visc_general(ctx, Uw, Upw, gradL, nhat, xyz, delta)
        fv_in = _interior_visc_dot_n(ctx.fluxes, UL, UpL, gradL, nor, xyz, delta)
        corr = 0.5 * (fv_wall * mag[..., None] + fv_in)
        return flux.at[..., 1:].add(-corr[..., 1:])

    def _wall_visc_general(self, ctx, Uw, Upw, grad, nhat, xyz, delta):
        """One-sided wall viscous normal flux with prescribed primitive
        fluxes (reference: Fluxes::ComputeBdrViscousFluxes)."""
        mix = ctx.fluxes.mixture
        dim, nvel, neq = mix.dim, mix.nvel, mix.num_equations
        nsp = mix.num_species
        nact = mix.num_active_species
        ie = mix.i_electron

        props = ctx.fluxes.transport.flux_properties(mix, Uw, Upw, grad)
        visc = props["visc"]
        bulk = props["bulk_visc"] - (2.0 / 3.0) * visc
        kappa = props["kappa"]
        kappa_e = props["kappa_e"]

        grad_vel = grad[..., 1 : 1 + dim, :dim]
        div_v = jnp.trace(grad_vel, axis1=-2, axis2=-1)
        stress = visc[..., None, None] * (grad_vel + jnp.swapaxes(grad_vel, -1, -2))
        dd = jnp.arange(dim)
        stress = stress.at[..., dd, dd].add((bulk * div_v)[..., None])
        sn = jnp.einsum("...ij,...j->...i", stress, nhat)

        # prescribed species normal diffusion velocities
        if self.electron == "sheath":
            Vn, q_sheath = self._sheath_flux(mix, Uw, Upw)
        else:
            Vn = jnp.zeros(Uw.shape[:-1] + (nsp,), Uw.dtype)
            q_sheath = jnp.zeros_like(visc)

        h_sp = mix.species_enthalpies(Uw)

        # heavy heat slot: -k dTh/dn + sum_{sp != e} h_sp Vn_sp
        if self.heavy == "adiabatic":
            q_h = jnp.zeros_like(visc)
        else:
            gradT = grad[..., mix.i_th, :]
            q_h = -kappa * jnp.einsum("...d,...d->...", gradT, nhat)
            for sp in range(nsp):
                if mix.two_temperature and sp == ie:
                    continue
                q_h = q_h + h_sp[..., sp] * Vn[..., sp]

        # electron heat slot
        if mix.two_temperature:
            if self.electron == "isothermal":
                gradTe = grad[..., neq - 1, :]
                q_e = (-kappa_e * jnp.einsum("...d,...d->...", gradTe, nhat)
                       + h_sp[..., ie] * Vn[..., ie])
            elif self.electron == "adiabatic":
                q_e = jnp.zeros_like(visc)
            else:  # sheath
                q_e = q_sheath
        else:
            q_e = jnp.zeros_like(visc)

        out = jnp.zeros(Uw.shape[:-1] + (neq,), dtype=Uw.dtype)
        out = out.at[..., 1 : 1 + dim].set(sn)
        # wall state is no-slip: sn . vel0 = 0
        out = out.at[..., mix.i_th].set(-q_h - q_e)
        for a in range(nact):
            out = out.at[..., nvel + 2 + a].set(
                -Uw[..., nvel + 2 + a] * Vn[..., a]
            )
        if mix.two_temperature:
            out = out.at[..., neq - 1].set(-q_e)
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
class FaceInletBC:
    """Face-relative subsonic density-velocity inlet (reference:
    subsonicReflectingDensityVelocityFace, src/inletBC.cpp:453-520;
    ini types subsonicFaceBasedX/Y/Z).

    input_state = (rho, U_normal, U_tangent); the injection velocity is
    U_normal along the inward face normal (orthogonalized against the
    chosen axis) plus U_tangent along n x e_axis.  Unlike the reference
    (which leaves the rotation unapplied), the velocity is actually
    rotated into Cartesian components."""

    input_state: tuple
    tangent_axis: int = 2  # X=0 / Y=1 / Z=2 ini variants

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel, dim = mix.nvel, mix.dim
        p = mix.pressure(UL)
        rho, Un, Ut = self.input_state[:3]

        nhat, _ = _unit(nor)
        n_in = -nhat  # inward
        t2 = jnp.zeros(dim).at[self.tangent_axis % dim].set(1.0)
        # orthogonalize the inward normal against the tangent axis
        tn = jnp.einsum("...d,d->...", n_in, t2)
        n_in = n_in - tn[..., None] * t2
        if dim == 3:
            t1 = jnp.cross(n_in, jnp.broadcast_to(t2, n_in.shape))
        else:
            t1 = jnp.stack([n_in[..., 1], -n_in[..., 0]], axis=-1)
        vel = Un * n_in + Ut * t1

        ghost = UL.at[..., 0].set(rho)
        ghost = ghost.at[..., 1 : 1 + dim].set(rho * vel)
        if nvel > dim:
            ghost = ghost.at[..., 1 + dim : 1 + nvel].set(0.0)
        ke = 0.5 * rho * jnp.sum(vel * vel, axis=-1)
        ghost = ghost.at[..., mix.i_th].set(
            p / (mix.specific_heat_ratio - 1.0) + ke
        )
        return ctx.riemann(UL, ghost, nor)


@dataclass(frozen=True)
class InterpolatedInletBC:
    """Inlet state interpolated from an external data plane (reference:
    InletType INTERPOLATE, fed by GaussianInterpExtData).  Per-face-point
    temperature/velocity targets with time ramping; ghost density follows
    the interior pressure (reflecting subsonic behavior)."""

    temperature: object  # [nf, nqf]
    velocity: object  # [nf, nqf, dim]
    gas_constant: float
    ramp_time: float = 0.0

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        p = mix.pressure(UL)
        wt = 1.0 if self.ramp_time <= 0.0 else jnp.minimum(
            t / self.ramp_time, 1.0
        )
        rho = p / (self.gas_constant * self.temperature)
        vel = wt * self.velocity
        ghost = UL.at[..., 0].set(rho)
        ghost = ghost.at[..., 1 : 1 + mix.dim].set(rho[..., None] * vel)
        if nvel > mix.dim:
            ghost = ghost.at[..., 1 + mix.dim : 1 + nvel].set(0.0)
        ke = 0.5 * rho * jnp.sum(vel * vel, axis=-1)
        ghost = ghost.at[..., mix.i_th].set(
            p / (mix.specific_heat_ratio - 1.0) + ke
        )
        return ctx.riemann(UL, ghost, nor)


@dataclass(frozen=True)
class NonReflectingInletBC:
    """Characteristic subsonic inlets (reference: src/inletBC.cpp
    SUB_DENS_VEL_NR 'nonreflecting' and SUB_VEL_CONST_ENT
    'nonreflectingConstEntropy').

    The outgoing acoustic invariant R- = u_n - 2c/(gamma-1) leaves through
    the inlet and is taken from the interior; density (or entropy) and
    velocity come from the target state, and the ghost sound speed follows
    from the invariant so acoustic waves exit without reflection.

    input_state = (rho, u, v[, w]); rho is ignored for const-entropy.
    """

    input_state: tuple
    kind: str = "nonreflecting"  # | "nonreflectingConstEntropy"

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel, dim = mix.nvel, mix.dim
        gam = mix.specific_heat_ratio
        nhat, _ = _unit(nor)

        rho = UL[..., 0]
        vel = UL[..., 1 : 1 + nvel] / rho[..., None]
        p_in = mix.pressure(UL)
        c_in = jnp.sqrt(gam * p_in / rho)
        un = jnp.einsum("...d,...d->...", vel[..., :dim], nhat)
        Rminus = un - 2.0 * c_in / (gam - 1.0)  # leaves the domain

        vel_t = jnp.asarray(self.input_state[1 : 1 + nvel], UL.dtype)
        un_t = jnp.einsum("d,...d->...", vel_t[:dim], nhat)
        c_g = 0.5 * (gam - 1.0) * (un_t - Rminus)

        if self.kind == "nonreflectingConstEntropy":
            s_ent = p_in / rho**gam  # interior entropy
            rho_g = (c_g * c_g / (gam * s_ent)) ** (1.0 / (gam - 1.0))
        else:
            rho_g = jnp.full_like(rho, self.input_state[0])
        p_g = rho_g * c_g * c_g / gam

        ghost = UL.at[..., 0].set(rho_g)
        ghost = ghost.at[..., 1 : 1 + nvel].set(rho_g[..., None] * vel_t)
        ke = 0.5 * rho_g * jnp.sum(vel_t * vel_t, axis=-1)
        ghost = ghost.at[..., mix.i_th].set(p_g / (gam - 1.0) + ke)
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

    pressure: float = 0.0
    kind: str = "subsonicPressure"
    # nonReflectingMassFlow / nonReflectingPointBasedMassFlow (reference:
    # src/outletBC.cpp SUB_MF_NR / SUB_MF_NR_PW): target mass flow [kg/s]
    # over the patch area; the normal velocity u*_n = mdot/(A rho) is
    # imposed through the incoming characteristic.  The non-pointwise
    # variant uses the patch-MEAN density (the role of the reference's
    # per-patch subcommunicator reductions, src/mpi_groups.hpp:44-78),
    # computed with the patch quadrature weights and reduced across shards
    # with psum when running under shard_map.
    mass_flow: float = 0.0
    area: float = 1.0
    wts: object = None  # [nf, nqf] patch quadrature weights x |n|

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        if self.kind in ("nonReflectingMassFlow",
                         "nonReflectingPointBasedMassFlow"):
            gam = mix.specific_heat_ratio
            nhat, _ = _unit(nor)
            rho = UL[..., 0]
            vel = UL[..., 1 : 1 + nvel] / rho[..., None]
            p_in = mix.pressure(UL)
            c_in = jnp.sqrt(gam * p_in / rho)
            un = jnp.einsum("...d,...d->...", vel[..., : mix.dim], nhat)
            s_ent = p_in / rho**gam
            Rplus = un + 2.0 * c_in / (gam - 1.0)  # outgoing
            if self.kind == "nonReflectingMassFlow" and self.wts is not None:
                # patch-mean density (masked psum across shards)
                num = jnp.sum(self.wts * rho)
                den = jnp.sum(self.wts)
                if ctx.axis_name is not None:
                    import jax

                    num = jax.lax.psum(num, ctx.axis_name)
                    den = jax.lax.psum(den, ctx.axis_name)
                rho_eff = num / jnp.maximum(den, 1e-300)
            else:
                rho_eff = rho  # pointwise variant
            un_t = self.mass_flow / (self.area * rho_eff)  # target normal vel
            Rminus = 2.0 * un_t - Rplus  # impose u_n = un_t at the face
            c_g = 0.25 * (gam - 1.0) * (Rplus - Rminus)
            rho_g = (c_g * c_g / (gam * s_ent)) ** (1.0 / (gam - 1.0))
            p_g = rho_g * c_g * c_g / gam
            vel_g = vel.at[..., : mix.dim].add((un_t - un)[..., None] * nhat)
            ke_g = 0.5 * rho_g * jnp.sum(vel_g * vel_g, axis=-1)
            ghost = UL.at[..., 0].set(rho_g)
            ghost = ghost.at[..., 1 : 1 + nvel].set(rho_g[..., None] * vel_g)
            ghost = ghost.at[..., mix.i_th].set(p_g / (gam - 1.0) + ke_g)
            return ctx.riemann(UL, ghost, nor)
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
