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


def _tangent_frame(nhat):
    """Deterministic orthonormal tangents (t1, t2) for unit normals.

    The reference builds tangents from face vertices (src/BoundaryCondition.
    cpp computeTangents); any fixed orthonormal completion works as long as
    it is consistent between the ghost update and the rotation back."""
    dim = nhat.shape[-1]
    if dim == 2:
        t1 = jnp.stack([-nhat[..., 1], nhat[..., 0]], axis=-1)
        return t1, None
    # 3-D: cross with the cartesian axis least aligned with n per point
    eye = jnp.eye(3, dtype=nhat.dtype)
    k = jnp.argmin(jnp.abs(nhat), axis=-1)
    ek = eye[k]
    t1 = jnp.cross(ek, nhat)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(nhat, t1)
    return t1, t2


def _patch_mean(Up, wts, axis_name):
    """Quadrature-weighted boundary-patch mean of per-point data.

    The TPU-native form of the reference's per-patch-subcommunicator
    reductions (src/mpi_groups.hpp:44-78 + inletBC/outletBC updateMean):
    padded shard faces carry zero weights, and a psum over the device-mesh
    axis completes the patch mean when the patch spans shards."""
    num = jnp.sum(wts[..., None] * Up, axis=tuple(range(Up.ndim - 1)))
    den = jnp.sum(wts)
    if axis_name is not None:
        import jax

        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1e-300)


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

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
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

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
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

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
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
        # keep interior pressure; for multi-species/two-T mixtures this
        # rebuilds the energy from species heats + formation energies
        # (reference: modifyEnergyForPressure, src/equation_of_state.cpp)
        ghost = mix.modify_energy_for_pressure(ghost, p)
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

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
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
        ghost = mix.modify_energy_for_pressure(ghost, p)
        return ctx.riemann(UL, ghost, nor)


@dataclass(frozen=True)
class InterpolatedInletBC:
    """Inlet state interpolated from an external data plane (reference:
    InletType INTERPOLATE, fed by GaussianInterpExtData).  Per-face-point
    temperature/velocity targets with time ramping; ghost density follows
    the interior pressure (reflecting subsonic behavior)."""

    temperature: object  # [nf, nqf], or [P, nf, nqf] per-shard stacked
    velocity: object  # [nf, nqf, dim], or [P, nf, nqf, dim] stacked
    gas_constant: float
    ramp_time: float = 0.0

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def _local_data(self, ctx):
        """Per-shard slice of the interpolated targets: under shard_map the
        data is stacked [P, nf, nqf(,dim)] in each shard's padded face
        order and selected by the device-mesh axis index (reference: the
        interpolated inlet is MPI-clean, each rank holding its own faces'
        values, src/inletBC.cpp interpInlet path)."""
        temp, vel = self.temperature, self.velocity
        if ctx.axis_name is not None and jnp.ndim(temp) == 3:
            import jax

            idx = jax.lax.axis_index(ctx.axis_name)
            temp = jax.lax.dynamic_index_in_dim(temp, idx, keepdims=False)
            vel = jax.lax.dynamic_index_in_dim(vel, idx, keepdims=False)
        return temp, vel

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
        mix = ctx.fluxes.mixture
        nvel = mix.nvel
        p = mix.pressure(UL)
        wt = 1.0 if self.ramp_time <= 0.0 else jnp.minimum(
            t / self.ramp_time, 1.0
        )
        temperature, velocity = self._local_data(ctx)
        rho = p / (self.gas_constant * temperature)
        vel = wt * velocity
        ghost = UL.at[..., 0].set(rho)
        ghost = ghost.at[..., 1 : 1 + mix.dim].set(rho[..., None] * vel)
        if nvel > mix.dim:
            ghost = ghost.at[..., 1 + mix.dim : 1 + nvel].set(0.0)
        ghost = mix.modify_energy_for_pressure(ghost, p)
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

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
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
        ghost = mix.modify_energy_for_pressure(ghost, p_g)
        return ctx.riemann(UL, ghost, nor)


@dataclass(frozen=True)
class FarFieldBC:
    """Characteristic (Riemann-invariant) far-field boundary with a full
    free-stream state; inflow vs outflow is decided per quadrature point
    by the boundary normal velocity.  The single-patch role the reference
    splits between its inlet and outlet types — used for O-grid outer
    boundaries (external aerodynamics: flow past a cylinder).

    input_state = (rho_inf, u_inf..., p_inf).  Exactly well-balanced: at
    the free-stream state the ghost equals the interior.
    """

    input_state: tuple

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def _ghost(self, mix, UL, nor):
        nvel, dim = mix.nvel, mix.dim
        gam = mix.specific_heat_ratio
        nhat, _ = _unit(nor)

        rho = UL[..., 0]
        vel = UL[..., 1 : 1 + nvel] / rho[..., None]
        p_in = mix.pressure(UL)
        c_in = jnp.sqrt(gam * p_in / rho)
        un = jnp.einsum("...d,...d->...", vel[..., :dim], nhat)

        rho_inf = jnp.asarray(self.input_state[0], UL.dtype)
        vel_inf = jnp.asarray(self.input_state[1 : 1 + nvel], UL.dtype)
        p_inf = jnp.asarray(self.input_state[1 + nvel], UL.dtype)
        c_inf = jnp.sqrt(gam * p_inf / rho_inf)
        un_inf = jnp.einsum("d,...d->...", vel_inf[:dim], nhat)

        Rplus = un + 2.0 * c_in / (gam - 1.0)  # leaves through the boundary
        Rminus = un_inf - 2.0 * c_inf / (gam - 1.0)  # enters from far field
        un_b = 0.5 * (Rplus + Rminus)
        c_b = 0.25 * (gam - 1.0) * (Rplus - Rminus)

        outflow = un_b > 0.0
        # entropy + tangential velocity from the upwind side
        s_in = p_in / rho**gam
        s_inf = p_inf / rho_inf**gam
        s_b = jnp.where(outflow, s_in, s_inf)
        rho_b = (c_b * c_b / (gam * s_b)) ** (1.0 / (gam - 1.0))
        p_b = rho_b * c_b * c_b / gam
        vt_in = vel - un[..., None] * jnp.pad(
            nhat, [(0, 0)] * (nhat.ndim - 1) + [(0, nvel - mix.dim)]
        )
        vt_inf = vel_inf - un_inf[..., None] * jnp.pad(
            nhat, [(0, 0)] * (nhat.ndim - 1) + [(0, nvel - mix.dim)]
        )
        vel_b = jnp.where(outflow[..., None], vt_in, vt_inf) \
            + un_b[..., None] * jnp.pad(
                nhat, [(0, 0)] * (nhat.ndim - 1) + [(0, nvel - mix.dim)]
            )
        ghost = UL.at[..., 0].set(rho_b)
        ghost = ghost.at[..., 1 : 1 + nvel].set(rho_b[..., None] * vel_b)
        return mix.modify_energy_for_pressure(ghost, p_b)

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None,
             wts=None):
        mix = ctx.fluxes.mixture
        ghost = self._ghost(mix, UL, nor)
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
    # far-field normal-velocity reference for the stateless
    # nonReflectingPressure variant: 0.0 | "patch-mean" | float (see flux)
    ref_vel_n: object = 0.0

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None,
             wts=None, patch_stats=None):
        """patch_stats: optional {"rho_mean": x, "un_mean": y} overriding
        the internally computed patch means — used by the mixed-mesh RHS
        to supply means accumulated over BOTH element-type buckets of a
        patch crossing the tri/quad seam (the reference's per-patch
        subcommunicators are bucket-agnostic, src/mpi_groups.hpp:44-78)."""
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
            w = wts if wts is not None else self.wts
            if self.kind == "nonReflectingMassFlow" and (
                    patch_stats is not None and "rho_mean" in patch_stats):
                rho_eff = patch_stats["rho_mean"]  # cross-bucket mean
            elif self.kind == "nonReflectingMassFlow" and w is not None:
                # patch-mean density (masked psum across shards)
                rho_eff = _patch_mean(rho[..., None], w, ctx.axis_name)[0]
            else:
                rho_eff = rho  # pointwise variant
            un_t = self.mass_flow / (self.area * rho_eff)  # target normal vel
            Rminus = 2.0 * un_t - Rplus  # impose u_n = un_t at the face
            c_g = 0.25 * (gam - 1.0) * (Rplus - Rminus)
            rho_g = (c_g * c_g / (gam * s_ent)) ** (1.0 / (gam - 1.0))
            p_g = rho_g * c_g * c_g / gam
            vel_g = vel.at[..., : mix.dim].add((un_t - un)[..., None] * nhat)
            ghost = UL.at[..., 0].set(rho_g)
            ghost = ghost.at[..., 1 : 1 + nvel].set(rho_g[..., None] * vel_g)
            ghost = mix.modify_energy_for_pressure(ghost, p_g)
            return ctx.riemann(UL, ghost, nor)
        if self.kind == "subsonicPressure":
            ghost = mix.modify_energy_for_pressure(UL, self.pressure)
            return ctx.riemann(UL, ghost, nor)

        # characteristic far-field ghost: outgoing invariant
        # R+ = u_n + 2c/(gam-1) and entropy from the interior, the incoming
        # invariant R- from a far-field reference state at the target
        # pressure.  The reference normal velocity is `ref_vel_n`:
        #   0.0 (default)  quiescent reservoir — zero reflection for
        #                  acoustic pulses (entropy unchanged -> R- exact)
        #   "patch-mean"   instantaneous patch-mean u_n (the role of the
        #                  reference's per-patch subcommunicator means,
        #                  src/mpi_groups.hpp:44-78) — exactly well-balanced
        #                  for an advective outflow at the target pressure
        #   float          fixed expected outflow normal velocity
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
        if isinstance(self.ref_vel_n, str):  # "patch-mean"
            if patch_stats is not None and "un_mean" in patch_stats:
                un_ref = patch_stats["un_mean"]  # cross-bucket mean
            else:
                w = wts if wts is not None else self.wts
                un_ref = _patch_mean(un[..., None], w, ctx.axis_name)[0]
        else:
            un_ref = jnp.asarray(self.ref_vel_n, UL.dtype)
        Rminus = un_ref - 2.0 * c_inf / (gam - 1.0)

        un_g = 0.5 * (Rplus + Rminus)
        c_g = 0.25 * (gam - 1.0) * (Rplus - Rminus)
        rho_g = (c_g * c_g / (gam * s_ent)) ** (1.0 / (gam - 1.0))
        p_g = rho_g * c_g * c_g / gam
        vel_g = vel.at[..., : mix.dim].add((un_g - un)[..., None] * nhat)
        ghost = UL.at[..., 0].set(rho_g)
        ghost = ghost.at[..., 1 : 1 + nvel].set(rho_g[..., None] * vel_g)
        ghost = mix.modify_energy_for_pressure(ghost, p_g)
        return ctx.riemann(UL, ghost, nor)


# ---------------------------------------------------------------------------
# Time-integrated nonreflecting characteristic BCs (LODI)
# ---------------------------------------------------------------------------
#
# The reference's production nonreflecting inlets/outlets carry a persistent
# per-boundary-point ghost state (`boundaryU`) that is integrated in time
# with characteristic (LODI) amplitudes built from patch-MEAN primitives —
# the means reduced over per-patch MPI subcommunicators
# (reference: src/outletBC.cpp:594-739 subsonicNonRefPressure,
#  :739-900 subsonicNonRefMassFlow, :900-1010 subsonicNonRefPWMassFlow;
#  src/inletBC.cpp:756-900 subsonicNonReflectingDensityVelocity;
#  means: src/mpi_groups.hpp:44-78 + updateMean).
#
# TPU-native shape: the ghost state is a pytree threaded through the jitted
# step (one entry per stateful BC), the patch means are masked weighted
# psums, and the per-point characteristic update is one fused elementwise
# sweep over [nf, nqf].  `flux()` evaluates Riemann(interior, carried ghost);
# `advance()` integrates the ghost once per time step.


def _lodi_assemble(mean_rho, meanVn, meanVt1, meanVt2, meanK, c, gam,
                   d1, d2, d3, d4, d5, neq, nvel, dtype):
    """Characteristic flux vector in the (n, t1, t2) rotated frame."""
    F = [d1,
         meanVn * d1 + mean_rho * d2,
         meanVt1 * d1 + mean_rho * d3]
    if nvel == 3:
        F.append(meanVt2 * d1 + mean_rho * d4)
    en = mean_rho * meanVn * d2 + mean_rho * meanVt1 * d3
    if nvel == 3:
        en = en + mean_rho * meanVt2 * d4
    en = en + meanK * d1 + d5 / (gam - 1.0)
    F.append(en)
    out = jnp.stack([jnp.broadcast_to(f, d1.shape) for f in F], axis=-1)
    if neq > nvel + 2:  # species / electron-energy / passive slots: frozen
        out = jnp.concatenate(
            [out, jnp.zeros(d1.shape + (neq - nvel - 2,), dtype)], axis=-1
        )
    return out


def _lodi_integrate(state, bdrFlux, nhat, t1, t2, dt, nvel, dim):
    """newU = rotate(state) - dt * bdrFlux, momenta rotated back to x-y."""
    mom = state[..., 1 : 1 + nvel]
    momN = [jnp.einsum("...d,...d->...", mom[..., :dim], nhat),
            jnp.einsum("...d,...d->...", mom[..., :dim], t1)]
    if nvel == 3:
        if dim == 3:
            momN.append(jnp.einsum("...d,...d->...", mom, t2))
        else:  # axisymmetric swirl: azimuthal component IS the t2 slot
            momN.append(mom[..., 2])
    stateN = state.at[..., 1 : 1 + nvel].set(jnp.stack(momN, axis=-1))
    newN = stateN - dt * bdrFlux
    # rotate momenta back (orthonormal frame: inverse = transpose)
    mN = newN[..., 1 : 1 + nvel]
    mom_xy = mN[..., 0:1] * nhat + mN[..., 1:2] * t1
    if dim == 3:
        mom_xy = mom_xy + mN[..., 2:3] * t2
    out = newN.at[..., 1 : 1 + dim].set(mom_xy)
    if nvel == 3 and dim == 2:
        out = out.at[..., 3].set(mN[..., 2])
    return out


@dataclass(frozen=True)
class CharacteristicOutletBC:
    """Time-integrated nonreflecting outlets (reference: OutletType
    SUB_P_NR / SUB_MF_NR / SUB_MF_NR_PW, src/outletBC.cpp:594-1010).

    kind = "nonReflectingPressure": incoming wave relaxes the patch-mean
    pressure to `pressure` with strength sigma = c/ref_length.
    kind = "nonReflectingMassFlow": relaxes the patch-mean normal velocity
    to mass_flow/(mean_rho * area).
    kind = "nonReflectingPointBasedMassFlow": same target but the local
    normal velocity enters the relaxation (SUB_MF_NR_PW).
    """

    kind: str = "nonReflectingPressure"
    pressure: float = 0.0
    mass_flow: float = 0.0
    area: float = 1.0
    ref_length: float = 1.0

    has_state = True

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def init_state(self, mix, UL0):
        """Ghost starts at the interior trace (reference: initBoundaryU)."""
        return UL0

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
        if state is None:
            # un-integrated fallback: reflecting ghost at the target pressure
            state = ctx.fluxes.mixture.modify_energy_for_pressure(
                UL, self.pressure if self.kind == "nonReflectingPressure"
                else ctx.fluxes.mixture.pressure(UL)
            )
        return ctx.riemann(UL, state, nor)

    def advance(self, ctx, state, UL, UpL, gradL, nor, wts, dt,
                mean_up=None):
        mix = ctx.fluxes.mixture
        dim, nvel, neq = mix.dim, mix.nvel, mix.num_equations
        gam = mix.specific_heat_ratio
        nhat, _ = _unit(nor)
        t1, t2 = _tangent_frame(nhat)

        # mean_up may be precomputed PATCH-GLOBALLY (mixed tri/quad meshes
        # combine both buckets' face weights into one mean, the analog of
        # the reference's per-patch subcommunicator reductions)
        if mean_up is None:
            mean_up = _patch_mean(UpL, wts, ctx.axis_name)  # [neq]
        mean_rho = mean_up[0]
        mean_vel = mean_up[1 : 1 + nvel]
        c = mix.sound_speed_from_T(mean_up[mix.i_th])
        meanK = 0.5 * jnp.sum(mean_vel * mean_vel)
        meanVn = jnp.einsum("d,...d->...", mean_vel[:dim], nhat)
        meanVt1 = jnp.einsum("d,...d->...", mean_vel[:dim], t1)
        meanVt2 = (jnp.einsum("d,...d->...", mean_vel, t2) if dim == 3
                   else (mean_vel[2] if nvel == 3 else 0.0))

        # per-point normal gradients of primitives [nf, nqf, neq]
        normGrad = jnp.einsum("...ed,...d->...e", gradL, nhat)
        dpdn = mix.pressure_derivative(normGrad, UL)
        dVndn = jnp.einsum("...d,...d->...", normGrad[..., 1 : 1 + dim], nhat)
        dVt1dn = jnp.einsum("...d,...d->...", normGrad[..., 1 : 1 + dim], t1)
        dVt2dn = (jnp.einsum("...d,...d->...", normGrad[..., 1 : 1 + dim], t2)
                  if dim == 3 else jnp.zeros_like(dpdn))

        # outgoing characteristic amplitudes (mean-frozen coefficients)
        L2 = meanVn * (c * c * normGrad[..., 0] - dpdn)
        L3 = meanVn * dVt1dn
        L4 = meanVn * dVt2dn
        L5 = (meanVn + c) * (dpdn + mean_rho * c * dVndn)

        # incoming wave: relaxation toward the target
        sigma = c / self.ref_length
        if self.kind == "nonReflectingPressure":
            mean_p = mean_rho * mix.gas_constant * mean_up[mix.i_th]
            L1 = sigma * (mean_p - self.pressure) * jnp.ones_like(dpdn)
        else:
            un_target = self.mass_flow / (mean_rho * self.area)
            if self.kind == "nonReflectingPointBasedMassFlow":
                un_pt = jnp.einsum(
                    "...d,...d->...", UpL[..., 1 : 1 + dim], nhat
                )
                L1 = -sigma * (un_pt - un_target) * mean_rho * c
            else:
                L1 = (-sigma * (meanVn - un_target) * mean_rho * c
                      ) * jnp.ones_like(dpdn)

        d1 = (L2 + 0.5 * (L5 + L1)) / (c * c)
        d2 = 0.5 * (L5 - L1) / (mean_rho * c)
        d3, d4, d5 = L3, L4, 0.5 * (L5 + L1)

        bdrFlux = _lodi_assemble(mean_rho, meanVn, meanVt1, meanVt2, meanK,
                                 c, gam, d1, d2, d3, d4, d5, neq, nvel,
                                 UL.dtype)
        return _lodi_integrate(state, bdrFlux, nhat, t1, t2, dt, nvel, dim)


@dataclass(frozen=True)
class CharacteristicInletBC:
    """Time-integrated nonreflecting density-velocity inlet (reference:
    InletType SUB_DENS_VEL_NR / SUB_VEL_CONST_ENT,
    src/inletBC.cpp:756-900).

    input_state = (rho_target, u, v[, w]); const_entropy drops the entropy
    relaxation (SUB_VEL_CONST_ENT).  All frame quantities use the INWARD
    unit normal, as the reference does.
    """

    input_state: tuple
    ref_length: float = 1.0
    const_entropy: bool = False

    has_state = True

    def ghost_primitive(self, mixture, UpL):
        return UpL

    def init_state(self, mix, UL0):
        return UL0

    def flux(self, ctx, UL, UpL, gradL, nor, xyz, delta, t, state=None, wts=None):
        if state is None:
            state = UL
        return ctx.riemann(UL, state, nor)

    def advance(self, ctx, state, UL, UpL, gradL, nor, wts, dt,
                mean_up=None):
        mix = ctx.fluxes.mixture
        dim, nvel, neq = mix.dim, mix.nvel, mix.num_equations
        gam = mix.specific_heat_ratio
        n_out, _ = _unit(nor)
        nhat = -n_out  # inward
        t1, t2 = _tangent_frame(nhat)

        if mean_up is None:  # see CharacteristicOutletBC.advance
            mean_up = _patch_mean(UpL, wts, ctx.axis_name)
        mean_rho = mean_up[0]
        mean_vel = mean_up[1 : 1 + nvel]
        c = mix.sound_speed_from_T(mean_up[mix.i_th])
        meanK = 0.5 * jnp.sum(mean_vel * mean_vel)
        meanVn = jnp.einsum("d,...d->...", mean_vel[:dim], nhat)
        meanVt1 = jnp.einsum("d,...d->...", mean_vel[:dim], t1)
        meanVt2 = (jnp.einsum("d,...d->...", mean_vel, t2) if dim == 3
                   else (mean_vel[2] if nvel == 3 else 0.0))

        target = jnp.asarray(self.input_state, UL.dtype)
        meanDV = mean_vel - target[1 : 1 + nvel]

        normGrad = jnp.einsum("...ed,...d->...e", gradL, nhat)
        dpdn = mix.pressure_derivative(normGrad, UL)
        dVndn = jnp.einsum("...d,...d->...", normGrad[..., 1 : 1 + dim], nhat)

        # outgoing (leaves through the inlet against the flow)
        L1 = (meanVn - c) * (dpdn - mean_rho * c * dVndn)

        sigma = c / self.ref_length
        dv_n = jnp.einsum("d,...d->...", meanDV[:dim], nhat)
        dv_t1 = jnp.einsum("d,...d->...", meanDV[:dim], t1)
        dv_t2 = (jnp.einsum("d,...d->...", meanDV, t2) if dim == 3
                 else (meanDV[2] if nvel == 3 else jnp.zeros(())))
        L5 = sigma * 2.0 * mean_rho * c * dv_n
        L3 = sigma * dv_t1
        L4 = sigma * dv_t2
        if self.const_entropy:
            L2 = jnp.zeros_like(L1)
        else:
            L2 = (sigma * c * c * (mean_rho - target[0]) - 0.5 * L5
                  ) * jnp.ones_like(L1)

        d1 = (L2 + 0.5 * (L5 + L1)) / (c * c)
        d2 = 0.5 * (L5 - L1) / (mean_rho * c)
        d3 = L3 * jnp.ones_like(L1)
        d4 = L4 * jnp.ones_like(L1)
        d5 = 0.5 * (L5 + L1)

        bdrFlux = _lodi_assemble(mean_rho, meanVn, meanVt1, meanVt2, meanK,
                                 c, gam, d1, d2, d3, d4, d5, neq, nvel,
                                 UL.dtype)
        return _lodi_integrate(state, bdrFlux, nhat, t1, t2, dt, nvel, dim)
