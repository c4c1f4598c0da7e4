"""Pointwise convective and viscous flux evaluation (batched, fused by XLA).

Mirrors the behavior of reference Fluxes (src/fluxes.cpp:131-336): convective
Euler fluxes plus Navier-Stokes viscous fluxes with heat conduction, optional
species diffusion enthalpy fluxes, SGS eddy viscosity, and the axisymmetric
swirl terms.  Everything here operates on arrays with an arbitrary batch
prefix; the equation index is the second-to-last axis of flux tensors
(F[..., eq, d]).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class PlanarViscousSponge:
    """Planar viscosity-multiplier ramp (reference: src/fluxes.cpp:669-687
    viscSpongePlanar, ini section viscosityMultiplierFunction):
    wgt(x) = 1 + (ratio-1) * 0.5 (tanh(dist/width - 2) + 1) with dist the
    signed distance past the plane (point, normal)."""

    point: tuple
    normal: tuple
    width: float
    ratio: float

    def __call__(self, xyz):
        dim = xyz.shape[-1]
        n = jnp.asarray(self.normal, xyz.dtype)[:dim]
        p = jnp.asarray(self.point, xyz.dtype)[:dim]
        dist = jnp.einsum("...d,d->...", xyz - p, n)
        w = 0.5 * (jnp.tanh(dist / self.width - 2.0) + 1.0)
        return 1.0 + (max(self.ratio, 1.0) - 1.0) * w


@dataclass(frozen=True)
class Fluxes:
    mixture: object
    transport: object | None = None
    eq_system: str = "navier-stokes"  # "euler" | "navier-stokes" | "ns-passive"
    axisymmetric: bool = False
    sgs_model: object | None = None
    visc_mult: float = 1.0
    visc_sponge: object | None = None  # callable wgt(xyz), e.g. PlanarViscousSponge

    @property
    def dim(self):
        return self.mixture.dim

    @property
    def nvel(self):
        return self.mixture.nvel

    @property
    def neq(self):
        return self.mixture.num_equations

    # -- convective --------------------------------------------------------

    def convective(self, U):
        """F_conv[..., neq, dim] (reference: src/fluxes.cpp:135-171)."""
        mix = self.mixture
        dim, nvel, neq = self.dim, self.nvel, self.neq
        p = mix.pressure(U)
        rho = U[..., 0]
        mom = U[..., 1 : 1 + nvel]  # [..., nvel]
        vel_d = mom[..., :dim] / rho[..., None]  # [..., dim]

        F = jnp.zeros(U.shape[:-1] + (neq, dim), dtype=U.dtype)
        # mass
        F = F.at[..., 0, :].set(mom[..., :dim])
        # momentum: rho u_i u_d + p delta_{id}
        F = F.at[..., 1 : 1 + nvel, :].set(mom[..., :, None] * vel_d[..., None, :])
        diag = jnp.arange(dim)
        F = F.at[..., 1 + diag, diag].add(p[..., None])
        # energy: u_d * (rhoE + p)
        H = (U[..., mix.i_th] + p)[..., None]
        F = F.at[..., mix.i_th, :].set(vel_d * H)
        # active species / passive scalars: rhoY * u_d
        nact = neq - (nvel + 2)
        if nact > 0:
            rhoY = U[..., nvel + 2 :]
            F = F.at[..., nvel + 2 :, :].set(rhoY[..., :, None] * vel_d[..., None, :])
        if mix.two_temperature:
            pe = mix.electron_pressure(U)
            he = (U[..., neq - 1] + pe)[..., None] / rho[..., None]
            F = F.at[..., neq - 1, :].set(he * mom[..., :dim])
        return F

    # -- viscous -----------------------------------------------------------

    def viscous(self, U, Up, grad_up, xyz=None, delta=None, distance=None):
        """F_visc[..., neq, dim] (reference: src/fluxes.cpp:173-336).

        grad_up[..., neq, dim] is the gradient of primitives.  The viscous
        flux is defined so the total flux is F_conv - F_visc.
        """
        mix = self.mixture
        dim, nvel, neq = self.dim, self.nvel, self.neq
        if self.eq_system == "euler":
            return jnp.zeros(U.shape[:-1] + (neq, dim), dtype=U.dtype)

        props = self.transport.flux_properties(
            mix, U, Up, grad_up, distance=distance,
            radius=(xyz[..., 0] if (self.axisymmetric and xyz is not None)
                    else None),
        )
        visc = props["visc"]
        bulk = props["bulk_visc"] - (2.0 / 3.0) * visc
        kappa = props["kappa"]
        kappa_e = props["kappa_e"]
        pr_cp = visc / props["kappa"]

        if self.sgs_model is not None and delta is not None:
            mu_sgs = self.sgs_model(U, grad_up, delta)
            bulk = bulk * (1.0 + mu_sgs / visc)
            visc = visc + mu_sgs
            kappa = kappa + mu_sgs / pr_cp

        if self.visc_sponge is not None and xyz is not None:
            # viscous sponge multiplies all transport coefficients
            # (reference: src/fluxes.cpp:233-246)
            wgt = self.visc_sponge(xyz)
            visc = visc * wgt
            bulk = bulk * wgt
            kappa = kappa * wgt
            kappa_e = kappa_e * wgt
            dv_sponge = wgt
        else:
            dv_sponge = None

        F = jnp.zeros(U.shape[:-1] + (neq, dim), dtype=U.dtype)

        grad_vel = grad_up[..., 1 : 1 + dim, :dim]  # du_i/dx_j
        div_v = jnp.trace(grad_vel, axis1=-2, axis2=-1)
        radius = None
        if self.axisymmetric:
            radius = xyz[..., 0]
            ur = Up[..., 1]
            div_v = div_v + jnp.where(radius > 0, ur / jnp.where(radius > 0, radius, 1.0), 0.0)

        stress = visc[..., None, None] * (grad_vel + jnp.swapaxes(grad_vel, -1, -2))
        diag = jnp.arange(dim)
        stress = stress.at[..., diag, diag].add((bulk * div_v)[..., None])

        F = F.at[..., 1 : 1 + dim, :].set(stress)

        # axisymmetric swirl stress (reference: fluxes.cpp:285-297)
        if self.axisymmetric and nvel == 3:
            ut = Up[..., 3]
            ut_r = grad_up[..., 3, 0]
            ut_z = grad_up[..., 3, 1]
            tau_tr = visc * (
                ut_r - jnp.where(radius > 0, ut / jnp.where(radius > 0, radius, 1.0), 0.0)
            )
            tau_tz = visc * ut_z
            F = F.at[..., 3, 0].set(tau_tr)
            F = F.at[..., 3, 1].set(tau_tz)

        # energy flux: tau . u + kappa grad(T) (+ electron heat flux)
        vel = Up[..., 1 : 1 + dim]
        tau_u = jnp.einsum("...ij,...j->...i", stress, vel)
        gradT = grad_up[..., mix.i_th, :]
        if mix.two_temperature:
            gradTe = grad_up[..., neq - 1, :]
            qe = kappa_e[..., None] * gradTe
            Fe = tau_u + kappa[..., None] * gradT + qe
            F = F.at[..., neq - 1, :].add(qe)
        else:
            Fe = tau_u + (kappa + kappa_e)[..., None] * gradT
        F = F.at[..., mix.i_th, :].set(Fe)

        if self.axisymmetric and nvel == 3:
            F = F.at[..., mix.i_th, 0].add(ut * tau_tr)
            F = F.at[..., mix.i_th, 1].add(ut * tau_tz)

        # species diffusion fluxes: -rhoY_s * V_s
        dv = props.get("diff_vel")
        if dv is not None and dv_sponge is not None:
            dv = dv * dv_sponge[..., None, None]
        if dv is not None:
            rhoY = U[..., nvel + 2 : nvel + 2 + mix.num_active_species]
            F = F.at[..., nvel + 2 : nvel + 2 + mix.num_active_species, :].set(
                -rhoY[..., None] * dv[..., : mix.num_active_species, :dim]
            )
            h_sp = mix.species_enthalpies(U)
            F = F.at[..., mix.i_th, :].add(
                -jnp.einsum("...s,...sd->...d", h_sp, dv[..., :dim])
            )
            if mix.two_temperature:
                # the electron-energy equation also transports electron
                # enthalpy with the electron diffusion velocity
                # (reference: src/fluxes.cpp:250-252, the two-T branch's
                # flux[num_equation-1] -= h_e * V_e; round-5 fix — the
                # BC-inclusive sheath MMS caught the missing term)
                ie = mix.i_electron
                F = F.at[..., neq - 1, :].add(
                    -h_sp[..., ie, None] * dv[..., ie, :dim]
                )
        elif mix.num_active_species > 0 and self.eq_system == "ns-passive":
            # passive scalar: Fick diffusion mu/Sc * grad(Y)
            Sc = getattr(self.transport, "Sc", 0.71)
            gradY = grad_up[..., nvel + 2 :, :dim]
            F = F.at[..., nvel + 2 :, :].set((visc / Sc)[..., None, None] * gradY)

        return F

    def total_at_dofs(self, U, Up, grad_up, xyz, delta, distance=None):
        """F_conv - F_visc at solution nodes (reference: rhs_operator.cpp:532-541)."""
        F = self.convective(U)
        if self.eq_system != "euler":
            F = F - self.viscous(U, Up, grad_up, xyz=xyz, delta=delta, distance=distance)
        return F
