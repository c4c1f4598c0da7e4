"""Molecular transport models (viscosity, conductivity, diffusion).

Mirrors the behavior of the reference TransportProperties hierarchy
(reference: src/transport_properties.hpp:52-311) as pure batched functions.
Each model returns a dict with keys:
  visc       dynamic viscosity mu
  bulk_visc  bulk viscosity (before the -2/3 mu Stokes correction)
  kappa      heavy-species thermal conductivity
  kappa_e    electron thermal conductivity (0 for neutral gases)
  diff_vel   species diffusion velocities [..., nspecies, dim] (or None)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class ConstantTransport:
    """Fixed transport coefficients (reference: transport_properties.hpp:275)."""

    visc: float
    bulk_visc: float
    kappa: float
    kappa_e: float = 0.0

    def flux_properties(self, mixture, U, Up, grad_up, **kw):
        shape = U.shape[:-1]
        dt = U.dtype
        return {
            "visc": jnp.full(shape, self.visc, dtype=dt),
            "bulk_visc": jnp.full(shape, self.bulk_visc, dtype=dt),
            "kappa": jnp.full(shape, self.kappa, dtype=dt),
            "kappa_e": jnp.full(shape, self.kappa_e, dtype=dt),
            "diff_vel": None,
        }


@dataclass(frozen=True)
class DryAirTransport:
    """Sutherland-law air transport (reference: transport_properties.hpp:227-273).

    mu = C1 * T^1.5 / (T + S0); k = cp/Pr * mu; bulk viscosity via multiplier.
    """

    gas_constant: float
    specific_heat_ratio: float
    visc_mult: float = 1.0
    bulk_visc_mult: float = 0.0
    C1: float = 1.458e-6
    S0: float = 110.4
    Pr: float = 0.71
    Sc: float = 0.71

    def viscosity(self, T):
        return self.C1 * self.visc_mult * T**1.5 / (T + self.S0)

    def flux_properties(self, mixture, U, Up, grad_up, **kw):
        T = Up[..., mixture.i_th]
        mu = self.viscosity(T)
        cp = self.specific_heat_ratio * self.gas_constant / (self.specific_heat_ratio - 1.0)
        kappa = cp / self.Pr * mu
        return {
            "visc": mu,
            "bulk_visc": self.bulk_visc_mult * mu,
            "kappa": kappa,
            "kappa_e": jnp.zeros_like(mu),
            "diff_vel": None,
        }


@dataclass(frozen=True, eq=False)
class MixingLengthTransport:
    """Algebraic mixing-length RANS closure wrapping a molecular transport
    (reference: src/mixing_length_transport.cpp:66-135):
      mu_t = rho * min(0.41 d_wall, max_mixing_length)^2 * |S|
      kappa_t = mu_t * (cp/Pr) * Prt ; bulk += bulk_mult * mu_t
    `distance` is the wall-distance field at the evaluation points."""

    molecular: object
    max_mixing_length: float
    Prt: float = 0.91
    bulk_mult: float = 0.0

    def flux_properties(self, mixture, U, Up, grad_up, distance=None,
                        radius=None, **kw):
        props = dict(self.molecular.flux_properties(mixture, U, Up, grad_up))
        if distance is None or grad_up is None:
            return props
        dim = mixture.dim
        rho = U[..., 0]
        gv = grad_up[..., 1 : 1 + dim, :dim]
        S2 = 2.0 * jnp.sum((0.5 * (gv + jnp.swapaxes(gv, -1, -2))) ** 2, (-2, -1))
        if mixture.nvel != dim and radius is not None:
            # axisymmetric swirl strain (reference:
            # src/mixing_length_transport.cpp:103-117)
            inv_r = jnp.where(radius > 0, 1.0 / jnp.where(radius > 0, radius, 1.0), 0.0)
            ur = Up[..., 1]
            ut = Up[..., 3]
            ut_r = grad_up[..., 3, 0]
            ut_z = grad_up[..., 3, 1]
            Szx = 0.5 * (ut_r - ut * inv_r)
            Szy = 0.5 * ut_z
            Szz = ur * inv_r
            S2 = S2 + 2.0 * (2.0 * Szx**2 + 2.0 * Szy**2 + Szz**2)
        S = jnp.sqrt(S2)
        lmix = jnp.minimum(0.41 * distance, self.max_mixing_length)
        mut = rho * lmix * lmix * S
        cp_over_pr = props["kappa"] / props["visc"]
        props["visc"] = props["visc"] + mut
        props["bulk_visc"] = props["bulk_visc"] + self.bulk_mult * mut
        props["kappa"] = props["kappa"] + mut * cp_over_pr * self.Prt
        return props

    def source_properties(self, U, Up, grad_up, efield=None):
        """Source-term transport is purely molecular (reference:
        MixingLengthTransport::ComputeSourceTransportProperties delegates,
        src/mixing_length_transport.cpp:159-164)."""
        return self.molecular.source_properties(U, Up, grad_up, efield=efield)
