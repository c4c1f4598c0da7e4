"""Algebraic subgrid-scale (LES) models for the compressible DG path.

Mirrors the reference Fluxes::sgsSmag / sgsSigma behavior
(reference: src/fluxes.cpp sgsSmag/sgsSigma; constants 0.12 / 0.135, floor
shift on the grid scale): callables `(U, grad_up, delta) -> mu_sgs` plugged
into Fluxes.sgs_model.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Smagorinsky:
    """mu_sgs = rho (Cd (delta - floor))^2 |S| with |S| = sqrt(2 S:S)."""

    mixture: object
    const: float = 0.12
    floor: float = 0.0

    def __call__(self, U, grad_up, delta):
        mix = self.mixture
        dim = mix.dim
        gv = grad_up[..., 1 : 1 + dim, :dim]
        S = 0.5 * (gv + jnp.swapaxes(gv, -1, -2))
        smag = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(-2, -1)))
        dd = delta if jnp.ndim(delta) == U.ndim - 1 else delta[..., 0]
        d = self.const * jnp.maximum(dd - self.floor, 0.0)
        return U[..., 0] * d * d * smag


@dataclass(frozen=True)
class Wale:
    """Wall-adapting local eddy viscosity (Nicoud & Ducros 1999), evaluated
    with the Ducros direct formula for Sd:Sd
    (role of reference: src/algebraicSubgridModels.cpp:324-452, default
    constant 0.5 per :75):
      G^2 = 1/6 (|S|^4 + |O|^4) + 2/3 |S|^2 |O|^2 + 2 S^2:O^2
      nu_t = (Cd d)^2 G^3 / (|S|^5 + G^{5/2})
    """

    mixture: object
    const: float = 0.5
    floor: float = 0.0

    def __call__(self, U, grad_up, delta):
        mix = self.mixture
        dim = mix.dim
        gv = grad_up[..., 1 : 1 + dim, :dim]
        S = 0.5 * (gv + jnp.swapaxes(gv, -1, -2))
        O = 0.5 * (gv - jnp.swapaxes(gv, -1, -2))
        S2 = jnp.einsum("...ik,...kj->...ij", S, S)
        O2 = jnp.einsum("...ik,...kj->...ij", O, O)
        Smag2 = jnp.sum(S * S, axis=(-2, -1))
        Omag2 = jnp.sum(O * O, axis=(-2, -1))
        SSOO = jnp.sum(S2 * O2, axis=(-2, -1))
        G2 = jnp.maximum(
            (Smag2**2 + Omag2**2) / 6.0 + (2.0 / 3.0) * Smag2 * Omag2 + 2.0 * SSOO,
            0.0,
        )
        omega = G2**1.5 / jnp.maximum(Smag2**2.5 + G2**1.25, 1e-12)
        dd = delta if jnp.ndim(delta) == U.ndim - 1 else delta[..., 0]
        d = self.const * jnp.maximum(dd - self.floor, 0.0)
        return U[..., 0] * d * d * omega


@dataclass(frozen=True)
class Sigma:
    """Nicoud et al. (PoF 2011) sigma model:
    mu_sgs = rho (Cd d)^2 s3 (s1 - s2)(s2 - s3) / s1^2 with s_i the singular
    values of the velocity gradient."""

    mixture: object
    const: float = 0.135
    floor: float = 0.0

    def __call__(self, U, grad_up, delta):
        mix = self.mixture
        dim = mix.dim
        gv = grad_up[..., 1 : 1 + dim, :dim]
        Q = jnp.einsum("...ki,...kj->...ij", gv, gv)  # g^T g (sym psd)
        ev = jnp.linalg.eigvalsh(Q)  # ascending
        ev = jnp.clip(ev, 0.0, None)
        s_desc = jnp.sqrt(ev[..., ::-1])  # descending singular values
        s1 = s_desc[..., 0]
        s2 = s_desc[..., 1] if dim > 1 else jnp.zeros_like(s1)
        s3 = s_desc[..., 2] if dim > 2 else jnp.zeros_like(s1)
        num = jnp.maximum(s3 * (s1 - s2) * (s2 - s3), 0.0)
        D = num / jnp.maximum(s1 * s1, 1e-24)
        dd = (delta if jnp.ndim(delta) == U.ndim - 1 else delta[..., 0])
        d = self.const * jnp.maximum(dd - self.floor, 0.0)
        return U[..., 0] * d * d * D
