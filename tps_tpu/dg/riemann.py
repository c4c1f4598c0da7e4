"""Numerical face fluxes: Rusanov (local Lax-Friedrichs) and Roe.

Mirrors reference RiemannSolverTPS (src/riemann_solver.cpp:85-206) as pure
batched functions over face quadrature points.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def flux_dot_n(fluxes, U, nor):
    """F_conv(U) . nor with nor the scaled (non-unit) normal."""
    F = fluxes.convective(U)  # [..., neq, dim]
    return jnp.einsum("...ed,...d->...e", F, nor)


@dataclass(frozen=True)
class Rusanov:
    """Local Lax-Friedrichs flux (reference: src/riemann_solver.cpp:89-115)."""

    fluxes: object

    def __call__(self, U1, U2, nor):
        mix = self.fluxes.mixture
        max_e = jnp.maximum(mix.max_char_speed(U1), mix.max_char_speed(U2))
        f1 = flux_dot_n(self.fluxes, U1, nor)
        f2 = flux_dot_n(self.fluxes, U2, nor)
        normag = jnp.linalg.norm(nor, axis=-1)
        return 0.5 * (f1 + f2) - 0.5 * (max_e * normag)[..., None] * (U2 - U1)


@dataclass(frozen=True)
class Roe:
    """Roe flux with entropy fix (reference: src/riemann_solver.cpp:117-206,
    generalized to 2-D/3-D).  Species/passive equations are upwinded with
    the contact speed."""

    fluxes: object

    def __call__(self, U1, U2, nor):
        mix = self.fluxes.mixture
        dim = mix.dim
        # guard the normalization: weight-folded normals (nor_wpf) are
        # exactly zero at zero-weight padding slots and axisymmetric-axis
        # faces; 0/0 would poison the whole element row through the face
        # scatter even though the flux there is multiplied by zero
        normag = jnp.maximum(jnp.linalg.norm(nor, axis=-1),
                             jnp.finfo(nor.dtype).tiny)
        n = nor / normag[..., None]

        f1 = flux_dot_n(self.fluxes, U1, n)
        f2 = flux_dot_n(self.fluxes, U2, n)
        mean = 0.5 * (f1 + f2)

        s1 = jnp.sqrt(U1[..., 0])
        s2 = jnp.sqrt(U2[..., 0])
        r = s1 * s2
        vel = (U1[..., 1 : 1 + dim] / s1[..., None] + U2[..., 1 : 1 + dim] / s2[..., None]) / (
            s1 + s2
        )[..., None]
        qk = jnp.einsum("...d,...d->...", vel, n)

        p1 = mix.pressure(U1)
        p2 = mix.pressure(U2)
        H = ((U1[..., 1 + dim] + p1) / s1 + (U2[..., 1 + dim] + p2) / s2) / (s1 + s2)
        a2 = (mix.specific_heat_ratio - 1.0) * (H - 0.5 * jnp.sum(vel**2, axis=-1))
        a = jnp.sqrt(a2)

        lamb0 = qk
        lamb0 = jnp.where(jnp.abs(lamb0) < 1e-4, 1e-4, lamb0)
        lamb1 = qk + a
        lamb2 = qk - a

        dP = p2 - p1
        dvel = U2[..., 1 : 1 + dim] / U2[..., 0:1] - U1[..., 1 : 1 + dim] / U1[..., 0:1]
        dqk = jnp.einsum("...d,...d->...", dvel, n)

        drho = U2[..., 0] - U1[..., 0]
        # contact/shear wave contribution
        coef0 = drho - dP / a2
        DF1 = jnp.concatenate(
            [
                coef0[..., None],
                coef0[..., None] * vel + r[..., None] * (dvel - n * dqk[..., None]),
                (coef0 * 0.5 * jnp.sum(vel**2, axis=-1)
                 + r * (jnp.einsum("...d,...d->...", vel, dvel) - qk * dqk)
                 )[..., None],
            ],
            axis=-1,
        ) * jnp.abs(lamb0)[..., None]

        # acoustic waves
        alpha_p = 0.5 * (dP + r * a * dqk) / a2
        alpha_m = 0.5 * (dP - r * a * dqk) / a2
        one = jnp.ones_like(a)[..., None]
        DFp = jnp.concatenate(
            [one, vel + n * a[..., None], (H + qk * a)[..., None]], axis=-1
        ) * (alpha_p * jnp.abs(lamb1))[..., None]
        DFm = jnp.concatenate(
            [one, vel - n * a[..., None], (H - qk * a)[..., None]], axis=-1
        ) * (alpha_m * jnp.abs(lamb2))[..., None]

        flux_ns = mean - 0.5 * (DF1 + DFp + DFm)

        neq = mix.num_equations
        if neq > dim + 2:
            # upwind transported scalars with the interface normal velocity
            up = jnp.where(qk >= 0, U1[..., dim + 2 :], U2[..., dim + 2 :])
            qk1 = jnp.einsum("...d,...d->...", U1[..., 1 : 1 + dim] / U1[..., 0:1], n)
            qk2 = jnp.einsum("...d,...d->...", U2[..., 1 : 1 + dim] / U2[..., 0:1], n)
            fs = 0.5 * (qk1[..., None] * U1[..., dim + 2 :] + qk2[..., None] * U2[..., dim + 2 :])
            fs = fs - 0.5 * jnp.abs(qk)[..., None] * (U2[..., dim + 2 :] - U1[..., dim + 2 :])
            flux = jnp.concatenate([flux_ns, fs], axis=-1)
        else:
            flux = flux_ns
        return flux * normag[..., None]
