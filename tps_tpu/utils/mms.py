"""Manufactured-solution (MMS) verification utilities.

The role of the reference's MASA handlers + compute_rhs driver
(reference: src/masa_handler.cpp, utils/compute_rhs.cpp, used by
test/mms.euler_2d.test:28-52): project an exact solution, evaluate the
discrete RHS, and report the L2 error against the exact time derivative.
Exact solutions are arbitrary jax-differentiable primitive fields; forcing
comes from autodiff (dg.forcing.make_mms_forcing) instead of the MASA
library.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l2_norm(tab, field):
    """Quadrature L2 norm of a dof field [ne, ndof(, k)]."""
    fq = jnp.einsum("qd,nd...->nq...", tab.Bvol, field)
    w = tab.wq[None, :] * tab.detJ
    if fq.ndim == 3:
        w = w[..., None]
    return jnp.sqrt(jnp.sum(w * fq * fq))


def rhs_error(ctx, tab, exact_primitive_fn, t=0.0):
    """L2 error of the discrete RHS vs the exact dU/dt at time t.

    Returns (error, per-equation errors) — the quantity bracketed by the
    reference's mms.euler_2d test."""
    mix = ctx.fluxes.mixture

    def exact_U(tt):
        return mix.conservatives(exact_primitive_fn(tab.xyz_dof, tt))

    from ..dg.rhs import compute_rhs

    t = jnp.asarray(t, dtype=tab.xyz_dof.dtype)
    U = exact_U(t)
    y, _ = compute_rhs(ctx, tab, U, t)
    dUdt = jax.jacfwd(exact_U)(t)
    err = y - dUdt
    total = l2_norm(tab, err)
    per_eq = jnp.stack(
        [l2_norm(tab, err[..., k]) for k in range(err.shape[-1])]
    )
    return total, per_eq


def solution_error(tab, mix, U, exact_primitive_fn, t):
    """L2 error of the solution vs the exact state (checkSolutionError
    analog, reference: src/M2ulPhyS.hpp:361-366)."""
    Uex = mix.conservatives(exact_primitive_fn(tab.xyz_dof, t))
    return l2_norm(tab, U - Uex)


def convergence_study(make_ctx_tab, exact_primitive_fn, resolutions):
    """RHS-error convergence sweep (the runP*.sh role). Returns
    [(n, error)] and observed orders."""
    results = []
    for n in resolutions:
        ctx, tab = make_ctx_tab(n)
        err, _ = rhs_error(ctx, tab, exact_primitive_fn)
        results.append((n, float(err)))
    orders = [
        np.log(results[i - 1][1] / results[i][1])
        / np.log(results[i][0] / results[i - 1][0])
        for i in range(1, len(results))
    ]
    return results, orders
