"""Restarted GMRES with iteration counting.

`jax.scipy.sparse.linalg.gmres` (used through round 3 for the EM block
solves) reports nothing: no iteration count, no residual, and its
"batched" mode always runs full restart cycles even after convergence.
The reference prints hypre/FGMRES iteration counts and residuals on
every EM solve (src/quasimagnetostatic.cpp:464-476 solver prints), and
VERDICT r3 asks the gate to track per-EM-solve cost — both need a
Krylov loop that counts.

This is textbook right-preconditioned GMRES(m) with modified
Gram-Schmidt and Givens rotations, written as lax.while_loops so it
jits once and early-exits mid-cycle.  Right preconditioning keeps the
monitored residual the TRUE residual ||b - A x||, so the reported
relres is meaningful regardless of how strong the preconditioner is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmres_solve(apply_fn, b, x0=None, M=None, tol=1e-8, atol=0.0,
                restart=30, maxiter=400, return_info=False):
    """Solve A x = b with restarted right-preconditioned GMRES.

    Returns x, or (x, iterations, relres) with return_info=True.
    `iterations` counts matvec/preconditioner applications (Arnoldi
    steps), summed over restart cycles — the number the reference's
    solver prints track.
    """
    if M is None:
        M = lambda x: x  # noqa: E731
    n = b.shape[0]
    dtype = b.dtype
    m = int(restart)
    x0 = jnp.zeros_like(b) if x0 is None else x0

    bnorm = jnp.sqrt(jnp.sum(b * b))
    # convergence target on the TRUE residual norm
    eps = float(jnp.finfo(dtype).eps)
    target = jnp.maximum(jnp.asarray(max(float(tol), 10.0 * eps),
                                     dtype) * bnorm,
                         jnp.asarray(float(atol), dtype))
    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    def arnoldi_cycle(x):
        """One GMRES(m) cycle from iterate x; returns (x_new, res_norm,
        inner_iters)."""
        r = b - apply_fn(x)
        beta = jnp.sqrt(jnp.sum(r * r))
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set(r / (beta + tiny))
        R0 = jnp.zeros((m, m), dtype)     # rotated Hessenberg (upper tri)
        g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        cs0 = jnp.zeros(m, dtype)
        sn0 = jnp.zeros(m, dtype)

        def cond(st):
            j, _, _, g, _, _ = st
            return jnp.logical_and(j < m, jnp.abs(g[j]) > target)

        def body(st):
            j, V, R, g, cs, sn = st
            w = apply_fn(M(V[j]))
            # modified-GS against rows 0..j (mask keeps shapes static)
            live = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * live                      # [m+1]
            w = w - h @ V
            # one reorthogonalization pass (MGS in masked-matmul form is
            # classical GS; the second pass restores MGS-grade orthogonality)
            h2 = (V @ w) * live
            w = w - h2 @ V
            h = h + h2
            hj1 = jnp.sqrt(jnp.sum(w * w))
            V = V.at[j + 1].set(w / (hj1 + tiny))

            # apply the previous Givens rotations to the new column
            def rot(i, col):
                a, bb = col[i], col[i + 1]
                return col.at[i].set(cs[i] * a + sn[i] * bb) \
                          .at[i + 1].set(-sn[i] * a + cs[i] * bb)

            col = jnp.zeros(m + 1, dtype).at[:m].set(
                jnp.where(jnp.arange(m) <= j, h[:m], 0.0)
            ).at[jnp.minimum(j + 1, m)].set(hj1)
            # guard: h lives in rows 0..j, subdiag at j+1
            col = col.at[j].set(h[j])
            col = jax.lax.fori_loop(0, j, rot, col)
            # new rotation eliminating the subdiagonal hj1
            a, bb = col[j], hj1
            denom = jnp.sqrt(a * a + bb * bb) + tiny
            c, s = a / denom, bb / denom
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            col = col.at[j].set(c * a + s * bb)
            R = R.at[:, j].set(col[:m])
            # update the residual vector g
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            return (j + 1, V, R, g, cs, sn)

        j, V, R, g, _, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), V0, R0, g0, cs0, sn0)
        )

        # back-substitute the leading j x j system (mask the unused tail:
        # unit diagonal + zero rhs -> y[k>=j] = 0)
        used = jnp.arange(m) < j
        Rm = jnp.where(used[None, :] & used[:, None], R, 0.0)
        Rm = Rm + jnp.diag(jnp.where(used, 0.0, 1.0).astype(dtype))
        y = jax.scipy.linalg.solve_triangular(Rm, jnp.where(used, g[:m], 0.0),
                                              lower=False)
        x_new = x + M(y @ V[:m])
        return x_new, jnp.abs(g[j]), j

    def outer_cond(st):
        _, res, it, first = st
        return jnp.logical_and(
            jnp.logical_or(first, res > target), it < maxiter
        )

    def outer_body(st):
        x, _, it, _ = st
        x, res, j = arnoldi_cycle(x)
        return (x, res, it + j, False)

    x, res, iters, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0), True),
    )
    if return_info:
        relres = res / jnp.maximum(bnorm, tiny)
        return x, iters, relres
    return x
