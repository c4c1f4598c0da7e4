"""Restarted GMRES with iteration counting and mixed-precision cycles.

`jax.scipy.sparse.linalg.gmres` (used through round 3 for the EM block
solves) reports nothing: no iteration count, no residual, and its
"batched" mode always runs full restart cycles even after convergence.
The reference prints hypre/FGMRES iteration counts and residuals on
every EM solve (src/quasimagnetostatic.cpp:464-476 solver prints), and
VERDICT r3 asks the gate to track per-EM-solve cost — both need a
Krylov loop that counts.

This is textbook right-preconditioned GMRES(m) with modified
Gram-Schmidt (one reorthogonalization pass) and Givens rotations,
written as lax.while_loops so it jits once and early-exits mid-cycle.

Two properties matter on TPU:

- **The monitored residual is the TRUE residual.**  Every restart
  recomputes r = b - A x in the OUTER dtype, so the reported relres is
  meaningful regardless of preconditioner strength or inner precision,
  and a stalled solve is visible (and cut off by `stall_factor`)
  instead of silently burning maxiter.
- **Iterative refinement (GMRES-IR).**  `cycle_dtype`/`cycle_apply`/
  `cycle_M` run the Arnoldi cycles in a cheap precision (f32 — native
  TPU speed) while the outer residual/solution updates stay in the
  caller's dtype (f64 where enabled): each cycle solves A d = r/||r||
  in the cycle precision and applies x += ||r|| d in the outer
  precision.  Converges to outer-precision tolerances as long as each
  cycle makes progress (kappa_precond(A) * eps_cycle < 1), which the
  stall cutoff checks empirically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmres_solve(apply_fn, b, x0=None, M=None, tol=1e-8, atol=0.0,
                restart=30, maxiter=400, return_info=False,
                cycle_apply=None, cycle_M=None, cycle_dtype=None,
                stall_factor=0.95):
    """Solve A x = b with restarted right-preconditioned GMRES(-IR).

    Returns x, or (x, iterations, relres) with return_info=True.
    `iterations` counts matvec/preconditioner applications (Arnoldi
    steps), summed over restart cycles — the number the reference's
    solver prints track.  `relres` is the TRUE relative residual
    ||b - A x|| / ||b|| recomputed in the dtype of `b`.

    cycle_dtype (+ optionally cycle_apply/cycle_M operating in that
    dtype) runs the inner Arnoldi cycles in reduced precision with
    outer-precision residual refresh at each restart (GMRES-IR).
    stall_factor: stop when a full cycle fails to shrink the true
    residual below stall_factor * previous (converged as far as the
    cycle precision/preconditioner can go).
    """
    if M is None:
        M = lambda x: x  # noqa: E731
    n = b.shape[0]
    dtype = b.dtype
    cdtype = dtype if cycle_dtype is None else jnp.dtype(cycle_dtype)
    if cycle_apply is None:
        cycle_apply = (apply_fn if cdtype == dtype else
                       (lambda v: apply_fn(v.astype(dtype)).astype(cdtype)))
    if cycle_M is None:
        cycle_M = (M if cdtype == dtype else
                   (lambda v: M(v.astype(dtype)).astype(cdtype)))
    m = int(restart)
    x0 = jnp.zeros_like(b) if x0 is None else x0

    bnorm = jnp.sqrt(jnp.sum(b * b))
    # convergence target on the TRUE residual norm
    eps = float(jnp.finfo(dtype).eps)
    ceps = float(jnp.finfo(cdtype).eps)
    target = jnp.maximum(jnp.asarray(max(float(tol), 10.0 * eps),
                                     dtype) * bnorm,
                         jnp.asarray(float(atol), dtype))
    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)
    ctiny = jnp.asarray(1e-30 if cdtype == jnp.float32 else 1e-300, cdtype)

    def arnoldi_cycle(x):
        """One GMRES(m) cycle from iterate x; returns (x_new, res_norm,
        inner_iters).  The cycle runs in cdtype on the UNIT-normalized
        residual (g0 = 1), so reduced precision keeps full headroom;
        res_norm is the true outer-dtype residual of x_new."""
        r = b - apply_fn(x)
        beta = jnp.sqrt(jnp.sum(r * r))
        V0 = jnp.zeros((m + 1, n), cdtype).at[0].set(
            (r / (beta + tiny)).astype(cdtype))
        R0 = jnp.zeros((m, m), cdtype)    # rotated Hessenberg (upper tri)
        g0 = jnp.zeros(m + 1, cdtype).at[0].set(1.0)
        cs0 = jnp.zeros(m, cdtype)
        sn0 = jnp.zeros(m, cdtype)
        # in-cycle exit on the residual ESTIMATE relative to this cycle's
        # start: down to the outer target, but never below what the cycle
        # precision can resolve
        inner_target = jnp.maximum(
            (target / (beta + tiny)).astype(cdtype),
            jnp.asarray(5.0 * ceps, cdtype),
        )

        def cond(st):
            j, _, _, g, _, _ = st
            return jnp.logical_and(j < m, jnp.abs(g[j]) > inner_target)

        def body(st):
            j, V, R, g, cs, sn = st
            w = cycle_apply(cycle_M(V[j]))
            # modified-GS against rows 0..j (mask keeps shapes static)
            live = (jnp.arange(m + 1) <= j).astype(cdtype)
            h = (V @ w) * live                      # [m+1]
            w = w - h @ V
            # one reorthogonalization pass (MGS in masked-matmul form is
            # classical GS; the second pass restores MGS-grade
            # orthogonality)
            h2 = (V @ w) * live
            w = w - h2 @ V
            h = h + h2
            hj1 = jnp.sqrt(jnp.sum(w * w))
            V = V.at[j + 1].set(w / (hj1 + ctiny))

            # apply the previous Givens rotations to the new column
            def rot(i, col):
                a, bb = col[i], col[i + 1]
                return col.at[i].set(cs[i] * a + sn[i] * bb) \
                          .at[i + 1].set(-sn[i] * a + cs[i] * bb)

            col = jnp.zeros(m + 1, cdtype).at[:m].set(
                jnp.where(jnp.arange(m) <= j, h[:m], 0.0)
            ).at[jnp.minimum(j + 1, m)].set(hj1)
            # guard: h lives in rows 0..j, subdiag at j+1
            col = col.at[j].set(h[j])
            col = jax.lax.fori_loop(0, j, rot, col)
            # new rotation eliminating the subdiagonal hj1
            a, bb = col[j], hj1
            denom = jnp.sqrt(a * a + bb * bb) + ctiny
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
        Rm = Rm + jnp.diag(jnp.where(used, 0.0, 1.0).astype(cdtype))
        y = jax.scipy.linalg.solve_triangular(
            Rm, jnp.where(used, g[:m], 0.0), lower=False)
        dx = cycle_M(y @ V[:m]).astype(dtype)
        x_new = x + beta * dx
        # TRUE residual of the new iterate, outer dtype (pays one extra
        # apply per cycle; keeps the report honest and IR convergent)
        r_new = b - apply_fn(x_new)
        return x_new, jnp.sqrt(jnp.sum(r_new * r_new)), j

    def outer_cond(st):
        _, res, it, first, prev = st
        improving = res < stall_factor * prev
        return jnp.logical_and(
            jnp.logical_or(first,
                           jnp.logical_and(res > target, improving)),
            it < maxiter,
        )

    def outer_body(st):
        x, res, it, _, _ = st
        x2, res2, j = arnoldi_cycle(x)
        # keep the better iterate (a failed reduced-precision cycle must
        # not destroy a converged solution)
        take = res2 < res
        x2 = jnp.where(take, x2, x)
        res2 = jnp.minimum(res2, res)
        return (x2, res2, it + j, False, res)

    inf = jnp.asarray(jnp.inf, dtype)
    x, res, iters, _, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, inf, jnp.asarray(0), True, inf),
    )
    if return_info:
        relres = res / jnp.maximum(bnorm, tiny)
        return x, iters, relres
    return x
