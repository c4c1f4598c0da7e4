"""Fused-layout RHS fast path for structured (generator) meshes.

Motivation (PERF.md): XLA tiles the two minor dims of every TPU array to
(8, 128).  The general DG pipeline materializes arrays like [ne, 27, 20]
and [ne, 54, 5] whose minor dims are far below the tile, inflating HBM
traffic ~7x.  On structured generator meshes every element shares the
same geometry factors:

  - Bvol == I          (collocated Gauss-Legendre basis)
  - Minv diagonal and identical for all elements
  - adjJ constant (one dim x dim matrix)
  - face weights/normals identical per (local face, point) slot
  - neighbor traces are pure grid rolls (tab.roll_info)

so the *entire linear part* of the DG operator folds into a few shared
weight matrices acting on a fused (dof*eq) minor dimension >= 128:

  gradient: G2 [ne, ndof*neq*dim] = [Up2 | rolls(Up2)] @ K_grad
  traces:   T  [ne, nlf*nqf*neq(*dim)] = U2 @ K_tr (block kron(Btr, I))
  scatter:  y += fluxw2 @ K_face_out   (wts, sign, Minv folded in)
  volume:   y += Fdof2 @ K_vol         (wq, adjJ, Gvol, Minv folded in)

Every materialized buffer is 2-D [ne, K] with K >= 128, so tile padding
is <= 1.2x instead of 7-11x.  The nonlinear physics (primitives, Riemann,
viscous fluxes) runs pointwise on reshaped *views* between the matmuls,
which XLA keeps inside fusions.  The extra block-diagonal FLOPs are free:
the pipeline is HBM-bound, not MXU-bound.

This is the production fast path used by the solver and bench when the
preconditions hold (periodic structured mesh, no BCs / forcings / SGS /
sponge / axisymmetry); the slot path (rhs.compute_rhs) remains the
general fallback.  Hot-loop parity: reference RHSoperator::Mult,
src/rhs_operator.cpp:343-464 and dgNonlinearForm.cpp:90-349.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


_POINTWISE_FORCINGS = ("SourceTerm", "JouleHeating")


def fusable(tab_np, ctx) -> bool:
    """Preconditions for the fused path (see module docstring).

    Pointwise per-dof forcings (chemistry SourceTerm, JouleHeating —
    both ignore the tables and act on (U, Up, grad_up, fields)) are
    evaluated after the DG part, so the periodic plasma configs ride
    the roll-based fast path instead of the gather-heavy slot path."""
    t = tab_np
    if t.roll_info is None or t.nfb or ctx.bcs:
        return False
    if any(type(f).__name__ not in _POINTWISE_FORCINGS
           for f in ctx.forcings):
        return False
    if ctx.fluxes.axisymmetric or getattr(t, "rad_vol", None) is not None:
        return False
    if ctx.fluxes.sgs_model is not None or ctx.fluxes.visc_sponge is not None:
        return False
    if ctx.axis_name is not None:
        return False
    # collocation: the nodal basis must coincide with the volume rule
    # (true for the GL basis + GL 2p rule; NOT for the reference-default
    # GLL/GLL combination, whose 2p rule has p+2 points per dim)
    if t.Bvol.shape[0] != t.Bvol.shape[1]:
        return False
    if not np.allclose(t.Bvol, np.eye(t.nq)):
        return False
    M0 = np.asarray(t.Minv[0])
    if not np.allclose(t.Minv, M0) or not np.allclose(M0, np.diag(np.diag(M0))):
        return False
    if not np.allclose(t.adjJ, t.adjJ[0, 0]):
        return False
    if not (np.allclose(t.wts_slot, t.wts_slot[0:1])
            and np.allclose(t.nor_slot, t.nor_slot[0:1])):
        return False
    return True


@dataclass(frozen=True)
class FusedRHS:
    """Callable fused-layout RHS: (U2 [ne, ndof*neq], t) -> (dU2/dt, aux).

    Face handling is *per local face*: each face's trace lives in its own
    fused buffer [ne, nqf*neq] (pad <= 2.9x instead of 11x for a stacked
    [ne, nlf, nqf, neq]), and the neighbor trace is a pure grid-row roll of
    the OPPOSITE face's buffer -- no lane-unaligned slicing, no padded
    stack materialization.  Measured on v5e: 1.86 -> 1.06 ms/substep vs
    the stacked-trace variant (PERF.md).
    """

    ctx: object
    ne: int
    ndof: int
    neq: int
    dim: int
    grid: tuple
    per_lf: tuple  # ((axis, shift, opp), ...) from tab.roll_info
    nlf: int
    nqf: int
    # jnp weight matrices
    K_grad: object  # [(1+nlf)*ndof*neq, ndof*neq*dim]
    KU_lf: tuple  # per face: [ndof*neq, nqf*neq]
    KG_lf: tuple  # per face: [ndof*neq*dim, nqf*neq*dim]
    KO_lf: tuple  # per face: [nqf*neq, ndof*neq]
    K_vol: object  # [ndof*neq*dim, ndof*neq]
    nor_lf: tuple  # per face: [nqf, dim] (shared across elements)
    delta: object  # scalar element size (uniform)
    # element-sharded operation (grid axis 0 split into contiguous
    # equal slabs over a shard_map axis): cross-shard neighbor rows
    # ride a ppermute at the slab seams, everything else is local —
    # the fused/megakernel analog of the reference's packed halo
    # exchange (src/rhs_operator.cpp:775-830)
    axis_name: object = None
    nparts: int = 1

    def to_fused(self, U):
        return U.reshape(U.shape[0], -1)

    def from_fused(self, U2):
        return U2.reshape(self.ne, self.ndof, self.neq)

    def _rolls(self, A2):
        """Grid rolls of a fused per-element buffer [ne, K] -> list per lf."""
        out = []
        for (axis, shift, _opp) in self.per_lf:
            out.append(self._roll(A2, axis, shift))
        return out

    def _roll(self, A2, axis, shift):
        import jax
        import jax.numpy as jnp

        Ag = A2.reshape(tuple(self.grid) + (A2.shape[-1],))
        if axis == 0 and self.axis_name is not None and self.nparts > 1:
            # local roll + seam fix-up: the wrapped-in row comes from the
            # neighboring shard's edge slab (periodic over shards)
            P = self.nparts
            rolled = jnp.roll(Ag, shift, axis=0)
            if shift == 1:
                edge = Ag[-1:]
                perm = [(i, (i + 1) % P) for i in range(P)]
                recv = jax.lax.ppermute(edge, self.axis_name, perm)
                rolled = rolled.at[0:1].set(recv)
            else:
                edge = Ag[:1]
                perm = [(i, (i - 1) % P) for i in range(P)]
                recv = jax.lax.ppermute(edge, self.axis_name, perm)
                rolled = rolled.at[-1:].set(recv)
            return rolled.reshape(A2.shape)
        return jnp.roll(Ag, shift, axis=axis).reshape(A2.shape)

    def __call__(self, U2, t=0.0, fields=None):
        import jax.numpy as jnp

        ctx = self.ctx
        mix = ctx.mixture
        ne, ndof, neq, dim = self.ne, self.ndof, self.neq, self.dim
        nqf = self.nqf
        viscous = ctx.fluxes.eq_system != "euler"

        U = self.from_fused(U2)
        Up = mix.primitives(U)
        Up2 = Up.reshape(ne, -1)

        # ---- gradient (fully linear: one matmul over [self | rolls]) ----
        G2 = None
        if viscous:
            R = jnp.concatenate([Up2] + self._rolls(Up2), axis=-1)
            G2 = R @ self.K_grad  # [ne, ndof*neq*dim]

        # ---- per-face traces (fused minor dim per face) ----
        TU = [U2 @ K for K in self.KU_lf]  # [ne, nqf*neq] each
        TG = [G2 @ K for K in self.KG_lf] if viscous else None

        # ---- volume flux + scatter ----
        Fdof = ctx.fluxes.total_at_dofs(U, Up,
                                        G2.reshape(ne, ndof, neq, dim)
                                        if viscous else None,
                                        None, None)
        y2 = Fdof.reshape(ne, -1) @ self.K_vol

        # ---- per-face physics: neighbor = grid roll of the opposite
        # face's trace buffer (pure row permutation) ----
        d = self.delta
        for lf, (axis, shift, opp) in enumerate(self.per_lf):
            own_u = TU[lf].reshape(ne, nqf, neq)
            nbr_u = self._roll(TU[opp], axis, shift).reshape(ne, nqf, neq)
            nor = self.nor_lf[lf]  # [nqf, dim]
            flux = ctx.riemann(own_u, nbr_u, nor)
            if viscous:
                own_g = TG[lf].reshape(ne, nqf, neq, dim)
                nbr_g = self._roll(TG[opp], axis, shift).reshape(
                    ne, nqf, neq, dim)
                Fv1 = ctx.fluxes.viscous(own_u, mix.primitives(own_u), own_g,
                                         xyz=None, delta=d)
                Fv2 = ctx.fluxes.viscous(nbr_u, mix.primitives(nbr_u), nbr_g,
                                         xyz=None, delta=d)
                flux = flux - jnp.einsum("...ed,...d->...e",
                                         0.5 * (Fv1 + Fv2), nor)
            y2 = y2 + flux.reshape(ne, nqf * neq) @ self.KO_lf[lf]

        if ctx.forcings:
            # pointwise forcings (fusable() restricts to tab-independent
            # ones); grad_up from the fused gradient when viscous
            gu = G2.reshape(ne, ndof, neq, dim) if viscous else None
            yf = y2.reshape(ne, ndof, neq)
            for f in ctx.forcings:
                yf = yf + f(t, None, U, Up, gu, fields)
            y2 = yf.reshape(ne, ndof * neq)

        mcs = jnp.max(mix.max_char_speed(U))
        if self.axis_name is not None and self.nparts > 1:
            import jax

            mcs = jax.lax.pmax(mcs, self.axis_name)
        return y2, {"max_char_speed": mcs}


def build_fused(tab_np, ctx, dtype=None) -> FusedRHS:
    """Fold the linear DG operators into fused-layout weight matrices."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32

    t = tab_np
    mix = ctx.mixture
    ndof, nq, nlf, nqf, dim = t.ndof, t.nq, t.nlf, t.nqf, t.dim
    neq = mix.num_equations
    ne = t.ne
    grid, per_lf = t.roll_info

    B = np.asarray(t.Btr)  # [nlf*nqf, ndof]
    m = np.diag(np.asarray(t.Minv[0]))  # [ndof] diagonal inverse mass
    adj = np.asarray(t.adjJ[0, 0])  # [dim, dim]
    wq = np.asarray(t.wq)  # [nq] == [ndof]
    Gv = np.asarray(t.Gvol)  # [nq, ndof, dim] (ref-space basis gradients)
    w_s = np.asarray(t.wts_slot[0])  # [nlf, nqf]
    n_s = np.asarray(t.nor_slot[0])  # [nlf, nqf, dim]

    eye_e = np.eye(neq)

    # -- gradient fold: scalar maps [ndof -> (j, dd)] then kron over eq --
    # volume: rvol[j,(e,dd)] = wq[j] sum_k Gv[j,d,k] adj[k,dd] Up[d,e]
    S_vol = np.einsum("j,jdk,kD->djD", wq, Gv, adj)  # [d, j, dd]
    # own side of the central face jump: -0.5 w n (Btr Up)
    S_own = np.einsum("sj,s,sD,sd->djD", B, -0.5 * w_s.reshape(-1),
                      n_s.reshape(-1, dim), B)
    S_self = (S_vol + S_own) * m[None, :, None]
    blocks = [S_self]
    for lf, (_axis, _shift, opp) in enumerate(per_lf):
        sl = slice(lf * nqf, (lf + 1) * nqf)
        so = slice(opp * nqf, (opp + 1) * nqf)
        N = np.einsum("sj,s,sD,sd->djD", B[sl], 0.5 * w_s[lf],
                      n_s[lf], B[so])
        blocks.append(N * m[None, :, None])
    # expand each [d, j, dd] block over equations -> [(d,e), (j,e,dd)]
    K_grad = np.concatenate(
        [
            np.einsum("djD,ef->dejfD", blk, eye_e).reshape(
                ndof * neq, ndof * neq * dim
            )
            for blk in blocks
        ],
        axis=0,
    )  # [(1+nlf)*ndof*neq, ndof*neq*dim]

    # -- per-face trace matmuls: kron(Btr[face rows], I) --
    eye_ed = np.eye(neq * dim)
    KU_lf, KG_lf, KO_lf = [], [], []
    for lf in range(nlf):
        sl = slice(lf * nqf, (lf + 1) * nqf)
        KU_lf.append(np.einsum("sd,ef->desf", B[sl], eye_e).reshape(
            ndof * neq, nqf * neq))
        KG_lf.append(np.einsum("sd,gh->dgsh", B[sl], eye_ed).reshape(
            ndof * neq * dim, nqf * neq * dim))
        # face scatter: z[j,e] = -sum_s w[s] Btr[s,j] m[j] flux[s,e]
        KO_lf.append(np.einsum("s,sj,j,ef->sejf", w_s[lf], B[sl], m,
                               eye_e).reshape(nqf * neq, ndof * neq) * (-1.0))

    # -- volume scatter: z[j,e] = sum_{q,dd} wq[q] Gv[q,j,k] adj[k,dd] m[j] F --
    A_vol = np.einsum("q,qjk,kD,j->qDj", wq, Gv, adj, m)  # [q, dd, j]
    K_vol = np.einsum("qDj,ef->qeDjf", A_vol, eye_e).reshape(
        ndof * neq * dim, ndof * neq
    )

    return FusedRHS(
        ctx=ctx, ne=ne, ndof=ndof, neq=neq, dim=dim,
        grid=tuple(grid), per_lf=tuple(per_lf), nlf=nlf, nqf=nqf,
        K_grad=jnp.asarray(K_grad, dtype),
        KU_lf=tuple(jnp.asarray(K, dtype) for K in KU_lf),
        KG_lf=tuple(jnp.asarray(K, dtype) for K in KG_lf),
        KO_lf=tuple(jnp.asarray(K, dtype) for K in KO_lf),
        K_vol=jnp.asarray(K_vol, dtype),
        nor_lf=tuple(jnp.asarray(n_s[lf], dtype) for lf in range(nlf)),
        delta=float(np.asarray(t.delta).flat[0]),
    )


def maybe_build_fused(tab_np, ctx, dtype=None):
    """FusedRHS when the preconditions hold, else None."""
    return build_fused(tab_np, ctx, dtype) if fusable(tab_np, ctx) else None


def maybe_build_fused_sharded(global_tab_np, ctx, partition, nparts,
                              axis_name="dd", dtype=None):
    """Per-shard FusedRHS for an element-sharded solver, or None.

    Requires the global tables fusable, the partition to be the
    contiguous equal-block partition in element order (so each shard
    owns a grid-ordered slab along roll axis 0), and the leading grid
    extent divisible by the shard count.  The returned FusedRHS operates
    on one shard's LOCAL state inside shard_map; cross-shard neighbor
    rows ride ppermute (see FusedRHS._roll)."""
    import dataclasses

    # fusable() rejects sharded contexts because the PLAIN fused path has
    # no halo exchange; this builder provides one (ppermute seams), so
    # evaluate the remaining preconditions with axis_name cleared
    if getattr(ctx, "axis_name", None) is not None:
        ctx = dataclasses.replace(ctx, axis_name=None)
    if not fusable(global_tab_np, ctx):
        return None
    ne_g = global_tab_np.ne
    if ne_g % nparts != 0:
        return None
    part = np.asarray(partition)
    blocks = np.repeat(np.arange(nparts), ne_g // nparts)
    if not np.array_equal(part, blocks):
        return None
    grid, _per_lf = global_tab_np.roll_info
    rest = int(np.prod(grid[1:]))  # grid is 2-D (ny, nx) or 3-D (nz, ny, nx)
    if grid[0] % nparts != 0 or (ne_g // nparts) % rest:
        return None
    f = build_fused(global_tab_np, ctx, dtype)
    return dataclasses.replace(
        f, ne=ne_g // nparts,
        grid=(grid[0] // nparts,) + tuple(grid[1:]),
        axis_name=axis_name, nparts=nparts,
    )
