"""Core DG operator pipeline: trace interpolation, face gather/scatter,
weak divergence, DG gradients, inverse mass.

These are the TPU-native counterparts of the reference's GPU kernel sweeps
(reference: src/dgNonlinearForm.cpp interpFaceData/evalFaceFlux/faceIntegration,
src/gradients.cpp computeGradients) expressed as batched matmuls (MXU) and
static gathers: trace = one [nlf*nqf, ndof] matmul over the element batch,
face alignment = flat takes with precomputed index maps, scatter-back = one
transposed matmul.  No dynamic shapes, no scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(tab, X, axis_name):
    """Refresh halo-element rows of X from their owning shards.

    Pack own rows needed by peers (static index list), all-gather over the
    device mesh axis (rides ICI), and unpack into local halo slots.  The
    TPU-native equivalent of the reference's packed nonblocking MPI halo
    exchange (reference: src/rhs_operator.cpp:775-830).

    X: [ne_loc, ...] shard-local element data.
    """
    send = X[tab.halo_send_idx]  # [S, ...]
    allg = jax.lax.all_gather(send, axis_name, axis=0, tiled=True)  # [P*S, ...]
    recv = allg[tab.halo_recv_idx]
    return X.at[tab.halo_slots].set(recv)


def elem_traces(tab, X):
    """Interpolate element dof data to all local-face quadrature points.

    X: [ne, ndof, k] -> [ne, nlf*nqf, k]
    """
    return jnp.einsum("fd,ndk->nfk", tab.Btr, X)


def face_gather(tab, Xtr):
    """Gather both sides of every face from stacked traces.

    Xtr: [ne, nlf*nqf, k] (from elem_traces)
    Returns XL [nft, nqf, k] (interior then boundary) and XR [nfi, nqf, k],
    with XR aligned to the L-side quadrature-point ordering.
    """
    ne = Xtr.shape[0]
    k = Xtr.shape[-1]
    nqf = tab.nqf
    flat = Xtr.reshape(ne * tab.nlf, nqf, k)
    XL = flat[tab.f_elem_l * tab.nlf + tab.f_slot_l]
    XRr = flat[tab.f_elem_r * tab.nlf + tab.f_slot_r]  # R's own ordering
    XR = jnp.take_along_axis(XRr, tab.f_qperm_r[..., None], axis=1)
    return XL, XR


def face_scatter_gather(tab, Fq):
    """Map per-face quadrature data back to (element, local face) slots.

    Fq: [nft, nqf, k] in each face's L ordering.
    Returns Fel [ne, nlf*nqf, k] re-ordered into each element's own trace
    ordering (no side sign applied; see tab.ef_sign).

    A zero "null face" row is appended at index nft: ef_face entries equal
    to nft (used for halo-element slots under domain decomposition) gather
    exactly zero flux.
    """
    k = Fq.shape[-1]
    flat = jnp.concatenate(
        [Fq.reshape(tab.nft * tab.nqf, k), jnp.zeros((tab.nqf, k), dtype=Fq.dtype)]
    )
    gidx = tab.ef_face[..., None] * tab.nqf + tab.ef_qmap  # [ne, nlf, nqf]
    out = flat[gidx.reshape(tab.ne, tab.nlf * tab.nqf)]
    return out


def elem_traces_or(tab, X):
    """Oriented traces: X [ne, ndof, k] -> [ne, n_combo*nqf, k].

    Row block c covers (local face, orientation) combo c, so every face side
    can be gathered directly in the quadrature ordering it needs."""
    return jnp.einsum("fd,ndk->nfk", tab.Btr_or, X)


def slot_traces(tab, X):
    """Neighbor-slot views of the oriented traces.

    X: [ne, ndof, k] ->
      own  [ne, nlf, nqf, k]  (plain slice: identity combos come first)
      nbr  [ne, nlf, nqf, k]  (ONE row gather via tab.nbr_row, or pure
                               grid rolls on structured meshes)
    This single gather serves the entire face sweep."""
    ne, _, k = X.shape
    Xtr = elem_traces_or(tab, X)  # [ne, n_combo*nqf, k]
    own = Xtr[:, : tab.nlf * tab.nqf, :].reshape(ne, tab.nlf, tab.nqf, k)
    if tab.roll_info is not None:
        # structured topology: every neighbor trace is a roll of the
        # opposite-face own trace over the element grid -> contiguous
        # copies that XLA fuses, no gather (verified at table build)
        grid, per_lf = tab.roll_info
        og = own.reshape(tuple(grid) + (tab.nlf, tab.nqf, k))
        nbr = jnp.stack(
            [
                jnp.roll(og[..., opp, :, :], shift, axis=axis)
                for (axis, shift, opp) in per_lf
            ],
            axis=-3,
        ).reshape(ne, tab.nlf, tab.nqf, k)
        return own, nbr
    flat = Xtr.reshape(ne * tab.n_combo, tab.nqf, k)
    nbr = flat[tab.nbr_row.reshape(-1)].reshape(ne, tab.nlf, tab.nqf, k)
    return own, nbr


def trace_transpose(tab, Fel):
    """Accumulate face-point data into element residuals: B_tr^T apply.

    Fel: [ne, nlf*nqf, k] -> [ne, ndof, k]
    """
    return jnp.einsum("fd,nfk->ndk", tab.Btr, Fel)


def volume_weak_div(tab, Fdof):
    """Volume term sum_q w_q grad(phi_i) . F, with F given at solution nodes.

    Fdof: [ne, ndof, neq, dim] -> z [ne, ndof, neq]
    (reference: src/domain_integrator.cpp:45-99 assembled form, applied at
    rhs_operator.cpp:379-391; here evaluated matrix-free at quad points)
    """
    Fq = jnp.einsum("qd,ndek->nqek", tab.Bvol, Fdof)
    # grad_x(phi_i) detJ = G_ref[q,i,k] adjJ[q,k,d]
    Fk = jnp.einsum("nqkd,nqed->nqek", tab.adjJ, Fq)
    if tab.rad_vol is not None:  # axisymmetric: dV = r dr dz
        Fk = Fk * tab.rad_vol[..., None, None]
    return jnp.einsum("q,qik,nqek->nie", tab.wq, tab.Gvol, Fk)


def apply_minv(tab, Z, radial=False):
    """Element-wise inverse mass: [ne, ndof, k] -> [ne, ndof, k].

    radial=True uses the radius-weighted mass (axisymmetric RHS apply,
    reference: src/rhs_operator.cpp:443-445)."""
    M = tab.Minv_rad if (radial and tab.Minv_rad is not None) else tab.Minv
    return jnp.einsum("nij,njk->nik", M, Z)


def dg_gradient(tab, Up, bdr_up2=None):
    """DG gradient of primitives with central face fluxes.

    gradUp = M^-1 [ int phi grad(u) dx + oint phi (mean - u^-) n ds ]
    (reference: src/gradients.cpp:144-232, src/faceGradientIntegration.cpp:40-140)

    Up: [ne, ndof, neq]
    bdr_up2: optional [nfb, nqf, neq] exterior primitive state on boundary
             faces (useBCinGrad); defaults to the interior trace (zero jump).
    Returns gradUp [ne, ndof, neq, dim].
    """
    ne, ndof, neq = Up.shape
    dim = tab.dim

    # volume: int phi_j du/dx_d = sum_q w_q B[q,j] (G u)_k adjJ[k,d]
    du_ref = jnp.einsum("qdk,nde->nqek", tab.Gvol, Up)
    du_phys = jnp.einsum("nqek,nqkd->nqed", du_ref, tab.adjJ)
    rvol = jnp.einsum("q,qj,nqed->njed", tab.wq, tab.Bvol, du_phys)

    # face central correction: per slot, (mean - u_own).n_out in the slot's
    # own ordering — one neighbor gather, no scatter maps
    if tab.nbr_row is not None:
        own, nbr = slot_traces(tab, Up)
        # boundary slots carry no central jump (the roll path wraps there;
        # the gather path already has nbr == own so the mask is a no-op)
        jump = 0.5 * (nbr - own) * tab.interior_mask[..., None, None]
        if bdr_up2 is not None:
            # useBCinGrad: boundary exterior state from the BCs
            own_b = own.reshape(ne * tab.nlf, tab.nqf, neq)[tab.bdr_slot]
            jump = jump.reshape(ne * tab.nlf, tab.nqf, neq).at[tab.bdr_slot].set(
                0.5 * (bdr_up2 - own_b), mode="drop"
            ).reshape(ne, tab.nlf, tab.nqf, neq)
        J = (
            jump[..., :, None]
            * tab.nor_slot[..., None, :]
            * tab.wts_slot[..., None, None]
        )
        Fel = J.reshape(ne, tab.nlf * tab.nqf, neq * dim)
    else:  # legacy point-permutation path (sharded tables)
        Uptr = elem_traces(tab, Up)
        UL, UR = face_gather(tab, Uptr)
        U2b = UL[tab.nfi :] if bdr_up2 is None else bdr_up2
        U2 = jnp.concatenate([UR, U2b], axis=0)  # [nft, nqf, neq]
        jumpn = (
            (0.5 * (U2 - UL))[..., :, None]
            * tab.f_nor[..., None, :]
            * tab.f_wts[..., None, None]
        )
        Fel = face_scatter_gather(tab, jumpn.reshape(tab.nft, tab.nqf, neq * dim))
    rface = trace_transpose(tab, Fel).reshape(ne, ndof, neq, dim)

    rhs = rvol + rface
    return apply_minv(tab, rhs.reshape(ne, ndof, neq * dim)).reshape(ne, ndof, neq, dim)
