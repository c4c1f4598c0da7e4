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


def perface_own_traces(tab, X):
    """Own-side per-face fused trace buffers only (boundary-data paths
    that do not need neighbors): tuple of nlf arrays [ne, nqf*k]."""
    ne, ndof, k = X.shape
    nqf = tab.nqf
    X2 = X.reshape(ne, ndof * k)
    eye_k = jnp.eye(k, dtype=X.dtype)
    out = []
    for lf in range(tab.nlf):
        B = tab.Btr_or[lf * nqf : (lf + 1) * nqf]  # identity combos first
        K = jnp.einsum("sd,ef->desf", B, eye_k).reshape(ndof * k, nqf * k)
        out.append(X2 @ K)
    return tuple(out)


def perface_traces(tab, X):
    """Per-face fused trace buffers + neighbors (the face sweep's inputs).

    X [ne, ndof, k] -> (own, nbr): tuples of nlf arrays [ne, nqf*k].
    own[lf] comes from a kron(Btr_lf, I_k) matmul that emits the fused
    (nqf*k) minor dim directly — no [ne, nqf, k] relayout, so XLA's (8,128)
    tiling stays dense.  nbr[lf] is a grid roll of the opposite face's
    buffer (structured meshes) or one row gather over the stacked
    per-combo oriented traces (general meshes)."""
    ne, ndof, k = X.shape
    nqf, nlf, nc = tab.nqf, tab.nlf, tab.n_combo
    X2 = X.reshape(ne, ndof * k)
    eye_k = jnp.eye(k, dtype=X.dtype)
    T_c = []
    for c in range(nc):
        B = tab.Btr_or[c * nqf : (c + 1) * nqf]  # [nqf, ndof]
        K = jnp.einsum("sd,ef->desf", B, eye_k).reshape(ndof * k, nqf * k)
        T_c.append(X2 @ K)
    own = tuple(T_c[:nlf])
    if tab.roll_info is not None:
        grid, per_lf = tab.roll_info
        nbr = []
        for (axis, shift, opp) in per_lf:
            Ag = own[opp].reshape(tuple(grid) + (nqf * k,))
            nbr.append(jnp.roll(Ag, shift, axis=axis).reshape(ne, nqf * k))
        return own, tuple(nbr)
    flat = jnp.stack(T_c, axis=1).reshape(ne * nc, nqf * k)
    nbr = tuple(flat[tab.nbr_row[:, lf]] for lf in range(nlf))
    return own, nbr


def trace_transpose(tab, Fel):
    """Accumulate face-point data into element residuals: B_tr^T apply.

    Fel: [ne, nlf*nqf, k] -> [ne, ndof, k]
    """
    return jnp.einsum("fd,nfk->ndk", tab.Btr, Fel)


def _adjj_rep(tab, neq):
    """adjJ with each quad value repeated neq times along fused lanes:
    [dim, dim, ne, nq*neq].  Loop-invariant under jit, so XLA hoists the
    expansion out of the RK substeps; all downstream geometry applications
    become lane-dense elementwise multiplies (PERF.md)."""
    a = jnp.moveaxis(tab.adjJ, (2, 3), (0, 1))  # [k, d, ne, nq]
    a = jnp.repeat(a[..., None], neq, axis=-1)
    return a.reshape(tab.dim, tab.dim, tab.adjJ.shape[0], tab.nq * neq)


def volume_weak_div(tab, Fdof, fused_out=False):
    """Volume term sum_q w_q grad(phi_i) . F, with F given at solution nodes.

    Fdof: [ne, ndof, neq, dim] -> z [ne, ndof, neq]
    (reference: src/domain_integrator.cpp:45-99 assembled form, applied at
    rhs_operator.cpp:379-391; here evaluated matrix-free at quad points).

    Fused-minor formulation: per flux direction d the dof data lives in a
    [ne, ndof*neq] buffer, the geometry (adjJ, radius) is applied as
    lane-dense elementwise multiplies against the repeated-adjJ table, and
    the basis/test contractions are shared kron(B, I_neq) matmuls -- no
    [ne, nq, neq, dim]-shaped materializations (whose (neq, dim) minor
    dims would pad ~50x under the (8,128) tiling)."""
    ne, ndof, neq, dim = Fdof.shape
    nq = tab.nq
    eye_e = jnp.eye(neq, dtype=Fdof.dtype)
    K_b = jnp.einsum("qd,ef->deqf", tab.Bvol, eye_e).reshape(
        ndof * neq, nq * neq
    )
    Fq_d = [
        Fdof[..., d].reshape(ne, ndof * neq) @ K_b for d in range(dim)
    ]
    arep = _adjj_rep(tab, neq)
    rad = None
    if tab.rad_vol is not None:  # axisymmetric: dV = r dr dz
        rad = jnp.repeat(tab.rad_vol[..., None], neq, -1).reshape(ne, nq * neq)
    z2 = 0.0
    for kk in range(dim):
        Fk = sum(Fq_d[d] * arep[kk, d] for d in range(dim))
        if rad is not None:
            Fk = Fk * rad
        K_gw = jnp.einsum("q,qj,ef->qfje", tab.wq, tab.Gvol[:, :, kk],
                          eye_e).reshape(nq * neq, ndof * neq)
        z2 = z2 + Fk @ K_gw
    if fused_out:
        return z2
    return z2.reshape(ne, ndof, neq)


def apply_minv(tab, Z, radial=False):
    """Element-wise inverse mass: [ne, ndof, k] -> [ne, ndof, k].

    radial=True uses the radius-weighted mass (axisymmetric RHS apply,
    reference: src/rhs_operator.cpp:443-445).

    When the mass matrix is diagonal (affine tensor-product elements; see
    discretization.extract_diag) this is one lane-dense multiply on the
    fused [ne, ndof*k] layout — the batched [ndof, ndof] einsum reads a
    67 MB padded Minv and wastes the MXU on [27, 27] @ [27, k] tiles."""
    use_rad = radial and tab.Minv_rad is not None
    d = getattr(tab, "minv_rad_diag" if use_rad else "minv_diag", None)
    if d is not None:
        ne, ndof, k = Z.shape
        drep = jnp.repeat(d[..., None], k, axis=-1).reshape(ne, ndof * k)
        return (Z.reshape(ne, ndof * k) * drep).reshape(ne, ndof, k)
    M = tab.Minv_rad if use_rad else tab.Minv
    return jnp.einsum("nij,njk->nik", M, Z)


def apply_minv2(tab, Z2, k, radial=False):
    """Inverse mass on the fused layout: [ne, ndof*k] -> [ne, ndof*k].

    Keeps the whole RHS tail on fused-minor buffers (no padded
    [ne, ndof, k] round trip); diagonal-mass meshes pay one lane-dense
    multiply, others one batched matmul."""
    use_rad = radial and tab.Minv_rad is not None
    d = getattr(tab, "minv_rad_diag" if use_rad else "minv_diag", None)
    ne = Z2.shape[0]
    if d is not None:
        drep = jnp.repeat(d[..., None], k, axis=-1).reshape(ne, -1)
        return Z2 * drep
    M = tab.Minv_rad if use_rad else tab.Minv
    ndof = M.shape[-1]
    return jnp.einsum(
        "nij,njk->nik", M, Z2.reshape(ne, ndof, k)
    ).reshape(ne, ndof * k)


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
    eye_e = jnp.eye(neq, dtype=Up.dtype)

    # volume: int phi_j du/dx_d = sum_q w_q B[q,j] (G u)_k adjJ[k,d]
    # (fused-minor form: per-direction kron matmuls + lane-dense adjJ)
    up2 = Up.reshape(ne, ndof * neq)
    du_d = [
        up2 @ jnp.einsum("qd,ef->deqf", tab.Gvol[:, :, d], eye_e).reshape(
            ndof * neq, tab.nq * neq
        )
        for d in range(dim)
    ]
    arep = _adjj_rep(tab, neq)
    K_bw = jnp.einsum("q,qj,ef->qfje", tab.wq, tab.Bvol, eye_e).reshape(
        tab.nq * neq, ndof * neq
    )
    rvol_k = []
    for kk in range(dim):
        # d/dx_kk = sum_l (du/dxi_l) adjJ[l, kk]: the contraction runs over
        # the REFERENCE index (first adjJ axis) — arep[d, kk], not the
        # transpose (wrong on any mesh with non-symmetric Jacobians)
        dphys = sum(du_d[d] * arep[d, kk] for d in range(dim))
        rvol_k.append(dphys @ K_bw)  # [ne, ndof*neq]
    rvol = jnp.stack(rvol_k, axis=-1).reshape(ne, ndof, neq, dim)

    # face central correction: per slot, (mean - u_own).n_out in the slot's
    # own ordering — one neighbor gather, no scatter maps
    if tab.nbr_row is not None:
        own_pf, nbr_pf = perface_traces(tab, Up)
        # boundary slots carry no central jump (the roll path wraps there;
        # the gather path already has nbr == own so the mask is a no-op);
        # with bdr_up2 (useBCinGrad / mixed interfaces) the boundary jump is
        # added through a fused-minor zeros scatter
        zb = None
        if bdr_up2 is not None:
            own_b = jnp.stack(own_pf, axis=1).reshape(
                ne * tab.nlf, tab.nqf * neq
            )[tab.bdr_slot].reshape(-1, tab.nqf, neq)
            jb = 0.5 * (bdr_up2 - own_b)
            zb = jnp.zeros((ne * tab.nlf, tab.nqf * neq), dtype=Up.dtype)
            zb = zb.at[tab.bdr_slot].set(
                jb.reshape(-1, tab.nqf * neq), mode="drop"
            ).reshape(ne, tab.nlf, tab.nqf * neq)

        # geometry: wts-scaled normal components repeated over neq lanes
        # (no radius factor: matches the stacked formulation)
        norw = tab.nor_slot * tab.wts_slot[..., None]  # [ne, nlf, nqf, dim]
        rface_d = [0.0] * dim
        for lf in range(tab.nlf):
            jump = 0.5 * (nbr_pf[lf] - own_pf[lf]) \
                * tab.interior_mask[:, lf, None]
            if zb is not None:
                jump = jump + zb[:, lf]
            B = tab.Btr[lf * tab.nqf : (lf + 1) * tab.nqf]
            K_out = jnp.einsum("sj,ef->sejf", B, eye_e).reshape(
                tab.nqf * neq, ndof * neq
            )
            for d in range(dim):
                nw = jnp.repeat(
                    norw[:, lf, :, d, None], neq, -1
                ).reshape(ne, tab.nqf * neq)
                rface_d[d] = rface_d[d] + (jump * nw) @ K_out
        rface = jnp.stack(rface_d, axis=-1).reshape(ne, ndof, neq, dim)
        rhs = rvol + rface
        return apply_minv(tab, rhs.reshape(ne, ndof, neq * dim)).reshape(
            ne, ndof, neq, dim
        )
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
