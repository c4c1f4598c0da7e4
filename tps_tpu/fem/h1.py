"""Continuous H1 finite-element substrate for the low-Mach solver family.

The reference's low-Mach path runs on MFEM H1 spaces with assembled hypre
matrices (reference: src/loMach.cpp, src/tomboulides.cpp).  The TPU-native
design keeps everything matrix-free and element-batched: fields live in a
global dof vector, operators gather element dofs, do dense per-element
quadrature contractions (MXU), and scatter back with segment-sum.  Krylov
solves use jax CG with diagonal preconditioning (hypre/BoomerAMG has no TPU
analog; CG + Jacobi over moderate-order spaces plays that role).

Elements are tensor-product Gauss-Lobatto (nodes include the element
boundary, giving C0 continuity through shared global dofs discovered by
coordinate matching).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mesh import Mesh
from ..mesh.reference_element import ReferenceElement


@dataclass
class H1Tables:
    """Static tables for one H1 space (numpy; to_jax like DGTables)."""

    dim: int
    order: int
    ne: int
    ndof_el: int
    nq: int
    ndofs: int  # global dofs
    nqf: int
    nbf: int  # boundary faces

    elem_dofs: np.ndarray  # [ne, ndof_el] global ids
    Bvol: np.ndarray  # [nq, ndof_el]
    Gvol: np.ndarray  # [nq, ndof_el, dim]
    wq: np.ndarray  # [nq]
    adjJ: np.ndarray  # [ne, nq, dim, dim]
    detJ: np.ndarray  # [ne, nq]
    xyz: np.ndarray  # [ndofs, dim] global dof coordinates
    xyz_q: np.ndarray  # [ne, nq, dim] quad-point coordinates

    # boundary faces (for Dirichlet marking + surface integrals)
    bf_elem: np.ndarray  # [nbf]
    bf_attr: np.ndarray  # [nbf]
    bf_Btr: np.ndarray  # [nbf, nqf, ndof_el] element-basis trace
    bf_nor: np.ndarray  # [nbf, nqf, dim] scaled outward normal
    bf_wts: np.ndarray  # [nbf, nqf]
    bf_xyz: np.ndarray  # [nbf, nqf, dim]

    # element-sharded assembly (ShardedH1): 1 on real elements, 0 on the
    # padding rows added to equalize per-shard element counts
    elem_valid: np.ndarray | None = None
    # assembly transpose: for each global dof, the flat (elem*ndof_el+local)
    # slots contributing to it, padded with the sentinel ne*ndof_el (reads a
    # zero row).  Turns scatter_add into gather+sum -- segment_sum is the
    # dominant cost of every CG iteration on TPU (PERF.md)
    dof_gather: np.ndarray | None = None

    def to_jax(self, dtype):
        out = {}
        for f in fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                if np.issubdtype(v.dtype, np.floating):
                    out[f.name] = jnp.asarray(v, dtype=dtype)
                else:
                    out[f.name] = jnp.asarray(v)
            else:
                out[f.name] = v
        return H1Tables(**out)


def _register_pytree():
    meta = ["dim", "order", "ne", "ndof_el", "nq", "ndofs", "nqf", "nbf"]
    data = [f.name for f in fields(H1Tables) if f.name not in meta]
    jax.tree_util.register_dataclass(H1Tables, data_fields=data, meta_fields=meta)


_register_pytree()


def build_h1(mesh: Mesh, order: int, quad_order: int | None = None) -> H1Tables:
    ref = ReferenceElement(geom=mesh.geom, order=order, basis="gauss-lobatto")
    dim = ref.dim
    ne = mesh.num_elements
    ndof_el = ref.ndof
    if quad_order is None:
        quad_order = 2 * order + 2

    pts, wq = ref.volume_quadrature(quad_order)

    Bvol = ref.eval_basis(pts)
    Gvol = ref.eval_basis_grad(pts)

    elem_verts = mesh.vertices[mesh.elements]
    Nq = ref.eval_geom_basis(pts)  # [nq, nverts]
    xyz_q = np.einsum("qv,nvi->nqi", Nq, elem_verts)
    dN = ref.eval_geom_basis_grad(pts)
    J = np.einsum("nvi,qvj->nqij", elem_verts, dN)
    detJ = np.linalg.det(J)
    if np.any(detJ <= 0):
        raise ValueError("non-positive Jacobians in H1 build")
    adjJ = detJ[..., None, None] * np.linalg.inv(J)

    # global dof numbering by coordinate matching (handles conforming meshes)
    Ng = ref.eval_geom_basis(ref.nodes)
    node_xyz = np.einsum("dv,nvi->ndi", Ng, elem_verts)  # [ne, ndof_el, dim]
    flat = node_xyz.reshape(-1, dim)
    scale = max(np.abs(mesh.vertices).max(), 1.0)

    def _key(arr):
        return np.round(arr / scale * 1e10).astype(np.int64)

    key = _key(flat)
    _, inverse = np.unique(key, axis=0, return_inverse=True)
    ndofs = int(inverse.max()) + 1
    xyz = np.zeros((ndofs, dim))
    xyz[inverse] = flat

    # periodic gluing: merge dofs identified by the mesh's periodic shifts
    # (side-a coords + shift land on side-b dofs; interior dofs shift out of
    # the domain and never collide)
    if mesh.periodic_pairs:
        keymap = {tuple(k): i for i, k in enumerate(_key(xyz))}
        parent = np.arange(ndofs)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        shifts = {tuple(np.round(np.asarray(s), 12)) for _, _, s in mesh.periodic_pairs}
        for s in shifts:
            shifted = _key(xyz + np.asarray(s))
            for i, k in enumerate(shifted):
                j = keymap.get(tuple(k))
                if j is not None and j != i:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(ndofs)])
        uniq_roots, new_ids = np.unique(roots, return_inverse=True)
        inverse = new_ids[inverse]
        ndofs = len(uniq_roots)
        xyz = xyz[uniq_roots]

    elem_dofs = inverse.reshape(ne, ndof_el).astype(np.int32)

    # assembly-transpose gather table (see H1Tables.dof_gather)
    flat_ids = elem_dofs.reshape(-1)
    order_ = np.argsort(flat_ids, kind="stable")
    sorted_ids = flat_ids[order_]
    counts = np.bincount(flat_ids, minlength=ndofs)
    Kmax = int(counts.max()) if len(counts) else 0
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(len(sorted_ids)) - starts[sorted_ids]
    dof_gather = np.full((ndofs, Kmax), ne * ndof_el, dtype=np.int32)
    dof_gather[sorted_ids, pos] = order_

    # boundary faces
    faces = mesh.build_faces()
    nbf = len(faces.bdr_elem)
    fq_pts, fq_w = ref.face_quadrature(2 * order + 2)
    nqf = fq_pts.shape[0]
    bf_Btr = np.zeros((nbf, nqf, ndof_el))
    bf_nor = np.zeros((nbf, nqf, dim))
    bf_wts = np.broadcast_to(fq_w, (nbf, nqf)).copy()
    bf_xyz = np.zeros((nbf, nqf, dim))
    elem_centers = elem_verts.mean(axis=1)
    for k in range(nbf):
        e, lf = int(faces.bdr_elem[k]), int(faces.bdr_lf[k])
        rc = ref.face_ref_coords(lf, fq_pts)
        bf_Btr[k] = ref.eval_basis(rc)
        Nf = ref.eval_geom_basis(rc)
        bf_xyz[k] = Nf @ elem_verts[e]
        tang = ref.face_ref_tangents(lf, fq_pts)
        dNf = ref.eval_geom_basis_grad(rc)
        Jf = np.einsum("vi,qvj->qij", elem_verts[e], dNf)
        tph = np.einsum("qij,qjk->qik", Jf, tang)
        if dim == 2:
            nor = np.stack([tph[:, 1, 0], -tph[:, 0, 0]], axis=-1)
        else:
            nor = np.cross(tph[..., 0], tph[..., 1])
        sgn = np.sign(nor[0] @ (bf_xyz[k].mean(axis=0) - elem_centers[e]))
        bf_nor[k] = nor * (sgn if sgn != 0 else 1.0)

    return H1Tables(
        dim=dim, order=order, ne=ne, ndof_el=ndof_el, nq=pts.shape[0],
        ndofs=ndofs, nqf=nqf, nbf=nbf,
        elem_dofs=elem_dofs, Bvol=Bvol, Gvol=Gvol, wq=wq, adjJ=adjJ,
        detJ=detJ, xyz=xyz, xyz_q=xyz_q,
        bf_elem=faces.bdr_elem.astype(np.int32),
        bf_attr=faces.bdr_attr.astype(np.int32),
        bf_Btr=bf_Btr, bf_nor=bf_nor, bf_wts=bf_wts, bf_xyz=bf_xyz,
        dof_gather=dof_gather,
    )


# --------------------------------------------------------------------------
# matrix-free operator applications
#
# Fields are [ndofs] (scalar) or [ndofs, k] (k-component).  All operators
# promote to [ndofs, k] internally and return the caller's shape.
# --------------------------------------------------------------------------


def gather(tab, u):
    """u [ndofs(, k)] -> element-local [ne, ndof_el(, k)].

    Mod-row formulation: scalar gathers are pathological on TPU, so the
    dof vector is viewed as 8-lane rows, whole rows are gathered by
    elem_dofs // 8, and the lane is selected with a one-hot contraction
    (~3x faster than the direct scalar gather; PERF.md)."""
    if _sharded(tab):
        raise NotImplementedError(
            "direct element gather is not available on an element-sharded "
            "H1 space; use the assembly operators (mass/diffusion/...)"
        )
    nd = u.shape[0]
    ndpad = -(-nd // 8) * 8
    rowi = tab.elem_dofs // 8  # hoisted (table-derived)
    lane = jax.nn.one_hot(tab.elem_dofs % 8, 8, dtype=u.dtype)
    if u.ndim != 1:
        # multi-column: ONE row gather (rows carry all k columns) — the
        # per-gather cost on TPU is proportional to the row count, not the
        # row width, so this is ~k x cheaper than per-column gathers
        k = u.shape[1]
        xp = jnp.pad(u, ((0, ndpad - nd), (0, 0))).reshape(-1, 8, k)
        return jnp.sum(xp[rowi] * lane[..., None], axis=-2)  # [ne, nde, k]
    xp = jnp.pad(u, (0, ndpad - nd)).reshape(-1, 8)
    return jnp.sum(xp[rowi] * lane, axis=-1)


def scatter_add(tab, r_el):
    """[ne, ndof_el, ...] -> [ndofs, ...] assembly.

    Uses the precomputed assembly-transpose gather (dof_gather) when
    available -- one padded gather + small sum, far faster on TPU than the
    segment_sum scatter it replaces; sharded tables (no dof_gather) keep
    the segment-sum path."""
    if tab.elem_valid is not None:  # mask shard-padding elements
        r_el = r_el * tab.elem_valid.reshape(
            (-1,) + (1,) * (r_el.ndim - 1)
        )
    if getattr(tab, "dof_gather", None) is not None:
        # mod-row gather-sum over the assembly transpose (see gather)
        nfl = tab.ne * tab.ndof_el + 1
        flpad = -(-nfl // 8) * 8
        rowi = tab.dof_gather // 8
        lane = jax.nn.one_hot(tab.dof_gather % 8, 8, dtype=r_el.dtype)
        if r_el.ndim > 2:
            # multi-column: one row gather carrying all k columns
            k = r_el.shape[-1]
            flat = r_el.reshape(-1, k)
            flat = jnp.pad(
                flat, ((0, flpad - tab.ne * tab.ndof_el), (0, 0))
            ).reshape(-1, 8, k)
            return jnp.sum(flat[rowi] * lane[..., None], axis=(-3, -2))
        flat = r_el.reshape(-1)
        flat = jnp.pad(flat, (0, flpad - tab.ne * tab.ndof_el)).reshape(-1, 8)
        return jnp.sum(flat[rowi] * lane, axis=(-1, -2))
    flat = r_el.reshape((tab.ne * tab.ndof_el,) + r_el.shape[2:])
    seg = tab.elem_dofs.reshape(-1)
    return jax.ops.segment_sum(flat, seg, num_segments=tab.ndofs)


def _promote(u):
    if u.ndim == 1:
        return u[:, None], True
    return u, False


def _coef_q(tab, coef):
    """Coefficient at quad points: None | scalar | nodal [ndofs] |
    quad-point [ne, nq]."""
    if coef is None:
        return None
    coef = jnp.asarray(coef)
    if coef.ndim == 0:
        return coef  # scalar
    if coef.ndim == 2:
        return coef  # already at quad points
    return jnp.einsum("qd,nd->nq", tab.Bvol, gather(tab, coef))


def to_quad(tab, u):
    """Nodal field -> quad-point values [ne_global, nq], usable as a
    coefficient. Works on element-sharded tables too (plain dof gather via
    the retained global elem_dofs — coefficient prep only, a handful of
    calls per step)."""
    if _sharded(tab):
        ue = jnp.asarray(u)[jnp.asarray(tab.elem_dofs)]
        return jnp.einsum("qd,nd->nq", tab.Bvol, ue)
    return jnp.einsum("qd,nd->nq", tab.Bvol, gather(tab, u))


def as_coef(tab, coef_q):
    """Wrap a global quad-point coefficient [ne, nq] for use with the
    assembly operators: identity on plain tables, per-shard stacking
    (StackedQuadCoef) on element-sharded ones."""
    if coef_q is None:
        return None
    return tab.stack_quad(coef_q) if _sharded(tab) else coef_q


def weak_grad(tab, s, coef=None):
    """r[dof, d] = (v, c ds/dx_d): weak-gradient linear form (numerator of
    an L2 gradient projection)."""
    if _sharded(tab):
        return tab.run_coef(weak_grad, s, coef)
    gq = jnp.einsum("qdk,nd->nqk", tab.Gvol, gather(tab, s))
    gphys = jnp.einsum("nqk,nqkd->nqd", gq, tab.adjJ)  # carries detJ
    cq = _coef_q(tab, coef)
    if cq is not None:
        gphys = gphys * (cq[..., None] if jnp.ndim(cq) else cq)
    re = jnp.einsum("qd,nqi->ndi", tab.Bvol * tab.wq[:, None], gphys)
    return scatter_add(tab, re)


def mass_apply(tab, u, coef=None):
    """(v, c u).

    Per-component scalar sweeps: every buffer is [ne, nq]-shaped with two
    clean matmuls -- the k-trailing einsum form padded its singleton minor
    dim 128x under TPU tiling and dominated CG iteration time (PERF.md)."""
    if _sharded(tab):
        return tab.run_coef(mass_apply, u, coef)
    uu, squeeze = _promote(u)
    w = tab.wq[None, :] * tab.detJ
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    k = uu.shape[1]
    ne, nde = tab.ne, tab.ndof_el
    # fold columns into the row (element) axis: one gather, one scatter,
    # and k-independent matmul count (TPU latency floors; see the
    # dense-direct section note)
    ue = gather(tab, uu)  # [ne, nde, k]
    uek = jnp.moveaxis(ue, -1, 0).reshape(k * ne, nde)
    uq = uek @ tab.Bvol.T  # [k*ne, nq]
    wk = jnp.tile(w, (k, 1))
    re = (wk * uq) @ tab.Bvol
    out = scatter_add(tab, jnp.moveaxis(re.reshape(k, ne, nde), 0, -1))
    return out[:, 0] if squeeze else out


def diffusion_apply(tab, u, coef=None):
    """(grad v, c grad u) — the stiffness apply (scalar sweeps; see
    mass_apply)."""
    if _sharded(tab):
        return tab.run_coef(diffusion_apply, u, coef)
    uu, squeeze = _promote(u)
    dim = tab.dim
    w = tab.wq[None, :]
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    # metric slices A[m,l] = (adjJ adjJ^T)[m,l] / detJ: [ne, nq] each,
    # loop-invariant under jit (hoisted across CG iterations)
    A = [
        [
            jnp.einsum("nqd,nqd->nq", tab.adjJ[:, :, m, :],
                       tab.adjJ[:, :, l, :]) / tab.detJ
            for l in range(dim)
        ]
        for m in range(dim)
    ]
    k = uu.shape[1]
    ne, nde = tab.ne, tab.ndof_el
    # fold columns into the row axis (see mass_apply)
    ue = gather(tab, uu)  # [ne, nde, k]
    uek = jnp.moveaxis(ue, -1, 0).reshape(k * ne, nde)
    # w is [1, nq] (no/scalar coef: broadcasts as-is) or [ne, nq] (tile)
    wk = jnp.tile(w, (k, 1)) if w.shape[0] == tab.ne else w
    g = [uek @ tab.Gvol[:, :, l].T for l in range(dim)]  # [k*ne, nq]
    Ak = [[jnp.tile(A[m][l], (k, 1)) for l in range(dim)]
          for m in range(dim)]
    re = 0.0
    for m in range(dim):
        h = sum(Ak[m][l] * g[l] for l in range(dim)) * wk
        re = re + h @ tab.Gvol[:, :, m]  # [k*ne, nde]
    out = scatter_add(tab, jnp.moveaxis(re.reshape(k, ne, nde), 0, -1))
    return out[:, 0] if squeeze else out


def mass_lumped_diag(tab, coef=None):
    """Row-sum (lumped) mass diagonal for Jacobi preconditioning."""
    if _sharded(tab):
        if coef is None:
            return tab.run(lambda tl: mass_lumped_diag(tl))
        if isinstance(coef, StackedQuadCoef):
            return tab.run_qcoef(
                lambda tl, uu, cc: mass_lumped_diag(tl, cc), None, coef.arr)
        return tab.run(lambda tl, cc: mass_lumped_diag(tl, cc), coef)
    w = tab.wq[None, :] * tab.detJ
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    re = jnp.einsum("qd,nq->nd", tab.Bvol, w)
    return scatter_add(tab, re)


def mass_diag(tab, coef=None):
    """True diagonal of the (coefficient-weighted) mass matrix,
    M_ii = int c phi_i^2 — strictly positive even where the row-sum
    lumped diagonal vanishes (the radius-weighted axisymmetric mass has an
    exactly-zero row sum at axis vertices for quadratic elements:
    int_0^1 xi phi_0(xi) dxi = 0 for the GLL vertex quadratic)."""
    if _sharded(tab):
        if coef is None:
            return tab.run(lambda tl: mass_diag(tl))
        if isinstance(coef, StackedQuadCoef):
            return tab.run_qcoef(
                lambda tl, uu, cc: mass_diag(tl, cc), None, coef.arr)
        return tab.run(lambda tl, cc: mass_diag(tl, cc), coef)
    w = tab.wq[None, :] * tab.detJ
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    re = jnp.einsum("qd,nq->nd", tab.Bvol * tab.Bvol, w)
    return scatter_add(tab, re)


def l2_project(tab, rhs_weak, coef=None, tol=1e-12, maxiter=60, M=None):
    """Solve the consistent mass system M x = rhs_weak by Jacobi-CG
    (the reference's MqInv solve for the thermal-divergence projection,
    src/calorically_perfect.cpp:619-627). Row-sum lumping is NOT a valid
    substitute under the axisymmetric radius weight (see mass_diag).
    `M` takes a dense-direct mass factor preconditioner (direct_precond)
    when the caller has one — cuts the f32 Jacobi-CG's ~11 iterations
    to 1-2 on the radius-weighted mass (coupled-torch profile, round 5)."""
    return cg_solve(
        lambda v: mass_apply(tab, v, coef=coef), rhs_weak,
        diag=mass_diag(tab, coef), tol=tol, maxiter=maxiter, M=M,
    )


def stiffness_diag(tab, coef=None):
    """Diagonal of the stiffness operator (Jacobi preconditioner)."""
    if _sharded(tab):
        if coef is None:
            return tab.run(lambda tl: stiffness_diag(tl))
        if isinstance(coef, StackedQuadCoef):
            return tab.run_qcoef(
                lambda tl, uu, cc: stiffness_diag(tl, cc), None, coef.arr)
        return tab.run(lambda tl, cc: stiffness_diag(tl, cc), coef)
    A = jnp.einsum("nqkd,nqld->nqkl", tab.adjJ, tab.adjJ) / tab.detJ[..., None, None]
    w = tab.wq[None, :]
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    re = jnp.einsum("qdk,nqkl,qdl,nq->nd", tab.Gvol, A, tab.Gvol, w)
    return scatter_add(tab, re)


def _grad_num(tab, u):
    gq = jnp.einsum("qdk,nd->nqk", tab.Gvol, gather(tab, u))
    gphys = jnp.einsum("nqk,nqkd->nqd", gq, tab.adjJ)  # carries detJ
    re = jnp.einsum("qd,nqi->ndi", tab.Bvol * tab.wq[:, None], gphys)
    return scatter_add(tab, re)


def grad_at_dofs(tab, u):
    """Lumped-mass L2 projection of grad(u): [ndofs] -> [ndofs, dim]."""
    if _sharded(tab):
        return tab.run(_grad_num, u) / mass_lumped_diag(tab)[:, None]
    return _grad_num(tab, u) / mass_lumped_diag(tab)[:, None]


def convection_apply(tab, u, vel):
    """(v, (w . grad) u) with advecting velocity [ndofs, dim]."""
    if _sharded(tab):
        return tab.run(lambda tl, uu, vv: convection_apply(tl, uu, vv), u, vel)
    uu, squeeze = _promote(u)
    vq = jnp.einsum("qd,ndi->nqi", tab.Bvol, gather(tab, vel))
    gq = jnp.einsum("qdl,ndk->nqlk", tab.Gvol, gather(tab, uu))
    gphys = jnp.einsum("nqlk,nqld->nqdk", gq, tab.adjJ)  # carries detJ
    conv = jnp.einsum("nqi,nqik->nqk", vq, gphys)
    re = jnp.einsum("qd,nqk->ndk", tab.Bvol, tab.wq[None, :, None] * conv)
    out = scatter_add(tab, re)
    return out[:, 0] if squeeze else out


def weak_divergence(tab, vel, coef=None):
    """(grad v, w): RHS form for the pressure Poisson; vel [ndofs, dim]."""
    if _sharded(tab):
        return tab.run_coef(weak_divergence, vel, coef)
    vq = jnp.einsum("qd,ndi->nqi", tab.Bvol, gather(tab, vel))
    w = tab.wq[None, :]
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    vk = jnp.einsum("nqi,nqki->nqk", w[..., None] * vq, tab.adjJ)
    re = jnp.einsum("qdk,nqk->nd", tab.Gvol, vk)
    return scatter_add(tab, re)


def _div_num(tab, vel):
    gq = jnp.einsum("qdl,ndk->nqlk", tab.Gvol, gather(tab, vel))
    div = jnp.einsum("nqlk,nqlk->nq", gq, tab.adjJ)  # carries detJ
    re = jnp.einsum("qd,nq->nd", tab.Bvol * tab.wq[:, None], div)
    return scatter_add(tab, re)


def divergence_at_dofs(tab, vel):
    """Lumped-mass projected div(vel): [ndofs, dim] -> [ndofs]."""
    if _sharded(tab):
        return tab.run(_div_num, vel) / mass_lumped_diag(tab)
    return _div_num(tab, vel) / mass_lumped_diag(tab)


def integrate(tab, u):
    """Domain integral of a nodal field."""
    if _sharded(tab):
        return tab.run(integrate, u)
    uq = jnp.einsum("qd,nd->nq", tab.Bvol, gather(tab, u))
    w = tab.wq[None, :] * tab.detJ
    if tab.elem_valid is not None:
        w = w * tab.elem_valid[:, None]
    return jnp.sum(w * uq)


def surface_normal_form(tab, w, face_sel=None):
    """Boundary linear form r[dof] = oint v (w . n) ds.

    w: [ndofs, dim] nodal vector field; face_sel: optional [nbf] 0/1 mask
    restricting the integral to selected boundary faces.  bf_nor carries
    the area element, bf_wts the reference quadrature weights.  Works on
    both plain and element-sharded tables (the boundary tables are global
    either way)."""
    ed = jnp.asarray(tab.elem_dofs)[jnp.asarray(tab.bf_elem)]  # [nbf, nde]
    Btr = jnp.asarray(tab.bf_Btr, w.dtype)
    nor = jnp.asarray(tab.bf_nor, w.dtype)
    wts = jnp.asarray(tab.bf_wts, w.dtype)
    wf = w[ed]  # [nbf, nde, dim]
    wq = jnp.einsum("fqd,fdk->fqk", Btr, wf)
    wn = jnp.einsum("fqk,fqk->fq", wq, nor) * wts
    if face_sel is not None:
        wn = wn * jnp.asarray(face_sel, w.dtype)[:, None]
    contrib = jnp.einsum("fq,fqd->fd", wn, Btr)
    out = jnp.zeros(tab.ndofs, dtype=w.dtype)
    return out.at[ed].add(contrib)


def boundary_dofs(tab, attrs=None) -> np.ndarray:
    """Global dof ids on boundary faces (optionally restricted to attrs).
    Setup-side numpy."""
    bf_attr = np.asarray(tab.bf_attr)
    sel = np.ones(len(bf_attr), dtype=bool) if attrs is None else np.isin(
        bf_attr, list(attrs)
    )
    btr = np.abs(np.asarray(tab.bf_Btr)).max(axis=1) > 1e-8  # [nbf, ndof_el]
    ed = np.asarray(tab.elem_dofs)
    be = np.asarray(tab.bf_elem)
    ids = set()
    for k in np.where(sel)[0]:
        for d in ed[be[k]][btr[k]]:
            ids.add(int(d))
    return np.array(sorted(ids), dtype=np.int32)


# --------------------------------------------------------------------------
# Krylov solve with Dirichlet constraints
# --------------------------------------------------------------------------


def cg_solve(apply_fn, b, x0=None, diag=None, dirichlet_mask=None, tol=1e-10,
             maxiter=500, M=None, return_info=False):
    """Preconditioned CG on the constrained system.

    `dirichlet_mask` [ndofs] is 1 on free dofs, 0 on constrained dofs; the
    caller lifts inhomogeneous values into x0 and b beforehand.

    `M`: optional preconditioner callable r -> z (e.g. chebyshev_precond /
    pmg_precond); `diag` gives plain Jacobi when M is None.

    With return_info=True, returns (x, iterations, relative_residual) so
    callers can report convergence like the reference's hypre screen output
    (reference: src/tomboulides.cpp:1582-1596 solver prints); a diverged
    solve is then visible instead of silent.
    """
    mask = 1.0 if dirichlet_mask is None else dirichlet_mask

    def A(x):
        y = apply_fn(x * mask) * mask
        if dirichlet_mask is not None:
            y = y + x * (1.0 - dirichlet_mask)
        return y

    if M is None:
        if diag is not None:
            dinv = jnp.where(jnp.abs(diag) > 1e-300, 1.0 / diag, 1.0)
            M = lambda x: x * dinv
        else:
            M = lambda x: x

    x0 = jnp.zeros_like(b) if x0 is None else x0
    # clamp the tolerance to what the dtype can deliver (an f64-minded
    # 1e-12 in an f32 run would always hit maxiter)
    eps = float(jnp.finfo(b.dtype).eps)
    tol = max(float(tol), 50.0 * eps)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    atol2 = (tol * bnorm) ** 2 + 1e-300

    r0 = b - A(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(state):
        _, r, _, _, _, it = state
        return jnp.logical_and(jnp.sum(r * r) > atol2, it < maxiter)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = A(p)
        alpha = rz / jnp.sum(p * Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, _, _, _, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0))
    )
    if return_info:
        relres = jnp.sqrt(jnp.sum(r * r)) / jnp.maximum(bnorm, 1e-300)
        return x, it, relres
    return x


def estimate_lambda_max(apply_fn, dinv, n, iters=15):
    """Largest eigenvalue of D^-1 A by power iteration (deterministic
    start; jittable; run once per operator build)."""
    v0 = 1.0 + 0.3 * jnp.cos(jnp.arange(n, dtype=dinv.dtype))
    v0 = v0 / jnp.sqrt(jnp.sum(v0 * v0))

    def body(_, v):
        w = dinv * apply_fn(v)
        return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-300)

    v = jax.lax.fori_loop(0, iters, body, v0)
    w = dinv * apply_fn(v)
    return jnp.sum(v * w) / jnp.maximum(jnp.sum(v * v), 1e-300)


def chebyshev_precond(apply_fn, diag, degree=3, lmax=None, eig_ratio=0.1,
                      lmax_safety=1.1):
    """Chebyshev polynomial preconditioner on the Jacobi-scaled operator
    (the TPU-viable stand-in for the reference's BoomerAMG smoothers —
    a fixed linear polynomial in D^-1 A, so plain CG stays valid).

    Targets the interval [eig_ratio*lmax, lmax] of D^-1 A; each degree
    costs one operator apply.  `lmax` may be passed in (estimated once via
    estimate_lambda_max) or is estimated internally."""
    dinv = jnp.where(jnp.abs(diag) > 1e-300, 1.0 / diag, 1.0)
    if lmax is None:
        lmax = estimate_lambda_max(apply_fn, dinv, diag.shape[0])
    lmax = lmax * lmax_safety
    lmin = eig_ratio * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def M(r):
        d = (1.0 / theta) * (dinv * r)
        z = d
        rho_old = 1.0 / sigma
        for _ in range(degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            rk = r - apply_fn(z)
            d = rho * rho_old * d + (2.0 * rho / delta) * (dinv * rk)
            z = z + d
            rho_old = rho
        return z

    return M


def build_p_interp(tab_f, tab_c, mesh):
    """Prolongation data between the order-1 and order-p H1 spaces on the
    same mesh (two-level p-multigrid; the reference leans on BoomerAMG,
    src/tomboulides.cpp:1582-1596 — p-coarsening is the TPU-native ladder).

    Returns (P_ids [nf, nvert], P_wts [nf, nvert], c2f [nc]):
      prolong(uc)  = sum_v P_wts[:, v] * uc[P_ids[:, v]]
      restrict(rf) = scatter-add of P_wts * rf  (exact transpose)
      c2f maps each coarse dof to its collocated fine dof (coefficient
      injection)."""
    from ..mesh.reference_element import ReferenceElement

    ref_f = ReferenceElement(geom=mesh.geom, order=tab_f.order,
                             basis="gauss-lobatto")
    # coarse vertex basis at the fine reference nodes == geometric basis
    Pe = ref_f.eval_geom_basis(ref_f.nodes)  # [ndof_f_el, nvert]
    nvert = Pe.shape[1]
    nf = tab_f.ndofs
    # vectorized over elements (a per-element loop over device arrays costs
    # one host<->device round-trip each — pathological on the TPU tunnel)
    ed_f = np.asarray(tab_f.elem_dofs)  # [ne, ndof_f_el]
    ed_c = np.asarray(tab_c.elem_dofs)  # [ne, nvert]
    P_ids = np.zeros((nf, nvert), dtype=np.int32)
    P_wts = np.zeros((nf, nvert))
    P_ids[ed_f] = ed_c[:, None, :]
    P_wts[ed_f.reshape(-1)] = np.tile(Pe, (ed_f.shape[0], 1))
    # coarse -> fine collocation (coarse nodes are mesh vertices, which are
    # also fine Gauss-Lobatto nodes)
    c2f = np.zeros(tab_c.ndofs, dtype=np.int32)
    for v in range(nvert):
        hit_v = int(np.where(np.abs(Pe[:, v] - 1.0) < 1e-12)[0][0])
        c2f[ed_c[:, v]] = ed_f[:, hit_v]
    return jnp.asarray(P_ids), jnp.asarray(P_wts), jnp.asarray(c2f)


def pmg_precond(apply_f, diag_f, apply_c, diag_c, P_ids, P_wts, nc,
                degree=3, coarse_degree=None, lmax_f=None, lmax_c=None,
                ortho=False):
    """Two-level p-multigrid V(1,1) preconditioner: Chebyshev smoothing on
    the order-p space, Chebyshev 'solve' on the order-1 space, exact-
    transpose grid transfers.  All parts are fixed linear symmetric
    operators, so the result is an SPD preconditioner for standard CG.

    The smoother targets the upper spectrum (eig_ratio 0.3 — low modes are
    the coarse grid's job); the coarse polynomial covers a wide interval
    so it acts as an approximate solve.  The coarse interval/degree is
    dtype-aware: extreme Chebyshev intervals amplify f32 roundoff to
    divergence, so f32 uses a tamer polynomial."""
    f32 = jnp.finfo(diag_f.dtype).bits <= 32
    if coarse_degree is None:
        coarse_degree = 10 if f32 else 24
    coarse_ratio = 0.05 if f32 else 0.02
    smooth = chebyshev_precond(apply_f, diag_f, degree=degree, lmax=lmax_f,
                               eig_ratio=0.3)
    coarse = chebyshev_precond(apply_c, diag_c, degree=coarse_degree,
                               lmax=lmax_c, eig_ratio=coarse_ratio)

    def prolong(uc):
        return jnp.sum(P_wts * uc[P_ids], axis=-1)

    def restrict(rf):
        return jnp.zeros(nc, dtype=rf.dtype).at[P_ids].add(
            P_wts * rf[:, None]
        )

    def M(r):
        z = smooth(r)
        rc = restrict(r - apply_f(z))
        z = z + prolong(coarse(rc))
        z = z + smooth(r - apply_f(z))
        if ortho:
            z = z - jnp.mean(z)
        return z

    return M


# --------------------------------------------------------------------------
# Dense direct factorization (small-case implicit solves)
#
# On the hosted TPU every gather costs ~130 us and every small matmul ~30 us
# REGARDLESS of size (latency floors, measured; PERF.md round 4), so a
# matrix-free CG iteration costs ~0.25 ms no matter how small the mesh is —
# a 25-iteration pmg-CG pressure solve on a 4.8k-dof case burns ~50 ms of
# pure latency.  For small dof counts the TPU-native answer is dense direct
# algebra on the MXU: assembling the operator densely and Cholesky-factoring
# it costs ~7 ms ONCE, after which each solve is one triangular pair
# (~0.03 ms).  Used as a LAGGED preconditioner: the factor is refreshed
# every chunk while CG (still exact) converges in 1-3 iterations.
# The reference leans on BoomerAMG/LOR for the same solves
# (src/tomboulides.cpp:1582-1610); dense-on-MXU is the TPU analog at small n.
# --------------------------------------------------------------------------

DENSE_DIRECT_MAX = int(os.environ.get("TPS_DENSE_DIRECT_MAX", "12000"))


def dense_capable(tab):
    """True when the dense direct path applies (small space; element-sharded
    spaces assemble the replicated global matrix via a psum — round-5 fix
    for the sharded-vs-single parity regression: WITHOUT this, only the
    unsharded run got the lagged dense factors, its CG solves converged to
    1e-10 while the Jacobi-only sharded solves iteration-capped at ~6e-9,
    and the split scheme amplified that seed ~6x/step)."""
    return tab.ndofs <= DENSE_DIRECT_MAX


def _shard_map():
    try:
        return jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        return shard_map


def _run_elem(tab, op, coef):
    """Run an element-matrix builder op(local_tab, coef_local) under
    shard_map on an element-sharded space; returns element matrices
    [ne_padded_global, ...] sharded over the mesh axis (padding rows are
    zero via elem_valid).  `coef` may be None, a scalar, a replicated
    nodal vector, a global quad-point [ne, nq] array (per-shard stacked
    here), or an as_coef-wrapped StackedQuadCoef."""
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    if isinstance(coef, StackedQuadCoef):
        arr, spec, local = coef.arr, P(tab.axis), lambda c: c[0]
    elif coef is None:
        arr, spec, local = jnp.zeros(0), P(), lambda c: None
    else:
        arr = jnp.asarray(coef)
        if arr.ndim == 2 and arr.shape[0] == tab.ne:
            arr = tab.stack_quad(arr).arr
            spec, local = P(tab.axis), lambda c: c[0]
        else:
            spec, local = P(), lambda c: c

    @_partial(_shard_map(), mesh=tab.jmesh,
              in_specs=(tab._specs(), spec), out_specs=P(tab.axis))
    def f(tab_s, cc):
        return op(tab.localize(tab_s), local(cc))

    return f(tab._stacked, arr)


def element_mass(tab, coef=None):
    """Element mass matrices (v_i, c v_j) [ne, nde, nde].

    precision=HIGHEST: on TPU the default f32 einsum multiplies in bf16,
    which perturbs the assembled operator by ~1e-3 relative — enough to
    make the (to-be-Cholesky-factored) matrix indefinite (measured:
    min scaled eigenvalue -3e-3 on the reacting bench pressure
    Laplacian).  Full f32 products keep it SPD."""
    if _sharded(tab):
        return _run_elem(tab, element_mass, coef)
    w = tab.wq[None, :] * tab.detJ
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    if tab.elem_valid is not None:
        w = w * tab.elem_valid[:, None]
    return jnp.einsum("nq,qi,qj->nij", w, tab.Bvol, tab.Bvol,
                      precision=jax.lax.Precision.HIGHEST)


def element_stiffness(tab, coef=None):
    """Element stiffness matrices (grad v_i, c grad v_j) [ne, nde, nde]."""
    if _sharded(tab):
        return _run_elem(tab, element_stiffness, coef)
    dim = tab.dim
    w = tab.wq[None, :]
    cq = _coef_q(tab, coef)
    if cq is not None:
        w = w * cq
    if tab.elem_valid is not None:
        w = w * tab.elem_valid[:, None]
    Ke = 0.0
    for m in range(dim):
        for l in range(dim):
            A_ml = jnp.einsum(
                "nqd,nqd->nq", tab.adjJ[:, :, m, :], tab.adjJ[:, :, l, :],
                precision=jax.lax.Precision.HIGHEST,
            ) / tab.detJ
            # HIGHEST precision: see element_mass (bf16 products make the
            # assembled operator indefinite)
            Ke = Ke + jnp.einsum(
                "nq,qim,qjl->nij", w * A_ml,
                tab.Gvol[:, :, m:m + 1], tab.Gvol[:, :, l:l + 1],
                precision=jax.lax.Precision.HIGHEST,
            )
    return Ke


def _scatter_dense(Ke, ii, jj, nd):
    if Ke.ndim == 4:  # stacked operators: one scatter for all of them
        k = Ke.shape[0]
        return jnp.zeros((k, nd, nd), Ke.dtype).at[:, ii, jj].add(
            Ke.reshape(k, -1))
    return jnp.zeros((nd, nd), Ke.dtype).at[ii, jj].add(Ke.reshape(-1))


def assemble_dense(tab, Ke):
    """[(k,) ne, nde, nde] element matrices -> dense [(k,) nd, nd].

    On an element-sharded space Ke comes in sharded over the mesh axis
    (from the sharded element_mass/element_stiffness); each shard scatters
    its local elements and a psum replicates the global matrix."""
    if _sharded(tab):
        from functools import partial as _partial

        from jax.sharding import PartitionSpec as P

        el_ax = Ke.ndim - 3
        spec_K = P(*((None,) * el_ax), tab.axis)

        @_partial(_shard_map(), mesh=tab.jmesh,
                  in_specs=(spec_K, P(tab.axis)), out_specs=P())
        def f(Ke_l, ed_l):
            ed = ed_l[0]
            nep, nde = ed.shape
            ii = jnp.broadcast_to(
                ed[:, :, None], (nep, nde, nde)).reshape(-1)
            jj = jnp.broadcast_to(
                ed[:, None, :], (nep, nde, nde)).reshape(-1)
            return jax.lax.psum(
                _scatter_dense(Ke_l, ii, jj, tab.ndofs), tab.axis)

        return f(Ke, tab._stacked.elem_dofs)
    ed = np.asarray(tab.elem_dofs)
    ne, nde = ed.shape
    ii = jnp.asarray(np.broadcast_to(
        ed[:, :, None], (ne, nde, nde)).reshape(-1))
    jj = jnp.asarray(np.broadcast_to(
        ed[:, None, :], (ne, nde, nde)).reshape(-1))
    nd = tab.ndofs
    if Ke.ndim == 4:  # stacked operators: one scatter for all of them
        k = Ke.shape[0]
        vals = Ke.reshape(k, -1)
        return jnp.zeros((k, nd, nd), Ke.dtype).at[:, ii, jj].add(vals)
    return jnp.zeros((nd, nd), Ke.dtype).at[ii, jj].add(Ke.reshape(-1))


def dense_constrain(K, mask=None, ortho=False):
    """Apply Dirichlet elimination (mask: 1=free) and/or the rank-one
    shift that makes a pure-Neumann (singular, nullspace=constants)
    operator SPD while acting exactly on the mean-free complement."""
    if mask is not None:
        K = K * (mask[..., :, None] * mask[..., None, :])
        n = K.shape[-1]
        didx = jnp.arange(n)
        K = K.at[..., didx, didx].add(1.0 - mask)
    if ortho:
        n = K.shape[-1]
        didx = jnp.arange(n)
        sigma = jnp.mean(K[..., didx, didx], axis=-1)
        K = K + (sigma[..., None, None] / n) * jnp.ones_like(K)
    return K


def _direct_inv():
    """True when the dense-direct data should be the factor's explicit
    triangular INVERSE instead of the factor: on TPU a triangular solve
    is a sequential blocked loop (~0.6 ms at 4.7k dofs inside a
    program) while the equivalent matmul rides the MXU (~0.05 ms); the
    inversion costs one batched multi-RHS triangular solve ONCE per
    lagged refresh (PERF.md round 4)."""
    return jax.default_backend() == "tpu"


def dense_cholesky(K):
    """Robust Cholesky factor of an SPD FEM operator in working precision.

    Returns the lower factor L with L L^T ~= K — except on TPU, where
    it returns W = L^-1 (see _direct_inv; `direct_precond` switches on
    the same flag, so builder/applier stay consistent).

    The raw stiffness spans many orders of magnitude (coefficient
    contrast x metric terms) and the TPU f32 Cholesky NaNs on it
    (measured: the 1/rho pressure Laplacian of the reacting bench fails
    even with a 1e-6 diagonal shift).  Symmetric Jacobi scaling to unit
    diagonal removes the scaling part of the condition number before
    factoring, and progressively larger diagonal shifts cover the rest —
    a shifted factor is still an excellent lagged preconditioner.  The
    scaling is absorbed back into the returned (lower-triangular)
    factor, so L @ L.T ~= K and cho_solve works unchanged."""
    n = K.shape[-1]
    didx = jnp.arange(n)
    d = K[..., didx, didx]
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-300))
    Ks = K * (s[..., :, None] * s[..., None, :])
    L = jnp.linalg.cholesky(Ks)
    for shift in (1e-5, 1e-3):
        Ls = jnp.linalg.cholesky(Ks.at[..., didx, didx].add(shift))
        bad = jnp.any(jnp.isnan(L), axis=(-2, -1), keepdims=True)
        L = jnp.where(bad, Ls, L)
    if _direct_inv():
        # explicit W = L^-1 (scaled space), one batched triangular
        # multi-RHS solve per (lagged) refresh; direct_precond then
        # applies K^-1 = W^T W as two full-precision MXU matmuls
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), Ks.shape)
        W = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return W * s[..., None, :]
    return L / s[..., :, None]


def direct_precond(L):
    """Preconditioner callable from dense_cholesky's output [nd, nd]:
    M(r) solves L L^T z = r for r of shape [nd] or [nd, k].  On TPU the
    input is W = L^-1 and the apply is W^T (W r) on the MXU (see
    _direct_inv)."""
    inv = _direct_inv()

    def M(r):
        rr = r[:, None] if r.ndim == 1 else r
        if inv:
            with jax.default_matmul_precision("highest"):
                z = L.T @ (L @ rr)
        else:
            z = jax.scipy.linalg.solve_triangular(L, rr, lower=True)
            z = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        return z[:, 0] if r.ndim == 1 else z
    return M


def direct_precond_stack(Ls):
    """Per-column preconditioner from stacked factors [k, nd, nd] for a
    multi-RHS solve with a different operator per column: M(r [nd, k])."""
    inv = _direct_inv()

    def solve_one(L, r):
        if inv:
            with jax.default_matmul_precision("highest"):
                return L.T @ (L @ r)
        z = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)

    def M(r):
        return jnp.moveaxis(
            jax.vmap(solve_one)(Ls, jnp.moveaxis(r, -1, 0)), 0, -1
        )
    return M


def cg_solve_multi(apply_fn, B, x0=None, diag=None, dirichlet_mask=None,
                   tol=1e-10, maxiter=500, M=None, return_info=False):
    """Multi-RHS preconditioned CG: one operator sweep per iteration for
    ALL columns (per-column alpha/beta), iterating until every column
    meets its tolerance.  apply_fn, dirichlet_mask, diag, and M must
    accept/broadcast over [nd, k]."""
    mask = None if dirichlet_mask is None else (
        dirichlet_mask if dirichlet_mask.ndim == 2 else
        dirichlet_mask[:, None]
    )

    def A(x):
        if mask is None:
            return apply_fn(x)
        return apply_fn(x * mask) * mask + x * (1.0 - mask)

    if M is None:
        if diag is not None:
            dd = diag if diag.ndim == 2 else diag[:, None]
            dinv = jnp.where(jnp.abs(dd) > 1e-300, 1.0 / dd, 1.0)
            M = lambda x: x * dinv
        else:
            M = lambda x: x

    x0 = jnp.zeros_like(B) if x0 is None else x0
    eps = float(jnp.finfo(B.dtype).eps)
    tol = max(float(tol), 50.0 * eps)
    bnorm2 = jnp.sum(B * B, axis=0)
    atol2 = (tol * tol) * bnorm2 + 1e-300

    r0 = B - A(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=0)

    def cond(state):
        _, r, _, _, _, it = state
        return jnp.logical_and(
            jnp.any(jnp.sum(r * r, axis=0) > atol2), it < maxiter
        )

    def body(state):
        x, r, z, p, rz, it = state
        Ap = A(p)
        denom = jnp.sum(p * Ap, axis=0)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-300, denom, 1.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = M(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-300, rz, 1.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, _, _, _, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0))
    )
    if return_info:
        relres = jnp.sqrt(
            jnp.max(jnp.sum(r * r, axis=0) / jnp.maximum(bnorm2, 1e-300))
        )
        return x, it, relres
    return x


def helmholtz_apply_multi(tab, U, alpha, mass_coefs, diff_coefs):
    """Batched-coefficient Helmholtz apply: column c of the result is
    (alpha M(mass_coefs[c]) + K(diff_coefs[c])) U[:, c], computed with ONE
    gather and ONE scatter for all columns (latency-floor dodging; see the
    dense-direct section note).

    mass_coefs / diff_coefs: [k, ne, nq] quad-point coefficients (use
    to_quad per column) or None."""
    k = U.shape[1]
    ne, nde = tab.ne, tab.ndof_el
    ue = gather(tab, U)  # [ne, nde, k]
    uek = jnp.moveaxis(ue, -1, 0).reshape(k * ne, nde)
    wdet = tab.wq[None, :] * tab.detJ  # [ne, nq]
    re = 0.0
    if mass_coefs is not None:
        uq = uek @ tab.Bvol.T  # [k*ne, nq]
        wm = (alpha * wdet)[None] * mass_coefs  # [k, ne, nq]
        re = re + (wm.reshape(k * ne, -1) * uq) @ tab.Bvol
    if diff_coefs is not None:
        dim = tab.dim
        wk = tab.wq[None, None, :] * diff_coefs  # [k, ne, nq]
        wkf = wk.reshape(k * ne, -1)
        g = [uek @ tab.Gvol[:, :, l].T for l in range(dim)]  # [k*ne, nq]
        for m in range(dim):
            h = 0.0
            for l in range(dim):
                A_ml = (jnp.einsum(
                    "nqd,nqd->nq", tab.adjJ[:, :, m, :], tab.adjJ[:, :, l, :]
                ) / tab.detJ)
                h = h + jnp.tile(A_ml, (k, 1)) * g[l]
            re = re + (h * wkf) @ tab.Gvol[:, :, m]
    re = jnp.moveaxis(re.reshape(k, ne, nde), 0, -1)  # [ne, nde, k]
    return scatter_add(tab, re)


def diffusion_apply_tensor(tab, u, Kq):
    """(grad v, K grad u) with a matrix coefficient K [ne, nq, dim, dim]
    at quadrature points (SUPG streamwise diffusion etc.)."""
    if _sharded(tab):
        return tab.run_qcoef(
            lambda tl, uu, cc: diffusion_apply_tensor(tl, uu, cc),
            u, tab.stack_quad(Kq).arr,
        )
    uu, squeeze = _promote(u)
    gq = jnp.einsum("qdl,ndk->nqlk", tab.Gvol, gather(tab, uu))
    # A[m,l] = adjJ[m,:] K adjJ[l,:]^T / detJ
    A = jnp.einsum("nqmd,nqde,nqle->nqml", tab.adjJ, Kq, tab.adjJ) \
        / tab.detJ[..., None, None]
    Ag = jnp.einsum("nqml,nqlk->nqmk", A, gq)
    re = jnp.einsum("qdm,nqmk->ndk", tab.Gvol,
                    tab.wq[None, :, None, None] * Ag)
    out = scatter_add(tab, re)
    return out[:, 0] if squeeze else out


def grid_scale_q(tab, order=1):
    """Element grid scale at quadrature points: detJ^(1/dim) / order."""
    return tab.detJ ** (1.0 / tab.dim) / max(order, 1)


# --------------------------------------------------------------------------
# Element-sharded H1 assembly (multi-device loMach)
#
# The reference runs every solver family under MPI domain decomposition
# (SURVEY.md 2.6; src/loMach.cpp:447).  TPU-native model here: dof vectors
# stay REPLICATED across the device mesh while the element loop (gather ->
# quadrature kernel -> scatter-add, the dominant cost) is sharded; each
# assembly op runs under shard_map and finishes with a psum over the mesh
# axis.  CG and pointwise updates operate on replicated vectors unchanged.
# --------------------------------------------------------------------------

_SH_ELEM_FIELDS = ("elem_dofs", "adjJ", "detJ", "xyz_q", "elem_valid")
_SH_META = ("dim", "order", "ne", "ndof_el", "nq", "ndofs", "nqf", "nbf")


class ShardedH1:
    """Duck-typed H1Tables whose assembly ops run element-sharded.

    Exposes the global setup surface (ndofs, xyz, bf_* arrays for
    boundary_dofs) while the h1.* operator functions dispatch through
    `run` (shard_map + psum)."""

    def __init__(self, tab_np, nparts, dtype, axis="dd", devices=None):
        import jax
        from jax.sharding import Mesh as JaxMesh

        self.axis = axis
        self.nparts = nparts
        self._global_np = tab_np
        gj = tab_np.to_jax(dtype)

        # forwarded global metadata / setup surface
        self.dim, self.order = tab_np.dim, tab_np.order
        self.ne, self.ndof_el = tab_np.ne, tab_np.ndof_el
        self.nq, self.ndofs = tab_np.nq, tab_np.ndofs
        self.nqf, self.nbf = tab_np.nqf, tab_np.nbf
        self.xyz = gj.xyz
        self.xyz_q = gj.xyz_q  # global (coefficient prep: radius weights)
        self.detJ = gj.detJ  # global (coefficient prep: grid_scale_q)
        self.wq, self.Bvol, self.Gvol = gj.wq, gj.Bvol, gj.Gvol
        self.bf_elem, self.bf_attr = tab_np.bf_elem, tab_np.bf_attr
        self.bf_Btr, self.bf_nor = tab_np.bf_Btr, tab_np.bf_nor
        self.bf_wts, self.bf_xyz = tab_np.bf_wts, tab_np.bf_xyz
        self.elem_dofs = tab_np.elem_dofs  # global (setup use only)

        # block element partition, padded to a uniform shard size
        ne = tab_np.ne
        part = np.minimum((np.arange(ne) * nparts) // ne, nparts - 1)
        counts = np.bincount(part, minlength=nparts)
        nep = int(counts.max())
        ed = np.zeros((nparts, nep, tab_np.ndof_el), dtype=np.int32)
        eid = np.zeros((nparts, nep), dtype=np.int32)
        adjJ = np.zeros((nparts, nep) + tab_np.adjJ.shape[1:])
        detJ = np.ones((nparts, nep) + tab_np.detJ.shape[1:])
        xyz_q = np.zeros((nparts, nep) + tab_np.xyz_q.shape[1:])
        valid = np.zeros((nparts, nep))
        for p in range(nparts):
            ids = np.where(part == p)[0]
            k = len(ids)
            ed[p, :k] = tab_np.elem_dofs[ids]
            eid[p, :k] = ids
            eid[p, k:] = ids[0] if k else 0
            adjJ[p, :k] = tab_np.adjJ[ids]
            detJ[p, :k] = tab_np.detJ[ids]
            xyz_q[p, :k] = tab_np.xyz_q[ids]
            valid[p, :k] = 1.0
            if k < nep:  # padding rows reuse element-0 geometry, masked out
                ed[p, k:] = tab_np.elem_dofs[ids[0] if k else 0]
                adjJ[p, k:] = tab_np.adjJ[ids[0] if k else 0]
                detJ[p, k:] = tab_np.detJ[ids[0] if k else 0]
                xyz_q[p, k:] = tab_np.xyz_q[ids[0] if k else 0]

        import jax.numpy as jnp_

        self._elem_ids_stacked = jnp_.asarray(eid)
        nb0 = 0
        z = np.zeros
        self._stacked = H1Tables(
            dim=tab_np.dim, order=tab_np.order, ne=nep,
            ndof_el=tab_np.ndof_el, nq=tab_np.nq, ndofs=tab_np.ndofs,
            nqf=tab_np.nqf, nbf=nb0,
            elem_dofs=jnp_.asarray(ed),
            Bvol=gj.Bvol, Gvol=gj.Gvol, wq=gj.wq,
            adjJ=jnp_.asarray(adjJ, dtype), detJ=jnp_.asarray(detJ, dtype),
            xyz=gj.xyz, xyz_q=jnp_.asarray(xyz_q, dtype),
            bf_elem=jnp_.zeros((nparts, nb0), jnp_.int32),
            bf_attr=jnp_.zeros((nparts, nb0), jnp_.int32),
            bf_Btr=jnp_.zeros((nparts, nb0, tab_np.nqf, tab_np.ndof_el), dtype),
            bf_nor=jnp_.zeros((nparts, nb0, tab_np.nqf, tab_np.dim), dtype),
            bf_wts=jnp_.zeros((nparts, nb0, tab_np.nqf), dtype),
            bf_xyz=jnp_.zeros((nparts, nb0, tab_np.nqf, tab_np.dim), dtype),
            elem_valid=jnp_.asarray(valid, dtype),
        )

        if devices is not None:
            devs = list(devices)
            if len(devs) < nparts:
                raise ValueError(
                    f"device group has {len(devs)} devices, need {nparts}"
                )
        else:
            devs = jax.devices()
            if len(devs) < nparts:
                devs = jax.devices("cpu")
        self.jmesh = JaxMesh(np.array(devs[:nparts]), (axis,))

    def localize(self, tab_s):
        kw = {}
        for f in fields(H1Tables):
            v = getattr(tab_s, f.name)
            if f.name in _SH_META or v is None:
                kw[f.name] = v
            elif f.name in _SH_ELEM_FIELDS or f.name.startswith("bf_"):
                kw[f.name] = v[0]
            else:
                kw[f.name] = v
        return H1Tables(**kw)

    def _specs(self):
        from jax.sharding import PartitionSpec as P

        kw = {}
        for f in fields(H1Tables):
            v = getattr(self._stacked, f.name)
            if f.name in _SH_META or v is None:
                kw[f.name] = v
            elif f.name in _SH_ELEM_FIELDS or f.name.startswith("bf_"):
                kw[f.name] = P(self.axis)
            else:
                kw[f.name] = P()
        return H1Tables(**kw)

    def run(self, op, *args):
        """op(local_tab, *args) -> partial assembly; returns the psum."""
        import jax
        from functools import partial as _partial

        from jax.sharding import PartitionSpec as P

        try:
            shard_map = jax.shard_map
        except AttributeError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        in_specs = (self._specs(),) + tuple(P() for _ in args)

        @_partial(shard_map, mesh=self.jmesh, in_specs=in_specs,
                  out_specs=P())
        def f(tab_s, *a):
            return jax.lax.psum(op(self.localize(tab_s), *a), self.axis)

        return f(self._stacked, *args)

    def run_coef(self, op, u, coef):
        """Dispatch helper for ops with an optional nodal coefficient."""
        if isinstance(coef, StackedQuadCoef):
            return self.run_qcoef(op, u, coef.arr)
        if coef is None:
            return self.run(lambda tl, uu: op(tl, uu), u)
        return self.run(lambda tl, uu, cc: op(tl, uu, cc), u, coef)

    def stack_quad(self, coef_q):
        """Global quad-point coefficient [ne, nq] -> StackedQuadCoef whose
        array is the per-shard stacked [P, nep, nq] view (padding rows get
        element 0's values; they are masked by elem_valid in assembly)."""
        import jax.numpy as jnp

        cq = jnp.asarray(coef_q)
        return StackedQuadCoef(cq[self._elem_ids_stacked])

    def run_qcoef(self, op, u, coef_stacked):
        """Like run_coef but with a per-shard quad-point coefficient
        [P, nep, nq] sharded over the device-mesh axis."""
        import jax
        from functools import partial as _partial

        from jax.sharding import PartitionSpec as P

        try:
            shard_map = jax.shard_map
        except AttributeError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        @_partial(shard_map, mesh=self.jmesh,
                  in_specs=(self._specs(), P(), P(self.axis)), out_specs=P())
        def f(tab_s, uu, cc):
            return jax.lax.psum(op(self.localize(tab_s), uu, cc[0]),
                                self.axis)

        return f(self._stacked, u, coef_stacked)


class StackedQuadCoef:
    """Per-shard stacked quad-point coefficient for ShardedH1 assembly."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr


def _sharded(tab):
    return isinstance(tab, ShardedH1)
