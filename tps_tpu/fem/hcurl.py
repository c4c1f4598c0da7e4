"""Lowest-order Nedelec H(curl) elements on hex meshes (matrix-free).

The TPU-native backbone of the 3-D quasimagnetostatic solver (role of the
reference's MFEM ND_FECollection path, src/quasimagnetostatic.cpp:134-660):
12 edge dofs per hex, covariant Piola transform A_phys = J^{-T} A_ref,
curl transform curl_phys = J curl_ref / detJ.  All operators are
element-batched einsums + segment_sum scatters, so applies are jit/XLA
friendly; systems are solved matrix-free (CG/GMRES).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..mesh.reference_element import gauss_legendre_1d

# local hex edges: (v0, v1) pairs in MFEM hex vertex ordering, grouped as
# 4 x-edges, 4 y-edges, 4 z-edges; direction v0 -> v1 is the +axis direction
_HEX_EDGES = [
    (0, 1), (3, 2), (4, 5), (7, 6),  # x: (y,z) = (0,0),(1,0),(0,1),(1,1)
    (0, 3), (1, 2), (4, 7), (5, 6),  # y: (x,z) = (0,0),(1,0),(0,1),(1,1)
    (0, 4), (1, 5), (3, 7), (2, 6),  # z: (x,y) = (0,0),(1,0),(0,1),(1,1)
]
_EDGE_AXIS = [0] * 4 + [1] * 4 + [2] * 4
_EDGE_TRANS = [  # (a, b): transverse reference coordinates of the edge
    (0, 0), (1, 0), (0, 1), (1, 1),
    (0, 0), (1, 0), (0, 1), (1, 1),
    (0, 0), (1, 0), (0, 1), (1, 1),
]


def _psi(t, a):
    return t if a else 1.0 - t


def _dpsi(a):
    return 1.0 if a else -1.0


def _edge_basis_at(pts):
    """W [nq, 12, 3] and curl W [nq, 12, 3] on the reference cube."""
    nq = pts.shape[0]
    W = np.zeros((nq, 12, 3))
    C = np.zeros((nq, 12, 3))
    for e in range(12):
        d = _EDGE_AXIS[e]
        d1, d2 = [x for x in range(3) if x != d]
        a, b = _EDGE_TRANS[e]
        pa = _psi(pts[:, d1], a)
        pb = _psi(pts[:, d2], b)
        W[:, e, d] = pa * pb
        # curl(e_d f(x_{d1}) g(x_{d2})) has components along d1 and d2:
        # (curl W)_{d1} = dW_d/dx_{d2} * eps(d1,d2,d)...
        # use explicit formula: curl(F) = (dFz/dy - dFy/dz, ...)
        grad = np.zeros((nq, 3))
        grad[:, d1] = _dpsi(a) * pb
        grad[:, d2] = pa * _dpsi(b)
        # W = e_d * f -> curl W = grad f x e_d
        ed = np.zeros(3)
        ed[d] = 1.0
        C[:, e, :] = np.cross(grad, ed[None, :])
    return W, C


@dataclass
class HCurlTables:
    dim: int
    ne: int
    nedge: int  # global edges
    elem_edges: np.ndarray  # [ne, 12] global edge ids
    edge_sign: np.ndarray  # [ne, 12] +-1
    W: np.ndarray  # [nq, 12, 3] reference basis
    Cw: np.ndarray  # [nq, 12, 3] reference curls
    wq: np.ndarray  # [nq]
    Jinv: np.ndarray  # [ne, nq, 3, 3]
    Jmat: np.ndarray  # [ne, nq, 3, 3]
    detJ: np.ndarray  # [ne, nq]
    xyz_q: np.ndarray  # [ne, nq, 3]
    bdr_edges: np.ndarray  # boundary edge ids (for PEC A x n = 0)
    edge_verts: np.ndarray = None  # [nedge, 2] (lo, hi) mesh vertex ids
    ref_pts: np.ndarray = None  # [nq, 3] reference quadrature points
    elem_valid: np.ndarray = None  # [ne] 1.0 real / 0.0 shard padding
    # ---- higher-order (k >= 2) interpolatory metadata ----
    order: int = 1
    dof_dirs: np.ndarray = None  # [ndloc] axis family per local dof
    ref_dof_pts: np.ndarray = None  # [ndloc, 3] dof nodes on the ref cube
    Gref: np.ndarray = None  # [ndloc, nv] (hex) or [ne, ndloc, nv] (tet)
    tau_dof: np.ndarray = None  # [ne, ndloc, 3] physical dof tangents
    dof_mult: np.ndarray = None  # [nedge] (elem, local) count per global dof
    # ---- tet k >= 2: 2-slot dof mixing (local dof = sum_s mixW * x[mixI];
    # generalizes the +-1 edge_sign to the face-tangent change of basis
    # between element-local and canonical global functionals) ----
    mixI: np.ndarray = None  # [ne, ndloc, 2] global dof ids
    mixW: np.ndarray = None  # [ne, ndloc, 2] mixing weights

    @property
    def ndofs(self):
        return self.nedge

    def to_jax(self, dtype):
        import jax.numpy as jnp

        out = HCurlTables.__new__(HCurlTables)
        for name, v in self.__dict__.items():
            if isinstance(v, np.ndarray) and np.issubdtype(v.dtype, np.floating):
                setattr(out, name, jnp.asarray(v, dtype))
            elif isinstance(v, np.ndarray):
                setattr(out, name, jnp.asarray(v))
            else:
                setattr(out, name, v)
        return out


# MFEM hex local faces as (normal axis, coordinate value, vertex ids)
_HEX_FACES = [
    (0, 0.0, (0, 3, 7, 4)), (0, 1.0, (1, 2, 6, 5)),
    (1, 0.0, (0, 1, 5, 4)), (1, 1.0, (3, 2, 6, 7)),
    (2, 0.0, (0, 1, 2, 3)), (2, 1.0, (4, 5, 6, 7)),
]


def _hex_nedelec_k_dofs(order):
    """Interpolatory Nedelec-I(k) dof metadata on the unit cube: per axis
    family d, nodes at (Gauss_k along d) x (Lobatto_{k+1})^2 transverse,
    functional A_ref . e_d at the node (reference: ND_FECollection(order),
    src/quasimagnetostatic.cpp:170).  Returns (ref_pts [nd, 3],
    dirs [nd]); k=1 reproduces the 12 Whitney edge dofs."""
    from ..mesh.reference_element import gauss_lobatto_1d

    g, _ = gauss_legendre_1d(order)
    lb, _ = gauss_lobatto_1d(order + 1)
    pts, dirs = [], []
    for d in range(3):
        t1, t2 = [a for a in range(3) if a != d]
        for i in range(order):
            for j in range(order + 1):
                for k2 in range(order + 1):
                    p = np.zeros(3)
                    p[d] = g[i]
                    p[t1] = lb[j]
                    p[t2] = lb[k2]
                    pts.append(p)
                    dirs.append(d)
    return np.asarray(pts), np.asarray(dirs, dtype=np.int64)


def _hex_nedelec_k_basis(order, pts_eval):
    """W [nq, nd, 3] and curl W [nq, nd, 3] for order-k hex Nedelec."""
    from ..mesh.reference_element import (
        gauss_lobatto_1d,
        lagrange_deriv,
        lagrange_eval,
    )

    g, _ = gauss_legendre_1d(order)
    lb, _ = gauss_lobatto_1d(order + 1)
    nq = pts_eval.shape[0]
    LG = [lagrange_eval(g, pts_eval[:, a]) for a in range(3)]
    dLG = [lagrange_deriv(g, pts_eval[:, a]) for a in range(3)]
    LL = [lagrange_eval(lb, pts_eval[:, a]) for a in range(3)]
    dLL = [lagrange_deriv(lb, pts_eval[:, a]) for a in range(3)]
    W, C = [], []
    for d in range(3):
        t1, t2 = [a for a in range(3) if a != d]
        ed = np.zeros(3)
        ed[d] = 1.0
        for i in range(order):
            for j in range(order + 1):
                for k2 in range(order + 1):
                    f = LG[d][:, i] * LL[t1][:, j] * LL[t2][:, k2]
                    grad = np.zeros((nq, 3))
                    grad[:, d] = dLG[d][:, i] * LL[t1][:, j] * LL[t2][:, k2]
                    grad[:, t1] = LG[d][:, i] * dLL[t1][:, j] * LL[t2][:, k2]
                    grad[:, t2] = LG[d][:, i] * LL[t1][:, j] * dLL[t2][:, k2]
                    Wd = np.zeros((nq, 3))
                    Wd[:, d] = f
                    W.append(Wd)
                    C.append(np.cross(grad, ed[None, :]))
    return np.stack(W, axis=1), np.stack(C, axis=1)


def _number_hcurl_dofs_k(mesh, ref_pts, dirs):
    """Global numbering for the interpolatory dofs by geometric matching:
    two element-local dofs are the same global dof iff they share the
    physical node AND the tangent line; the local sign is the tangent's
    orientation against the canonical one.  Orientation-case-free: works
    for any conforming (even curved-face) hex mesh because both elements
    parametrize a shared face by the same bilinear surface."""
    from ..mesh.reference_element import ReferenceElement

    ne = mesh.num_elements
    nd = len(dirs)
    ref = ReferenceElement(geom="hex", order=1, basis="gauss-lobatto")
    Ngeo = ref.eval_geom_basis(ref_pts)  # [nd, 8]
    dN = ref.eval_geom_basis_grad(ref_pts)  # [nd, 8, 3]
    ev = mesh.vertices[mesh.elements]  # [ne, 8, 3]
    X = np.einsum("dv,nvi->ndi", Ngeo, ev)  # dof points [ne, nd, 3]
    J = np.einsum("nvi,dvj->ndij", ev, dN)  # [ne, nd, 3, 3]
    tau = np.empty((ne, nd, 3))
    for d in range(3):
        m = dirs == d
        tau[:, m, :] = J[..., d][:, m, :]

    scale = max(float(np.abs(mesh.vertices).max()), 1.0)
    Xr = np.round(X / scale * 1e8).astype(np.int64)
    tn = tau / np.linalg.norm(tau, axis=-1, keepdims=True)
    # canonical orientation: first significant component positive
    sig = np.abs(tn) > 1e-8
    first = np.argmax(sig, axis=-1)
    comp = np.take_along_axis(tn, first[..., None], axis=-1)[..., 0]
    sgn = np.where(comp >= 0, 1.0, -1.0)
    tr = np.round(tn * sgn[..., None] * 1e5).astype(np.int64)

    keys = np.concatenate([Xr, tr], axis=-1).reshape(ne * nd, 6)
    _uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    elem_dofs = inv.reshape(ne, nd).astype(np.int64)
    dof_sign = sgn
    ndof = int(elem_dofs.max()) + 1

    # PEC boundary dofs: face-tangential dofs of boundary faces
    bdr_keys = {frozenset(int(v) for v in f) for f in mesh.bdr_faces}
    bdr = np.zeros(ndof, dtype=bool)
    elems = mesh.elements
    for n in range(ne):
        for (ax, val, vids) in _HEX_FACES:
            if frozenset(int(elems[n, v]) for v in vids) in bdr_keys:
                sel = (np.abs(ref_pts[:, ax] - val) < 1e-12) & (dirs != ax)
                bdr[elem_dofs[n, sel]] = True
    bdr_dofs = np.where(bdr)[0].astype(np.int64)
    return elem_dofs, dof_sign, ndof, bdr_dofs, X, tau


_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

# barycentric gradients on the reference tet (lambda0 = 1-x-y-z, ...)
_TET_GRAD_L = np.array(
    [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)


def _tet_edge_basis_at(pts):
    """Whitney edge basis W_e = l_a grad(l_b) - l_b grad(l_a) and its curl
    2 grad(l_a) x grad(l_b) on the reference tet: [nq, 6, 3] each."""
    nq = pts.shape[0]
    lam = np.column_stack(
        [1.0 - pts.sum(axis=1), pts[:, 0], pts[:, 1], pts[:, 2]]
    )  # [nq, 4]
    W = np.zeros((nq, 6, 3))
    C = np.zeros((nq, 6, 3))
    for e, (a, b) in enumerate(_TET_EDGES):
        ga, gb = _TET_GRAD_L[a], _TET_GRAD_L[b]
        W[:, e, :] = lam[:, a, None] * gb[None, :] - lam[:, b, None] * ga[None, :]
        C[:, e, :] = 2.0 * np.cross(ga, gb)[None, :]
    return W, C


# -- arbitrary-order Nedelec-I(k) on tets ----------------------------------
#
# Interpolatory point-tangent dofs (the structure MFEM's ND tet elements
# use, reference ND_FECollection(order, dim), src/quasimagnetostatic.cpp:170):
#   * k Gauss points per edge, tangent = edge vector;
#   * interior points of the degree-(k+1) principal lattice per face, two
#     tangents each (face edge vectors);
#   * interior lattice points, three axis tangents each.
# The reference basis is built numerically: span N-I(k) = (P_{k-1})^3 (+)
# S_k (homogeneous p with x.p = 0, via SVD null space) in the monomial
# basis, then invert the dof Vandermonde.  Inter-element conformity uses
# CANONICAL global functionals (tangents built from sorted global vertex
# ids); each element-local dof is a 1- or 2-term combination of the
# canonical dofs at the same physical point (mixI/mixW tables), which
# generalizes the +-1 edge sign of the Whitney space.

_TET_FACES = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
_TET_REF_VERTS = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)
# tangent (rank_from, rank_to) -> coefficients on (t1, t2) where
# t1 = x(g1) - x(g0), t2 = x(g2) - x(g0) for sorted global face verts
_FACE_TAN_COEF = np.zeros((3, 3, 2))
_FACE_TAN_COEF[0, 1] = (1.0, 0.0)
_FACE_TAN_COEF[1, 0] = (-1.0, 0.0)
_FACE_TAN_COEF[0, 2] = (0.0, 1.0)
_FACE_TAN_COEF[2, 0] = (0.0, -1.0)
_FACE_TAN_COEF[1, 2] = (-1.0, 1.0)
_FACE_TAN_COEF[2, 1] = (1.0, -1.0)


def _tri_interior_lattice(order):
    """Interior points of the degree-(order+1) principal lattice on a
    triangle, as barycentric integer triples (i, j, l), i+j+l = order+1,
    all >= 1, enumerated lexicographically: k(k-1)/2 points."""
    n = order + 1
    return [(i, j, n - i - j)
            for i in range(1, n) for j in range(1, n - i)]


def _tet_interior_lattice(order):
    n = order + 1
    return [(i, j, l, n - i - j - l)
            for i in range(1, n) for j in range(1, n - i)
            for l in range(1, n - i - j)]


def _monomial_exps(order):
    """All 3-var monomial exponents of total degree <= order."""
    return np.array(
        [(a, b, c) for a in range(order + 1)
         for b in range(order + 1 - a) for c in range(order + 1 - a - b)],
        dtype=np.int64,
    )


def _mono_eval(exps, pts):
    """[npts, nmono] monomial values (0^0 = 1)."""
    return np.prod(
        np.where(exps[None, :, :] == 0, 1.0,
                 pts[:, None, :] ** exps[None, :, :]),
        axis=-1,
    )


def _deriv_mats(exps):
    """D[i] [nmono, nmono] mapping coefficient vectors to d/dx_i coefs."""
    nm = len(exps)
    idx = {tuple(e): m for m, e in enumerate(exps)}
    D = np.zeros((3, nm, nm))
    for m, e in enumerate(exps):
        for i in range(3):
            if e[i] > 0:
                e2 = list(e)
                e2[i] -= 1
                D[i, idx[tuple(e2)], m] = e[i]
    return D


@functools.lru_cache(maxsize=None)
def _tet_nedelec_k_ref(order):
    """Reference-element data for Nedelec-I(k) on the unit tet: returns
    (exps, Cn [nd, nmono, 3] nodal coefficients, ref_pts [nd, 3],
    ref_dirs [nd, 3], kinds [nd] 0/1/2, ents [nd], subs [nd], tslots [nd])."""
    k = order
    exps = _monomial_exps(k)
    nm = len(exps)
    idx = {tuple(e): m for m, e in enumerate(exps)}

    # span: (P_{k-1})^3
    span = []
    for m, e in enumerate(exps):
        if e.sum() <= k - 1:
            for d in range(3):
                c = np.zeros((nm, 3))
                c[m, d] = 1.0
                span.append(c)
    # span: S_k = {p in (H_k)^3 : x . p = 0} via SVD null space of the
    # multiplication map (H_k)^3 -> H_{k+1}
    hk = [m for m, e in enumerate(exps) if e.sum() == k]
    e1 = _monomial_exps(k + 1)
    idx1 = {tuple(e): m for m, e in enumerate(e1)}
    h1e = [m for m, e in enumerate(e1) if e.sum() == k + 1]
    row = {m: r for r, m in enumerate(h1e)}
    Con = np.zeros((len(h1e), 3 * len(hk)))
    for c_, m in enumerate(hk):
        for d in range(3):
            e2 = exps[m].copy()
            e2[d] += 1
            Con[row[idx1[tuple(e2)]], d * len(hk) + c_] = 1.0
    _u, s, vt = np.linalg.svd(Con)
    null = vt[np.sum(s > 1e-10):]
    for vec in null:
        c = np.zeros((nm, 3))
        for d in range(3):
            for c_, m in enumerate(hk):
                c[m, d] += vec[d * len(hk) + c_]
        span.append(c)
    C = np.stack(span)  # [nspan, nmono, 3]

    # dofs
    g, _ = gauss_legendre_1d(k)
    pts, dirs, kinds, ents, subs, tslots = [], [], [], [], [], []
    for e, (a, b) in enumerate(_TET_EDGES):
        va, vb = _TET_REF_VERTS[a], _TET_REF_VERTS[b]
        for i in range(k):
            pts.append(va + g[i] * (vb - va))
            dirs.append(vb - va)
            kinds.append(0)
            ents.append(e)
            subs.append(i)
            tslots.append(0)
    lat = _tri_interior_lattice(k)
    for f, fv in enumerate(_TET_FACES):
        va, vb, vc = (_TET_REF_VERTS[v] for v in fv)
        for p, (i, j, l) in enumerate(lat):
            pt = (i * va + j * vb + l * vc) / float(k + 1)
            for s, d in enumerate((vb - va, vc - va)):
                pts.append(pt)
                dirs.append(d)
                kinds.append(1)
                ents.append(f)
                subs.append(p)
                tslots.append(s)
    lat3 = _tet_interior_lattice(k)
    for p, (i, j, l, m_) in enumerate(lat3):
        pt = (i * _TET_REF_VERTS[0] + j * _TET_REF_VERTS[1]
              + l * _TET_REF_VERTS[2] + m_ * _TET_REF_VERTS[3]) / float(k + 1)
        for s in range(3):
            d = np.zeros(3)
            d[s] = 1.0
            pts.append(pt)
            dirs.append(d)
            kinds.append(2)
            ents.append(0)
            subs.append(p)
            tslots.append(s)
    pts = np.asarray(pts)
    dirs = np.asarray(dirs)
    nd = len(pts)
    if C.shape[0] != nd:
        raise RuntimeError(
            f"Nedelec-I({k}) span/dof mismatch: {C.shape[0]} vs {nd}")

    mv = _mono_eval(exps, pts)  # [nd, nmono]
    V = np.einsum("im,jmc,ic->ij", mv, C, dirs)  # V[i, j] = l_i(span_j)
    cond = np.linalg.cond(V)
    if cond > 1e10:
        raise RuntimeError(
            f"ill-conditioned Nedelec-I({k}) tet Vandermonde: cond={cond:g}")
    Vinv = np.linalg.inv(V)
    Cn = np.einsum("js,jmc->smc", Vinv, C)  # nodal basis coefficients
    return (exps, Cn, pts, dirs, np.asarray(kinds, dtype=np.int64),
            np.asarray(ents, dtype=np.int64), np.asarray(subs, np.int64),
            np.asarray(tslots, dtype=np.int64))


def _tet_nedelec_k_basis(order, pts_eval):
    """W [nq, nd, 3] and curl W [nq, nd, 3] for order-k tet Nedelec."""
    exps, Cn, *_ = _tet_nedelec_k_ref(order)
    D = _deriv_mats(exps)
    mv = _mono_eval(exps, pts_eval)  # [nq, nmono]
    W = np.einsum("qm,dmc->qdc", mv, Cn)
    Cc = np.empty_like(Cn)
    Cc[:, :, 0] = Cn[:, :, 2] @ D[1].T - Cn[:, :, 1] @ D[2].T
    Cc[:, :, 1] = Cn[:, :, 0] @ D[2].T - Cn[:, :, 2] @ D[0].T
    Cc[:, :, 2] = Cn[:, :, 1] @ D[0].T - Cn[:, :, 0] @ D[1].T
    Cw = np.einsum("qm,dmc->qdc", mv, Cc)
    return W, Cw


def _number_hcurl_tet_k(mesh, order):
    """Structural (entity-based) global numbering + the local->canonical
    mixing tables for order-k tet Nedelec.  Canonical functionals: edge
    dofs at Gauss points along the global lo->hi direction; face dofs at
    face-lattice points with tangents t_s = x(g_s) - x(g_0) for the
    face's SORTED global vertices; interior dofs element-private."""
    k = order
    elems = np.asarray(mesh.elements, dtype=np.int64)  # [ne, 4]
    ne = elems.shape[0]
    X = np.asarray(mesh.vertices)
    (_exps, _Cn, _pts, _dirs, kinds, ents, subs, tslots) = \
        _tet_nedelec_k_ref(order)
    nd = len(kinds)

    # ---- global edges
    epairs = elems[:, np.asarray(_TET_EDGES, dtype=np.int64)]  # [ne, 6, 2]
    nv = int(elems.max()) + 1
    g0, g1 = epairs[..., 0], epairs[..., 1]
    ekey = (np.minimum(g0, g1) * np.int64(nv) + np.maximum(g0, g1))
    uniq_ekeys, eid = np.unique(ekey.reshape(-1), return_inverse=True)
    eid = eid.reshape(ne, 6)
    easc = g0 < g1
    nedge = len(uniq_ekeys)

    # ---- global faces
    ftrip = np.sort(elems[:, np.asarray(_TET_FACES, dtype=np.int64)],
                    axis=-1)  # [ne, 4, 3] sorted global ids
    fkey = (ftrip[..., 0] * np.int64(nv) + ftrip[..., 1]) * np.int64(nv) \
        + ftrip[..., 2]
    uniq_fkeys, fid = np.unique(fkey.reshape(-1), return_inverse=True)
    fid = fid.reshape(ne, 4)
    nface = len(uniq_fkeys)

    lat = _tri_interior_lattice(k)
    npf = len(lat)
    nint_pts = len(_tet_interior_lattice(k))
    face_base = nedge * k
    int_base = face_base + nface * npf * 2
    ndof = int_base + ne * nint_pts * 3

    # canonical lattice-point index lookup (encode (i,j,l) base k+2)
    enc = {}
    for p, (i, j, l) in enumerate(lat):
        enc[(i * (k + 2) + j) * (k + 2) + l] = p

    mixI = np.zeros((ne, nd, 2), dtype=np.int64)
    mixW = np.zeros((ne, nd, 2))
    elem_dofs = np.zeros((ne, nd), dtype=np.int64)  # canonical-aligned
    tau = np.zeros((ne, nd, 3))  # canonical physical tangents per slot

    # edge dofs (vectorized over elements)
    for j in range(nd):
        if kinds[j] != 0:
            continue
        e, i = int(ents[j]), int(subs[j])
        asc = easc[:, e]
        slot = np.where(asc, i, k - 1 - i)
        gid = eid[:, e] * k + slot
        elem_dofs[:, j] = gid
        mixI[:, j, 0] = gid
        mixI[:, j, 1] = gid
        mixW[:, j, 0] = np.where(asc, 1.0, -1.0)
        lo = np.minimum(g0[:, e], g1[:, e])
        hi = np.maximum(g0[:, e], g1[:, e])
        tau[:, j, :] = X[hi] - X[lo]

    # face dofs
    loc_faces = np.asarray(_TET_FACES, dtype=np.int64)
    for f in range(4):
        gf = elems[:, loc_faces[f]]  # [ne, 3] global ids, local order
        ranks = np.argsort(np.argsort(gf, axis=-1), axis=-1)  # [ne, 3]
        gsorted = np.sort(gf, axis=-1)
        t12 = np.stack([X[gsorted[:, 1]] - X[gsorted[:, 0]],
                        X[gsorted[:, 2]] - X[gsorted[:, 0]]], axis=1)
        for j in range(nd):
            if kinds[j] != 1 or ents[j] != f:
                continue
            p, s = int(subs[j]), int(tslots[j])
            i, jj, l = lat[p]
            # canonical lattice coords: weight of sorted-global vertex r
            trip = np.zeros((ne, 3), dtype=np.int64)
            np.put_along_axis(
                trip, ranks,
                np.broadcast_to(np.array([i, jj, l]), (ne, 3)), axis=-1)
            code = (trip[:, 0] * (k + 2) + trip[:, 1]) * (k + 2) + trip[:, 2]
            can_p = np.array([enc[c] for c in code.tolist()], dtype=np.int64)
            base = face_base + fid[:, f] * (npf * 2) + can_p * 2
            # local tangent s: from rank of local vert a to rank of b/c
            r_from = ranks[:, 0]
            r_to = ranks[:, 1 + s]
            w = _FACE_TAN_COEF[r_from, r_to]  # [ne, 2]
            elem_dofs[:, j] = base + s
            mixI[:, j, 0] = base
            mixI[:, j, 1] = base + 1
            mixW[:, j, :] = w
            tau[:, j, :] = t12[:, s, :]

    # interior dofs
    for j in range(nd):
        if kinds[j] != 2:
            continue
        p, s = int(subs[j]), int(tslots[j])
        gid = int_base + np.arange(ne, dtype=np.int64) * (nint_pts * 3) \
            + p * 3 + s
        elem_dofs[:, j] = gid
        mixI[:, j, 0] = gid
        mixI[:, j, 1] = gid
        mixW[:, j, 0] = 1.0
        tau[:, j, s] = 1.0

    # PEC boundary dofs: edge + face dofs of boundary faces
    bdr = np.zeros(ndof, dtype=bool)
    if len(mesh.bdr_faces):
        bf = np.sort(np.asarray(mesh.bdr_faces, dtype=np.int64), axis=-1)
        bfkey = (bf[:, 0] * np.int64(nv) + bf[:, 1]) * np.int64(nv) + bf[:, 2]
        pos = np.clip(np.searchsorted(uniq_fkeys, bfkey), 0, nface - 1)
        for fidx in np.unique(pos[uniq_fkeys[pos] == bfkey]):
            base = face_base + fidx * (npf * 2)
            bdr[base:base + npf * 2] = True
        # edges of boundary faces
        b0 = bf
        b1 = np.roll(bf, -1, axis=1)
        bek = (np.minimum(b0, b1) * np.int64(nv)
               + np.maximum(b0, b1)).reshape(-1)
        pos = np.clip(np.searchsorted(uniq_ekeys, bek), 0, nedge - 1)
        hit = uniq_ekeys[pos] == bek
        for eidx in np.unique(pos[hit]):
            bdr[eidx * k:(eidx + 1) * k] = True
    bdr_dofs = np.where(bdr)[0].astype(np.int64)

    mult = np.bincount(elem_dofs.reshape(-1), minlength=ndof).astype(float)
    return elem_dofs, mixI, mixW, tau, ndof, bdr_dofs, mult


def _build_hcurl_tet_k(mesh, order, quad_order):
    from ..mesh.reference_element import ReferenceElement

    (exps, Cn, ref_dof_pts, ref_dirs, kinds, _e, _s, tslots) = \
        _tet_nedelec_k_ref(order)
    elem_dofs, mixI, mixW, tau, ndof, bdr_dofs, mult = \
        _number_hcurl_tet_k(mesh, order)

    ref_q = ReferenceElement(geom="tet", order=1, basis="gauss-lobatto")
    deg = max(2 * quad_order, 2 * order + 2)
    pts, wq = ref_q.volume_quadrature(deg)
    W, Cw = _tet_nedelec_k_basis(order, pts)

    dN = ref_q.eval_geom_basis_grad(pts)
    Ngeo = ref_q.eval_geom_basis(pts)
    ev = mesh.vertices[mesh.elements]  # [ne, 4, 3]
    J = np.einsum("nvi,qvj->nqij", ev, dN)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)
    xyz_q = np.einsum("qv,nvi->nqi", Ngeo, ev)

    # per-element discrete-gradient block for the AMS auxiliary space:
    # (G p)_slot = grad(p) . tau_canonical = sum_v p_v (J^{-T} grad
    # lambda_v) . tau  (affine tets: constant J); tangential derivatives
    # of a continuous p agree between the sharing elements, so the
    # mult-averaged assembly is exact
    gradphi = np.einsum("nji,vj->nvi", Jinv[:, 0], _TET_GRAD_L)  # [ne, 4, 3]
    Gref = np.einsum("nvi,ndi->ndv", gradphi, tau)  # [ne, nd, 4]

    return HCurlTables(
        dim=3, ne=mesh.num_elements, nedge=ndof, elem_edges=elem_dofs,
        edge_sign=np.ones_like(mixW[..., 0]), W=W, Cw=Cw, wq=wq, Jinv=Jinv,
        Jmat=J, detJ=detJ, xyz_q=xyz_q, bdr_edges=bdr_dofs, edge_verts=None,
        ref_pts=pts, order=order, dof_dirs=tslots, ref_dof_pts=ref_dof_pts,
        Gref=Gref, tau_dof=tau, dof_mult=np.maximum(mult, 1.0),
        mixI=mixI, mixW=mixW,
    )


def build_hcurl(mesh, quad_order=3, order=1) -> HCurlTables:
    """Nedelec H(curl) tables on hex OR tet meshes (reference:
    ND_FECollection(order, dim) accepts any order and 3-D element type,
    src/quasimagnetostatic.cpp:170; the rings/coupled-3d cases are Gmsh
    tet meshes).  order=1 is the Whitney edge space on either geometry;
    order>=2 is the interpolatory Nedelec-I(k) family on hexes
    (geometric dof matching — see _number_hcurl_dofs_k) and on tets
    (canonical functionals + mixing tables — see _number_hcurl_tet_k)."""
    from ..mesh.reference_element import ReferenceElement

    if mesh.dim != 3:
        raise ValueError("H(curl) tables require a 3-D (hex or tet) mesh")
    is_tet = mesh.geom == "tet"
    if order > 1:
        if is_tet:
            return _build_hcurl_tet_k(mesh, order, quad_order)
        return _build_hcurl_hex_k(mesh, order, quad_order)
    local_edges = _TET_EDGES if is_tet else _HEX_EDGES
    nedloc = len(local_edges)
    ne = mesh.num_elements
    elems = mesh.elements  # [ne, 8] or [ne, 4]

    # global edges by sorted vertex pair (periodic meshes: vertex ids are
    # already glued by the mesh generator's periodic mapping if any);
    # vectorized: encode each pair as one int64 key and np.unique
    epairs = elems[:, np.asarray(local_edges, dtype=np.int64)]
    g0 = epairs[..., 0]
    g1 = epairs[..., 1]
    nv = int(elems.max()) + 1
    ekey = (np.minimum(g0, g1) * np.int64(nv)
            + np.maximum(g0, g1)).reshape(-1)
    uniq_keys, elem_edges = np.unique(ekey, return_inverse=True)
    elem_edges = elem_edges.reshape(ne, nedloc).astype(np.int64)
    edge_sign = np.where(g0 < g1, 1.0, -1.0)
    nedge = int(elem_edges.max()) + 1

    # quadrature + geometry
    if is_tet:
        ref_q = ReferenceElement(geom="tet", order=1, basis="gauss-lobatto")
        pts, wq = ref_q.volume_quadrature(2 * quad_order)
        W, Cw = _tet_edge_basis_at(pts)
    else:
        x1, w1 = gauss_legendre_1d(quad_order)
        X, Y, Z = np.meshgrid(x1, x1, x1, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
        wq = np.einsum("i,j,k->ijk", w1, w1, w1).ravel()
        W, Cw = _edge_basis_at(pts)

    ref = ReferenceElement(geom=mesh.geom, order=1, basis="gauss-lobatto")
    dN = ref.eval_geom_basis_grad(pts)  # [nq, nverts, 3]
    Ngeo = ref.eval_geom_basis(pts)  # [nq, nverts]
    ev = mesh.vertices[elems]  # [ne, nverts, 3]
    J = np.einsum("nvi,qvj->nqij", ev, dN)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)
    xyz_q = np.einsum("qv,nvi->nqi", Ngeo, ev)

    # boundary edges: edges of boundary faces (vectorized key lookup;
    # unique keys are sorted, so the searchsorted position IS the edge id)
    if len(mesh.bdr_faces):
        bf = np.asarray(mesh.bdr_faces, dtype=np.int64)  # [nbf, 4]
        b0 = bf
        b1 = np.roll(bf, -1, axis=1)
        bkeys = (np.minimum(b0, b1) * np.int64(nv)
                 + np.maximum(b0, b1)).reshape(-1)
        pos = np.searchsorted(uniq_keys, bkeys)
        pos = np.clip(pos, 0, len(uniq_keys) - 1)
        hit = uniq_keys[pos] == bkeys
        bdr_edges = np.unique(pos[hit]).astype(np.int64)
    else:
        bdr_edges = np.zeros(0, dtype=np.int64)

    # edge endpoints (lo, hi): the global edge orientation is lo -> hi, so
    # the discrete gradient is (G phi)_e = phi[hi] - phi[lo]
    edge_verts = np.stack(
        [uniq_keys // np.int64(nv), uniq_keys % np.int64(nv)], axis=-1
    ).astype(np.int64)

    return HCurlTables(
        dim=3, ne=ne, nedge=nedge, elem_edges=elem_edges,
        edge_sign=edge_sign, W=W, Cw=Cw, wq=wq, Jinv=Jinv, Jmat=J,
        detJ=detJ, xyz_q=xyz_q, bdr_edges=bdr_edges, edge_verts=edge_verts,
        ref_pts=pts,
    )


def _build_hcurl_hex_k(mesh, order, quad_order):
    from ..mesh.reference_element import ReferenceElement

    ref_dof_pts, dirs = _hex_nedelec_k_dofs(order)
    elem_dofs, dof_sign, ndof, bdr_dofs, _X, tau = _number_hcurl_dofs_k(
        mesh, ref_dof_pts, dirs
    )

    qo = max(quad_order, order + 2)
    x1, w1 = gauss_legendre_1d(qo)
    Xq, Yq, Zq = np.meshgrid(x1, x1, x1, indexing="ij")
    pts = np.stack([Xq.ravel(), Yq.ravel(), Zq.ravel()], axis=-1)
    wq = np.einsum("i,j,k->ijk", w1, w1, w1).ravel()
    W, Cw = _hex_nedelec_k_basis(order, pts)

    ref = ReferenceElement(geom="hex", order=1, basis="gauss-lobatto")
    dN = ref.eval_geom_basis_grad(pts)
    Ngeo = ref.eval_geom_basis(pts)
    ev = mesh.vertices[mesh.elements]
    J = np.einsum("nvi,qvj->nqij", ev, dN)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)
    xyz_q = np.einsum("qv,nvi->nqi", Ngeo, ev)

    # discrete-gradient reference block for the AMS auxiliary space:
    # (G p)_dof = d(p o geomap)/dxi_{dir} at the dof node (the covariant
    # dof of a gradient field is purely a reference-space derivative)
    dNd = ref.eval_geom_basis_grad(ref_dof_pts)  # [ndloc, 8, 3]
    Gref = np.take_along_axis(
        dNd, dirs[:, None, None], axis=2
    )[..., 0]  # [ndloc, 8]

    mult = np.bincount(elem_dofs.reshape(-1), minlength=ndof).astype(float)

    return HCurlTables(
        dim=3, ne=mesh.num_elements, nedge=ndof, elem_edges=elem_dofs,
        edge_sign=dof_sign, W=W, Cw=Cw, wq=wq, Jinv=Jinv, Jmat=J,
        detJ=detJ, xyz_q=xyz_q, bdr_edges=bdr_dofs, edge_verts=None,
        ref_pts=pts, order=order, dof_dirs=dirs, ref_dof_pts=ref_dof_pts,
        Gref=Gref, tau_dof=tau, dof_mult=mult,
    )


# -- operators (jax) --------------------------------------------------------

def gather(tab, x):
    """x [nedge] -> [ne, ndloc] local dofs (signed, or 2-slot mixed for
    tet k >= 2 where face dofs change tangent basis per element)."""
    if getattr(tab, "mixI", None) is not None:
        return (x[tab.mixI] * tab.mixW).sum(-1)
    return x[tab.elem_edges] * tab.edge_sign


def scatter_add(tab, xl):
    """[ne, nedloc] local values -> [nedge] assembly (adjoint of gather)."""
    import jax.numpy as jnp
    from jax.ops import segment_sum

    if tab.elem_valid is not None:
        xl = xl * tab.elem_valid[:, None]
    if getattr(tab, "mixI", None) is not None:
        return segment_sum(
            (xl[..., None] * tab.mixW).reshape(-1),
            tab.mixI.reshape(-1),
            num_segments=tab.nedge,
        )
    return segment_sum(
        (xl * tab.edge_sign).reshape(-1),
        tab.elem_edges.reshape(-1),
        num_segments=tab.nedge,
    )


def field_at_quad(tab, x):
    """Physical vector field at quadrature points: [ne, nq, 3]."""
    import jax.numpy as jnp

    xl = gather(tab, x)  # [ne, 12]
    Aref = jnp.einsum("qed,ne->nqd", tab.W, xl)
    return jnp.einsum("nqji,nqj->nqi", tab.Jinv, Aref)  # J^{-T} A_ref


def curl_at_quad(tab, x):
    """curl of the field at quadrature points: [ne, nq, 3]."""
    import jax.numpy as jnp

    xl = gather(tab, x)
    Cref = jnp.einsum("qed,ne->nqd", tab.Cw, xl)
    return jnp.einsum("nqij,nqj->nqi", tab.Jmat, Cref) / tab.detJ[..., None]


def mass_apply(tab, x, coef=None):
    """y_i = int coef W_i . W_j x_j (coef given at quad points or None)."""
    if _sharded(tab):
        return tab.run_coef(mass_apply, x, coef)
    import jax.numpy as jnp

    Aq = field_at_quad(tab, x)
    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Zq = Aq * w[..., None]
    # test functions: (J^{-T} W_e) . Zq
    Wphys = jnp.einsum("nqji,qej->nqei", tab.Jinv, tab.W)
    yl = jnp.einsum("nqei,nqi->ne", Wphys, Zq)
    return scatter_add(tab, yl)


def curlcurl_apply(tab, x, coef=None):
    """y_i = int coef curl W_i . curl W_j x_j."""
    if _sharded(tab):
        return tab.run_coef(curlcurl_apply, x, coef)
    import jax.numpy as jnp

    Cq = curl_at_quad(tab, x)
    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Zq = Cq * w[..., None]
    Cphys = jnp.einsum("nqij,qej->nqei", tab.Jmat, tab.Cw) / tab.detJ[..., None, None]
    yl = jnp.einsum("nqei,nqi->ne", Cphys, Zq)
    return scatter_add(tab, yl)


def rhs_vector(tab, Jsrc_q):
    """b_i = int W_i . J_src with J_src given at quad points [ne, nq, 3]."""
    if _sharded(tab):
        return tab.run_coef(lambda tl, cc: rhs_vector(tl, cc), None, Jsrc_q)
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    Zq = Jsrc_q * w[..., None]
    Wphys = jnp.einsum("nqji,qej->nqei", tab.Jinv, tab.W)
    yl = jnp.einsum("nqei,nqi->ne", Wphys, Zq)
    return scatter_add(tab, yl)


def element_mass(tab, coef=None):
    """Element mass matrices (W_i, c W_j) [ne, ndloc, ndloc] in the
    LOCAL (unsigned) basis; combine with assemble_dense.  Full f32
    products (see fem/h1.py element_mass for why bf16 defaults break
    factorizations)."""
    import jax
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Wphys = jnp.einsum("nqji,qej->nqei", tab.Jinv, tab.W)
    return jnp.einsum("nq,nqei,nqfi->nef", w, Wphys, Wphys,
                      precision=jax.lax.Precision.HIGHEST)


def element_curlcurl(tab, coef=None):
    """Element curl-curl matrices (curl W_i, c curl W_j)."""
    import jax
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Cphys = jnp.einsum("nqij,qej->nqei", tab.Jmat, tab.Cw) \
        / tab.detJ[..., None, None]
    return jnp.einsum("nq,nqei,nqfi->nef", w, Cphys, Cphys,
                      precision=jax.lax.Precision.HIGHEST)


def assemble_dense(tab, Ke):
    """Element matrices [ne, ndloc, ndloc] -> dense [nedge, nedge],
    applying the edge-sign (or 2-slot mixed-weight) local->global map
    on both indices — the dense analog of scatter_add(gather(.))."""
    import jax.numpy as jnp
    import numpy as np_

    if tab.elem_valid is not None:
        Ke = Ke * tab.elem_valid[:, None, None]
    if getattr(tab, "mixI", None) is not None:
        I2 = np_.asarray(tab.mixI)       # [ne, ndloc, S]
        W2 = jnp.asarray(tab.mixW)
    else:
        I2 = np_.asarray(tab.elem_edges)[:, :, None]
        W2 = jnp.asarray(tab.edge_sign)[:, :, None]
    ne, ndloc, S = I2.shape
    Ke_exp = jnp.einsum("nis,njt,nij->nisjt", W2, W2, Ke).reshape(
        ne, ndloc * S, ndloc * S)
    Ifl = I2.reshape(ne, ndloc * S)
    ii = jnp.asarray(np_.broadcast_to(
        Ifl[:, :, None], Ke_exp.shape).reshape(-1))
    jj = jnp.asarray(np_.broadcast_to(
        Ifl[:, None, :], Ke_exp.shape).reshape(-1))
    return jnp.zeros((tab.nedge, tab.nedge), Ke.dtype).at[ii, jj].add(
        Ke_exp.reshape(-1))


def mass_diag(tab, coef=None):
    if _sharded(tab):
        return tab.run_coef(mass_diag, None, coef) if coef is not None \
            else tab.run(mass_diag)
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Wphys = jnp.einsum("nqji,qej->nqei", tab.Jinv, tab.W)
    dl = jnp.einsum("nq,nqei,nqei->ne", w, Wphys, Wphys)
    return scatter_add_unsigned(tab, dl)


def curlcurl_diag(tab, coef=None):
    if _sharded(tab):
        return tab.run_coef(curlcurl_diag, None, coef) if coef is not None \
            else tab.run(curlcurl_diag)
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    if coef is not None:
        w = w * coef
    Cphys = jnp.einsum("nqij,qej->nqei", tab.Jmat, tab.Cw) / tab.detJ[..., None, None]
    dl = jnp.einsum("nq,nqei,nqei->ne", w, Cphys, Cphys)
    return scatter_add_unsigned(tab, dl)


def scatter_add_unsigned(tab, xl):
    """Diagonal-style assembly: global_g += sum over local copies.  With
    2-slot mixing the exact assembled diagonal has cross terms; the
    sum-of-squares form used here is the positive Jacobi-safe bound."""
    from jax.ops import segment_sum

    if tab.elem_valid is not None:
        xl = xl * tab.elem_valid[:, None]
    if getattr(tab, "mixI", None) is not None:
        return segment_sum(
            (xl[..., None] * tab.mixW**2).reshape(-1),
            tab.mixI.reshape(-1),
            num_segments=tab.nedge,
        )
    return segment_sum(
        xl.reshape(-1), tab.elem_edges.reshape(-1), num_segments=tab.nedge
    )


def integrate(tab, fq):
    """int f dV for f at quadrature points [ne, nq]."""
    if _sharded(tab):
        return tab.run_coef(lambda tl, cc: integrate(tl, cc), None, fq)
    import jax.numpy as jnp

    w = tab.wq[None, :] * tab.detJ
    if tab.elem_valid is not None:
        w = w * tab.elem_valid[:, None]
    return jnp.sum(w * fq)


# --------------------------------------------------------------------------
# Element-sharded H(curl) assembly (em/partitions on the 3-D QMS solver)
#
# Mirrors fem.h1.ShardedH1: edge-dof vectors stay REPLICATED across the
# device mesh while the element assembly loop runs sharded under shard_map
# with a psum reduction (SURVEY.md 2.6 — the reference's EM solve runs
# under MPI like everything else).


class ShardedHCurl:
    """Duck-typed HCurlTables whose assembly ops run element-sharded.

    Per-element diagnostics (field_at_quad/curl_at_quad over the global
    element list) use the retained global tables via `.global_tab`."""

    def __init__(self, tab_np, nparts, dtype, axis="dd", devices=None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh as JaxMesh

        self.axis = axis
        self.nparts = nparts
        gj = tab_np.to_jax(dtype)
        self.global_tab = gj
        # forwarded global surface (incl. the order-k interpolatory
        # metadata consumed by the HO AMS preconditioner, which acts on
        # the GLOBAL tables — only the Krylov operator applies shard)
        for name in ("dim", "ne", "nedge", "order"):
            setattr(self, name, getattr(tab_np, name))
        for name in ("elem_edges", "edge_sign", "W", "Cw", "wq", "Jinv",
                     "Jmat", "detJ", "xyz_q", "bdr_edges", "edge_verts",
                     "ref_pts", "dof_dirs", "ref_dof_pts", "Gref",
                     "tau_dof", "dof_mult", "mixI", "mixW"):
            setattr(self, name, getattr(gj, name))
        self.elem_valid = None

        ne = tab_np.ne
        part = np.minimum((np.arange(ne) * nparts) // ne, nparts - 1)
        counts = np.bincount(part, minlength=nparts)
        nep = int(counts.max())
        nedloc = tab_np.elem_edges.shape[1]

        def z(shape):
            return np.zeros((nparts,) + shape)

        ee = np.zeros((nparts, nep, nedloc), dtype=np.int64)
        es = z((nep, nedloc))
        Ji = z((nep,) + tab_np.Jinv.shape[1:])
        Jm = z((nep,) + tab_np.Jmat.shape[1:])
        dJ = np.ones((nparts, nep) + tab_np.detJ.shape[1:])
        xq = z((nep,) + tab_np.xyz_q.shape[1:])
        valid = np.zeros((nparts, nep))
        eid = np.zeros((nparts, nep), dtype=np.int64)
        has_mix = tab_np.mixI is not None
        if has_mix:
            mI = np.zeros((nparts, nep, nedloc, 2), dtype=np.int64)
            mW = z((nep, nedloc, 2))
        for p in range(nparts):
            ids = np.where(part == p)[0]
            k = len(ids)
            pad = ids[0] if k else 0
            sel = np.concatenate([ids, np.full(nep - k, pad)])
            ee[p] = tab_np.elem_edges[sel]
            es[p] = tab_np.edge_sign[sel]
            Ji[p] = tab_np.Jinv[sel]
            Jm[p] = tab_np.Jmat[sel]
            dJ[p] = tab_np.detJ[sel]
            xq[p] = tab_np.xyz_q[sel]
            eid[p] = sel
            valid[p, :k] = 1.0
            if has_mix:
                mI[p] = tab_np.mixI[sel]
                mW[p] = tab_np.mixW[sel]

        self._elem_ids_stacked = jnp.asarray(eid)
        self._st = {
            "elem_edges": jnp.asarray(ee),
            "edge_sign": jnp.asarray(es, dtype),
            "Jinv": jnp.asarray(Ji, dtype),
            "Jmat": jnp.asarray(Jm, dtype),
            "detJ": jnp.asarray(dJ, dtype),
            "xyz_q": jnp.asarray(xq, dtype),
            "elem_valid": jnp.asarray(valid, dtype),
        }
        if has_mix:
            self._st["mixI"] = jnp.asarray(mI)
            self._st["mixW"] = jnp.asarray(mW, dtype)
        self._has_mix = has_mix
        self._nep = nep

        if devices is not None:
            devs = list(devices)
        else:
            devs = jax.devices()
            if len(devs) < nparts:
                devs = jax.devices("cpu")
        if len(devs) < nparts:
            raise ValueError(f"need {nparts} devices, have {len(devs)}")
        self.jmesh = JaxMesh(np.array(devs[:nparts]), (axis,))

    def _localize(self, st):
        loc = HCurlTables.__new__(HCurlTables)
        loc.dim, loc.ne, loc.nedge = self.dim, self._nep, self.nedge
        loc.W, loc.Cw, loc.wq = self.W, self.Cw, self.wq
        loc.bdr_edges, loc.edge_verts = self.bdr_edges, self.edge_verts
        loc.ref_pts = self.ref_pts
        if not self._has_mix:
            loc.mixI = loc.mixW = None
        for k, v in st.items():
            setattr(loc, k, v[0])
        return loc

    def run(self, op, *args):
        import jax
        from functools import partial as _partial
        from jax.sharding import PartitionSpec as P

        try:
            shard_map = jax.shard_map
        except AttributeError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        st_specs = {k: P(self.axis) for k in self._st}
        in_specs = (st_specs,) + tuple(P() for _ in args)

        @_partial(shard_map, mesh=self.jmesh, in_specs=in_specs,
                  out_specs=P())
        def f(st, *a):
            return jax.lax.psum(op(self._localize(st), *a), self.axis)

        return f(self._st, *args)

    def stack_quad(self, cq):
        """Global quad coefficient [ne, nq(, ...)] -> per-shard stacked."""
        import jax.numpy as jnp

        return jnp.asarray(cq)[self._elem_ids_stacked]

    def run_coef(self, op, x, coef):
        if coef is None:
            return self.run(lambda tl, xx: op(tl, xx), x)
        import jax
        from functools import partial as _partial
        from jax.sharding import PartitionSpec as P

        try:
            shard_map = jax.shard_map
        except AttributeError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        st_specs = {k: P(self.axis) for k in self._st}
        cs = self.stack_quad(coef)
        if x is None:
            @_partial(shard_map, mesh=self.jmesh,
                      in_specs=(st_specs, P(self.axis)), out_specs=P())
            def f0(st, cc):
                return jax.lax.psum(op(self._localize(st), cc[0]), self.axis)

            return f0(self._st, cs)

        @_partial(shard_map, mesh=self.jmesh,
                  in_specs=(st_specs, P(), P(self.axis)), out_specs=P())
        def f(st, xx, cc):
            return jax.lax.psum(op(self._localize(st), xx, cc[0]), self.axis)

        return f(self._st, x, cs)


def _sharded(tab):
    return isinstance(tab, ShardedHCurl)
