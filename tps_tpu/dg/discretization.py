"""DG discretization tables: the static data driving all DG operators.

Setup runs once in numpy on the host and produces dense, element-batched
tables (basis matrices, metric factors, face gather/scatter index maps).
The runtime operators are then pure gather -> pointwise -> matmul pipelines
over these tables, which is the TPU-native replacement for the reference's
precomputed GPU indirection arrays (reference: src/M2ulPhyS.cpp:816-1487,
src/dataStructures.hpp:297-506).

Design notes
------------
* Faces are stored as one array: interior faces first, boundary faces after.
  Side L is the element whose trace ordering defines the face quadrature
  ordering; side R traces are aligned to it with a per-face point permutation
  (computed at setup by physical-coordinate matching, which also handles
  periodic gluing via shift vectors).
* Scatter-back to element residuals is expressed as a *gather*: every
  (element, local face) slot knows which face feeds it, the orientation
  permutation, and its side sign.  This keeps the runtime free of
  scatter-add races and XLA-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import numpy as np

from ..mesh.mesh import FaceInfo, Mesh
from ..mesh.reference_element import ReferenceElement


@dataclass
class DGTables:
    """All static arrays for one single-element-type DG discretization.

    Arrays are numpy float64/int32; convert per-precision with `to_jax`.
    """

    # --- sizes / metadata (static) ---
    dim: int
    order: int
    ne: int
    ndof: int
    nq: int  # volume quadrature points
    nlf: int  # local faces per element
    nqf: int  # quadrature points per face
    nfi: int  # interior faces
    nfb: int  # boundary faces

    # --- volume operators ---
    Bvol: np.ndarray  # [nq, ndof] basis values at volume quad pts
    Gvol: np.ndarray  # [nq, ndof, dim] reference-space gradients
    wq: np.ndarray  # [nq]
    adjJ: np.ndarray  # [ne, nq, dim, dim] adj(J) = detJ * J^{-1}
    detJ: np.ndarray  # [ne, nq]
    Minv: np.ndarray  # [ne, ndof, ndof]
    xyz_dof: np.ndarray  # [ne, ndof, dim]
    delta: np.ndarray  # [ne] element length scale / order (SGS delta)

    # --- trace operator (all local faces stacked: row lf*nqf+q) ---
    Btr: np.ndarray  # [nlf*nqf, ndof]

    # --- face arrays: interior faces [0, nfi), boundary faces [nfi, nft) ---
    f_elem_l: np.ndarray  # [nft]
    f_slot_l: np.ndarray  # [nft] local face id on side L
    f_elem_r: np.ndarray  # [nfi]
    f_slot_r: np.ndarray  # [nfi]
    f_qperm_r: np.ndarray  # [nfi, nqf]: L-ordered point i is R-ordered point qperm[i]
    f_nor: np.ndarray  # [nft, nqf, dim] scaled normal (L->R / outward), |n| = surf jac
    f_wts: np.ndarray  # [nft, nqf] reference face quadrature weights
    f_xyz: np.ndarray  # [nft, nqf, dim]
    f_bdr_attr: np.ndarray  # [nfb]

    # --- element-side scatter-back (gather form) ---
    ef_face: np.ndarray  # [ne, nlf] face index for this slot
    ef_qmap: np.ndarray  # [ne, nlf, nqf] index into the face's L ordering
    ef_sign: np.ndarray  # [ne, nlf] +1.0 if side L else -1.0

    # distance function (wall distance) at dofs; zeros if unused
    distance: np.ndarray | None = None
    # wall distance at face quadrature points (set with `distance` when
    # [flow]/computeDistance is on; the reference threads distance into the
    # face flux kernels too, src/dgNonlinearForm.cpp evalFaceFlux)
    f_dist: np.ndarray | None = None  # [nft, nqf] (legacy/sharded path)
    dist_slot: np.ndarray | None = None  # [ne, nlf, nqf] (per-face path)

    # ---- oriented-trace fast path (gather-friendly face sweep) ----
    # Orientation permutations are baked into extra trace-matrix row blocks
    # ("combos" = (local face, point permutation) pairs) so every face-side
    # quantity is produced directly in the needed quadrature ordering and all
    # runtime gathers are wide row gathers (no take_along_axis / per-point
    # index maps).  n_combo is static; Btr_or is [n_combo*nqf, ndof].
    n_combo: int = 0
    Btr_or: np.ndarray | None = None
    f_combo_r_inL: np.ndarray | None = None  # [nfi] R trace, L ordering
    f_combo_l_inR: np.ndarray | None = None  # [nfi] L trace, R ordering
    f_nor_r: np.ndarray | None = None  # [nfi, nqf, dim] normal in R ordering
    f_wts_r: np.ndarray | None = None  # [nfi, nqf]
    f_xyz_r: np.ndarray | None = None  # [nfi, nqf, dim]
    rad_face_r: np.ndarray | None = None  # [nfi, nqf] (axisymmetric)

    # ---- neighbor-slot formulation (single-gather face sweep) ----
    # Every (element, local face) slot evaluates its own outward flux from
    # (own trace slice, ONE neighbor-trace gather); combos 0..nlf-1 are the
    # identity combos so own traces are a plain slice of the oriented traces.
    nbr_row: np.ndarray | None = None  # [ne, nlf] row into trace-flat array
    # structured-topology roll metadata (static): (grid_shape, ((axis,
    # shift, opp_lf), ...)); when set, the neighbor gather is a grid roll
    roll_info: tuple | None = None
    nor_slot: np.ndarray | None = None  # [ne, nlf, nqf, dim] outward normal
    wts_slot: np.ndarray | None = None  # [ne, nlf, nqf]
    xyz_slot: np.ndarray | None = None  # [ne, nlf, nqf, dim]
    rad_slot: np.ndarray | None = None  # [ne, nlf, nqf] (axisymmetric)
    delta_nbr: np.ndarray | None = None  # [ne, nlf] neighbor length scale
    interior_mask: np.ndarray | None = None  # [ne, nlf] 1 interior, 0 bdr
    bdr_slot: np.ndarray | None = None  # [nfb] flat slot id e*nlf+lf
    nor_wpf: np.ndarray | None = None  # [nlf, ne, nqf*dim] wts(+rad)-folded
    # static per-local-face boundary index (single-device tables only):
    # tuple over lf of (elem_ids, rows_into_nfb) as int tuples.  Lets the
    # boundary gather/scatter run per face buffer instead of stacking all
    # nlf trace buffers into an [ne, nlf, nqf*k] padded array first.
    bdr_by_lf: tuple | None = None

    # ---- axisymmetric fields (None for planar/3D runs) ----
    # radius (x-coordinate) at volume/face quadrature points, and the
    # radius-weighted inverse mass used for the final RHS apply
    # (reference: Me_inv_rad, src/rhs_operator.hpp:105)
    rad_vol: np.ndarray | None = None
    rad_face: np.ndarray | None = None
    Minv_rad: np.ndarray | None = None

    # ---- diagonal inverse mass (set when M is numerically diagonal:
    # affine tensor-product elements with the collocated-exact GL nodal
    # basis).  apply_minv then runs as one lane-dense fused multiply
    # instead of a batched [ndof, ndof] matmul (PERF.md round 3).
    minv_diag: np.ndarray | None = None  # [ne, ndof]
    minv_rad_diag: np.ndarray | None = None  # [ne, ndof]

    # ---- domain-decomposition fields (None on single-device tables) ----
    # When built by parallel.partition.build_sharded_tables, every per-entity
    # array above carries a leading shard axis [P, ...] and these are set:
    own_mask: np.ndarray | None = None  # [.., ne] 1.0 for owned elements
    halo_send_idx: np.ndarray | None = None  # [.., S] local elems to pack
    halo_recv_idx: np.ndarray | None = None  # [.., H] index into [P*S] gathered
    halo_slots: np.ndarray | None = None  # [.., H] local slots receiving halo
    global_ids: np.ndarray | None = None  # [.., ne] global element ids (-1 pad)

    @property
    def nft(self) -> int:
        return self.nfi + self.nfb

    def to_jax(self, dtype):
        """Return a JAX pytree copy with float arrays cast to `dtype`."""
        import jax.numpy as jnp

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
        return DGTables(**out)


def build_ef_tables(ne, nlf, nqf, nfi, nft, f_elem_l, f_slot_l, f_elem_r, f_slot_r,
                    f_qperm_r, allow_unassigned=False):
    """Per-(element, local face) scatter-back maps: owning face, point
    permutation into the face's L ordering, and side sign (+1 L / -1 R).

    Unassigned slots (halo elements under domain decomposition) point at the
    null face index `nft`, which gathers zero flux (see
    operators.face_scatter_gather)."""
    from .. import native as _native

    out = _native.build_ef_tables(
        ne, nlf, nqf, nfi, nft, f_elem_l, f_slot_l, f_elem_r, f_slot_r,
        f_qperm_r, allow_unassigned=allow_unassigned,
    )
    if out is not None:
        return out

    ef_face = np.full((ne, nlf), -1, dtype=np.int32)
    ef_qmap = np.zeros((ne, nlf, nqf), dtype=np.int32)
    ef_sign = np.zeros((ne, nlf))
    identity = np.arange(nqf, dtype=np.int32)
    for fidx in range(nft):
        e, lf = int(f_elem_l[fidx]), int(f_slot_l[fidx])
        if e < 0:
            continue  # padding face
        ef_face[e, lf] = fidx
        ef_qmap[e, lf] = identity
        ef_sign[e, lf] = 1.0
    inv_perm = np.empty(nqf, dtype=np.int32)
    for fidx in range(nfi):
        e, lf = int(f_elem_r[fidx]), int(f_slot_r[fidx])
        if e < 0:
            continue
        ef_face[e, lf] = fidx
        # L-ordered point i lives at R-ordered slot qperm[i]; invert
        inv_perm[f_qperm_r[fidx]] = identity
        ef_qmap[e, lf] = inv_perm.copy()
        ef_sign[e, lf] = -1.0
    if np.any(ef_face < 0):
        if not allow_unassigned:
            raise ValueError("unassigned (element, local face) slot — topology bug")
        ef_face[ef_face < 0] = nft  # null face: zero flux
    return ef_face, ef_qmap, ef_sign


def solve_orientation_baking(nlf, nqf, nfi, f_slot_l, f_slot_r, f_qperm_r):
    """Try to find per-local-face point permutations sigma[lf] such that
    sigma[lfR] = qperm_f o sigma[lfL] for EVERY interior face.

    When such an assignment exists (all structured and consistently-oriented
    tensor meshes), the permutations can be baked into the trace matrix rows,
    making every runtime face pairing the identity: traces shrink from
    n_combo*nqf to nlf*nqf rows and all face sweeps become plain row
    gathers.  Returns a list of nlf permutations, or None when the
    constraint graph is inconsistent (general unstructured orientations)."""
    from collections import deque

    ident = np.arange(nqf, dtype=np.int64)
    adj = [[] for _ in range(nlf)]
    for f in range(nfi):
        a, b = int(f_slot_l[f]), int(f_slot_r[f])
        q = f_qperm_r[f].astype(np.int64)
        adj[a].append((b, q, False))  # sigma_b = q o sigma_a
        adj[b].append((a, q, True))  # sigma_a = q^-1 o sigma_b
    sigma = [None] * nlf
    for start in range(nlf):
        if sigma[start] is not None:
            continue
        sigma[start] = ident.copy()
        dq = deque([start])
        while dq:
            u = dq.popleft()
            for v, q, invflag in adj[u]:
                if invflag:
                    qi = np.empty(nqf, np.int64)
                    qi[q] = ident
                    cand = qi[sigma[u]]
                else:
                    cand = q[sigma[u]]
                if sigma[v] is None:
                    sigma[v] = cand
                    dq.append(v)
                elif not np.array_equal(sigma[v], cand):
                    return None
    return sigma


def build_oriented_tables(Btr, nlf, nqf, dim, nfi, nft, f_slot_l, f_slot_r,
                          f_qperm_r, f_nor, f_wts, f_xyz, rad_face=None):
    """Build the oriented-trace face tables (see DGTables docstring).

    Each face side is served by a "combo" = (local face, point permutation)
    trace-row block, so runtime face sweeps are wide row gathers only."""
    # unique permutations across faces (identity always present)
    identity = tuple(range(nqf))
    perm_ids = {identity: 0}
    perms = [identity]
    f_perm = np.zeros(nfi, dtype=np.int64)
    f_iperm = np.zeros(nfi, dtype=np.int64)
    inv = np.empty(nqf, dtype=np.int64)
    for f in range(nfi):
        p = tuple(int(x) for x in f_qperm_r[f])
        if p not in perm_ids:
            perm_ids[p] = len(perms)
            perms.append(p)
        f_perm[f] = perm_ids[p]
        inv[list(p)] = np.arange(nqf)
        ip = tuple(int(x) for x in inv)
        if ip not in perm_ids:
            perm_ids[ip] = len(perms)
            perms.append(ip)
        f_iperm[f] = perm_ids[ip]

    # combos actually used; identity combos first so own-side traces are a
    # plain slice of the oriented trace array (neighbor-slot formulation)
    combo_ids = {}
    combo_list = []

    def combo(lf, pid):
        key = (int(lf), int(pid))
        if key not in combo_ids:
            combo_ids[key] = len(combo_list)
            combo_list.append(key)
        return combo_ids[key]

    for lf in range(nlf):
        combo(lf, 0)

    f_combo_r_inL = np.array(
        [combo(f_slot_r[f], f_perm[f]) for f in range(nfi)], np.int32)
    f_combo_l_inR = np.array(
        [combo(f_slot_l[f], f_iperm[f]) for f in range(nfi)], np.int32)

    n_combo = len(combo_list)
    Btr_or = np.zeros((n_combo * nqf, Btr.shape[1]))
    for c, (lf, pid) in enumerate(combo_list):
        p = perms[pid]
        for j in range(nqf):
            Btr_or[c * nqf + j] = Btr[lf * nqf + p[j]]

    # R-ordered geometric face data: value at R-ordered point j equals the
    # L-ordered value at invperm[j]
    f_nor_r = np.zeros((nfi, nqf, dim))
    f_wts_r = np.zeros((nfi, nqf))
    f_xyz_r = np.zeros((nfi, nqf, dim))
    rad_face_r = np.zeros((nfi, nqf)) if rad_face is not None else None
    for f in range(nfi):
        ip = np.asarray(perms[f_iperm[f]])
        f_nor_r[f] = f_nor[f][ip]
        f_wts_r[f] = f_wts[f][ip]
        f_xyz_r[f] = f_xyz[f][ip]
        if rad_face is not None:
            rad_face_r[f] = rad_face[f][ip]

    return {
        "n_combo": n_combo,
        "Btr_or": Btr_or,
        "f_combo_r_inL": f_combo_r_inL,
        "f_combo_l_inR": f_combo_l_inR,
        "f_nor_r": f_nor_r,
        "f_wts_r": f_wts_r,
        "f_xyz_r": f_xyz_r,
        "rad_face_r": rad_face_r,
    }


def build_slot_tables(oriented, ne, nlf, nqf, dim, nfi, nft,
                      f_elem_l, f_slot_l, f_elem_r, f_slot_r,
                      f_nor, f_wts, f_xyz, delta, rad_face=None):
    """Neighbor-slot tables: one gather serves the whole face sweep.

    For slot (e, lf) on side L of face f the neighbor row is elemR with
    combo (lfR, perm) [R data in L ordering]; on side R it is elemL with
    combo (lfL, invperm) [L data in R ordering].  Geometry is stored per
    slot in the slot's own ordering with OUTWARD normals."""
    n_combo = oriented["n_combo"]
    f_combo_r_inL = oriented["f_combo_r_inL"]
    f_combo_l_inR = oriented["f_combo_l_inR"]
    f_nor_r = oriented["f_nor_r"]
    f_wts_r = oriented["f_wts_r"]
    f_xyz_r = oriented["f_xyz_r"]
    rad_face_r = oriented["rad_face_r"]

    nbr_row = np.zeros((ne, nlf), dtype=np.int32)
    # unassigned slots (halo/padding elements under domain decomposition)
    # keep a safe unit normal and zero weight: any flux evaluated there is
    # finite and integrates to zero
    nor_slot = np.zeros((ne, nlf, nqf, dim))
    nor_slot[..., 0] = 1.0
    wts_slot = np.zeros((ne, nlf, nqf))
    xyz_slot = np.zeros((ne, nlf, nqf, dim))
    rad_slot = np.zeros((ne, nlf, nqf)) if rad_face is not None else None
    delta_nbr = np.ones((ne, nlf))
    interior_mask = np.zeros((ne, nlf))
    # padded boundary faces (sharded tables) point at the out-of-range
    # sentinel and are dropped by the runtime scatter
    bdr_slot = np.full(nft - nfi, ne * nlf, dtype=np.int32)

    for f in range(nft):
        e, lf = int(f_elem_l[f]), int(f_slot_l[f])
        if e < 0:
            continue
        if f < nfi:
            er = int(f_elem_r[f])
            nbr_row[e, lf] = er * n_combo + int(f_combo_r_inL[f])
            interior_mask[e, lf] = 1.0
            delta_nbr[e, lf] = delta[er]
        else:
            # boundary: zero jump against own data; BC overrides the flux
            nbr_row[e, lf] = e * n_combo + lf  # identity combo == lf
            delta_nbr[e, lf] = delta[e]
            bdr_slot[f - nfi] = e * nlf + lf
        nor_slot[e, lf] = f_nor[f]
        wts_slot[e, lf] = f_wts[f]
        xyz_slot[e, lf] = f_xyz[f]
        if rad_face is not None:
            rad_slot[e, lf] = rad_face[f]

    for f in range(nfi):
        e, lf = int(f_elem_r[f]), int(f_slot_r[f])
        el = int(f_elem_l[f])
        if e < 0:
            continue
        nbr_row[e, lf] = el * n_combo + int(f_combo_l_inR[f])
        interior_mask[e, lf] = 1.0
        delta_nbr[e, lf] = delta[el]
        nor_slot[e, lf] = -f_nor_r[f]  # outward for the R side
        wts_slot[e, lf] = f_wts_r[f]
        xyz_slot[e, lf] = f_xyz_r[f]
        if rad_face is not None:
            rad_slot[e, lf] = rad_face_r[f]

    # per-face fused weighted normals (weights x radius folded in): the
    # face sweep's only geometry read, [nlf, ne, nqf*dim] so the per-face
    # slice is free and the minor dim stays dense
    w_eff = wts_slot * rad_slot if rad_slot is not None else wts_slot
    nor_wpf = np.ascontiguousarray(
        np.transpose(nor_slot * w_eff[..., None], (1, 0, 2, 3))
    ).reshape(nlf, ne, nqf * dim)

    sl = np.asarray(bdr_slot)
    bdr_by_lf = tuple(
        (
            tuple(int(e) for e in (sl[sl % nlf == lf] // nlf)),
            tuple(int(r) for r in np.where(sl % nlf == lf)[0]),
        )
        for lf in range(nlf)
    )
    return {
        "nbr_row": nbr_row,
        "nor_slot": nor_slot,
        "wts_slot": wts_slot,
        "xyz_slot": xyz_slot,
        "rad_slot": rad_slot,
        "delta_nbr": delta_nbr,
        "interior_mask": interior_mask,
        "bdr_slot": bdr_slot,
        "nor_wpf": nor_wpf,
        "bdr_by_lf": bdr_by_lf,
    }


def _register_dgtables_pytree():
    import jax

    meta = ["dim", "order", "ne", "ndof", "nq", "nlf", "nqf", "nfi", "nfb",
            "n_combo", "roll_info", "bdr_by_lf"]
    data = [f.name for f in fields(DGTables) if f.name not in meta]
    jax.tree_util.register_dataclass(DGTables, data_fields=data, meta_fields=meta)


_register_dgtables_pytree()


def detect_roll_topology(grid_shape, nlf, n_combo, nbr_row, interior_mask):
    """If every local face's neighbor map is a uniform grid roll (the
    generators' C-order element grids), return (grid_shape, ((axis, shift,
    opp_lf) per lf)); else None.  Verified numerically against nbr_row, so
    the hint can never produce wrong results."""
    if grid_shape is None:
        return None
    grid_shape = tuple(int(g) for g in grid_shape)
    ne = int(np.prod(grid_shape))
    if nbr_row.shape[0] != ne:
        return None
    eid = np.arange(ne).reshape(grid_shape)
    gdim = len(grid_shape)
    info = []
    for lf in range(nlf):
        mask = interior_mask[:, lf] > 0.5
        if not mask.any():
            return None
        found = None
        for axis in range(gdim):
            for shift in (-1, 1):
                er = np.roll(eid, shift, axis=axis).reshape(-1)
                for opp in range(nlf):
                    if np.array_equal(
                        (er * n_combo + opp)[mask], nbr_row[mask, lf]
                    ):
                        found = (axis, shift, opp)
                        break
                if found:
                    break
            if found:
                break
        if found is None:
            return None
        info.append(found)
    return (grid_shape, tuple(info))


def extract_diag(Minv, rtol=1e-10):
    """The diagonal of a batched matrix when it is numerically diagonal,
    else None.  The DG mass matrix is exactly diagonal for affine
    tensor-product elements with the nodal GL basis (the collocated
    quadrature is exact for the degree-2p integrand), which covers every
    generated/structured mesh; curved, sheared, and simplex elements fall
    back to the full batched inverse."""
    d = np.einsum("nii->ni", Minv)
    off = Minv - d[:, :, None] * np.eye(Minv.shape[-1])
    if np.max(np.abs(off)) <= rtol * np.max(np.abs(d)):
        return np.ascontiguousarray(d)
    return None


def mesh_orderw(mesh: Mesh) -> int:
    """Polynomial order of det(J) of the element mapping, matching MFEM's
    IsoparametricTransformation::OrderW (Qk: k*dim-1; Pk: (k-1)*dim).  The
    reference sizes its face quadrature as OrderW + 2p (+1 for simplices),
    mirroring DGTraceIntegrator — see src/face_integrator.cpp:233-243,
    src/M2ulPhyS.cpp:965-975."""
    k = mesh.curved_order if mesh.curved_nodes is not None else 1
    if mesh.geom in ("tri", "tet"):
        return (k - 1) * mesh.dim
    return k * mesh.dim - 1


def build_tables(
    mesh: Mesh,
    order: int,
    basis: str = "gauss-legendre",
    quad_rule: str = "gauss-legendre",
    vol_quad_order: int | None = None,
    face_quad_order: int | None = None,
    mass_quad_order: int | None = None,
    faces: FaceInfo | None = None,
    axisymmetric: bool = False,
) -> DGTables:
    """Build all DG tables for a mesh (single element type).

    `quad_rule` selects the 1-D quadrature family for tensor geometries
    (the reference's flow/integrationRule: 0 = gauss-legendre,
    1 = gauss-lobatto, src/M2ulPhyS.cpp:557-561).  Default integration
    orders follow the reference exactly: volume 2p
    (src/domain_integrator.cpp:69), mass 2p (src/rhs_operator.cpp:181),
    faces OrderW + 2p (+1 for simplices, src/face_integrator.cpp:233-243).
    """
    ref = ReferenceElement(geom=mesh.geom, order=order, basis=basis)
    dim = ref.dim
    ne = mesh.num_elements
    ndof = ref.ndof
    nlf = ref.nfaces

    if vol_quad_order is None:
        vol_quad_order = 2 * order  # reference: src/domain_integrator.cpp:69
    if face_quad_order is None:
        face_quad_order = mesh_orderw(mesh) + 2 * order
        if mesh.geom in ("tri", "tet"):
            face_quad_order += 1  # FunctionSpace::Pk bump
    if mass_quad_order is None:
        mass_quad_order = 2 * order  # reference: src/rhs_operator.cpp:181

    # ---- volume quadrature on the reference element ----
    vol_pts, wq = ref.volume_quadrature(vol_quad_order, quad_rule)
    nq = vol_pts.shape[0]

    Bvol = ref.eval_basis(vol_pts)  # [nq, ndof]
    Gvol = ref.eval_basis_grad(vol_pts)  # [nq, ndof, dim]

    # ---- geometry: Jacobians at volume quad points ----
    # geometry evaluators: straight (vertex bi/tri-linear) or curved
    # (isoparametric Lagrange nodes on the element)
    if mesh.curved_nodes is not None:
        gref = ReferenceElement(geom=mesh.geom, order=mesh.curved_order,
                                basis="gauss-lobatto")
        elem_verts = mesh.curved_nodes  # [ne, ngeo, dim]
        geo_eval = gref.eval_basis
        geo_grad = gref.eval_basis_grad
    else:
        elem_verts = mesh.vertices[mesh.elements]  # [ne, nverts, dim]
        geo_eval = ref.eval_geom_basis
        geo_grad = ref.eval_geom_basis_grad
    dN = geo_grad(vol_pts)  # [nq, ngeo, dim]
    # J[n, q, i, j] = d x_i / d xi_j
    J = np.einsum("nvi,qvj->nqij", elem_verts, dN)
    detJ = np.linalg.det(J)
    if np.any(detJ <= 0):
        raise ValueError("non-positive element Jacobians; check orientation")
    Jinv = np.linalg.inv(J)
    adjJ = detJ[..., None, None] * Jinv

    # ---- mass matrices (reference: MassIntegrator at 2p from the intRules
    # family, src/rhs_operator.cpp:179-185; exact for affine elements,
    # deliberately underintegrated for curved ones as the reference is) ----
    m_pts, wm = ref.volume_quadrature(mass_quad_order, quad_rule)
    Bm = ref.eval_basis(m_pts)
    dNm = geo_grad(m_pts)
    Jm = np.einsum("nvi,qvj->nqij", elem_verts, dNm)
    detJm = np.linalg.det(Jm)
    # M[n,i,j] = sum_q w_q B[q,i] B[q,j] detJ[n,q]
    M = np.einsum("q,qi,qj,nq->nij", wm, Bm, Bm, detJm)
    Minv = np.linalg.inv(M)
    minv_diag = extract_diag(Minv)
    Minv_rad = None
    minv_rad_diag = None
    if axisymmetric:
        Nm = geo_eval(m_pts)
        rm = np.einsum("qv,nv->nq", Nm, elem_verts[..., 0])
        M_rad = np.einsum("q,qi,qj,nq,nq->nij", wm, Bm, Bm, detJm, rm)
        Minv_rad = np.linalg.inv(M_rad)
        minv_rad_diag = extract_diag(Minv_rad)

    # ---- dof coordinates & element size ----
    Ndof = geo_eval(ref.nodes)  # [ndof, ngeo]
    xyz_dof = np.einsum("dv,nvi->ndi", Ndof, elem_verts)
    center = np.full((1, dim), 0.5)
    dNc = geo_grad(center)[0]  # [ngeo, dim]
    Jc = np.einsum("nvi,vj->nij", elem_verts, dNc)
    svals = np.linalg.svd(Jc, compute_uv=False)  # [ne, dim] descending
    delta = svals[:, -1] / max(order, 1)

    # ---- trace operator ----
    fq_pts, fq_w = ref.face_quadrature(face_quad_order, quad_rule)
    nqf = fq_pts.shape[0]
    Btr = np.zeros((nlf * nqf, ndof))
    face_ref = np.zeros((nlf, nqf, dim))
    for lf in range(nlf):
        rc = ref.face_ref_coords(lf, fq_pts)
        face_ref[lf] = rc
        Btr[lf * nqf : (lf + 1) * nqf] = ref.eval_basis(rc)

    # physical coords of face quad points for every (elem, local face)
    Ngf = np.stack([geo_eval(face_ref[lf]) for lf in range(nlf)])  # [nlf,nqf,ngeo]
    # [ne, nlf, nqf, dim]
    fq_xyz_all = np.einsum("lqv,nvi->nlqi", Ngf, elem_verts)

    # face normals (scaled by surface jacobian) for every (elem, lf), outward
    elem_centers = elem_verts.mean(axis=1)  # [ne, dim]
    nor_all = np.zeros((ne, nlf, nqf, dim))
    for lf in range(nlf):
        tang_ref = ref.face_ref_tangents(lf, fq_pts)  # [nqf, dim, dim-1]
        dNf = geo_grad(face_ref[lf])  # [nqf, ngeo, dim]
        Jf = np.einsum("nvi,qvj->nqij", elem_verts, dNf)  # [ne,nqf,dim,dim]
        # physical tangents: Jf @ tang_ref
        tph = np.einsum("nqij,qjk->nqik", Jf, tang_ref)  # [ne,nqf,dim,dim-1]
        if dim == 2:
            tx = tph[..., 0, 0]
            ty = tph[..., 1, 0]
            nor = np.stack([ty, -tx], axis=-1)
        else:
            nor = np.cross(tph[..., 0], tph[..., 1])
        # orient outward from the element
        outward = fq_xyz_all[:, lf].mean(axis=1) - elem_centers  # [ne, dim]
        sgn = np.sign(np.einsum("nqi,ni->n", nor, outward))
        sgn[sgn == 0] = 1.0
        nor_all[:, lf] = nor * sgn[:, None, None]

    # ---- face topology ----
    if faces is None:
        faces = mesh.build_faces()
    # sort boundary faces by attribute so each BC patch is a static slice
    if len(faces.bdr_elem):
        bsort = np.argsort(faces.bdr_attr, kind="stable")
        faces.bdr_elem = faces.bdr_elem[bsort]
        faces.bdr_lf = faces.bdr_lf[bsort]
        faces.bdr_attr = faces.bdr_attr[bsort]
    nfi = len(faces.int_elem_l)
    nfb = len(faces.bdr_elem)
    nft = nfi + nfb

    f_elem_l = np.concatenate([faces.int_elem_l, faces.bdr_elem]).astype(np.int32)
    f_slot_l = np.concatenate([faces.int_lf_l, faces.bdr_lf]).astype(np.int32)
    f_elem_r = faces.int_elem_r.astype(np.int32)
    f_slot_r = faces.int_lf_r.astype(np.int32)
    f_bdr_attr = faces.bdr_attr.astype(np.int32)

    f_nor = nor_all[f_elem_l, f_slot_l]  # [nft, nqf, dim] in L ordering
    f_xyz = fq_xyz_all[f_elem_l, f_slot_l]
    f_wts = np.broadcast_to(fq_w, (nft, nqf)).copy()

    # ---- R-side point permutations by coordinate matching ----
    f_qperm_r = np.zeros((nfi, nqf), dtype=np.int32)
    if nfi:
        xl = f_xyz[:nfi] + faces.int_shift[:, None, :]  # L coords shifted to R frame
        xr = fq_xyz_all[f_elem_r, f_slot_r]  # [nfi, nqf, dim] R ordering
        from .. import native as _native

        qp = _native.match_face_points(xl, xr)
        if qp is not None:
            f_qperm_r = qp
        else:  # numpy fallback
            d2 = np.sum((xl[:, :, None, :] - xr[:, None, :, :]) ** 2, axis=-1)
            f_qperm_r = np.argmin(d2, axis=-1).astype(np.int32)
        # validate: bijection + matched distances small
        xr_perm = np.take_along_axis(xr, f_qperm_r[..., None].astype(np.int64), 1)
        mind = np.linalg.norm(xl - xr_perm, axis=-1)
        scale = np.sqrt(np.sum((f_xyz[:nfi].max(axis=1) - f_xyz[:nfi].min(axis=1)) ** 2, -1))
        tol = 1e-8 * np.maximum(scale[:, None], 1.0)
        bad = (mind > tol).any(axis=1)
        if bad.any():
            # pre-glued periodic seams (MFEM nodes-based meshes): the two
            # sides share vertex ids but their per-element geometry differs
            # by the periodic translation — retry with the centroid shift,
            # exact for translated faces and far outside tol otherwise
            sh = xr[bad].mean(axis=1) - xl[bad].mean(axis=1)
            xl_b = xl[bad] + sh[:, None, :]
            d2 = np.sum((xl_b[:, :, None, :] - xr[bad][:, None, :, :]) ** 2, -1)
            f_qperm_r[bad] = np.argmin(d2, axis=-1).astype(np.int32)
            xr_perm = np.take_along_axis(
                xr, f_qperm_r[..., None].astype(np.int64), 1
            )
            mind = np.linalg.norm(xl - xr_perm, axis=-1)
            mind[bad] = np.linalg.norm(xl_b - xr_perm[bad], axis=-1)
        if np.any(mind > tol):
            raise ValueError("face quad point matching failed (non-conforming mesh?)")
        if np.any(np.sort(f_qperm_r, axis=1) != np.arange(nqf)[None, :]):
            raise ValueError("face point permutation is not a bijection")

    # ---- orientation baking ----
    # If a per-local-face permutation sigma satisfies
    # sigma[lfR] = qperm o sigma[lfL] on every interior face, bake sigma into
    # the Btr rows and the per-face point data: every runtime face pairing
    # becomes the identity, so the oriented-trace machinery degenerates to
    # n_combo == nlf and the face sweep reads half the trace rows.
    sigma = solve_orientation_baking(nlf, nqf, nfi, f_slot_l, f_slot_r, f_qperm_r)
    ident = np.arange(nqf, dtype=np.int64)
    if sigma is not None and any(not np.array_equal(s, ident) for s in sigma):
        for lf in range(nlf):
            s = sigma[lf]
            Btr[lf * nqf : (lf + 1) * nqf] = Btr[lf * nqf : (lf + 1) * nqf][s]
        sL = np.stack([sigma[int(lf)] for lf in f_slot_l])  # [nft, nqf]
        f_nor = np.take_along_axis(f_nor, sL[..., None], axis=1)
        f_xyz = np.take_along_axis(f_xyz, sL[..., None], axis=1)
        f_wts = np.take_along_axis(f_wts, sL, axis=1)
        if nfi:
            sR = np.stack([sigma[int(lf)] for lf in f_slot_r])
            inv_sR = np.empty_like(sR)
            np.put_along_axis(
                inv_sR, sR, np.broadcast_to(ident, sR.shape).copy(), axis=1
            )
            q_os = np.take_along_axis(f_qperm_r.astype(np.int64), sL[:nfi], axis=1)
            f_qperm_r = np.take_along_axis(inv_sR, q_os, axis=1).astype(np.int32)
            if np.any(f_qperm_r != ident[None, :]):
                raise AssertionError("orientation baking did not normalize qperm")

    # ---- element-side scatter-back tables ----
    ef_face, ef_qmap, ef_sign = build_ef_tables(
        ne, nlf, nqf, nfi, nft, f_elem_l, f_slot_l, f_elem_r, f_slot_r, f_qperm_r,
        allow_unassigned=False,
    )



    rad_vol = None
    rad_face = None
    if axisymmetric:
        Nv = geo_eval(vol_pts)
        rad_vol = np.einsum("qv,nv->nq", Nv, elem_verts[..., 0])
        rad_face = f_xyz[..., 0].copy()

    # ---- oriented-trace tables (fast gather path) ----
    oriented = build_oriented_tables(
        Btr, nlf, nqf, dim, nfi, nft,
        f_slot_l, f_slot_r, f_qperm_r, f_nor, f_wts, f_xyz,
        rad_face=rad_face,
    )
    slots = build_slot_tables(
        oriented, ne, nlf, nqf, dim, nfi, nft,
        f_elem_l, f_slot_l, f_elem_r, f_slot_r,
        f_nor, f_wts, f_xyz, delta, rad_face=rad_face,
    )
    oriented = {**oriented, **slots}

    # structured-topology roll fast path (verified against nbr_row)
    oriented["roll_info"] = detect_roll_topology(
        getattr(mesh, "grid_shape", None), nlf, oriented["n_combo"],
        slots["nbr_row"], slots["interior_mask"],
    )

    return DGTables(
        dim=dim,
        order=order,
        ne=ne,
        ndof=ndof,
        nq=nq,
        nlf=nlf,
        nqf=nqf,
        nfi=nfi,
        nfb=nfb,
        Bvol=Bvol,
        Gvol=Gvol,
        wq=wq,
        adjJ=adjJ,
        detJ=detJ,
        Minv=Minv,
        xyz_dof=xyz_dof,
        delta=delta,
        Btr=Btr,
        f_elem_l=f_elem_l,
        f_slot_l=f_slot_l,
        f_elem_r=f_elem_r,
        f_slot_r=f_slot_r,
        f_qperm_r=f_qperm_r,
        f_nor=f_nor,
        f_wts=f_wts,
        f_xyz=f_xyz,
        f_bdr_attr=f_bdr_attr,
        ef_face=ef_face,
        ef_qmap=ef_qmap,
        ef_sign=ef_sign,
        distance=None,
        rad_vol=rad_vol,
        rad_face=rad_face,
        Minv_rad=Minv_rad,
        minv_diag=minv_diag,
        minv_rad_diag=minv_rad_diag,
        **oriented,
    )
