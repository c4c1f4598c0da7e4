"""Unstructured mesh container and face-topology construction.

A Mesh holds vertices, single-type element connectivity, boundary faces with
integer attributes, and optional periodic face identifications.  Faces are
discovered by canonical vertex-key matching (the moral equivalent of MFEM's
face table used by the reference at src/M2ulPhyS.cpp:816-1487, rebuilt here
setup-side in numpy).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .reference_element import HEX_FACES, QUAD_FACES, TET_FACES, TRI_FACES


@dataclass
class FaceInfo:
    """Topological face lists produced by Mesh.build_faces()."""

    # interior faces (including glued periodic faces)
    int_elem_l: np.ndarray  # [nfi]
    int_lf_l: np.ndarray  # [nfi] local face id in elem L
    int_elem_r: np.ndarray  # [nfi]
    int_lf_r: np.ndarray  # [nfi]
    int_shift: np.ndarray  # [nfi, dim] coordinate shift from L side to R side
    # boundary faces
    bdr_elem: np.ndarray  # [nfb]
    bdr_lf: np.ndarray  # [nfb]
    bdr_attr: np.ndarray  # [nfb] integer attribute (1-based, MFEM style)


@dataclass
class Mesh:
    dim: int
    geom: str  # "quad" | "hex"
    vertices: np.ndarray  # [nv, dim] float64
    elements: np.ndarray  # [ne, nverts_per_elem] int
    # boundary faces given as vertex tuples + attributes
    bdr_faces: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), dtype=int))
    bdr_attrs: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=int))
    # periodic identification: list of (bdr_face_idx_a, bdr_face_idx_b, shift)
    # where shift maps side-a coordinates onto side-b coordinates.
    periodic_pairs: list = field(default_factory=list)
    # optional high-order geometry nodes (curved/isoparametric meshes):
    # [ne, ngeo, dim] at the order-`curved_order` Gauss-Lobatto tensor nodes
    # (x-fastest); None = straight-sided elements from the vertices
    curved_nodes: np.ndarray | None = None
    curved_order: int = 1
    # per-element integer attributes (regions; MFEM/Gmsh physical tags)
    elem_attrs: np.ndarray | None = None
    # structured-topology hint from the generators: elements form a C-order
    # grid of this shape ((nz, ny, nx) in 3D / (ny, nx) in 2D, x fastest);
    # discretization verifies before enabling the roll-based face sweep
    grid_shape: tuple | None = None

    def attributes(self) -> np.ndarray:
        if self.elem_attrs is None:
            return np.ones(self.num_elements, dtype=np.int64)
        return self.elem_attrs

    @property
    def num_elements(self) -> int:
        return self.elements.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def local_faces(self) -> list[tuple[int, ...]]:
        return {"quad": QUAD_FACES, "hex": HEX_FACES,
                "tri": TRI_FACES, "tet": TET_FACES}[self.geom]

    def element_vertices(self, e: int) -> np.ndarray:
        return self.vertices[self.elements[e]]

    # ------------------------------------------------------------------
    def build_faces(self) -> FaceInfo:
        """Discover interior/boundary faces by canonical vertex keys.

        The grouping runs in the native hash-join kernel
        (native/setup_kernels.cpp build_face_topology) with a vectorized
        numpy unique/argsort fallback; only the (small) boundary set is
        post-processed in python for attributes and periodic gluing."""
        lf_defs = self.local_faces
        ne = self.num_elements
        nlf = len(lf_defs)

        # canonical keys, vectorized: [ne*nlf, nvpf] sorted vertex ids
        lf_arr = np.asarray(lf_defs, dtype=np.int64)  # [nlf, nvpf]
        verts = self.elements[:, lf_arr]  # [ne, nlf, nvpf]
        keys = np.sort(verts, axis=-1).reshape(ne * nlf, -1).astype(np.int64)
        rec_e = np.repeat(np.arange(ne, dtype=np.int32), nlf)
        rec_lf = np.tile(np.arange(nlf, dtype=np.int32), ne)

        from .. import native as _native

        nat = _native.face_topology(keys, rec_e, rec_lf)
        if nat is not None:
            int_l, int_lfl, int_r, int_lfr, bdr_e_arr, bdr_lf_arr = \
                (list(a) for a in nat)
        else:
            # numpy fallback: group records by unique key
            _, inv, counts = np.unique(
                keys, axis=0, return_inverse=True, return_counts=True
            )
            if counts.max(initial=0) > 2:
                raise ValueError("a face is shared by more than 2 elements")
            order = np.argsort(inv, kind="stable")
            cnt_per_rec = counts[inv[order]]
            starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
            pos = np.arange(len(order)) - starts[inv[order]]
            paired = cnt_per_rec == 2
            first = order[paired & (pos == 0)]
            second = order[paired & (pos == 1)]
            single = order[cnt_per_rec == 1]
            int_l = list(rec_e[first])
            int_lfl = list(rec_lf[first])
            int_r = list(rec_e[second])
            int_lfr = list(rec_lf[second])
            bdr_e_arr = rec_e[single]
            bdr_lf_arr = rec_lf[single]
        int_shift = [np.zeros(self.dim) for _ in int_l]
        unmatched: dict[tuple, tuple[int, int]] = {}
        for e, lf in zip(bdr_e_arr, bdr_lf_arr):
            key = tuple(int(v) for v in keys[int(e) * nlf + int(lf)])
            unmatched[key] = (int(e), int(lf))

        # boundary faces: match unmatched faces to bdr_faces list for attrs
        bdr_key_to_idx = {}
        for i in range(self.bdr_faces.shape[0]):
            bdr_key_to_idx[tuple(sorted(int(v) for v in self.bdr_faces[i]))] = i

        # periodic gluing: pairs of boundary-face indices
        periodic_handled = set()
        for (ia, ib, shift) in self.periodic_pairs:
            key_a = tuple(sorted(int(v) for v in self.bdr_faces[ia]))
            key_b = tuple(sorted(int(v) for v in self.bdr_faces[ib]))
            ea, lfa = unmatched[key_a]
            eb, lfb = unmatched[key_b]
            int_l.append(ea)
            int_lfl.append(lfa)
            int_r.append(eb)
            int_lfr.append(lfb)
            int_shift.append(np.asarray(shift, dtype=np.float64))
            periodic_handled.add(key_a)
            periodic_handled.add(key_b)

        bdr_e, bdr_lf, bdr_attr = [], [], []
        for key, (e, lf) in unmatched.items():
            if key in periodic_handled:
                continue
            if key in bdr_key_to_idx:
                attr = int(self.bdr_attrs[bdr_key_to_idx[key]])
            else:
                attr = 1  # default attribute
            bdr_e.append(e)
            bdr_lf.append(lf)
            bdr_attr.append(attr)

        def _ai(x):
            return np.asarray(x, dtype=np.int32)

        return FaceInfo(
            int_elem_l=_ai(int_l),
            int_lf_l=_ai(int_lfl),
            int_elem_r=_ai(int_r),
            int_lf_r=_ai(int_lfr),
            int_shift=(
                np.asarray(int_shift, dtype=np.float64).reshape(-1, self.dim)
                if int_shift
                else np.zeros((0, self.dim))
            ),
            bdr_elem=_ai(bdr_e),
            bdr_lf=_ai(bdr_lf),
            bdr_attr=_ai(bdr_attr),
        )

    # ------------------------------------------------------------------
    def curved(self, mapping, order: int = 2) -> "Mesh":
        """Return an isoparametrically curved copy: physical coordinates are
        mapping(x) evaluated at each element's order-`order` Gauss-Lobatto
        geometry nodes (the role of MFEM's nodes-based curved meshes).

        `mapping` takes [n, dim] straight coordinates -> [n, dim] curved."""
        from .reference_element import ReferenceElement

        gref = ReferenceElement(geom=self.geom, order=order,
                                basis="gauss-lobatto")
        ev = self.vertices[self.elements]  # [ne, nverts, dim]
        lin = ReferenceElement(geom=self.geom, order=1, basis="gauss-lobatto")
        N = lin.eval_geom_basis(gref.nodes)  # [ngeo, nverts]
        straight = np.einsum("gv,nvi->ngi", N, ev)  # [ne, ngeo, dim]
        curved = np.asarray(
            mapping(straight.reshape(-1, self.dim))
        ).reshape(straight.shape)
        # vertices themselves also move so face matching keys stay exact
        new_verts = np.asarray(mapping(self.vertices))
        out = Mesh(
            dim=self.dim, geom=self.geom, vertices=new_verts,
            elements=self.elements, bdr_faces=self.bdr_faces,
            bdr_attrs=self.bdr_attrs, periodic_pairs=self.periodic_pairs,
            curved_nodes=curved, curved_order=order,
            elem_attrs=self.elem_attrs,
        )
        return out

    # ------------------------------------------------------------------
    def scaled(self, factor: float) -> "Mesh":
        """Uniformly scale mesh coordinates (reference: src/mesh_base.cpp)."""
        out = Mesh(
            dim=self.dim,
            geom=self.geom,
            vertices=self.vertices * factor,
            elements=self.elements,
            bdr_faces=self.bdr_faces,
            bdr_attrs=self.bdr_attrs,
            periodic_pairs=[(a, b, np.asarray(s) * factor) for a, b, s in self.periodic_pairs],
            curved_nodes=None if self.curved_nodes is None else self.curved_nodes * factor,
        )
        return out


def make_periodic(mesh: Mesh, translations, tol: float = 1e-8) -> Mesh:
    """Glue boundary faces identified by the given translation vectors.

    The role of MFEM's Mesh::MakePeriodic + CreatePeriodicVertexMapping as
    used by the reference for the [periodicity] input section (reference:
    src/M2ulPhyS.cpp:296-312, src/mesh_base.cpp:132-150): for every
    translation t, a boundary face whose centroid equals another boundary
    face's centroid + t is glued to it as an interior (periodic) face.

    Translations with |t| >= 1e11 are ignored (the reference's "disabled"
    default of 1e12 for xTrans/yTrans/zTrans).
    """
    lf_defs = mesh.local_faces
    ne = mesh.num_elements
    nlf = len(lf_defs)
    lf_arr = np.asarray(lf_defs, dtype=np.int64)
    verts = mesh.elements[:, lf_arr]  # [ne, nlf, nvpf]
    keys = np.sort(verts, axis=-1).reshape(ne * nlf, -1)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    single = counts[inv] == 1  # true boundary (unpaired) faces
    bfaces = verts.reshape(ne * nlf, -1)[single]  # [nb, nvpf] vertex ids
    centroids = mesh.vertices[bfaces].mean(axis=1)  # [nb, dim]

    # absolute matching tolerance from the mesh extent
    diag = float(np.linalg.norm(mesh.vertices.max(0) - mesh.vertices.min(0)))
    eps = tol * max(diag, 1.0)

    # index of each boundary face tuple in mesh.bdr_faces (appending the
    # ones the file did not list so periodic_pairs can reference them)
    bdr_list = [tuple(sorted(int(v) for v in mesh.bdr_faces[i]))
                for i in range(mesh.bdr_faces.shape[0])]
    key_to_idx = {k: i for i, k in enumerate(bdr_list)}
    new_faces = [list(mesh.bdr_faces[i]) for i in range(mesh.bdr_faces.shape[0])]
    new_attrs = list(mesh.bdr_attrs)

    def face_idx(row):
        k = tuple(sorted(int(v) for v in bfaces[row]))
        if k not in key_to_idx:
            key_to_idx[k] = len(new_faces)
            new_faces.append([int(v) for v in bfaces[row]])
            new_attrs.append(1)
        return key_to_idx[k]

    pairs = list(mesh.periodic_pairs)
    glued = set()
    for t in translations:
        t = np.asarray(t, dtype=np.float64)[: mesh.dim]
        if np.linalg.norm(t) >= 1e11 or np.linalg.norm(t) == 0.0:
            continue
        # quantized centroid lookup: face a at c matches face b at c - t
        quant = {tuple(np.round(c / eps).astype(np.int64)): i
                 for i, c in enumerate(centroids)}
        matched = 0
        for ia, ca in enumerate(centroids):
            if ia in glued:
                continue
            target = ca - t
            ib = quant.get(tuple(np.round(target / eps).astype(np.int64)))
            if ib is None:
                # retry the 3^dim neighbor cells (rounding boundary)
                base = np.round(target / eps).astype(np.int64)
                for off in np.ndindex(*([3] * mesh.dim)):
                    cand = quant.get(tuple(base + np.asarray(off) - 1))
                    if cand is not None and np.linalg.norm(
                            centroids[cand] - target) < 4 * eps:
                        ib = cand
                        break
            if ib is None or ib == ia or ib in glued:
                continue
            pairs.append((face_idx(ia), face_idx(ib), -t.copy()))
            glued.add(ia)
            glued.add(ib)
            matched += 1
        if matched == 0:
            raise ValueError(
                f"periodicity translation {t} matched no boundary faces"
            )
    nvpf = len(lf_defs[0])
    return Mesh(
        dim=mesh.dim, geom=mesh.geom, vertices=mesh.vertices,
        elements=mesh.elements,
        bdr_faces=np.asarray(new_faces, dtype=int).reshape(-1, nvpf),
        bdr_attrs=np.asarray(new_attrs, dtype=int),
        periodic_pairs=pairs, curved_nodes=mesh.curved_nodes,
        curved_order=mesh.curved_order, elem_attrs=mesh.elem_attrs,
        grid_shape=None,
    )
