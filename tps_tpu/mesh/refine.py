"""Uniform mesh refinement (the reference's `em/ref_levels` /
`mfem::Mesh::UniformRefinement` role, src/quasimagnetostatic.cpp:167-170).

Straight-sided quad/hex meshes only: each quad splits into 4 children and
each hex into 8, introducing edge midpoints, face centers, and (3-D) body
centers.  Element attributes propagate to children; boundary faces split
with their attribute preserved.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

# MFEM vertex ordering -> unit-lattice coordinates
_QUAD_LATTICE = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}
_HEX_LATTICE = {
    (0, 0, 0): 0, (1, 0, 0): 1, (1, 1, 0): 2, (0, 1, 0): 3,
    (0, 0, 1): 4, (1, 0, 1): 5, (1, 1, 1): 6, (0, 1, 1): 7,
}


class _PointPool:
    """Deduplicated refinement points keyed by the vertex subset they
    bisect (edge = 2 vertices, face = 4, body = 8)."""

    def __init__(self, vertices):
        self.coords = [v for v in np.asarray(vertices, dtype=np.float64)]
        self.keys: dict[tuple, int] = {}

    def vertex(self, v: int) -> int:
        return int(v)

    def midpoint(self, vids) -> int:
        key = tuple(sorted(int(v) for v in vids))
        if len(key) == 1:
            return key[0]
        idx = self.keys.get(key)
        if idx is None:
            idx = len(self.coords)
            self.coords.append(
                np.mean([self.coords[v] for v in key], axis=0))
            self.keys[key] = idx
        return idx


def _lattice_vids(pool, ev, lattice_map, dim):
    """3^dim lattice of point ids for one element (corners from `ev`)."""
    inv = {i: c for c, i in lattice_map.items()}
    shape = (3,) * dim
    out = np.zeros(shape, dtype=np.int64)
    for idx in np.ndindex(shape):
        corners = []
        for corner in np.ndindex((2,) * dim):
            # corner participates iff each lattice coord is reachable:
            # coord 0 -> corner 0, coord 2 -> corner 1, coord 1 -> both
            ok = all(idx[d] == 2 * corner[d] or idx[d] == 1
                     for d in range(dim))
            if ok:
                corners.append(int(ev[lattice_map[corner]]))
        out[idx] = pool.midpoint(corners)
    del inv
    return out


def refine_uniform(mesh: Mesh, levels: int = 1) -> Mesh:
    """Uniformly refine `levels` times. quad/hex, straight-sided,
    non-periodic meshes."""
    out = mesh
    for _ in range(max(0, int(levels))):
        out = _refine_once(out)
    return out


def _refine_once(mesh: Mesh) -> Mesh:
    if mesh.geom not in ("quad", "hex"):
        raise NotImplementedError(f"uniform refinement of {mesh.geom} meshes")
    if mesh.periodic_pairs:
        raise NotImplementedError("uniform refinement of periodic meshes")
    if mesh.curved_nodes is not None:
        raise NotImplementedError("uniform refinement of curved meshes")

    dim = mesh.dim
    lattice_map = _QUAD_LATTICE if mesh.geom == "quad" else _HEX_LATTICE
    pool = _PointPool(mesh.vertices)

    children = []
    child_attrs = []
    attrs = mesh.attributes()
    for e in range(mesh.num_elements):
        lat = _lattice_vids(pool, mesh.elements[e], lattice_map, dim)
        for child in np.ndindex((2,) * dim):
            vids = np.zeros(len(lattice_map), dtype=np.int64)
            for corner, local in lattice_map.items():
                pos = tuple(child[d] + corner[d] for d in range(dim))
                vids[local] = lat[pos]
            children.append(vids)
            child_attrs.append(int(attrs[e]))

    # boundary faces: segment -> 2 children, quad face -> 4 children
    new_bfaces, new_battrs = [], []
    for i in range(mesh.bdr_faces.shape[0]):
        fv = [int(v) for v in mesh.bdr_faces[i]]
        attr = int(mesh.bdr_attrs[i]) if len(mesh.bdr_attrs) else 1
        if len(fv) == 2:  # edge (2-D boundary)
            m = pool.midpoint(fv)
            new_bfaces += [[fv[0], m], [m, fv[1]]]
            new_battrs += [attr, attr]
        elif len(fv) == 4:  # quad face (3-D boundary)
            m01 = pool.midpoint((fv[0], fv[1]))
            m12 = pool.midpoint((fv[1], fv[2]))
            m23 = pool.midpoint((fv[2], fv[3]))
            m30 = pool.midpoint((fv[3], fv[0]))
            c = pool.midpoint(fv)
            new_bfaces += [
                [fv[0], m01, c, m30],
                [m01, fv[1], m12, c],
                [c, m12, fv[2], m23],
                [m30, c, m23, fv[3]],
            ]
            new_battrs += [attr] * 4
        else:
            raise NotImplementedError(f"boundary face with {len(fv)} vertices")

    return Mesh(
        dim=dim,
        geom=mesh.geom,
        vertices=np.asarray(pool.coords, dtype=np.float64),
        elements=np.asarray(children, dtype=np.int64),
        bdr_faces=(np.asarray(new_bfaces, dtype=np.int64)
                   if new_bfaces else np.zeros((0, 0), dtype=int)),
        bdr_attrs=np.asarray(new_battrs, dtype=np.int64),
        elem_attrs=np.asarray(child_attrs, dtype=np.int64),
    )
