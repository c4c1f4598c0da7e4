"""Mixed-element (tri + quad) meshes as per-geometry element buckets.

The reference handles mixed meshes through MFEM's generic element model and
buckets them by type for its GPU kernels (reference:
src/dgNonlinearForm.cpp:96-104 element-type bucketing; mixed meshes appear
in test/meshes/cyl-2d-mixed.msh used by test/inputs/input.cyl-2d.case*.ini).
Here a MixedMesh holds one single-geometry `Mesh` per element type over a
shared vertex array; the DG layer (dg/mixed.py) couples the buckets through
conforming interface faces.

Only 2-D tri/quad mixing is supported: tri and quad faces are both segments
with identical quadrature, so interface traces pair point-for-point.  (A
hex/tet interface would need quad-vs-tri face rules — not representable as
a conforming pairing.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mesh import Mesh


@dataclass
class MixedMesh:
    dim: int
    vertices: np.ndarray  # shared [nv, dim]
    parts: tuple  # per-geometry Mesh (same vertex array)
    # flat boundary description (vertex tuples + attrs over the whole mesh)
    bdr_faces: np.ndarray
    bdr_attrs: np.ndarray

    @property
    def geoms(self):
        return tuple(p.geom for p in self.parts)

    @property
    def num_elements(self):
        return sum(p.num_elements for p in self.parts)


def make_mixed_mesh(dim, vertices, elems_by_geom, bdr_faces=None,
                    bdr_attrs=None, attrs_by_geom=None):
    """Assemble a MixedMesh from per-geometry connectivity.

    elems_by_geom: {geom: [ne_g, nverts_g] int array}; buckets are ordered
    ("tri", "quad") for determinism.  Boundary faces (vertex tuples) are
    attached to whichever bucket owns them at table-build time, so they are
    kept flat here.
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    order = [g for g in ("tri", "quad") if g in elems_by_geom]
    if set(elems_by_geom) - {"tri", "quad"}:
        raise NotImplementedError(
            f"mixed meshes support tri+quad only, got {sorted(elems_by_geom)}")
    parts = []
    for g in order:
        el = np.asarray(elems_by_geom[g], dtype=np.int64)
        ea = (np.asarray(attrs_by_geom[g], dtype=np.int64)
              if attrs_by_geom else None)
        parts.append(Mesh(dim=dim, geom=g, vertices=vertices, elements=el,
                          elem_attrs=ea))
    bf = (np.asarray(bdr_faces, dtype=np.int64) if bdr_faces is not None
          and len(bdr_faces) else np.zeros((0, 0), dtype=np.int64))
    ba = (np.asarray(bdr_attrs, dtype=np.int64) if bdr_attrs is not None
          and len(bdr_attrs) else np.zeros(0, dtype=np.int64))
    return MixedMesh(dim=dim, vertices=vertices, parts=tuple(parts),
                     bdr_faces=bf, bdr_attrs=ba)


def mixed_box_2d(nx, ny, x1=1.0, y1=1.0, tri_from=0.5):
    """Structured [0,x1]x[0,y1] box: quads for x-cells left of `tri_from`
    (fraction of nx), each remaining quad split into two triangles along
    its main diagonal.  Boundary attributes match generators.box_2d:
    1=bottom, 2=right, 3=top, 4=left.  The tri/quad seam is a conforming
    interface (test mesh for the mixed DG path)."""
    xs = np.linspace(0.0, x1, nx + 1)
    ys = np.linspace(0.0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel()], axis=-1)

    def vid(i, j):
        return i * (ny + 1) + j

    ncut = int(round(tri_from * nx))
    quads, tris = [], []
    for i in range(nx):
        for j in range(ny):
            v = [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)]
            if i < ncut:
                quads.append(v)
            else:
                tris.append([v[0], v[1], v[2]])
                tris.append([v[0], v[2], v[3]])

    bf, ba = [], []
    for i in range(nx):
        bf.append([vid(i, 0), vid(i + 1, 0)])
        ba.append(1)
        bf.append([vid(i, ny), vid(i + 1, ny)])
        ba.append(3)
    for j in range(ny):
        bf.append([vid(nx, j), vid(nx, j + 1)])
        ba.append(2)
        bf.append([vid(0, j), vid(0, j + 1)])
        ba.append(4)

    elems = {}
    if tris:
        elems["tri"] = np.asarray(tris, dtype=np.int64)
    if quads:
        elems["quad"] = np.asarray(quads, dtype=np.int64)
    return make_mixed_mesh(2, verts, elems, bdr_faces=bf, bdr_attrs=ba)
