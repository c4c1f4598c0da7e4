"""Structured mesh generators (Cartesian boxes, stretched beams).

TPU-native equivalents of the reference's test-mesh utilities
(reference: utils/beam_mesh.cpp, utils/simple_periodic_mesh.cpp).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh


def _grid_vertices(xs: list[np.ndarray]) -> np.ndarray:
    grids = np.meshgrid(*xs, indexing="ij")
    return np.stack([g.ravel(order="F") for g in grids], axis=-1)


def box_2d(
    nx: int,
    ny: int,
    x0: float = 0.0,
    x1: float = 1.0,
    y0: float = 0.0,
    y1: float = 1.0,
    periodic_x: bool = False,
    periodic_y: bool = False,
    x_coords: np.ndarray | None = None,
    y_coords: np.ndarray | None = None,
) -> Mesh:
    """Quad mesh of an axis-aligned rectangle.

    Boundary attributes (MFEM-style, 1-based): 1=bottom, 2=right, 3=top,
    4=left.
    """
    xs = np.linspace(x0, x1, nx + 1) if x_coords is None else np.asarray(x_coords)
    ys = np.linspace(y0, y1, ny + 1) if y_coords is None else np.asarray(y_coords)
    nvx, nvy = len(xs), len(ys)
    verts = _grid_vertices([xs, ys])

    def vid(i, j):
        return i + nvx * j

    elems = np.empty((nx * ny, 4), dtype=np.int64)
    k = 0
    for j in range(ny):
        for i in range(nx):
            elems[k] = [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)]
            k += 1

    bdr_faces, bdr_attrs = [], []
    for i in range(nx):  # bottom (attr 1), top (attr 3)
        bdr_faces.append((vid(i, 0), vid(i + 1, 0)))
        bdr_attrs.append(1)
        bdr_faces.append((vid(i, nvy - 1), vid(i + 1, nvy - 1)))
        bdr_attrs.append(3)
    for j in range(ny):  # right (attr 2), left (attr 4)
        bdr_faces.append((vid(nvx - 1, j), vid(nvx - 1, j + 1)))
        bdr_attrs.append(2)
        bdr_faces.append((vid(0, j), vid(0, j + 1)))
        bdr_attrs.append(4)

    bdr_faces = np.asarray(bdr_faces, dtype=np.int64)
    bdr_attrs = np.asarray(bdr_attrs, dtype=np.int64)

    periodic_pairs = []
    if periodic_x:
        Lx = xs[-1] - xs[0]
        left = {}
        right = {}
        for idx, (f, a) in enumerate(zip(bdr_faces, bdr_attrs)):
            if a == 4:
                jmin = min(f) // nvx
                left[jmin] = idx
            elif a == 2:
                jmin = min(f) // nvx
                right[jmin] = idx
        for j in left:
            periodic_pairs.append((right[j], left[j], np.array([-Lx, 0.0])))
    if periodic_y:
        Ly = ys[-1] - ys[0]
        bot = {}
        top = {}
        for idx, (f, a) in enumerate(zip(bdr_faces, bdr_attrs)):
            if a == 1:
                bot[min(f) % nvx] = idx
            elif a == 3:
                top[min(f) % nvx] = idx
        for i in bot:
            periodic_pairs.append((top[i], bot[i], np.array([0.0, -Ly])))

    return Mesh(
        dim=2,
        geom="quad",
        vertices=verts,
        elements=elems,
        bdr_faces=bdr_faces,
        bdr_attrs=bdr_attrs,
        periodic_pairs=periodic_pairs,
        grid_shape=(ny, nx),
    )


def box_3d(
    nx: int,
    ny: int,
    nz: int,
    bounds=((0.0, 1.0), (0.0, 1.0), (0.0, 1.0)),
    periodic=(False, False, False),
) -> Mesh:
    """Hex mesh of an axis-aligned box.

    Boundary attributes: 1=x-min, 2=x-max, 3=y-min, 4=y-max, 5=z-min, 6=z-max.
    """
    (x0, x1), (y0, y1), (z0, z1) = bounds
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(z0, z1, nz + 1)
    nvx, nvy, nvz = len(xs), len(ys), len(zs)
    verts = _grid_vertices([xs, ys, zs])

    def vid(i, j, k):
        return i + nvx * (j + nvy * k)

    elems = np.empty((nx * ny * nz, 8), dtype=np.int64)
    c = 0
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                elems[c] = [
                    vid(i, j, k), vid(i + 1, j, k), vid(i + 1, j + 1, k), vid(i, j + 1, k),
                    vid(i, j, k + 1), vid(i + 1, j, k + 1), vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1),
                ]
                c += 1

    bdr_faces, bdr_attrs = [], []

    def quad_face(vids, attr):
        bdr_faces.append(tuple(vids))
        bdr_attrs.append(attr)

    for j in range(ny):
        for k in range(nz):
            quad_face((vid(0, j, k), vid(0, j + 1, k), vid(0, j + 1, k + 1), vid(0, j, k + 1)), 1)
            quad_face((vid(nvx - 1, j, k), vid(nvx - 1, j + 1, k), vid(nvx - 1, j + 1, k + 1), vid(nvx - 1, j, k + 1)), 2)
    for i in range(nx):
        for k in range(nz):
            quad_face((vid(i, 0, k), vid(i + 1, 0, k), vid(i + 1, 0, k + 1), vid(i, 0, k + 1)), 3)
            quad_face((vid(i, nvy - 1, k), vid(i + 1, nvy - 1, k), vid(i + 1, nvy - 1, k + 1), vid(i, nvy - 1, k + 1)), 4)
    for i in range(nx):
        for j in range(ny):
            quad_face((vid(i, j, 0), vid(i + 1, j, 0), vid(i + 1, j + 1, 0), vid(i, j + 1, 0)), 5)
            quad_face((vid(i, j, nvz - 1), vid(i + 1, j, nvz - 1), vid(i + 1, j + 1, nvz - 1), vid(i, j + 1, nvz - 1)), 6)

    bdr_faces = np.asarray(bdr_faces, dtype=np.int64)
    bdr_attrs = np.asarray(bdr_attrs, dtype=np.int64)

    periodic_pairs = []
    axis_attrs = [(1, 2), (3, 4), (5, 6)]
    lengths = [xs[-1] - xs[0], ys[-1] - ys[0], zs[-1] - zs[0]]
    for ax in range(3):
        if not periodic[ax]:
            continue
        amin, amax = axis_attrs[ax]
        # key a face by the min-corner coordinates in the other two axes
        mins = {}
        maxs = {}
        for idx, (f, a) in enumerate(zip(bdr_faces, bdr_attrs)):
            if a not in (amin, amax):
                continue
            pts = verts[list(f)]
            other = [d for d in range(3) if d != ax]
            key = tuple(np.round(pts[:, other].min(axis=0), 12))
            if a == amin:
                mins[key] = idx
            else:
                maxs[key] = idx
        shift = np.zeros(3)
        shift[ax] = -lengths[ax]
        for key in mins:
            periodic_pairs.append((maxs[key], mins[key], shift.copy()))

    return Mesh(
        dim=3,
        geom="hex",
        vertices=verts,
        elements=elems,
        bdr_faces=bdr_faces,
        bdr_attrs=bdr_attrs,
        periodic_pairs=periodic_pairs,
        grid_shape=(nz, ny, nx),
    )


def beam_mesh(n_axis, n_cross, length=4.0, width=1.0, stretch=1.0,
              dim=2, periodic_axis=True):
    """Stretched periodic beam mesh for MMS tests (the role of the
    reference utils/beam_mesh.cpp): element spacing along the axis follows
    a geometric progression with ratio `stretch`."""
    r = float(stretch)
    if abs(r - 1.0) < 1e-14:
        xs = np.linspace(0.0, length, n_axis + 1)
    else:
        w = r ** np.arange(n_axis)
        xs = np.concatenate([[0.0], np.cumsum(w)])
        xs = xs / xs[-1] * length
    if dim == 2:
        return box_2d(
            n_axis, n_cross, x1=length, y1=width,
            x_coords=xs, periodic_x=periodic_axis,
        )
    if dim == 3:
        m = box_3d(
            n_axis, n_cross, n_cross,
            bounds=((0.0, length), (0.0, width), (0.0, width)),
            periodic=(periodic_axis, False, False),
        )
        # apply the geometric axis stretching to the uniform grid
        u = m.vertices[:, 0] / length  # uniform fractions
        m.vertices[:, 0] = np.interp(
            u, np.linspace(0.0, 1.0, n_axis + 1), xs
        )
        return m
    raise ValueError(f"beam_mesh: dim must be 2 or 3, got {dim}")


def box_2d_tri(nx, ny, x0=0.0, x1=1.0, y0=0.0, y1=1.0,
               periodic_x=False, periodic_y=False):
    """Triangle mesh of a rectangle (each quad split along its diagonal).
    Boundary attributes match box_2d: 1=bottom, 2=right, 3=top, 4=left."""
    q = box_2d(nx, ny, x0=x0, x1=x1, y0=y0, y1=y1,
               periodic_x=periodic_x, periodic_y=periodic_y)
    tris = []
    for e in q.elements:
        v0, v1, v2, v3 = (int(v) for v in e)
        tris.append((v0, v1, v2))
        tris.append((v0, v2, v3))
    return Mesh(
        dim=2, geom="tri", vertices=q.vertices,
        elements=np.asarray(tris, dtype=np.int64),
        bdr_faces=q.bdr_faces, bdr_attrs=q.bdr_attrs,
        periodic_pairs=q.periodic_pairs,
    )


def box_3d_tet(nx, ny, nz, bounds=((0.0, 1.0), (0.0, 1.0), (0.0, 1.0)),
               periodic=(False, False, False)):
    """Tetrahedral mesh of a box (each hex split into 6 tets).
    Boundary attributes match box_3d (1..6); boundary quads are split into
    the matching triangle pairs."""
    hx = box_3d(nx, ny, nz, bounds=bounds, periodic=periodic)
    # 6-tet decomposition of the hex (v0..v7 MFEM ordering), all sharing the
    # main diagonal v0-v6 so neighbor faces are conforming
    TETS = [(0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
            (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6)]
    tets = []
    for e in hx.elements:
        v = [int(x) for x in e]
        for t in TETS:
            tets.append(tuple(v[i] for i in t))
    tets = np.asarray(tets, dtype=np.int64)
    # fix orientation: positive volume
    ev = hx.vertices[tets]
    vol = np.einsum(
        "ni,ni->n",
        np.cross(ev[:, 1] - ev[:, 0], ev[:, 2] - ev[:, 0]),
        ev[:, 3] - ev[:, 0],
    )
    flip = vol < 0
    tets[flip] = tets[flip][:, [0, 2, 1, 3]]

    # split boundary quads into triangles consistent with the tet faces:
    # collect all boundary tet faces and match to quads by vertex subset
    bdr_tris = []
    bdr_attrs = []
    for f, a in zip(hx.bdr_faces, hx.bdr_attrs):
        q = [int(v) for v in f]
        # any diagonal that exists in the tet decomposition; both diagonals
        # are tried and matched against faces present on the surface
        bdr_tris.append((q[0], q[1], q[2]))
        bdr_tris.append((q[0], q[2], q[3]))
        bdr_attrs.extend([int(a), int(a)])
    # periodic pairs: rebuild indices for the split faces (pair i of quads
    # becomes pairs (2i, 2i') and (2i+1, 2i'+1))
    pp = []
    for (ia, ib, shift) in hx.periodic_pairs:
        pp.append((2 * ia, 2 * ib, shift))
        pp.append((2 * ia + 1, 2 * ib + 1, shift))
    mesh = Mesh(
        dim=3, geom="tet", vertices=hx.vertices,
        elements=tets,
        bdr_faces=np.asarray(bdr_tris, dtype=np.int64),
        bdr_attrs=np.asarray(bdr_attrs, dtype=np.int64),
        periodic_pairs=pp,
    )
    return mesh


def annulus_2d(nr, ntheta, r0=0.5, r1=1.0, geom_order=2):
    """Curved O-grid annulus: a periodic rectangle mapped isoparametrically
    to the ring r in [r0, r1].  Boundary attributes: 4 = inner circle
    (x-min), 2 = outer circle (x-max)."""
    base = box_2d(nr, ntheta, x1=1.0, y1=1.0, periodic_y=True)

    def to_ring(x):
        r = r0 + (r1 - r0) * x[:, 0]
        th = 2.0 * np.pi * x[:, 1]
        return np.stack([r * np.cos(th), r * np.sin(th)], axis=-1)

    out = base.curved(to_ring, order=geom_order)
    # periodic gluing happened in (x, y) parameter space; after mapping the
    # theta=0/2pi faces coincide, so the shift becomes zero
    out.periodic_pairs = [(a, b, np.zeros(2)) for (a, b, _) in base.periodic_pairs]
    return out
