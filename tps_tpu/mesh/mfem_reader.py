"""Readers for MFEM `.mesh` (v1.0 text) and Gmsh `.msh` (v2.2 ASCII) files.

Covers straight-sided quad/hex/tri/tet elements (the
reference consumes arbitrary MFEM/Gmsh meshes through the MFEM library;
simplex and curved support is tracked as a TODO in README).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

# MFEM geometry type codes
_MFEM_GEOM = {
    1: ("segment", 2),
    2: ("tri", 3),
    3: ("quad", 4),
    4: ("tet", 4),
    5: ("hex", 8),
    6: ("prism", 6),
}


def read_mfem_mesh(path: str) -> Mesh:
    with open(path) as f:
        lines = [ln.split("#")[0].strip() for ln in f]
    lines = [ln for ln in lines if ln]
    if not lines or not lines[0].startswith("MFEM mesh"):
        raise ValueError(f"{path}: not an MFEM mesh file")

    idx = {ln: i for i, ln in enumerate(lines)}

    def section(name):
        if name not in idx:
            return None
        return idx[name] + 1

    i = section("dimension")
    dim = int(lines[i])

    i = section("elements")
    ne = int(lines[i])
    elems = []
    eattrs = []
    geom_seen = set()
    for k in range(ne):
        parts = lines[i + 1 + k].split()
        eattrs.append(int(parts[0]))
        geom = int(parts[1])
        if geom not in _MFEM_GEOM:
            raise ValueError(f"{path}: unsupported element geometry {geom}")
        gname, nverts = _MFEM_GEOM[geom]
        geom_seen.add(gname)
        elems.append([int(v) for v in parts[2 : 2 + nverts]])
    if geom_seen - {"quad", "hex", "tri", "tet"}:
        raise NotImplementedError(
            f"{path}: element types {sorted(geom_seen)} not supported "
            "(quad/hex/tri/tet)"
        )
    if len(geom_seen) != 1:
        raise NotImplementedError(f"{path}: mixed element types")
    geom = geom_seen.pop()
    elements = np.asarray(elems, dtype=np.int64)

    i = section("boundary")
    bdr_faces, bdr_attrs = [], []
    if i is not None:
        nb = int(lines[i])
        for k in range(nb):
            parts = lines[i + 1 + k].split()
            attr, g = int(parts[0]), int(parts[1])
            _, nverts = _MFEM_GEOM[g]
            bdr_faces.append(tuple(int(v) for v in parts[2 : 2 + nverts]))
            bdr_attrs.append(attr)

    i = section("vertices")
    nv = int(lines[i])
    # either "nv \n vdim \n coords..." or "nv" followed by a `nodes` section
    maybe_vdim = lines[i + 1].split()
    if len(maybe_vdim) == 1 and "nodes" not in idx:
        vdim = int(maybe_vdim[0])
        verts = np.array(
            [[float(x) for x in lines[i + 2 + k].split()[:vdim]] for k in range(nv)]
        )
    elif len(maybe_vdim) == 1 and "nodes" in idx:
        raise NotImplementedError(
            f"{path}: nodes-based (periodic/curved) MFEM meshes not yet supported"
        )
    else:
        raise ValueError(f"{path}: malformed vertices section")

    if bdr_faces:
        width = max(len(b) for b in bdr_faces)
        bf = np.zeros((len(bdr_faces), width), dtype=np.int64)
        for j, b in enumerate(bdr_faces):
            bf[j, : len(b)] = b
    else:
        bf = np.zeros((0, 0), dtype=np.int64)

    return Mesh(
        dim=dim,
        geom=geom,
        vertices=verts[:, :dim],
        elements=elements,
        bdr_faces=bf,
        bdr_attrs=np.asarray(bdr_attrs, dtype=np.int64),
        elem_attrs=np.asarray(eattrs, dtype=np.int64),
    )


# Gmsh element type codes -> (geom, nverts)
_GMSH_ELEM = {3: ("quad", 4), 5: ("hex", 8), 1: ("segment", 2),
              2: ("tri", 3), 4: ("tet", 4)}
_GMSH_BDR_FOR = {"quad": "segment", "hex": "quad", "tri": "segment",
                 "tet": "tri"}


def read_gmsh_mesh(path: str) -> Mesh:
    """Gmsh 2.2 ASCII reader (quad/hex volume elements; physical groups
    become boundary attributes, as the reference's meshes use)."""
    with open(path) as f:
        text = f.read()

    def block(name):
        start = text.find(f"${name}\n")
        if start < 0:
            return None
        end = text.find(f"$End{name}")
        return text[start + len(name) + 2 : end].strip().splitlines()

    fmt = block("MeshFormat")
    if fmt is None:
        raise ValueError(f"{path}: missing $MeshFormat")
    version = float(fmt[0].split()[0])
    if version >= 3.0:
        raise NotImplementedError(f"{path}: gmsh format {version} (need 2.x ASCII)")

    nlines = block("Nodes")
    nn = int(nlines[0])
    coords = np.zeros((nn, 3))
    id_map = {}
    for k in range(nn):
        parts = nlines[1 + k].split()
        id_map[int(parts[0])] = k
        coords[k] = [float(x) for x in parts[1:4]]

    elines = block("Elements")
    nel = int(elines[0])
    vols, vol_geom = [], set()
    bdrs = []  # (attr, verts)
    for k in range(nel):
        parts = [int(x) for x in elines[1 + k].split()]
        etype = parts[1]
        ntags = parts[2]
        phys = parts[3] if ntags >= 1 else 0
        verts = [id_map[v] for v in parts[3 + ntags :]]
        if etype not in _GMSH_ELEM:
            continue
        g, nvt = _GMSH_ELEM[etype]
        if g in ("quad", "hex"):
            vols.append((g, verts, phys))
            vol_geom.add(g)
        else:
            bdrs.append((phys, verts))

    if not vols:
        raise ValueError(f"{path}: no supported volume elements found")
    if len(vol_geom) == 2:
        # 2-D mesh: quads are the volume, segments the boundary
        pass
    geom = "hex" if "hex" in vol_geom else "quad"
    dim = 3 if geom == "hex" else 2
    if geom == "hex":
        vols = [t for t in vols if t[0] == "hex"]
        bdrs = [(a, v) for a, v in bdrs if len(v) == 4]
    elements = np.asarray([v for _, v, _ in vols], dtype=np.int64)
    eattrs = np.asarray([a for _, _, a in vols], dtype=np.int64)

    if bdrs:
        width = max(len(v) for _, v in bdrs)
        bf = np.zeros((len(bdrs), width), dtype=np.int64)
        ba = np.zeros(len(bdrs), dtype=np.int64)
        for j, (a, v) in enumerate(bdrs):
            bf[j, : len(v)] = v
            ba[j] = a
    else:
        bf = np.zeros((0, 0), dtype=np.int64)
        ba = np.zeros(0, dtype=np.int64)

    return Mesh(
        dim=dim,
        geom=geom,
        vertices=coords[:, :dim],
        elements=elements,
        bdr_faces=bf,
        bdr_attrs=ba,
        elem_attrs=eattrs,
    )


def read_mesh(path: str) -> Mesh:
    if path.endswith(".msh"):
        return read_gmsh_mesh(path)
    return read_mfem_mesh(path)
