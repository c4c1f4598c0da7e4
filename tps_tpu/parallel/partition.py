"""Domain decomposition: element partitioning and sharded DG tables.

The TPU-native replacement for the reference's MPI mesh partitioning + halo
machinery (reference: src/M2ulPhyS.cpp:329-365 METIS partition;
src/rhs_operator.cpp:775-830 packed face-neighbor exchange): elements are
assigned to shards, each shard's tables cover its owned elements plus a
one-element halo, and all per-shard tables are padded to uniform shapes and
stacked along a leading shard axis so one SPMD program (shard_map over a
jax device mesh) runs everywhere.  Halo refresh is a static pack ->
all-gather -> unpack (ICI collective), the moral equivalent of the
reference's device-packed MPI_Isend/Irecv rings.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from ..dg.discretization import (
    DGTables,
    build_ef_tables,
    build_slot_tables,
    build_tables,
)
from ..mesh.mesh import Mesh

# fields shared across shards (replicated, no leading shard axis)
SHARED_FIELDS = ("Bvol", "Gvol", "wq", "Btr", "Btr_or")
# per-element fields sliced by local element list
ELEM_FIELDS = ("adjJ", "detJ", "Minv", "xyz_dof", "delta")


@dataclass
class ShardedBuild:
    tables: DGTables  # stacked numpy tables, leading axis = nparts
    nparts: int
    ne_global: int
    partition: np.ndarray  # [ne_global] shard of each element
    bc_attr_blocks: list  # [(attr, start, stop)] in padded bdr-face coords
    global_tables: DGTables | None = None  # unsharded tables (IO/viz/BC setup)
    bdr_rows: np.ndarray | None = None  # [P, NFB] global bdr row (-1 pad)


def block_partition(ne: int, nparts: int) -> np.ndarray:
    """Contiguous block partition of the element index range."""
    return np.minimum((np.arange(ne) * nparts) // ne, nparts - 1).astype(np.int32)


def coordinate_partition(mesh: Mesh, nparts: int, axis: int = 0) -> np.ndarray:
    """Slab partition by element-centroid coordinate (good locality for
    generator meshes; a graph partitioner can be plugged in here)."""
    cent = mesh.vertices[mesh.elements].mean(axis=1)[:, axis]
    order = np.argsort(cent, kind="stable")
    part = np.empty(len(order), dtype=np.int32)
    part[order] = block_partition(len(order), nparts)
    return part


def build_sharded_tables(
    mesh: Mesh,
    order: int,
    nparts: int,
    partition: np.ndarray | None = None,
    faces=None,
    **build_kw,
) -> ShardedBuild:
    """Build stacked per-shard DG tables from a global mesh.

    `faces` overrides the face topology (mixed-mesh buckets carry their
    tri/quad interface faces as extra boundary faces)."""
    if faces is None:
        faces = mesh.build_faces()
    g = build_tables(mesh, order, faces=faces, **build_kw)
    ne_g = g.ne
    if partition is None:
        partition = coordinate_partition(mesh, nparts)
    partition = np.asarray(partition, dtype=np.int32)
    P = nparts

    gl_l = g.f_elem_l[: g.nfi]
    gl_r = g.f_elem_r

    # ---- ownership, halos, send/recv lists ----
    own_lists = [np.where(partition == p)[0] for p in range(P)]
    halo_sets = [dict() for _ in range(P)]  # global id -> None (ordered set)
    for f in range(g.nfi):
        el, er = int(gl_l[f]), int(gl_r[f])
        pl, pr = partition[el], partition[er]
        if pl != pr:
            halo_sets[pl].setdefault(er)
            halo_sets[pr].setdefault(el)
    halo_lists = [np.array(sorted(h.keys()), dtype=np.int64) for h in halo_sets]

    # send list of shard p: own elements appearing in any other shard's halo
    send_lists = []
    for p in range(P):
        need = set()
        for q in range(P):
            if q == p:
                continue
            need.update(int(e) for e in halo_lists[q] if partition[e] == p)
        send_lists.append(np.array(sorted(need), dtype=np.int64))

    n_own = [len(o) for o in own_lists]
    n_halo = [len(h) for h in halo_lists]
    NE = max(no + nh for no, nh in zip(n_own, n_halo)) + 1  # +1 dummy slot
    S = max(1, max(len(s) for s in send_lists))
    H = max(1, max(n_halo))

    # global->local maps per shard
    lid_maps = []
    for p in range(P):
        lm = {int(e): i for i, e in enumerate(own_lists[p])}
        for j, e in enumerate(halo_lists[p]):
            lm[int(e)] = n_own[p] + j
        lid_maps.append(lm)
    send_pos = [{int(e): i for i, e in enumerate(s)} for s in send_lists]

    # ---- per-shard face selection ----
    # boundary attr blocks in the global (attr-sorted) bdr ordering
    attrs = g.f_bdr_attr
    uniq_attrs = []
    for a in attrs:
        if not uniq_attrs or uniq_attrs[-1] != int(a):
            uniq_attrs.append(int(a))

    shard_int_faces = []  # list of arrays of global interior-face ids
    shard_bdr_faces = {a: [] for a in uniq_attrs}  # attr -> per-shard lists
    for p in range(P):
        own = set(int(e) for e in own_lists[p])
        fi = [
            f
            for f in range(g.nfi)
            if int(gl_l[f]) in own or int(gl_r[f]) in own
        ]
        shard_int_faces.append(np.array(fi, dtype=np.int64))
        for a in uniq_attrs:
            rows = [
                j
                for j in range(g.nfb)
                if int(attrs[j]) == a and int(g.f_elem_l[g.nfi + j]) in own
            ]
            shard_bdr_faces[a].append(np.array(rows, dtype=np.int64))

    NFI = max(1, max(len(x) for x in shard_int_faces))
    attr_pad = {a: max(1, max(len(x) for x in shard_bdr_faces[a])) for a in uniq_attrs}
    NFB = sum(attr_pad.values())
    NFT = NFI + NFB

    bc_attr_blocks = []
    off = 0
    for a in uniq_attrs:
        bc_attr_blocks.append((a, off, off + attr_pad[a]))
        off += attr_pad[a]

    # ---- assemble stacked arrays ----
    def zeros(shape, dtype=np.float64):
        return np.zeros((P,) + shape, dtype=dtype)

    st = {
        "f_elem_l": np.full((P, NFT), -1, dtype=np.int32),
        "f_slot_l": zeros((NFT,), np.int32),
        "f_elem_r": np.full((P, NFI), -1, dtype=np.int32),
        "f_slot_r": zeros((NFI,), np.int32),
        "f_qperm_r": np.tile(np.arange(g.nqf, dtype=np.int32), (P, NFI, 1)),
        "f_nor": zeros((NFT, g.nqf, g.dim)),
        "f_wts": zeros((NFT, g.nqf)),
        "f_xyz": zeros((NFT, g.nqf, g.dim)),
        "f_bdr_attr": zeros((NFB,), np.int32),
        "ef_face": zeros((NE, g.nlf), np.int32),
        "ef_qmap": zeros((NE, g.nlf, g.nqf), np.int32),
        "ef_sign": zeros((NE, g.nlf)),
        "own_mask": zeros((NE,)),
        "halo_send_idx": zeros((S,), np.int32),
        "halo_recv_idx": zeros((H,), np.int32),
        "halo_slots": np.full((P, H), NE - 1, dtype=np.int32),
        "global_ids": np.full((P, NE), -1, dtype=np.int32),
        # neighbor-slot fast path (same formulation as single-device; the
        # global combo map is reused so Btr_or stays shard-replicated)
        "nbr_row": zeros((NE, g.nlf), np.int32),
        "nor_slot": zeros((NE, g.nlf, g.nqf, g.dim)),
        "wts_slot": zeros((NE, g.nlf, g.nqf)),
        "xyz_slot": zeros((NE, g.nlf, g.nqf, g.dim)),
        "delta_nbr": zeros((NE, g.nlf)),
        "interior_mask": zeros((NE, g.nlf)),
        "bdr_slot": np.full((P, NFB), NE * g.nlf, dtype=np.int32),
        "nor_wpf": zeros((g.nlf, NE, g.nqf * g.dim)),
    }
    # global attr-sorted bdr-face index per padded slot (-1 padding):
    # mixed-mesh interface blocks use it to address the cross-bucket
    # interface buffers
    bdr_rows = np.full((P, NFB), -1, dtype=np.int32)
    # axisymmetric runs carry the radius tables through the same slicing
    # (reference: axisym under MPI like everything else, src/M2ulPhyS.cpp)
    axisym = g.rad_vol is not None
    elem_fields = list(ELEM_FIELDS) + (["rad_vol", "Minv_rad"] if axisym
                                       else [])
    # diagonal inverse mass (when the mesh is affine) shards like any
    # other per-element table
    if g.minv_diag is not None:
        elem_fields.append("minv_diag")
    if axisym and g.minv_rad_diag is not None:
        elem_fields.append("minv_rad_diag")
    for name in elem_fields:
        arr = getattr(g, name)
        st[name] = zeros((NE,) + arr.shape[1:], arr.dtype)
    if axisym:
        st["rad_face"] = zeros((NFT, g.nqf))
        st["rad_face_r"] = zeros((NFI, g.nqf))
        st["rad_slot"] = zeros((NE, g.nlf, g.nqf))

    # padding faces keep safe unit normals to avoid NaNs in dead lanes
    st["f_nor"][..., 0] = 1.0

    for p in range(P):
        lm = lid_maps[p]
        loc = np.concatenate([own_lists[p], halo_lists[p]]).astype(np.int64)
        nloc = len(loc)
        st["global_ids"][p, :nloc] = loc
        st["own_mask"][p, : n_own[p]] = 1.0
        for name in elem_fields:
            garr = getattr(g, name)
            st[name][p, :nloc] = garr[loc]
            # dummy/padding slots reuse element-0 geometry (valid, never read)
            st[name][p, nloc:] = garr[0]

        # interior faces
        fi = shard_int_faces[p]
        nfi_p = len(fi)
        st["f_elem_l"][p, :nfi_p] = [lm[int(gl_l[f])] for f in fi]
        st["f_slot_l"][p, :nfi_p] = g.f_slot_l[fi]
        st["f_elem_r"][p, :nfi_p] = [lm[int(gl_r[f])] for f in fi]
        st["f_slot_r"][p, :nfi_p] = g.f_slot_r[fi]
        st["f_qperm_r"][p, :nfi_p] = g.f_qperm_r[fi]
        st["f_nor"][p, :nfi_p] = g.f_nor[fi]
        st["f_wts"][p, :nfi_p] = g.f_wts[fi]
        st["f_xyz"][p, :nfi_p] = g.f_xyz[fi]
        if axisym:
            st["rad_face"][p, :nfi_p] = g.rad_face[fi]
            st["rad_face_r"][p, :nfi_p] = g.rad_face_r[fi]

        # boundary faces per attr block
        for (a, bstart, bstop) in bc_attr_blocks:
            rows = shard_bdr_faces[a][p]
            k = len(rows)
            dst = NFI + bstart
            st["f_bdr_attr"][p, bstart:bstop] = a
            if k:
                gid = g.nfi + rows
                bdr_rows[p, bstart : bstart + k] = rows
                st["f_elem_l"][p, dst : dst + k] = [lm[int(g.f_elem_l[j])] for j in gid]
                st["f_slot_l"][p, dst : dst + k] = g.f_slot_l[gid]
                st["f_nor"][p, dst : dst + k] = g.f_nor[gid]
                st["f_wts"][p, dst : dst + k] = g.f_wts[gid]
                st["f_xyz"][p, dst : dst + k] = g.f_xyz[gid]
                if axisym:
                    st["rad_face"][p, dst : dst + k] = g.rad_face[gid]

        # scatter-back tables (padding faces have elem -1 and are skipped;
        # unassigned halo-element slots -> null face NFT)
        ef_face, ef_qmap, ef_sign = build_ef_tables(
            NE, g.nlf, g.nqf, NFI, NFT,
            st["f_elem_l"][p], st["f_slot_l"][p],
            st["f_elem_r"][p], st["f_slot_r"][p], st["f_qperm_r"][p],
            allow_unassigned=True,
        )
        st["ef_face"][p] = ef_face
        st["ef_qmap"][p] = ef_qmap
        st["ef_sign"][p] = ef_sign

        # neighbor-slot tables for this shard, reusing the GLOBAL combo map
        # (so every shard indexes the same replicated Btr_or); padding faces
        # have f_elem == -1 and are skipped by the builder
        cro = np.zeros(NFI, np.int32)
        clr = np.zeros(NFI, np.int32)
        nr = np.zeros((NFI, g.nqf, g.dim))
        nr[..., 0] = 1.0  # safe normal on padding lanes
        wr = np.zeros((NFI, g.nqf))
        xr = np.zeros((NFI, g.nqf, g.dim))
        cro[:nfi_p] = g.f_combo_r_inL[fi]
        clr[:nfi_p] = g.f_combo_l_inR[fi]
        nr[:nfi_p] = g.f_nor_r[fi]
        wr[:nfi_p] = g.f_wts_r[fi]
        xr[:nfi_p] = g.f_xyz_r[fi]
        slot = build_slot_tables(
            {
                "n_combo": g.n_combo,
                "f_combo_r_inL": cro,
                "f_combo_l_inR": clr,
                "f_nor_r": nr,
                "f_wts_r": wr,
                "f_xyz_r": xr,
                "rad_face_r": st["rad_face_r"][p] if axisym else None,
            },
            NE, g.nlf, g.nqf, g.dim, NFI, NFT,
            st["f_elem_l"][p], st["f_slot_l"][p],
            st["f_elem_r"][p], st["f_slot_r"][p],
            st["f_nor"][p], st["f_wts"][p], st["f_xyz"][p],
            st["delta"][p],
            rad_face=st["rad_face"][p] if axisym else None,
        )
        for name in ("nbr_row", "nor_slot", "wts_slot", "xyz_slot",
                     "delta_nbr", "interior_mask", "bdr_slot", "nor_wpf") + (
                         ("rad_slot",) if axisym else ()):
            st[name][p] = slot[name]

        # halo exchange maps
        sl = send_lists[p]
        st["halo_send_idx"][p, : len(sl)] = [lm[int(e)] for e in sl]
        for j, e in enumerate(halo_lists[p]):
            op = int(partition[int(e)])
            st["halo_recv_idx"][p, j] = op * S + send_pos[op][int(e)]
            st["halo_slots"][p, j] = n_own[p] + j

    # clip padding face elem ids to 0 for safe gathers
    st["f_elem_l"] = np.maximum(st["f_elem_l"], 0)
    st["f_elem_r"] = np.maximum(st["f_elem_r"], 0)

    tables = DGTables(
        dim=g.dim, order=g.order, ne=NE, ndof=g.ndof, nq=g.nq, nlf=g.nlf,
        nqf=g.nqf, nfi=NFI, nfb=NFB,
        Bvol=g.Bvol, Gvol=g.Gvol, wq=g.wq, Btr=g.Btr,
        n_combo=g.n_combo, Btr_or=g.Btr_or,
        distance=None,
        **st,
    )
    return ShardedBuild(
        tables=tables,
        nparts=P,
        ne_global=ne_g,
        partition=partition,
        bc_attr_blocks=bc_attr_blocks,
        global_tables=g,
        bdr_rows=bdr_rows,
    )


def scatter_state(build: ShardedBuild, U_global):
    """U_global [ne_g, ndof, k] -> sharded [P, NE, ndof, k] (numpy or jnp)."""
    gids = np.maximum(np.asarray(build.tables.global_ids), 0)
    return U_global[gids]


def gather_state(build: ShardedBuild, U_sharded):
    """Sharded [P, NE, ndof, k] -> global [ne_g, ndof, k] from owned rows."""
    gids = np.asarray(build.tables.global_ids)
    own = np.asarray(build.tables.own_mask) > 0.5
    out = np.zeros((build.ne_global,) + tuple(U_sharded.shape[2:]),
                   dtype=np.asarray(U_sharded).dtype)
    Us = np.asarray(U_sharded)
    for p in range(build.nparts):
        out[gids[p][own[p]]] = Us[p][own[p]]
    return out


def save_partition(path, partition, nparts):
    """Persist the element partition (reference: partitioning_file_hdf5
    'write', src/io.cpp — partition.Np.h5 keeps restarts consistent)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["nparts"] = int(nparts)
        f["partitioning"] = np.asarray(partition, dtype=np.int32)


def load_partition(path, expected_ne=None, expected_nparts=None):
    """Read a persisted partition; validates sizes when given."""
    import h5py

    with h5py.File(path, "r") as f:
        part = np.asarray(f["partitioning"], dtype=np.int32)
        nparts = int(f.attrs["nparts"])
    if expected_ne is not None and len(part) != expected_ne:
        raise ValueError(
            f"partition file has {len(part)} elements, expected {expected_ne}"
        )
    if expected_nparts is not None and nparts != expected_nparts:
        raise ValueError(
            f"partition file has {nparts} parts, expected {expected_nparts}"
        )
    return part
