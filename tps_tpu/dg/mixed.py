"""Mixed-element DG: per-geometry buckets coupled through interface faces.

The reference runs mixed tri/quad meshes through MFEM's generic element
model and buckets elements by type for its GPU kernels (reference:
src/dgNonlinearForm.cpp:96-104; mixed mesh cases:
test/inputs/input.cyl-2d.case*.ini on test/meshes/cyl-2d-mixed.msh).

TPU-native design: one DGTables per element type (static shapes per
bucket), with tri/quad interface faces carried in each bucket's
boundary-face block under a sentinel attribute.  At runtime the interface
flux on each side is evaluated from (own trace, partner-bucket trace
gathered at matched quadrature points); Riemann conservativity
F(a, b, n) = -F(b, a, -n) makes the two sides consistent without any
cross-bucket scatter.  2-D tri+quad only: both face types are segments
with identical quadrature, so traces pair point-for-point.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mesh.mesh import FaceInfo
from .discretization import build_tables

INTERFACE_ATTR = 1 << 30  # sorts after every real boundary attribute


@dataclass
class MixedDGTables:
    buckets: tuple  # (DGTables, DGTables)
    n_iface: int  # interface face count (same faces seen from both sides)
    # per bucket [n_iface]: partner element-face row (e*nlf + lf) in the
    # OTHER bucket's trace-flat array, and the point permutation aligning
    # the partner's trace ordering to this bucket's interface-face ordering
    partner_row: tuple
    partner_qperm: tuple
    # ---- domain-decomposition fields (None single-device) ----
    # Sharded mixed tables exchange interface traces through a GLOBAL
    # [n_iface, ...] buffer assembled with a psum: each shard scatters its
    # local interface faces' own traces at their global crossing ids, and
    # gathers the partner bucket's buffer rows back.
    axis_name: str | None = None
    iface_block: tuple | None = None  # per bucket (start, stop) in padded
    #                                   bdr-face coords
    iface_gid: tuple | None = None  # per bucket [(P,) NIFB] crossing id, -1 pad
    iface_qperm: tuple | None = None  # per bucket [(P,) NIFB, nqf]

    def to_jax(self, dtype):
        import jax.numpy as jnp

        return MixedDGTables(
            buckets=tuple(b.to_jax(dtype) for b in self.buckets),
            n_iface=self.n_iface,
            partner_row=tuple(jnp.asarray(r) for r in self.partner_row)
            if self.partner_row is not None else None,
            partner_qperm=tuple(jnp.asarray(q) for q in self.partner_qperm)
            if self.partner_qperm is not None else None,
            axis_name=self.axis_name,
            iface_block=self.iface_block,
            iface_gid=tuple(jnp.asarray(g) for g in self.iface_gid)
            if self.iface_gid is not None else None,
            iface_qperm=tuple(jnp.asarray(q) for q in self.iface_qperm)
            if self.iface_qperm is not None else None,
        )


def _register_mixed_pytree():
    import jax
    from dataclasses import fields as _fields

    meta = ["n_iface", "axis_name", "iface_block"]
    data = [f.name for f in _fields(MixedDGTables) if f.name not in meta]
    jax.tree_util.register_dataclass(MixedDGTables, data_fields=data,
                                     meta_fields=meta)


_register_mixed_pytree()


def _mixed_face_info(mm):
    """Face discovery over both buckets: per-bucket FaceInfo (interface
    faces appended as boundary faces under INTERFACE_ATTR, in `crosses`
    order) plus the cross-bucket crossing list."""
    face_map: dict[tuple, list] = {}
    for b, mesh in enumerate(mm.parts):
        lf_defs = mesh.local_faces
        for e in range(mesh.num_elements):
            ev = mesh.elements[e]
            for lf, fv in enumerate(lf_defs):
                key = tuple(sorted(int(ev[v]) for v in fv))
                face_map.setdefault(key, []).append((b, e, lf))

    bdr_key_to_attr = {}
    for i in range(mm.bdr_faces.shape[0]):
        key = tuple(sorted(int(v) for v in mm.bdr_faces[i]))
        bdr_key_to_attr[key] = int(mm.bdr_attrs[i])

    int_faces = [[] for _ in mm.parts]  # (eL, lfL, eR, lfR) within bucket
    bdr_faces = [[] for _ in mm.parts]  # (e, lf, attr) real boundary
    crosses = []  # ((e0, lf0), (e1, lf1)) bucket-0 side first
    for key, owners in face_map.items():
        if len(owners) == 2:
            (b1, e1, l1), (b2, e2, l2) = owners
            if b1 == b2:
                int_faces[b1].append((e1, l1, e2, l2))
            else:
                sides = {b1: (e1, l1), b2: (e2, l2)}
                crosses.append((sides[0], sides[1]))
        elif len(owners) == 1:
            # single-owner face = boundary; faces missing from the mesh's
            # boundary list default to attribute 1 (matching
            # Mesh.build_faces for single-type meshes)
            b, e, lf = owners[0]
            bdr_faces[b].append((e, lf, bdr_key_to_attr.get(key, 1)))
        else:
            raise ValueError(f"face {key} shared by {len(owners)} elements")

    n_iface = len(crosses)
    fis = []
    for b, mesh in enumerate(mm.parts):
        ii = np.asarray(int_faces[b], dtype=np.int32).reshape(-1, 4)
        be = [x[0] for x in bdr_faces[b]] + [c[b][0] for c in crosses]
        bl = [x[1] for x in bdr_faces[b]] + [c[b][1] for c in crosses]
        battr = ([x[2] for x in bdr_faces[b]]
                 + [INTERFACE_ATTR] * n_iface)
        fis.append(FaceInfo(
            int_elem_l=ii[:, 0], int_lf_l=ii[:, 1],
            int_elem_r=ii[:, 2], int_lf_r=ii[:, 3],
            int_shift=np.zeros((len(ii), mesh.dim)),
            bdr_elem=np.asarray(be, dtype=np.int32),
            bdr_lf=np.asarray(bl, dtype=np.int32),
            bdr_attr=np.asarray(battr, dtype=np.int32),
        ))
    return fis, crosses


def _iface_qperm(tabs, crosses, n_iface, nif_block=None):
    """Partner trace rows + point permutations per bucket (global tables:
    this bucket's interface faces are the bdr tail, in `crosses` order)."""
    partner_row, partner_qperm = [], []
    nqf = tabs[0].nqf
    assert tabs[1].nqf == nqf, "face quadrature mismatch between buckets"
    for b in (0, 1):
        tp = tabs[1 - b]
        rows = np.zeros(n_iface, dtype=np.int32)
        qperm = np.zeros((n_iface, nqf), dtype=np.int32)
        own_xyz = tabs[b].f_xyz[tabs[b].nfi + (tabs[b].nfb - n_iface):]
        for k, cross in enumerate(crosses):
            ep, lp = cross[1 - b]
            rows[k] = ep * tp.nlf + lp
            pts = tp.Btr[lp * nqf:(lp + 1) * nqf] @ tp.xyz_dof[ep]
            d2 = np.sum((own_xyz[k][:, None, :] - pts[None, :, :]) ** 2, -1)
            qperm[k] = np.argmin(d2, axis=-1).astype(np.int32)
            mind = np.sqrt(d2[np.arange(nqf), qperm[k]])
            if (np.sort(qperm[k]) != np.arange(nqf)).any() or (
                    mind > 1e-8 * max(1.0, float(np.abs(pts).max()))).any():
                raise ValueError("mixed interface point matching failed "
                                 "(non-conforming tri/quad seam?)")
        partner_row.append(rows)
        partner_qperm.append(qperm)
    return partner_row, partner_qperm


def build_mixed_tables(mm, order, basis="gauss-legendre",
                       quad_rule="gauss-legendre",
                       vol_quad_order=None, face_quad_order=None,
                       axisymmetric=False) -> MixedDGTables:
    """Build per-bucket DGTables for a MixedMesh plus interface pairing."""
    if len(mm.parts) != 2:
        raise NotImplementedError("mixed tables support exactly 2 buckets")
    if any(p.curved_nodes is not None for p in mm.parts):
        raise NotImplementedError("curved mixed meshes")
    if face_quad_order is None:
        face_quad_order = 2 * order + 1

    fis, crosses = _mixed_face_info(mm)
    n_iface = len(crosses)
    tabs = []
    for b, mesh in enumerate(mm.parts):
        tabs.append(build_tables(
            mesh, order, basis=basis, quad_rule=quad_rule,
            vol_quad_order=vol_quad_order,
            face_quad_order=face_quad_order, faces=fis[b],
            axisymmetric=axisymmetric,
        ))

    # ---- interface pairing: partner trace rows + point permutations ----
    # Trace row (e*nlf + lf) of bucket p carries points at
    # Btr[lf*nqf:(lf+1)*nqf] @ xyz_dof[e] (valid for straight-sided
    # elements; Btr row order accounts for any orientation baking).
    partner_row, partner_qperm = _iface_qperm(tabs, crosses, n_iface)

    return MixedDGTables(
        buckets=tuple(tabs), n_iface=n_iface,
        partner_row=tuple(partner_row), partner_qperm=tuple(partner_qperm),
    )


def make_bc_slices(mt: MixedDGTables, bc_by_attr: dict):
    """Per-bucket BCSlice lists from {attr: bc object}.  Every real
    boundary attribute must be covered; interface faces are handled by the
    mixed RHS itself."""
    from .rhs import BCSlice

    out = []
    for b, tab in enumerate(mt.buckets):
        attrs = np.asarray(tab.f_bdr_attr)
        nreal = tab.nfb - mt.n_iface
        slices = []
        covered = np.zeros(nreal, dtype=bool)
        for attr, bc in bc_by_attr.items():
            rows = np.where(attrs[:nreal] == attr)[0]
            if len(rows) == 0:
                continue
            start, stop = int(rows.min()), int(rows.max()) + 1
            slices.append(BCSlice(bc=bc, start=start, stop=stop))
            covered[start:stop] = True
        if nreal and not covered.all():
            missing = sorted(set(int(a) for a in attrs[:nreal][~covered]))
            raise ValueError(f"no boundary condition for patch(es) {missing}")
        slices.sort(key=lambda s: s.start)
        out.append(tuple(slices))
    return tuple(out)



def make_bc_slices_sharded(smx, bc_by_attr):
    """Per-bucket BCSlice lists over the padded per-shard attr blocks
    (identical block coordinates on every shard)."""
    from .rhs import BCSlice

    out = []
    for b in range(2):
        slices = []
        missing = []
        for (a, s, e) in smx.bc_attr_blocks[b]:
            if a not in bc_by_attr:
                missing.append(a)
                continue
            slices.append(BCSlice(bc=bc_by_attr[a], start=s, stop=e))
        if missing:
            raise ValueError(
                f"no boundary condition for patch(es) {sorted(missing)}")
        slices.sort(key=lambda s: s.start)
        out.append(tuple(slices))
    return tuple(out)


def _ifb(mt, b):
    """Interface block (start, stop) in bucket b's bdr-face coordinates:
    the tail [nfb-nif, nfb) single-device, the padded INTERFACE_ATTR block
    when sharded."""
    if mt.iface_block is not None:
        return mt.iface_block[b]
    nfb = mt.buckets[b].nfb
    return (nfb - mt.n_iface, nfb)


def _partner_traces(mt, trX, b, extra=None):
    """Partner-bucket trace values on bucket b's interface faces
    [nifb, nqf, k], point-aligned to b's ordering.

    Single-device: direct partner-row gather.  Sharded: scatter the
    partner bucket's local interface traces into the global [n_iface, ...]
    buffer at their crossing ids, psum over the device-mesh axis, gather
    this bucket's rows back.  `extra` appends per-face payload channels
    (e.g. the partner element's length scale) [nifb_partner, 1]."""
    import jax.numpy as jnp

    if mt.axis_name is None:
        prt = jnp.take_along_axis(
            trX[1 - b][mt.partner_row[b]],
            mt.partner_qperm[b][..., None], axis=1)
        if extra is not None:
            prt = jnp.concatenate(
                [prt, jnp.broadcast_to(
                    extra[:, None, :], prt.shape[:2] + (extra.shape[-1],))],
                axis=-1)
        return prt
    import jax

    pt = mt.buckets[1 - b]
    p0, p1 = _ifb(mt, 1 - b)
    rows_p = (pt.f_elem_l[pt.nfi + p0: pt.nfi + p1] * pt.nlf
              + pt.f_slot_l[pt.nfi + p0: pt.nfi + p1])
    own_p = trX[1 - b][rows_p]  # [NIFBp, nqf, k] partner's own traces
    if extra is not None:
        own_p = jnp.concatenate(
            [own_p, jnp.broadcast_to(
                extra[:, None, :], own_p.shape[:2] + (extra.shape[-1],))],
            axis=-1)
    gidp = mt.iface_gid[1 - b]
    # where, not multiply: padded slots can reference rows whose state is
    # garbage, and NaN * 0 is NaN — a single NaN here would spread to all
    # shards through the psum
    own_p = jnp.where((gidp >= 0)[:, None, None], own_p, 0.0)
    G = jnp.zeros((mt.n_iface,) + own_p.shape[1:], own_p.dtype)
    G = G.at[jnp.maximum(gidp, 0)].add(own_p)
    G = jax.lax.psum(G, mt.axis_name)
    gidb = mt.iface_gid[b]
    prt = G[jnp.maximum(gidb, 0)]
    return jnp.take_along_axis(prt, mt.iface_qperm[b][..., None], axis=1)


def _interface_bdr_up2(mt, trUp, b, tab):
    """Exterior primitive state on bucket b's boundary block: own trace on
    real boundary faces (zero jump), partner-bucket trace on the interface
    block.  Shared by the RHS gradient stage and the stateful-BC boundary
    data so the two can never diverge."""
    rows_b = tab.f_elem_l[tab.nfi:] * tab.nlf + tab.f_slot_l[tab.nfi:]
    own_b = trUp[b][rows_b]
    partner = _partner_traces(mt, trUp, b)
    i0, i1 = _ifb(mt, b)
    if mt.axis_name is not None:
        # padded interface rows carry buffer row 0 (zero weights downstream)
        # but a zero-density primitive would poison gradients via 1/rho-free
        # terms; keep the own trace there instead
        import jax.numpy as jnp

        valid = (mt.iface_gid[b] >= 0).astype(partner.dtype)[:, None, None]
        partner = partner * valid + own_b[i0:i1] * (1.0 - valid)
    return own_b.at[i0:i1].set(partner)


def _stateless_patch_stats(mt, ctxs, trX):
    """Cross-bucket patch means for stateless BCs that compute one
    internally: the mass-flow outlet's density mean and the far-field
    "patch-mean" reference velocity.  A patch crossing the tri/quad seam
    is served by ONE BC object in both buckets' slices; its mean must
    cover both buckets' faces (and all shards), like the reference's
    bucket-agnostic per-patch subcommunicators (src/mpi_groups.hpp:44-78).
    Returns {id(bc): {"rho_mean": ..., "un_mean": ...}}."""
    import jax
    import jax.numpy as jnp

    from .rhs import _clip_species

    mix = ctxs[0].mixture
    neq = mix.num_equations
    nvel = mix.nvel
    accum = {}
    for b, tab in enumerate(mt.buckets):
        if not tab.nfb:
            continue
        nfi = tab.nfi
        ULb = _clip_species(mix, trX[b][tab.bdr_slot][..., :neq])
        norb = tab.f_nor[nfi:]
        nmag = jnp.linalg.norm(norb, axis=-1)
        wmagb = tab.f_wts[nfi:] * nmag
        nhat = norb / jnp.maximum(nmag, 1e-300)[..., None]
        for s in ctxs[b].bcs:
            bc = s.bc
            need_rho = getattr(bc, "kind", None) == "nonReflectingMassFlow"
            need_un = isinstance(getattr(bc, "ref_vel_n", 0.0), str)
            if not (need_rho or need_un):
                continue
            sl = slice(s.start, s.stop)
            UL = ULb[sl]
            w = wmagb[sl]
            rho = UL[..., 0]
            vel = UL[..., 1 : 1 + nvel] / rho[..., None]
            un = jnp.einsum("...d,...d->...", vel[..., : tab.dim], nhat[sl])
            e = accum.setdefault(id(bc), [0.0, 0.0, 0.0, need_rho, need_un])
            e[0] = e[0] + jnp.sum(w * rho)
            e[1] = e[1] + jnp.sum(w * un)
            e[2] = e[2] + jnp.sum(w)
    out = {}
    for k, (nr, nu, den, need_rho, need_un) in accum.items():
        if mt.axis_name is not None:
            nr = jax.lax.psum(nr, mt.axis_name)
            nu = jax.lax.psum(nu, mt.axis_name)
            den = jax.lax.psum(den, mt.axis_name)
        den = jnp.maximum(den, 1e-300)
        d = {}
        if need_rho:
            d["rho_mean"] = nr / den
        if need_un:
            d["un_mean"] = nu / den
        out[k] = d
    return out


def compute_rhs_mixed(mt: MixedDGTables, ctxs, Us, t=0.0, bc_states=None):
    """Mixed-mesh RHS: per-bucket slot face sweeps with interface fluxes
    evaluated against partner-bucket traces.  Mirrors compute_rhs
    (dg/rhs.py) stage-for-stage; runs element-sharded when mt carries the
    device-mesh axis (per-bucket halo exchange + psum-assembled interface
    buffers)."""
    import jax.numpy as jnp

    from .operators import (
        apply_minv,
        dg_gradient,
        elem_traces,
        halo_exchange,
        perface_traces,
        volume_weak_div,
    )
    from .rhs import _clip_species

    mix = ctxs[0].mixture
    neq = mix.num_equations
    viscous = ctxs[0].fluxes.eq_system != "euler"
    axis = mt.axis_name
    nif = mt.n_iface

    if axis is not None:
        Us = [halo_exchange(tab, U, axis)
              for tab, U in zip(mt.buckets, Us)]
    Ucl = [_clip_species(mix, U) for U in Us]
    Ups = [mix.primitives(U) for U in Ucl]

    # ---- gradients with conforming interface jumps (bdr_up2 hook) ----
    grads = [None, None]
    trUp = [None, None]
    if viscous:
        for b, tab in enumerate(mt.buckets):
            trUp[b] = elem_traces(tab, Ups[b]).reshape(
                Us[b].shape[0] * tab.nlf, tab.nqf, neq)
        for b, tab in enumerate(mt.buckets):
            bdr_up2 = _interface_bdr_up2(mt, trUp, b, tab) if nif else None
            grads[b] = dg_gradient(tab, Ups[b], bdr_up2=bdr_up2)
            if axis is not None:
                # halo elements' locally-computed gradients miss their
                # exterior contributions: refresh from the owners
                ne_b, ndof_b = Us[b].shape[0], Us[b].shape[1]
                grads[b] = halo_exchange(
                    tab, grads[b].reshape(ne_b, ndof_b, neq * tab.dim), axis
                ).reshape(ne_b, ndof_b, neq, tab.dim)

    # ---- per-bucket trace data [U | grad] ----
    Xs, trX = [], []
    for b, tab in enumerate(mt.buckets):
        ne, ndof = Us[b].shape[0], Us[b].shape[1]
        if viscous:
            X = jnp.concatenate(
                [Ucl[b], grads[b].reshape(ne, ndof, neq * tab.dim)], -1)
        else:
            X = Ucl[b]
        Xs.append(X)
        trX.append(elem_traces(tab, X).reshape(
            ne * tab.nlf, tab.nqf, X.shape[-1]))

    def _split(tab, Z):
        Uz = _clip_species(mix, Z[..., :neq])
        gz = (Z[..., neq:].reshape(Z.shape[:-1] + (neq, tab.dim))
              if viscous else None)
        return Uz, gz

    def _face_flux(ctx, U1, U2, g1, g2, nor, xyz, d1, d2):
        flux = ctx.riemann(U1, U2, nor)
        if viscous:
            Fv1 = ctx.fluxes.viscous(U1, mix.primitives(U1), g1,
                                     xyz=xyz, delta=d1)
            Fv2 = ctx.fluxes.viscous(U2, mix.primitives(U2), g2,
                                     xyz=xyz, delta=d2)
            flux = flux - jnp.einsum("...ed,...d->...e",
                                     0.5 * (Fv1 + Fv2), nor)
        return flux

    # patch-global means for stateless BCs (mass-flow density mean,
    # far-field "patch-mean" velocity) accumulated over BOTH buckets
    patch_stats = _stateless_patch_stats(mt, ctxs, trX)

    ys, mcss = [], []
    for b, tab in enumerate(mt.buckets):
        ctx = ctxs[b]
        ne, ndof = Us[b].shape[0], Us[b].shape[1]
        nqf = tab.nqf
        own_pf, nbr_pf = perface_traces(tab, Xs[b])

        def _split2(Z2, _tab=tab, _ne=ne):
            Z = Z2.reshape(_ne, _tab.nqf, -1)
            Uz = _clip_species(mix, Z[..., :neq])
            gz = (Z[..., neq:].reshape(Z.shape[:-1] + (neq, _tab.dim))
                  if viscous else None)
            return Uz, gz

        # per-face fused sweep (same formulation as compute_rhs: fused
        # minor dims, weights folded into nor_wpf)
        z2 = jnp.zeros((ne, ndof * neq), dtype=Us[b].dtype)
        eye_e = jnp.eye(neq, dtype=Us[b].dtype)
        K_outs = []
        for lf in range(tab.nlf):
            U_own, g_own = _split2(own_pf[lf])
            U_nbr, g_nbr = _split2(nbr_pf[lf])
            norw = tab.nor_wpf[lf].reshape(ne, nqf, tab.dim)
            flux = _face_flux(ctx, U_own, U_nbr, g_own, g_nbr, norw,
                              tab.xyz_slot[:, lf],
                              tab.delta[:, None, None],
                              tab.delta_nbr[:, lf, None, None])
            flux = flux * tab.interior_mask[:, lf, None, None]
            B = tab.Btr[lf * nqf : (lf + 1) * nqf]
            K_out = jnp.einsum("sj,ef->sejf", B, eye_e).reshape(
                nqf * neq, ndof * neq)
            K_outs.append(K_out)
            z2 = z2 + flux.reshape(ne, nqf * neq) @ K_out

        if tab.nfb:
            nfi = tab.nfi
            own_b = jnp.stack(own_pf, axis=1).reshape(
                ne * tab.nlf, nqf, Xs[b].shape[-1])[tab.bdr_slot]
            ULb, gLb = _split(tab, own_b)
            UpLb = mix.primitives(ULb)
            norb = tab.f_nor[nfi:]
            xyzb = tab.f_xyz[nfi:]
            deltab = tab.delta[tab.f_elem_l[nfi:]][:, None]
            wmagb = tab.f_wts[nfi:] * jnp.linalg.norm(norb, axis=-1)
            bdr_fluxes = []
            for i, s in enumerate(ctx.bcs):
                sl = slice(s.start, s.stop)
                st = None if bc_states is None else bc_states[b][i]
                extra = {}
                if id(s.bc) in patch_stats:
                    extra["patch_stats"] = patch_stats[id(s.bc)]
                bdr_fluxes.append(
                    s.bc.flux(ctx, ULb[sl], UpLb[sl],
                              None if gLb is None else gLb[sl],
                              norb[sl], xyzb[sl], deltab[sl], t,
                              state=st, wts=wmagb[sl], **extra))
            i0, i1 = _ifb(mt, b)
            covered = sum(s.stop - s.start for s in ctx.bcs)
            if covered != i0:
                raise ValueError(
                    "boundary faces not fully covered by BCs: "
                    f"{covered} != {i0}")
            if nif:
                # interface flux against the partner bucket's trace; the
                # partner element's length scale rides as an extra payload
                # channel (its element may live on another shard)
                if axis is None:
                    dp_extra = mt.buckets[1 - b].delta[
                        mt.partner_row[b] // mt.buckets[1 - b].nlf][:, None]
                else:
                    pt = mt.buckets[1 - b]
                    p0, p1 = _ifb(mt, 1 - b)
                    dp_extra = pt.delta[
                        pt.f_elem_l[pt.nfi + p0: pt.nfi + p1]][:, None]
                prt = _partner_traces(mt, trX, b, extra=dp_extra)
                U_p, g_p = _split(tab, prt[..., :-1])
                dp = prt[..., 0, -1][:, None]  # partner delta per face
                sl = slice(i0, i1)
                bdr_fluxes.append(_face_flux(
                    ctx, ULb[sl], U_p,
                    None if gLb is None else gLb[sl], g_p,
                    norb[sl], xyzb[sl], deltab[sl], dp))
            flux_b = jnp.concatenate(bdr_fluxes, axis=0)
            fwb = tab.f_wts[nfi:]
            if tab.rad_face is not None:
                fwb = fwb * tab.rad_face[nfi:]
            fb2 = (flux_b * fwb[..., None]).reshape(tab.nfb, nqf * neq)
            zb = jnp.zeros((ne * tab.nlf, nqf * neq), dtype=Us[b].dtype)
            zb = zb.at[tab.bdr_slot].set(fb2, mode="drop")
            zb = zb.reshape(ne, tab.nlf, nqf * neq)
            for lf in range(tab.nlf):
                z2 = z2 + zb[:, lf] @ K_outs[lf]

        z_face = -z2.reshape(ne, ndof, neq)

        Fdof = ctx.fluxes.total_at_dofs(
            Ucl[b], Ups[b], grads[b], tab.xyz_dof, tab.delta[:, None],
            distance=tab.distance)
        z_vol = volume_weak_div(tab, Fdof)
        y = apply_minv(tab, z_vol + z_face, radial=True)
        for f in ctx.forcings:
            y = y + f(t, tab, Ucl[b], Ups[b], grads[b], None)
        if axis is not None:
            # freeze non-owned rows: halo rows are refreshed from their
            # owners at every RHS call, and padding rows must never
            # integrate garbage into NaN (a shard may own ZERO elements of
            # one bucket — all its rows are padding)
            y = jnp.where(tab.own_mask[:, None, None] > 0.5, y, 0.0)
        ys.append(y)
        cs = mix.max_char_speed(Ucl[b])
        if axis is not None:
            # halo/padding rows hold stale or dummy state: mask them
            # (where, not multiply: NaN * 0 is NaN)
            cs = jnp.where(tab.own_mask[:, None] > 0.5, cs, 0.0)
        mcss.append(jnp.max(cs))

    mcs = jnp.maximum(*mcss)
    if axis is not None:
        import jax

        mcs = jax.lax.pmax(mcs, axis)
    aux = {"max_char_speed": mcs}
    return tuple(ys), aux


def _mixed_boundary_data(mt, ctxs, Us, need_grad):
    """Per-bucket interior traces at boundary-face quadrature points (the
    mixed analog of rhs._boundary_interior_data, with conforming interface
    gradient jumps).  Returns per bucket (ULb, UpLb, gLb, norb, wmagb) in
    the attr-sorted boundary ordering."""
    import jax.numpy as jnp

    from .operators import dg_gradient, elem_traces, halo_exchange
    from .rhs import _clip_species

    mix = ctxs[0].mixture
    neq = mix.num_equations
    nif = mt.n_iface
    out = []

    if mt.axis_name is not None:
        Us = [halo_exchange(tab, U, mt.axis_name)
              for tab, U in zip(mt.buckets, Us)]
    Ucl = [_clip_species(mix, U) for U in Us]
    Ups = [mix.primitives(U) for U in Ucl]
    trUp = [None, None]
    if need_grad:
        for b, tab in enumerate(mt.buckets):
            trUp[b] = elem_traces(tab, Ups[b]).reshape(
                Us[b].shape[0] * tab.nlf, tab.nqf, neq)
    for b, tab in enumerate(mt.buckets):
        ne, ndof = Us[b].shape[0], Us[b].shape[1]
        gLb = None
        if need_grad:
            bdr_up2 = _interface_bdr_up2(mt, trUp, b, tab) if nif else None
            grad = dg_gradient(tab, Ups[b], bdr_up2=bdr_up2)
            X = jnp.concatenate(
                [Ucl[b], grad.reshape(ne, ndof, neq * tab.dim)], -1)
        else:
            X = Ucl[b]
        trX = elem_traces(tab, X).reshape(
            ne * tab.nlf, tab.nqf, X.shape[-1])[tab.bdr_slot]
        ULb = _clip_species(mix, trX[..., :neq])
        if need_grad:
            gLb = trX[..., neq:].reshape(
                trX.shape[:-1] + (neq, tab.dim))
        norb = tab.f_nor[tab.nfi:]
        wmagb = tab.f_wts[tab.nfi:] * jnp.linalg.norm(norb, axis=-1)
        out.append((ULb, mix.primitives(ULb), gLb, norb, wmagb))
    return out


def init_bc_states_mixed(mt, ctxs, Us):
    """Initial per-bucket, per-BC state tuples (time-integrated
    characteristic ghosts start at the interior trace)."""
    if not any(getattr(s.bc, "has_state", False)
               for ctx in ctxs for s in ctx.bcs):
        return tuple(tuple(None for _ in ctx.bcs) for ctx in ctxs)
    data = _mixed_boundary_data(mt, ctxs, Us, need_grad=False)
    out = []
    for b, ctx in enumerate(ctxs):
        ULb = data[b][0]
        states = []
        for s in ctx.bcs:
            if getattr(s.bc, "has_state", False):
                states.append(s.bc.init_state(ctx.mixture,
                                              ULb[s.start:s.stop]))
            else:
                states.append(None)
        out.append(tuple(states))
    return tuple(out)


def advance_bc_states_mixed(mt, ctxs, Us, bc_states, dt):
    """One characteristic-ODE step of every stateful BC's ghost state.

    Patch means are PATCH-GLOBAL: the same BC object serves the patch's
    faces in both element-type buckets, so its quadrature-weighted mean is
    accumulated over both buckets' face weights before the per-bucket
    advance — one mean per patch, exactly as the reference's per-patch
    subcommunicator produces (src/mpi_groups.hpp:44-78)."""
    import jax.numpy as jnp

    if bc_states is None or not any(
            getattr(s.bc, "has_state", False)
            for ctx in ctxs for s in ctx.bcs):
        return bc_states
    data = _mixed_boundary_data(mt, ctxs, Us, need_grad=True)

    # cross-bucket patch means, keyed by the shared BC object (sharded:
    # padded faces have zero weights; a psum completes the patch mean)
    accum = {}
    for b, ctx in enumerate(ctxs):
        _ULb, UpLb, _g, _n, wmagb = data[b]
        for s in ctx.bcs:
            if getattr(s.bc, "has_state", False):
                sl = slice(s.start, s.stop)
                w = wmagb[sl]
                num = jnp.sum(w[..., None] * UpLb[sl], axis=(0, 1))
                den = jnp.sum(w)
                k = id(s.bc)
                if k in accum:
                    accum[k] = (accum[k][0] + num, accum[k][1] + den)
                else:
                    accum[k] = (num, den)
    if mt.axis_name is not None:
        import jax

        accum = {k: (jax.lax.psum(n, mt.axis_name),
                     jax.lax.psum(d, mt.axis_name))
                 for k, (n, d) in accum.items()}
    means = {k: n / jnp.maximum(d, 1e-300) for k, (n, d) in accum.items()}

    out = []
    for b, ctx in enumerate(ctxs):
        ULb, UpLb, gLb, norb, wmagb = data[b]
        states = []
        for i, s in enumerate(ctx.bcs):
            if getattr(s.bc, "has_state", False):
                sl = slice(s.start, s.stop)
                states.append(s.bc.advance(
                    ctx, bc_states[b][i], ULb[sl], UpLb[sl],
                    None if gLb is None else gLb[sl],
                    norb[sl], wmagb[sl], dt, mean_up=means[id(s.bc)]))
            else:
                states.append(bc_states[b][i])
        out.append(tuple(states))
    return tuple(out)


# ---------------------------------------------------------------------------
# Element-sharded mixed meshes ([mesh]/partitions on tri+quad)
#
# Each bucket is sharded independently by the SAME spatial cut (slab
# partition on element centroids), reusing parallel.partition's halo/slot
# machinery per bucket.  The tri/quad seam couples shards through a global
# [n_iface, nqf, k] trace buffer: every shard scatters the own traces of
# its local interface faces at their global crossing ids, a psum over the
# device-mesh axis completes the buffer, and each shard gathers the
# PARTNER bucket's rows back (point-permuted into its own ordering).
# The reference's MPI decomposition treats mixed meshes uniformly through
# MFEM; this is the bucketed TPU equivalent.


@dataclass
class ShardedMixedBuild:
    builds: tuple  # per-bucket parallel.partition.ShardedBuild
    stacked: MixedDGTables  # numpy stacked tables + per-shard iface data
    global_mt: MixedDGTables  # unsharded tables (IO/viz/BC setup)
    n_iface: int
    nparts: int
    bc_attr_blocks: tuple  # per bucket, REAL attrs only (no interface)


def build_sharded_mixed(mm, order, nparts, basis="gauss-legendre",
                        quad_rule="gauss-legendre",
                        vol_quad_order=None, face_quad_order=None,
                        axisymmetric=False, partition_axis=0,
                        axis_name="dd") -> ShardedMixedBuild:
    from ..parallel.partition import build_sharded_tables

    if face_quad_order is None:
        face_quad_order = 2 * order + 1
    # global tables (IO / BC setup / qperm pairing)
    global_mt = build_mixed_tables(
        mm, order, basis=basis, quad_rule=quad_rule,
        vol_quad_order=vol_quad_order,
        face_quad_order=face_quad_order, axisymmetric=axisymmetric)
    n_iface = global_mt.n_iface
    fis, crosses = _mixed_face_info(mm)
    _rows, qperm_g = _iface_qperm(
        [b for b in global_mt.buckets], crosses, n_iface)

    builds, blocks, gids, qperms, bc_blocks = [], [], [], [], []
    for b, part in enumerate(mm.parts):
        # same spatial cut in both buckets (locality across the seam)
        cent = part.vertices[part.elements].mean(axis=1)[:, partition_axis]
        lo = mm.parts[0].vertices[:, partition_axis].min()
        hi = mm.parts[0].vertices[:, partition_axis].max()
        for p2 in mm.parts[1:]:
            lo = min(lo, p2.vertices[:, partition_axis].min())
            hi = max(hi, p2.vertices[:, partition_axis].max())
        width = max(hi - lo, 1e-300)
        partition = np.minimum(
            ((cent - lo) / width * nparts).astype(np.int32), nparts - 1)
        sb = build_sharded_tables(
            part, order=order, nparts=nparts, partition=partition,
            faces=fis[b], basis=basis, quad_rule=quad_rule,
            vol_quad_order=vol_quad_order,
            face_quad_order=face_quad_order, axisymmetric=axisymmetric,
        )
        builds.append(sb)
        blk = [(s, e) for (a, s, e) in sb.bc_attr_blocks
               if a == INTERFACE_ATTR]
        ib = blk[0] if blk else (0, 0)
        blocks.append(ib)
        bc_blocks.append(tuple(
            (a, s, e) for (a, s, e) in sb.bc_attr_blocks
            if a != INTERFACE_ATTR))
        # per-shard global crossing ids: bdr_rows holds the global
        # attr-sorted bdr index; interface rows are the global tail
        n_real = global_mt.buckets[b].nfb - n_iface
        rows = sb.bdr_rows[:, ib[0]:ib[1]]  # [P, NIFB]
        gid = np.where(rows >= 0, rows - n_real, -1).astype(np.int32)
        gids.append(gid)
        qp = np.tile(np.arange(global_mt.buckets[b].nqf, dtype=np.int32),
                     (nparts, ib[1] - ib[0], 1))
        sel = gid >= 0
        qp[sel] = qperm_g[b][gid[sel]]
        qperms.append(qp)

    stacked = MixedDGTables(
        buckets=tuple(sb.tables for sb in builds),
        n_iface=n_iface,
        partner_row=None, partner_qperm=None,
        axis_name=axis_name,
        iface_block=tuple(blocks),
        iface_gid=tuple(gids),
        iface_qperm=tuple(qperms),
    )
    return ShardedMixedBuild(
        builds=tuple(builds), stacked=stacked, global_mt=global_mt,
        n_iface=n_iface, nparts=nparts, bc_attr_blocks=tuple(bc_blocks),
    )


def localize_mixed(mt_stacked: MixedDGTables) -> MixedDGTables:
    """Per-shard view inside shard_map: strip the leading shard axis."""
    from ..parallel.sharding import localize_tables

    return MixedDGTables(
        buckets=tuple(localize_tables(b) for b in mt_stacked.buckets),
        n_iface=mt_stacked.n_iface,
        partner_row=None, partner_qperm=None,
        axis_name=mt_stacked.axis_name,
        iface_block=mt_stacked.iface_block,
        iface_gid=tuple(g[0] for g in mt_stacked.iface_gid),
        iface_qperm=tuple(q[0] for q in mt_stacked.iface_qperm),
    )


def mixed_spec_tree(mt_stacked: MixedDGTables, axis: str) -> MixedDGTables:
    """PartitionSpec tree matching localize_mixed."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import tab_spec_tree

    return MixedDGTables(
        buckets=tuple(tab_spec_tree(b, axis) for b in mt_stacked.buckets),
        n_iface=mt_stacked.n_iface,
        partner_row=None, partner_qperm=None,
        axis_name=mt_stacked.axis_name,
        iface_block=mt_stacked.iface_block,
        iface_gid=tuple(P(axis) for _ in mt_stacked.iface_gid),
        iface_qperm=tuple(P(axis) for _ in mt_stacked.iface_qperm),
    )
