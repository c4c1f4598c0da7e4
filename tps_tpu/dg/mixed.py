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

    def to_jax(self, dtype):
        import jax.numpy as jnp

        return MixedDGTables(
            buckets=tuple(b.to_jax(dtype) for b in self.buckets),
            n_iface=self.n_iface,
            partner_row=tuple(jnp.asarray(r) for r in self.partner_row),
            partner_qperm=tuple(jnp.asarray(q) for q in self.partner_qperm),
        )


def build_mixed_tables(mm, order, basis="gauss-legendre",
                       vol_quad_order=None, face_quad_order=None,
                       axisymmetric=False) -> MixedDGTables:
    """Build per-bucket DGTables for a MixedMesh plus interface pairing."""
    if len(mm.parts) != 2:
        raise NotImplementedError("mixed tables support exactly 2 buckets")
    if any(p.curved_nodes is not None for p in mm.parts):
        raise NotImplementedError("curved mixed meshes")
    if face_quad_order is None:
        face_quad_order = 2 * order + 1

    # ---- global face discovery over both buckets ----
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
    tabs = []
    for b, mesh in enumerate(mm.parts):
        ii = np.asarray(int_faces[b], dtype=np.int32).reshape(-1, 4)
        be = [x[0] for x in bdr_faces[b]] + [c[b][0] for c in crosses]
        bl = [x[1] for x in bdr_faces[b]] + [c[b][1] for c in crosses]
        battr = ([x[2] for x in bdr_faces[b]]
                 + [INTERFACE_ATTR] * n_iface)
        fi = FaceInfo(
            int_elem_l=ii[:, 0], int_lf_l=ii[:, 1],
            int_elem_r=ii[:, 2], int_lf_r=ii[:, 3],
            int_shift=np.zeros((len(ii), mesh.dim)),
            bdr_elem=np.asarray(be, dtype=np.int32),
            bdr_lf=np.asarray(bl, dtype=np.int32),
            bdr_attr=np.asarray(battr, dtype=np.int32),
        )
        tabs.append(build_tables(
            mesh, order, basis=basis, vol_quad_order=vol_quad_order,
            face_quad_order=face_quad_order, faces=fi,
            axisymmetric=axisymmetric,
        ))

    # ---- interface pairing: partner trace rows + point permutations ----
    # Trace row (e*nlf + lf) of bucket p carries points at
    # Btr[lf*nqf:(lf+1)*nqf] @ xyz_dof[e] (valid for straight-sided
    # elements; Btr row order accounts for any orientation baking).
    partner_row, partner_qperm = [], []
    nqf = tabs[0].nqf
    assert tabs[1].nqf == nqf, "face quadrature mismatch between buckets"
    for b in (0, 1):
        tb, tp = tabs[b], tabs[1 - b]
        rows = np.zeros(n_iface, dtype=np.int32)
        qperm = np.zeros((n_iface, nqf), dtype=np.int32)
        # this bucket's interface faces are the attr-sorted boundary tail
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



def _interface_bdr_up2(mt, trUp, b, tab):
    """Exterior primitive state on bucket b's boundary block: own trace on
    real boundary faces (zero jump), partner-bucket trace on the interface
    tail.  Shared by the RHS gradient stage and the stateful-BC boundary
    data so the two can never diverge."""
    import jax.numpy as jnp

    rows_b = tab.f_elem_l[tab.nfi:] * tab.nlf + tab.f_slot_l[tab.nfi:]
    own_b = trUp[b][rows_b]
    partner = jnp.take_along_axis(
        trUp[1 - b][mt.partner_row[b]],
        mt.partner_qperm[b][..., None], axis=1)
    return own_b.at[tab.nfb - mt.n_iface:].set(partner)


def compute_rhs_mixed(mt: MixedDGTables, ctxs, Us, t=0.0, bc_states=None):
    """Mixed-mesh RHS: per-bucket slot face sweeps with interface fluxes
    evaluated against partner-bucket traces.  Mirrors compute_rhs
    (dg/rhs.py) stage-for-stage; single-device only."""
    import jax.numpy as jnp

    from .operators import (
        apply_minv,
        dg_gradient,
        elem_traces,
        perface_traces,
        volume_weak_div,
    )
    from .rhs import _clip_species

    mix = ctxs[0].mixture
    neq = mix.num_equations
    viscous = ctxs[0].fluxes.eq_system != "euler"
    for c in ctxs:
        if c.axis_name is not None:
            raise NotImplementedError("sharded mixed meshes")
    nif = mt.n_iface

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
                bdr_fluxes.append(
                    s.bc.flux(ctx, ULb[sl], UpLb[sl],
                              None if gLb is None else gLb[sl],
                              norb[sl], xyzb[sl], deltab[sl], t,
                              state=st, wts=wmagb[sl]))
            covered = sum(s.stop - s.start for s in ctx.bcs)
            if covered != tab.nfb - nif:
                raise ValueError(
                    "boundary faces not fully covered by BCs: "
                    f"{covered} != {tab.nfb - nif}")
            if nif:
                # interface flux against the partner bucket's trace
                prt = jnp.take_along_axis(
                    trX[1 - b][mt.partner_row[b]],
                    mt.partner_qperm[b][..., None], axis=1)
                U_p, g_p = _split(tab, prt)
                sl = slice(tab.nfb - nif, tab.nfb)
                dp = mt.buckets[1 - b].delta[
                    mt.partner_row[b] // mt.buckets[1 - b].nlf][:, None]
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
        ys.append(y)
        mcss.append(jnp.max(mix.max_char_speed(Ucl[b])))

    aux = {"max_char_speed": jnp.maximum(*mcss)}
    return tuple(ys), aux


def _mixed_boundary_data(mt, ctxs, Us, need_grad):
    """Per-bucket interior traces at boundary-face quadrature points (the
    mixed analog of rhs._boundary_interior_data, with conforming interface
    gradient jumps).  Returns per bucket (ULb, UpLb, gLb, norb, wmagb) in
    the attr-sorted boundary ordering."""
    import jax.numpy as jnp

    from .operators import dg_gradient, elem_traces
    from .rhs import _clip_species

    mix = ctxs[0].mixture
    neq = mix.num_equations
    nif = mt.n_iface
    out = []

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

    # cross-bucket patch means, keyed by the shared BC object
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
