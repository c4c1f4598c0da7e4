"""The DG right-hand side: one residual evaluation (the hot path).

Mirrors the structure of reference RHSoperator::Mult (src/rhs_operator.cpp:
343-464): primitives -> gradients -> face fluxes -> volume fluxes -> inverse
mass -> forcing, with the max characteristic speed computed in the same
sweep.  Everything is one jit-compiled pure function over element-batched
tensors; XLA fuses the pointwise physics into the gather/matmul pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .operators import (
    apply_minv,
    apply_minv2,
    dg_gradient,
    elem_traces,
    face_gather,
    face_scatter_gather,
    halo_exchange,
    trace_transpose,
    volume_weak_div,
)


@dataclass(frozen=True)
class BCSlice:
    bc: object
    start: int  # static slice bounds into the boundary-face block
    stop: int


@dataclass(frozen=True)
class RHSContext:
    """Static configuration of the RHS evaluation (closed over by jit)."""

    fluxes: object
    riemann: object
    bcs: tuple = ()
    forcings: tuple = ()
    use_bc_in_grad: bool = False
    # set to the device-mesh axis name when running sharded under shard_map;
    # enables halo exchanges and cross-shard reductions
    axis_name: str | None = None

    @property
    def mixture(self):
        return self.fluxes.mixture


def _clip_species(mix, U):
    """max(rho Y_s, 0) as the reference does at interpolated states
    (src/face_integrator.cpp:296-301, src/rhs_operator.cpp:513-517)."""
    nact = mix.num_active_species
    if nact == 0:
        return U
    sp = U[..., mix.nvel + 2 : mix.nvel + 2 + nact]
    return U.at[..., mix.nvel + 2 : mix.nvel + 2 + nact].set(jnp.maximum(sp, 0.0))


def compute_rhs(ctx: RHSContext, tab, U, t=0.0, fields=None, bc_states=None,
                fused_io=False):
    """Return (dU/dt, aux) with aux containing max_char_speed.

    bc_states: optional tuple aligned with ctx.bcs carrying persistent
    per-BC state (the time-integrated characteristic ghosts; reference:
    boundaryU in src/inletBC.cpp / src/outletBC.cpp).  None entries for
    stateless BCs.

    fused_io=True: U is [ne, ndof*neq] and the result is returned in the
    same fused layout.  The integrator state then stays on fused-minor
    buffers (4 MB vs 67 MB padded per materialization on a p=2 16^3 box),
    so the RK axpy chain and the RHS head/tail avoid the (8,128)-tile
    round trips entirely (PERF.md round 3)."""
    mix = ctx.mixture
    neq = mix.num_equations
    dim = tab.dim
    if fused_io:
        U = U.reshape(U.shape[0], -1, neq)
    ne, ndof = U.shape[0], U.shape[1]
    viscous = ctx.fluxes.eq_system != "euler"

    if ctx.axis_name is not None:
        # refresh halo-element state from owning shards (first of the two
        # overlapped exchanges in the reference, src/rhs_operator.cpp:349-372)
        U = halo_exchange(tab, U, ctx.axis_name)

    Up = mix.primitives(_clip_species(mix, U))

    # ---- gradients of primitives ----
    grad_up = None
    if viscous:
        bdr_up2 = None
        if ctx.use_bc_in_grad and ctx.bcs:
            Uptr = elem_traces(tab, Up)
            UpLb = face_gather(tab, Uptr)[0][tab.nfi :]
            parts = []
            for s in ctx.bcs:
                parts.append(s.bc.ghost_primitive(mix, UpLb[s.start : s.stop]))
            bdr_up2 = jnp.concatenate(parts, axis=0)
        grad_up = dg_gradient(tab, Up, bdr_up2=bdr_up2)
        if ctx.axis_name is not None:
            # halo elements' locally-computed gradients miss their exterior
            # faces; fetch owner-computed values (second exchange)
            grad_up = halo_exchange(
                tab, grad_up.reshape(ne, ndof, neq * dim), ctx.axis_name
            ).reshape(ne, ndof, neq, dim)

    # ---- face sweep ----
    nfi = tab.nfi
    deltaL = tab.delta[tab.f_elem_l][:, None]
    deltaR = tab.delta[tab.f_elem_r][:, None]

    def _face_flux(U1, U2, g1, g2, nor, xyz, d1, d2, dist=None):
        """Riemann + mean one-sided viscous normal flux at face points.
        `dist` is the wall distance at the face points (same for both
        sides — it is a continuous geometric field)."""
        flux = ctx.riemann(U1, U2, nor)
        if viscous:
            Fv1 = ctx.fluxes.viscous(U1, mix.primitives(U1), g1, xyz=xyz,
                                     delta=d1, distance=dist)
            Fv2 = ctx.fluxes.viscous(U2, mix.primitives(U2), g2, xyz=xyz,
                                     delta=d2, distance=dist)
            flux = flux - jnp.einsum("...ed,...d->...e", 0.5 * (Fv1 + Fv2), nor)
        return flux

    if tab.nbr_row is not None:
        # neighbor-slot fast path, per-face fused buffers: every (element,
        # local face) slot computes its own outward flux from (own trace,
        # one neighbor gather); Riemann conservativity F(a,b,n) = -F(b,a,-n)
        # makes both sides of a face consistent with no sign bookkeeping.
        # All face buffers keep a fused (nqf*k >= 128) minor dim so XLA's
        # (8,128) tiling stays dense (PERF.md: 4.8 -> ~1.5 ms/RHS on the
        # BC'd NS box vs the stacked [ne, nlf, nqf, k] formulation), and
        # the quadrature weights are folded into the face normals (the flux
        # is degree-1 homogeneous in the scaled normal).
        from .operators import perface_traces

        if viscous:
            X = jnp.concatenate([U, grad_up.reshape(ne, ndof, neq * dim)], -1)
        else:
            X = U
        own_pf, nbr_pf = perface_traces(tab, X)

        def _split(Z2):
            Z = Z2.reshape(ne, tab.nqf, -1)
            Uz = _clip_species(mix, Z[..., :neq])
            gz = (
                Z[..., neq:].reshape(Z.shape[:-1] + (neq, dim))
                if viscous else None
            )
            return Uz, gz

        z2 = jnp.zeros((ne, ndof * neq), dtype=U.dtype)
        eye_e = jnp.eye(neq, dtype=U.dtype)
        for lf in range(tab.nlf):
            U_own, g_own = _split(own_pf[lf])
            U_nbr, g_nbr = _split(nbr_pf[lf])
            # weights (x radius if axisymmetric) are folded into the
            # normals at table build (nor_wpf); the flux is degree-1
            # homogeneous in the scaled normal
            norw = tab.nor_wpf[lf].reshape(ne, tab.nqf, dim)
            flux = _face_flux(U_own, U_nbr, g_own, g_nbr, norw,
                              tab.xyz_slot[:, lf],
                              tab.delta[:, None, None],
                              tab.delta_nbr[:, lf, None, None],
                              dist=(None if tab.dist_slot is None
                                    else tab.dist_slot[:, lf]))
            flux = flux * tab.interior_mask[:, lf, None, None]
            B = tab.Btr[lf * tab.nqf : (lf + 1) * tab.nqf]  # [nqf, ndof]
            K_out = jnp.einsum("sj,ef->sejf", B, eye_e).reshape(
                tab.nqf * neq, ndof * neq
            )
            z2 = z2 + flux.reshape(ne, tab.nqf * neq) @ K_out

        # boundary slots: BC fluxes (interior contributions are masked off
        # above); scattered through a fused-minor zeros buffer
        if tab.nfb:
            kx = X.shape[-1]
            bbl = getattr(tab, "bdr_by_lf", None)
            if bbl is not None:
                # per-face gather of only the boundary rows (the stacked
                # [ne, nlf, nqf*k] alternative pads ~10x in HBM just to
                # select nfb rows)
                ob2 = jnp.zeros((tab.nfb, tab.nqf * kx), dtype=U.dtype)
                for lf, (els, rows) in enumerate(bbl):
                    if els:
                        ob2 = ob2.at[jnp.asarray(rows)].set(
                            own_pf[lf][jnp.asarray(els)]
                        )
                own_b = ob2.reshape(tab.nfb, tab.nqf, kx)
            else:
                own_b = jnp.stack(own_pf, axis=1).reshape(
                    ne * tab.nlf, tab.nqf, kx
                )[tab.bdr_slot]
            ULb = _clip_species(mix, own_b[..., :neq])
            gLb = (own_b[..., neq:].reshape(own_b.shape[:-1] + (neq, dim))
                   if viscous else None)
            UpLb_cons = mix.primitives(ULb)
            norb = tab.f_nor[nfi:]
            xyzb = tab.f_xyz[nfi:]
            deltab = deltaL[nfi:]
            wmagb = tab.f_wts[nfi:] * jnp.linalg.norm(norb, axis=-1)
            bdr_fluxes = []
            for i, s in enumerate(ctx.bcs):
                sl = slice(s.start, s.stop)
                bdr_fluxes.append(
                    s.bc.flux(ctx, ULb[sl], UpLb_cons[sl],
                              None if gLb is None else gLb[sl],
                              norb[sl], xyzb[sl], deltab[sl], t,
                              state=None if bc_states is None else bc_states[i],
                              wts=wmagb[sl])
                )
            covered = sum(s.stop - s.start for s in ctx.bcs)
            if covered != tab.nfb:
                raise ValueError(
                    f"boundary faces not fully covered by BCs: {covered} != {tab.nfb}"
                )
            flux_b = jnp.concatenate(bdr_fluxes, axis=0)
            fwb = tab.f_wts[nfi:]
            if tab.rad_face is not None:
                fwb = fwb * tab.rad_face[nfi:]
            fb2 = (flux_b * fwb[..., None]).reshape(tab.nfb, tab.nqf * neq)
            if bbl is not None:
                for lf, (els, rows) in enumerate(bbl):
                    if not els:
                        continue
                    zlf = jnp.zeros((ne, tab.nqf * neq), dtype=U.dtype)
                    zlf = zlf.at[jnp.asarray(els)].set(
                        fb2[jnp.asarray(rows)]
                    )
                    B = tab.Btr[lf * tab.nqf : (lf + 1) * tab.nqf]
                    K_out = jnp.einsum("sj,ef->sejf", B, eye_e).reshape(
                        tab.nqf * neq, ndof * neq
                    )
                    z2 = z2 + zlf @ K_out
            else:
                zb = jnp.zeros((ne * tab.nlf, tab.nqf * neq), dtype=U.dtype)
                zb = zb.at[tab.bdr_slot].set(fb2, mode="drop")
                zb = zb.reshape(ne, tab.nlf, tab.nqf * neq)
                for lf in range(tab.nlf):
                    B = tab.Btr[lf * tab.nqf : (lf + 1) * tab.nqf]
                    K_out = jnp.einsum("sj,ef->sejf", B, eye_e).reshape(
                        tab.nqf * neq, ndof * neq
                    )
                    z2 = z2 + zb[:, lf] @ K_out

        z2_face = -z2  # fused [ne, ndof*neq]
    else:
        # legacy path (sharded tables): single-ordering + point permutations
        Utr = elem_traces(tab, U)
        ULg, URg = face_gather(tab, Utr)
        UL = _clip_species(mix, ULg)
        UR_l = _clip_species(mix, URg)
        if viscous:
            gtr = elem_traces(tab, grad_up.reshape(ne, ndof, neq * dim))
            gLg, gRg = face_gather(tab, gtr)
            gL = gLg.reshape(gLg.shape[0], tab.nqf, neq, dim)
            gR_l = gRg.reshape(gRg.shape[0], tab.nqf, neq, dim)
        else:
            gL = gR_l = None
        flux_L_int = _face_flux(UL[:nfi], UR_l, gL[:nfi] if viscous else None,
                                gR_l, tab.f_nor[:nfi], tab.f_xyz[:nfi],
                                deltaL[:nfi], deltaR,
                                dist=(None if tab.f_dist is None
                                      else tab.f_dist[:nfi]))

        # boundary faces, one static slice per BC
        bdr_fluxes = []
        if tab.nfb:
            ULb = UL[nfi:]
            gLb = gL[nfi:] if viscous else None
            norb = tab.f_nor[nfi:]
            xyzb = tab.f_xyz[nfi:]
            deltab = deltaL[nfi:]
            wmagb = tab.f_wts[nfi:] * jnp.linalg.norm(norb, axis=-1)
            UpLb_cons = mix.primitives(ULb)
            for i, s in enumerate(ctx.bcs):
                sl = slice(s.start, s.stop)
                bdr_fluxes.append(
                    s.bc.flux(ctx, ULb[sl], UpLb_cons[sl],
                              None if gLb is None else gLb[sl],
                              norb[sl], xyzb[sl], deltab[sl], t,
                              state=None if bc_states is None else bc_states[i],
                              wts=wmagb[sl])
                )
            covered = sum(s.stop - s.start for s in ctx.bcs)
            if covered != tab.nfb:
                raise ValueError(
                    f"boundary faces not fully covered by BCs: {covered} != {tab.nfb}"
                )

        flux_all = (
            jnp.concatenate([flux_L_int] + bdr_fluxes, axis=0)
            if tab.nfb else flux_L_int
        )
        fw = tab.f_wts
        if tab.rad_face is not None:  # axisymmetric face weight (x radius)
            fw = fw * tab.rad_face
        flux_w = flux_all * fw[..., None]

        Fel = face_scatter_gather(tab, flux_w)
        sign = jnp.repeat(tab.ef_sign.reshape(tab.ne, tab.nlf), tab.nqf, axis=1)
        z2_face = trace_transpose(tab, -sign[..., None] * Fel).reshape(
            ne, ndof * neq
        )

    # ---- volume term ----
    Uv = _clip_species(mix, U)
    Fdof = ctx.fluxes.total_at_dofs(
        Uv, Up, grad_up, tab.xyz_dof, tab.delta[:, None], distance=tab.distance
    )
    z2_vol = volume_weak_div(tab, Fdof, fused_out=True)

    y2 = apply_minv2(tab, z2_vol + z2_face, neq, radial=True)

    # ---- forcing (added to dU/dt directly; reference rhs_operator.cpp:452-461)
    if ctx.forcings:
        yf = y2.reshape(ne, ndof, neq)
        for f in ctx.forcings:
            yf = yf + f(t, tab, U, Up, grad_up, fields)
        y2 = yf.reshape(ne, ndof * neq)

    mcs_field = mix.max_char_speed(U)
    if ctx.axis_name is not None:
        # zero residuals on halo/padding rows and reduce the wave speed
        # globally (reference: MPI_Allreduce at src/rhs_operator.cpp:557)
        y2 = y2 * tab.own_mask[:, None]
        mcs = jax.lax.pmax(
            jnp.max(jnp.where(tab.own_mask > 0.5, jnp.max(mcs_field, axis=-1), 0.0)),
            ctx.axis_name,
        )
    else:
        mcs = jnp.max(mcs_field)
    aux = {"max_char_speed": mcs}
    y = y2 if fused_io else y2.reshape(ne, ndof, neq)
    return y, aux


# ---------------------------------------------------------------------------
# Persistent BC state (time-integrated characteristic ghosts)
# ---------------------------------------------------------------------------

def has_stateful_bcs(ctx: RHSContext) -> bool:
    return any(getattr(s.bc, "has_state", False) for s in ctx.bcs)


def _boundary_interior_data(ctx: RHSContext, tab, U, need_grad):
    """Interior traces at boundary-face quadrature points.

    Returns (ULb [nfb,nqf,neq], UpLb, gLb or None, norb, wmagb) in the
    attr-sorted boundary ordering compute_rhs uses.  Mirrors the trace
    stage of the face sweep (reference: interpInlet_gpu-style boundary
    interpolation, src/inletBC.hpp:113-190)."""
    mix = ctx.mixture
    neq = mix.num_equations
    dim = tab.dim
    ne, ndof = U.shape[0], U.shape[1]

    if ctx.axis_name is not None:
        U = halo_exchange(tab, U, ctx.axis_name)
    Up = mix.primitives(_clip_species(mix, U))
    grad_up = dg_gradient(tab, Up) if need_grad else None

    if tab.nbr_row is not None:
        from .operators import perface_own_traces

        if need_grad:
            X = jnp.concatenate([U, grad_up.reshape(ne, ndof, neq * dim)], -1)
        else:
            X = U
        own_pf = perface_own_traces(tab, X)
        kx = X.shape[-1]
        bbl = getattr(tab, "bdr_by_lf", None)
        if bbl is not None:
            ob2 = jnp.zeros((tab.nfb, tab.nqf * kx), dtype=U.dtype)
            for lf, (els, rows) in enumerate(bbl):
                if els:
                    ob2 = ob2.at[jnp.asarray(rows)].set(
                        own_pf[lf][jnp.asarray(els)]
                    )
            own_b = ob2.reshape(tab.nfb, tab.nqf, kx)
        else:
            own_b = jnp.stack(own_pf, axis=1).reshape(
                ne * tab.nlf, tab.nqf, kx
            )[tab.bdr_slot]
        ULb = _clip_species(mix, own_b[..., :neq])
        gLb = (own_b[..., neq:].reshape(own_b.shape[:-1] + (neq, dim))
               if need_grad else None)
    else:
        Utr = elem_traces(tab, U)
        ULb = _clip_species(mix, face_gather(tab, Utr)[0][tab.nfi :])
        gLb = None
        if need_grad:
            gtr = elem_traces(tab, grad_up.reshape(ne, ndof, neq * dim))
            gLb = face_gather(tab, gtr)[0][tab.nfi :].reshape(
                -1, tab.nqf, neq, dim
            )
    norb = tab.f_nor[tab.nfi :]
    wmagb = tab.f_wts[tab.nfi :] * jnp.linalg.norm(norb, axis=-1)
    return ULb, mix.primitives(ULb), gLb, norb, wmagb


def init_bc_states(ctx: RHSContext, tab, U):
    """Initial per-BC state tuple (ghosts start at the interior trace)."""
    if not ctx.bcs:
        return ()
    if not has_stateful_bcs(ctx):
        return tuple(None for _ in ctx.bcs)
    ULb, _, _, _, _ = _boundary_interior_data(ctx, tab, U, need_grad=False)
    out = []
    for s in ctx.bcs:
        if getattr(s.bc, "has_state", False):
            out.append(s.bc.init_state(ctx.mixture, ULb[s.start : s.stop]))
        else:
            out.append(None)
    return tuple(out)


def advance_bc_states(ctx: RHSContext, tab, U, bc_states, dt):
    """One characteristic-ODE step of every stateful BC's ghost state
    (reference: the boundaryU integration inside computeBdrFlux,
    src/outletBC.cpp:739+ / src/inletBC.cpp:756+), using patch-mean
    primitives reduced with masked psums when sharded."""
    if bc_states is None or not has_stateful_bcs(ctx):
        return bc_states
    ULb, UpLb, gLb, norb, wmagb = _boundary_interior_data(
        ctx, tab, U, need_grad=True
    )
    out = []
    for i, s in enumerate(ctx.bcs):
        if getattr(s.bc, "has_state", False):
            sl = slice(s.start, s.stop)
            out.append(
                s.bc.advance(ctx, bc_states[i], ULb[sl], UpLb[sl], gLb[sl],
                             norb[sl], wmagb[sl], dt)
            )
        else:
            out.append(bc_states[i])
    return tuple(out)
