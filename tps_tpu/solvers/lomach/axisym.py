"""Axisymmetric (r, z) Tomboulides flow with optional swirl.

The role of the reference's axisymmetric low-Mach path (src/tomboulides.cpp
axisym_/swirl support, src/loMach.cpp loMach/axisymmetric): coordinates are
(x = r, y = z); every weak form carries the Jacobian factor r, which turns
the r-weighted stiffness into the axisymmetric vector Laplacian except for
the extra -mu u/r^2 terms on u_r and u_theta (added as (v, mu u / r) mass
terms; quadrature points are strictly interior so r_q > 0 even in elements
touching the axis).  Swirl u_theta adds the centrifugal force
rho u_theta^2 / r to the r-momentum and the Coriolis transport
rho u_r u_theta / r to the theta-momentum.  Axis dofs (r = 0) carry
Dirichlet u_r = u_theta = 0.

Steady analytic targets used by the tests: Poiseuille pipe flow
u_z(r) = F/(4 mu) (R^2 - r^2) and circular Couette swirl
u_theta(r) = A r + B / r.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import TemporalCoefficients
from .tomboulides import Tomboulides


class TomboulidesAxisym(Tomboulides):
    def __init__(self, tab, thermo, turb=None, vel_bcs=(), swirl=False,
                 swirl_bcs=(), body_force=None, sponge=None,
                 cg_tol=1e-10, cg_maxiter=1000, axis_tol=1e-12,
                 gravity=None):
        super().__init__(tab, thermo, turb=turb, vel_bcs=vel_bcs,
                         body_force=body_force, sponge=sponge,
                         cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                         gravity=gravity)
        nd = tab.ndofs
        self.swirl = swirl
        self.rad_q = jnp.asarray(tab.xyz_q[..., 0])  # radius at quads (> 0)
        # pre-wrapped radius coefficient (per-shard stacked when the H1
        # space is element-sharded; identity otherwise)
        self._rq_c = h1.as_coef(tab, self.rad_q)
        r_nodal = np.asarray(tab.xyz[:, 0])
        axis = r_nodal < axis_tol

        # component masks: u_r gets the axis Dirichlet on top of walls
        base = np.asarray(self.vel_mask)
        mask_r = base.copy()
        mask_r[axis] = 0.0
        self.vel_mask_c = jnp.asarray(np.stack([mask_r, base], axis=-1))

        self.ut = jnp.zeros(nd)
        self.ut_hist = [self.ut, self.ut, self.ut]
        self.Nt_hist = [jnp.zeros(nd)] * 3
        if swirl:
            free = np.array(base)
            vals = jnp.zeros(nd)
            for bc in swirl_bcs:
                dofs = np.asarray(h1.boundary_dofs(tab, tuple(bc.attrs)))
                free[dofs] = 0.0
                vals = vals.at[jnp.asarray(dofs)].set(
                    bc.value if np.isscalar(bc.value) else bc.value[0]
                )
            free[axis] = 0.0
            self.swirl_mask = jnp.asarray(free)
            self.swirl_bc_values = vals
        else:
            self.swirl_mask = jnp.ones(nd)
            self.swirl_bc_values = jnp.zeros(nd)

        self._step_jit = jax.jit(self._step_impl_axi,
                                 static_argnames=("order",))

    def set_swirl(self, ut0):
        self.ut = jnp.asarray(ut0)
        self.ut = (self.ut * self.swirl_mask
                   + self.swirl_bc_values * (1.0 - self.swirl_mask))
        self.ut_hist = [self.ut] * 3

    def swirl_velocity(self):
        return self.ut

    def step(self, coeff: TemporalCoefficients, dt: float):
        rho = self.thermo.density()
        mu = self.thermo.viscosity()
        if self.turb is not None:
            mu = mu + rho * self.turb.eddy_viscosity()
        if self.sponge is not None:
            mu = mu * self.sponge.multiplier()
        qt = self.thermo.thermal_divergence()
        ubc = self._ramped_ubc(dt)  # apply rampTime scaling (base class)
        self.precond_refresh(dt, coeff.order)
        if self._direct_age is not None:
            self._direct_age += 1
        (self.u, self.p, self.ut, u_hist, N_hist, ut_hist, Nt_hist) = \
            self._step_jit(
                self.u, self.p, self.ut,
                tuple(self.u_hist), tuple(self.N_hist),
                tuple(self.ut_hist), tuple(self.Nt_hist),
                rho, mu, qt, ubc, self.swirl_bc_values,
                jnp.asarray(dt),
                order=coeff.order, precond=self._direct,
            )
        self.u_hist = list(u_hist)
        self.N_hist = list(N_hist)
        self.ut_hist = list(ut_hist)
        self.Nt_hist = list(Nt_hist)

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_pack(self):
        import jax.numpy as jnp

        return (self.u, self.p, self.ut,
                tuple(self.u_hist), tuple(self.N_hist),
                tuple(self.ut_hist), tuple(self.Nt_hist),
                jnp.asarray(getattr(self, "_time", 0.0)))

    def chunk_unpack(self, s):
        u, p, ut, uh, Nh, uth, Nth, t = s
        self.u, self.p, self.ut = u, p, ut
        self.u_hist, self.N_hist = list(uh), list(Nh)
        self.ut_hist, self.Nt_hist = list(uth), list(Nth)
        self._time = float(t)

    def chunk_velocity(self, s):
        return s[0]

    def _precond_build(self, rho, mu, dt, bd0):
        """Lagged dense-direct factors for the RADIUS-WEIGHTED operators
        (overrides the planar build, whose matrices are the wrong
        operator here).  Factors: [0] r/rho pressure Laplacian,
        [1] z-momentum Helmholtz, [2] r-momentum Helmholtz (the extra
        (v, mu u / r) mass term included), [3] r-weighted consistent
        mass (grad_r's projection solves; time-constant, but
        refactoring it with the batch keeps the plumbing uniform), and
        — when swirl is on — [4] the same Helmholtz matrix constrained
        with the swirl mask, so the swirl solve's preconditioner rows
        match its own Dirichlet set.  Works on element-sharded spaces:
        the sharded element_mass/element_stiffness + assemble_dense
        psum the replicated global matrices (fem/h1.py)."""
        import jax.numpy as jnp_

        tab = self.tab
        rq = self.rad_q
        rho_q = h1.to_quad(tab, rho)
        mu_q = h1.to_quad(tab, mu)
        Kp_e = h1.element_stiffness(tab, rq / rho_q)
        He_e = (bd0 / dt) * h1.element_mass(tab, rho_q * rq) \
            + h1.element_stiffness(tab, mu_q * rq)
        Hx_e = He_e + h1.element_mass(tab, mu_q / rq)
        Mr_e = h1.element_mass(tab, rq)
        Kp, He, Hx, Mr = h1.assemble_dense(
            tab, jnp_.stack([Kp_e, He_e, Hx_e, Mr_e]))
        if self.pres_mask is not None:
            Kp_c = h1.dense_constrain(Kp, mask=self.pres_mask)
        else:
            Kp_c = h1.dense_constrain(Kp, ortho=True)
        mats = [Kp_c,
                h1.dense_constrain(He, mask=self.vel_mask_c[:, 1]),
                h1.dense_constrain(Hx, mask=self.vel_mask_c[:, 0]),
                Mr]
        if self.swirl:
            mats.append(h1.dense_constrain(Hx, mask=self.swirl_mask))
        L = h1.dense_cholesky(jnp_.stack(mats))
        return tuple(L[i] for i in range(len(mats)))

    def chunk_step(self, s, rho, mu, qt, dt, order, precond=None):
        u, p, ut, uh, Nh, uth, Nth, t = s
        t2 = t + dt
        u2, p2, ut2, uh2, Nh2, uth2, Nth2 = self._step_impl_axi(
            u, p, ut, uh, Nh, uth, Nth, rho, mu, qt,
            self._ramped_ubc_traced(t2), self.swirl_bc_values, dt, order,
            precond=precond,
        )
        return (u2, p2, ut2, tuple(uh2), tuple(Nh2), tuple(uth2),
                tuple(Nth2), t2), {}

    # ------------------------------------------------------------------
    def _step_impl_axi(self, u, p, ut, u_hist, N_hist, ut_hist, Nt_hist,
                       rho, mu, qt, ubc_vals, sbc_vals, dt, order,
                       precond=None):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        ab = (coeff.ab1, coeff.ab2, coeff.ab3)
        rq = self.rad_q
        rq_c = self._rq_c  # pre-wrapped radius coefficient (sharded-ready)
        # axis-safe radius: a where-guard on BOTH the divisor and the
        # quotient — the old jnp.maximum(r, 1e-300) underflows to 0 in
        # f32 and a fused 0/0*0 can surface as NaN depending on XLA's
        # reassociation (observed: finite eager, NaN jitted on the
        # sharded f32 dryrun config, round 5)
        r_pos = tab.xyz[:, 0] > 0.0
        r_safe = jnp.where(r_pos, tab.xyz[:, 0], 1.0)

        Ml = h1.mass_lumped_diag(tab)
        # r-weighted consistent-mass diagonal (int phi_i^2 r > 0 strictly;
        # the row-sum lumped mass has EXACTLY zero rows at axis nodes for
        # p >= 2 and cannot be used here)
        Dr = h1.mass_diag(tab, rq_c)

        # r-weighted L2 gradient projection via a consistent-mass CG solve:
        # the discrete adjoint pair of the r-weighted pressure Laplacian.
        # An inconsistent (planar-lumped) projection leaves a divergence
        # residual each projection step that feeds back through p += phi
        # and destabilizes the splitting.
        M_mass = (h1.direct_precond(precond[3])
                  if precond is not None else None)

        def grad_r(s):
            num = h1.weak_grad(tab, s, coef=rq_c)

            def Mr(v):
                return h1.mass_apply(tab, v, coef=rq_c)

            # both components in ONE multi-RHS CG (same operator): one
            # gather/scatter per iteration instead of two sequential
            # solves (latency-floor dodging, PERF.md round 5)
            return h1.cg_solve_multi(
                Mr, num, x0=num / Dr[:, None], diag=Dr,
                M=M_mass, tol=1e-12, maxiter=200,
            )

        # quad-point coefficient fields (global; wrapped per use)
        mu_q = h1.to_quad(tab, mu)
        rho_q = h1.to_quad(tab, rho)

        # nodal convection acceleration: (u.grad)q is pointwise, so the
        # unweighted lumped projection is used (the r-weighted lumped mass
        # degenerates at axis nodes); the radius enters only when the
        # acceleration is integrated into the momentum weak form.
        def conv_nodal(field):
            return h1.convection_apply(tab, field, u) / (
                Ml[:, None] if field.ndim > 1 else Ml
            )

        # nodal accelerations: -(u.grad)u + geometric sources
        N_now = -conv_nodal(u)
        if self.swirl:
            # centrifugal rho u_t^2 / r -> r-momentum (as acceleration)
            N_now = N_now.at[:, 0].add(
                jnp.where(r_pos, ut * ut / r_safe, 0.0))
        if self.body_force is not None:
            N_now = N_now + self.body_force(tab.xyz) / rho[:, None]
        N_ext = ab[0] * N_now + ab[1] * N_hist[0] + ab[2] * N_hist[1]

        hist = -(bd[1] * u + bd[2] * u_hist[0] + bd[3] * u_hist[1]) / dt

        gradp = grad_r(p)
        rhs = h1.mass_apply(
            tab, rho[:, None] * (hist + N_ext) - gradp, coef=rq_c
        )

        # Helmholtz with the extra r-weighted (v, mu u / r^2) -> (v, mu u / r)
        # term on u_r (and u_theta); quad points are strictly interior so
        # r_q > 0 even in axis elements
        mu_over_r_c = h1.as_coef(tab, mu_q / rq)
        murq_c = h1.as_coef(tab, mu_q * rq)
        rhorq_c = h1.as_coef(tab, rho_q * rq)

        diag_base = ((bd[0] / dt) * h1.mass_lumped_diag(tab, rhorq_c)
                     + h1.stiffness_diag(tab, murq_c))
        diag_extra = h1.mass_lumped_diag(tab, mu_over_r_c)

        ubc = ubc_vals
        masks = self.vel_mask_c

        # ---- swirl transport rhs (batched into the velocity solve:
        # the three Helmholtz columns share one gather/scatter per CG
        # iteration — the per-apply latency floor dominates this
        # 288-elem flagship config, PERF.md round 5) ----
        if self.swirl:
            Nt_now = (-conv_nodal(ut)
                      - jnp.where(r_pos, u[:, 0] * ut / r_safe, 0.0))
            Nt_ext = (ab[0] * Nt_now + ab[1] * Nt_hist[0]
                      + ab[2] * Nt_hist[1])
            hist_t = -(bd[1] * ut + bd[2] * ut_hist[0]
                       + bd[3] * ut_hist[1]) / dt
            rhs_t = h1.mass_apply(tab, rho * (hist_t + Nt_ext), coef=rq_c)
            smask = self.swirl_mask
            # sbc comes in as an ARGUMENT: a closed-over device array is
            # baked at first trace and external-data swirl ramping would
            # silently never reach the jitted step
            sbc = sbc_vals
        else:
            Nt_now = jnp.zeros_like(ut)

        # column sets: [u_r, u_z] (+ [u_theta] with swirl); the extra
        # (v, mu u / r) mass term applies to the r and theta columns
        ncol = 3 if self.swirl else 2
        extra_col = jnp.asarray([1.0, 0.0, 1.0][:ncol])
        B_bc = jnp.stack(
            [ubc[:, 0] * (1.0 - masks[:, 0]),
             ubc[:, 1] * (1.0 - masks[:, 1])]
            + ([sbc * (1.0 - smask)] if self.swirl else []), axis=-1)
        mask_m = jnp.stack(
            [masks[:, 0], masks[:, 1]]
            + ([smask] if self.swirl else []), axis=-1)
        rhs_m = jnp.stack(
            [rhs[:, 0], rhs[:, 1]]
            + ([rhs_t] if self.swirl else []), axis=-1)
        x0_m = jnp.stack(
            [u[:, 0], u[:, 1]] + ([ut] if self.swirl else []), axis=-1)

        # Helmholtz operator with the density/viscosity as QUAD-POINT
        # coefficients (the reference's GridFunctionCoefficient
        # semantics, src/tomboulides.cpp Mv_rho_form) — identical
        # discretization on sharded and unsharded paths
        if not hasattr(tab, "run"):
            # unsharded: single-gather batched coefficient apply
            mass_cs = jnp.stack(
                [(bd[0] / dt) * rho_q * rq + mu_q / rq,
                 (bd[0] / dt) * rho_q * rq]
                + ([(bd[0] / dt) * rho_q * rq + mu_q / rq]
                   if self.swirl else []))
            diff_cs = jnp.stack([mu_q * rq] * ncol)

            def helm_m(V):
                return h1.helmholtz_apply_multi(tab, V, 1.0, mass_cs,
                                                diff_cs)
        else:
            def helm_m(V):
                base = ((bd[0] / dt) * h1.mass_apply(tab, V, coef=rhorq_c)
                        + h1.diffusion_apply(tab, V, murq_c))
                ex = h1.mass_apply(tab, V, coef=mu_over_r_c)
                return base + ex * extra_col[None, :]

        lift = helm_m(B_bc)
        rhs_cols = (rhs_m - lift) * mask_m
        diag_m = (diag_base[:, None]
                  + diag_extra[:, None] * extra_col[None, :])
        diag_m = diag_m * mask_m + (1.0 - mask_m)
        if precond is not None:
            facs = [precond[2], precond[1]]
            if self.swirl:
                facs.append(precond[4] if len(precond) > 4 else precond[2])
            M_m = h1.direct_precond_stack(jnp.stack(facs))
        else:
            M_m = None
        sol = h1.cg_solve_multi(
            helm_m, rhs_cols, x0=x0_m * mask_m, diag=diag_m,
            dirichlet_mask=mask_m, M=M_m, tol=self.cg_tol,
            maxiter=self.cg_maxiter,
        )
        sol = sol * mask_m + B_bc
        u_star = sol[:, :2]
        ut_new = sol[:, 2] if self.swirl else ut

        # pressure correction: (grad v, (1/rho) grad phi) r =
        #   (bd0/dt) [ (grad v, u*) r + (v, Qt) r ]
        b = (bd[0] / dt) * (
            h1.weak_divergence(tab, u_star, coef=rq_c)
            + h1.mass_apply(tab, qt, coef=rq_c)
        )
        if self._ortho:
            b = b - jnp.mean(b)
        inv_rho_c = h1.as_coef(tab, rq / rho_q)

        def lap(v):
            return h1.diffusion_apply(tab, v, inv_rho_c)

        pdiag = h1.stiffness_diag(tab, inv_rho_c)
        M_p = h1.direct_precond(precond[0]) if precond is not None else None
        phi = h1.cg_solve(lap, b, x0=jnp.zeros_like(p), diag=pdiag,
                          M=M_p, tol=self.cg_tol, maxiter=self.cg_maxiter)
        if self._ortho:
            phi = phi - jnp.mean(phi)

        if getattr(self, "_debug_no_projection", False):
            phi = jnp.zeros_like(p)
        gphi = grad_r(phi)
        u_new = u_star - (dt / bd[0]) * gphi / rho[:, None]
        u_new = u_new * masks + ubc * (1.0 - masks)
        p_new = p + phi

        # (swirl transport was solved as the third column of the batched
        # Helmholtz above; ut_new/Nt_now already set)
        return (u_new, p_new, ut_new,
                (u, u_hist[0], u_hist[1]),
                (N_now, N_hist[0], N_hist[1]),
                (ut, ut_hist[0], ut_hist[1]),
                (Nt_now, Nt_hist[0], Nt_hist[1]))
