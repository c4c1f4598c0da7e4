"""Tomboulides-style fractional-step variable-density flow solver.

Mirrors the reference Tomboulides class (reference: src/tomboulides.cpp:
1530-2036, Tomboulides 1997 splitting) in its ROTATIONAL, non-incremental
form:

  2) vstar/dt = extrapolated convection + forcing + BDF history
  3) pressure Poisson  div((1/rho) grad p) with RHS built from
     pp_div = vstar/dt + nu (-curl curl u_ext + 4/3 grad Qt)
              + (2 S(u_ext) . grad(mu) - 2/3 Qt grad(mu)) / rho
     weak form (grad q, pp_div) + (bd0/dt)[(q, Qt) - oint q u_bc.n]
     — the curl-curl/boundary treatment that gives the correct pressure
     Neumann condition (reference :1700-1860)
  4) Helmholtz velocity solve with
     rhs = (v, rho vstar/dt - grad p + 1/3 grad(mu Qt) + S_mom),
     S_mom = (grad u_ext)^T grad(mu) - Qt grad(mu)

Supports pure-Neumann (orthogonalized, p-multigrid preconditioned) and
pressure-Dirichlet (outlet) Poisson solves, spatially varying and
time-ramped velocity Dirichlet values.  All solves are matrix-free CG
(Chebyshev / p-multigrid preconditioning) on the shared H1 substrate.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import FlowBase, TemporalCoefficients


@dataclass
class VelocityDirichlet:
    attrs: tuple
    value: tuple  # velocity vector, or callable(xyz [n, dim]) -> [n, dim]
    ramp_time: float = 0.0  # linear 0 -> value ramp (reference: SetTime)


@dataclass
class PressureDirichlet:
    attrs: tuple
    value: float


class Tomboulides(FlowBase):
    def __init__(self, tab, thermo, turb=None, vel_bcs=(), pres_refdof=True,
                 body_force=None, sponge=None, cg_tol=1e-10, cg_maxiter=1000,
                 mesh=None, pres_bcs=(), gravity=None):
        self.tab = tab
        self.thermo = thermo
        self.turb = turb
        self.sponge = sponge
        self.vel_bcs = tuple(vel_bcs)
        self.body_force = body_force
        # constant gravitational acceleration [dim] added to the velocity
        # equation (reference: loMach/gravity, src/tomboulides.cpp:419-434;
        # with variable density this drives buoyancy — a constant-rho g is
        # a pure gradient the pressure projection absorbs)
        self.gravity = None if gravity is None else jnp.asarray(
            np.asarray(gravity, dtype=np.float64))
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter
        self.solve_info = {}

        # two-level p-multigrid data for the pressure Poisson solve
        # (the reference preconditions with LOR BoomerAMG,
        # src/tomboulides.cpp:1582-1610; p-coarsening is the TPU ladder)
        self._pmg = None
        if mesh is not None and tab.order > 1 \
                and not isinstance(tab, h1.ShardedH1):
            dtype = jnp.asarray(tab.wq).dtype
            tab_c_np = h1.build_h1(mesh, order=1)
            P_ids, P_wts, c2f = h1.build_p_interp(tab, tab_c_np, mesh)
            self._pmg = {
                "tab_c": tab_c_np.to_jax(dtype),
                "nc": tab_c_np.ndofs,
                "P_ids": P_ids, "P_wts": jnp.asarray(P_wts, dtype),
                "c2f": c2f,
            }

        dim = tab.dim
        nd = tab.ndofs
        self.u = jnp.zeros((nd, dim))
        self.u_hist = [jnp.zeros((nd, dim)) for _ in range(3)]  # u^{n-1}, ...
        self.N_hist = [jnp.zeros((nd, dim)) for _ in range(3)]  # conv terms
        self.p = jnp.zeros(nd)

        # velocity Dirichlet machinery: spatially varying values (callables
        # evaluated at dof coordinates) and per-BC ramp times
        xyz = jnp.asarray(tab.xyz)
        self._vel_ramps = []  # (dof ids, base values, ramp_time)
        if self.vel_bcs:
            vals = jnp.zeros((nd, dim))
            free = np.ones(nd)
            for bc in self.vel_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                free[dofs] = 0.0
                jd = jnp.asarray(dofs)
                if callable(bc.value):
                    v = jnp.asarray(bc.value(np.asarray(tab.xyz)[dofs]))
                else:
                    v = jnp.broadcast_to(
                        jnp.asarray(bc.value), (len(dofs), dim)
                    )
                vals = vals.at[jd].set(v)
                if bc.ramp_time > 0.0:
                    self._vel_ramps.append((jd, v, bc.ramp_time))
            self.vel_mask = jnp.asarray(free)
            self.vel_bc_values = vals
        else:
            self.vel_mask = jnp.ones(nd)
            self.vel_bc_values = jnp.zeros((nd, dim))

        # boundary faces belonging to velocity-Dirichlet patches (for the
        # oint q u_bc.n pressure-RHS term)
        vel_attrs = set()
        for bc in self.vel_bcs:
            vel_attrs.update(bc.attrs)
        bf_attr = np.asarray(tab.bf_attr)
        self._vel_face_sel = jnp.asarray(
            np.isin(bf_attr, sorted(vel_attrs)).astype(np.float64)
        ) if len(bf_attr) else None

        # pressure Dirichlet (outlets); pure Neumann otherwise
        self.pres_bcs = tuple(pres_bcs)
        if self.pres_bcs:
            pfree = np.ones(nd)
            pvals = jnp.zeros(nd)
            for bc in self.pres_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                pfree[dofs] = 0.0
                pvals = pvals.at[jnp.asarray(dofs)].set(bc.value)
            self.pres_mask = jnp.asarray(pfree)
            self.pres_bc_values = pvals
            self._ortho = False
        else:
            self.pres_mask = None
            self.pres_bc_values = None
            self._ortho = True  # pure Neumann -> orthogonalize

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))

        # lagged dense-direct preconditioner (small unsharded spaces only;
        # see fem/h1.py dense-direct section): refreshed every chunk /
        # every _PRECOND_REFRESH steps, exactness is never required — CG
        # still iterates to tolerance
        self._direct = None
        self._direct_age = None
        self._refresh_jit = jax.jit(self._precond_build)

    _PRECOND_REFRESH = 16

    def _precond_build(self, rho, mu, dt, bd0):
        tab = self.tab
        inv_rho = 1.0 / rho
        Kp_e = h1.element_stiffness(tab, inv_rho)
        He_e = (bd0 / dt) * h1.element_mass(tab, rho) \
            + h1.element_stiffness(tab, mu)
        Kp, He = h1.assemble_dense(tab, jnp.stack([Kp_e, He_e]))
        if self.pres_mask is not None:
            Kp = h1.dense_constrain(Kp, mask=self.pres_mask)
        else:
            Kp = h1.dense_constrain(Kp, ortho=True)
        He = h1.dense_constrain(He, mask=self.vel_mask)
        L = h1.dense_cholesky(jnp.stack([Kp, He]))
        return L[0], L[1]

    def precond_refresh(self, dt, order, force=False):
        """Refresh the lagged dense pressure/Helmholtz factors (host-
        driven, outside the jitted step/chunk)."""
        if not h1.dense_capable(self.tab):
            return
        age = self._direct_age
        if not force and age is not None and age < self._PRECOND_REFRESH:
            return
        rho = self.thermo.density()
        mu = self.thermo.viscosity()
        if self.turb is not None:
            mu = mu + rho * self.turb.eddy_viscosity()
        if self.sponge is not None:
            mu = mu * self.sponge.multiplier()
        bd0 = TemporalCoefficients.bdf(order).bd0
        self._direct = self._refresh_jit(
            rho, mu, jnp.asarray(dt), jnp.asarray(bd0))
        self._direct_age = 0

    def chunk_precond(self):
        return self._direct

    # -- public API --------------------------------------------------------
    def set_velocity(self, u0):
        self.u = jnp.asarray(u0)
        self.u_hist = [self.u, self.u, self.u]
        N0 = self._convection(self.u)
        self.N_hist = [N0, N0, N0]

    def velocity(self):
        return self.u

    def step(self, coeff: TemporalCoefficients, dt: float):
        rho = self.thermo.density()
        mu = self.thermo.viscosity()
        if self.turb is not None:
            mu = mu + rho * self.turb.eddy_viscosity()
        if self.sponge is not None:
            # geometric sponge scales the total viscosity
            # (reference: src/tomboulides.cpp:2077)
            mu = mu * self.sponge.multiplier()
        qt = self.thermo.thermal_divergence()
        ubc = self._ramped_ubc(dt)
        self.precond_refresh(dt, coeff.order)
        if self._direct_age is not None:
            self._direct_age += 1
        (self.u, self.p, u_hist, N_hist, info) = self._step_jit(
            self.u, self.p, tuple(self.u_hist), tuple(self.N_hist),
            rho, mu, qt, ubc, jnp.asarray(dt),
            order=coeff.order, precond=self._direct,
        )
        self.u_hist = list(u_hist)
        self.N_hist = list(N_hist)
        # defer the host fetch of the convergence scalars by one step:
        # a synchronous per-step device round trip costs ~26 ms on the
        # hosted TPU tunnel (PERF.md); the async copy pipelines.  The
        # diverged-solve failure still fires, one step late.
        for v in info.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        pending = getattr(self, "_pending_info", None)
        self._pending_info = info
        self._check_solve_info(pending)

    @property
    def solve_info(self):
        """Latest solver iterations/residuals (forces the pending fetch)."""
        info = getattr(self, "_pending_info", None)
        return {} if info is None else {k: float(v) for k, v in info.items()}

    @solve_info.setter
    def solve_info(self, value):
        self._pending_info = value

    def finalize(self):
        """Drain the deferred convergence check (call at run end)."""
        self._check_solve_info(getattr(self, "_pending_info", None))

    def _check_solve_info(self, info):
        if not info or "p_res" not in info:
            return
        vals = {k: float(v) for k, v in info.items()}
        # loud failure on a diverged solve (the reference's hypre solvers
        # print iterations/residual and abort on non-convergence)
        if not (vals["p_res"] < 1e-3 and vals["v_res"] < 1e-3):
            raise FloatingPointError(
                f"implicit solve did not converge: {vals}"
            )

    def _ramped_ubc(self, dt):
        """Velocity Dirichlet values with time ramps applied (reference:
        coefficient SetTime on the velocity dbcs).  Shared with the
        axisymmetric subclass."""
        self._time = getattr(self, "_time", 0.0) + dt
        ubc = self.vel_bc_values
        for (jd, v, ramp) in self._vel_ramps:
            w = min(max(self._time / ramp, 0.0), 1.0)
            ubc = ubc.at[jd].set(w * v)
        return ubc

    def _ramped_ubc_traced(self, t):
        """Traced ramp at time t (chunked scan; same math as
        _ramped_ubc with jnp.clip in place of python min/max)."""
        ubc = self.vel_bc_values
        for (jd, v, ramp) in self._vel_ramps:
            w = jnp.clip(t / ramp, 0.0, 1.0)
            ubc = ubc.at[jd].set(w * v)
        return ubc

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_pack(self):
        return (self.u, self.p, tuple(self.u_hist), tuple(self.N_hist),
                jnp.asarray(getattr(self, "_time", 0.0)))

    def chunk_unpack(self, s):
        u, p, uh, Nh, t = s
        self.u, self.p = u, p
        self.u_hist, self.N_hist = list(uh), list(Nh)
        self._time = float(t)

    def chunk_velocity(self, s):
        return s[0]

    def chunk_step(self, s, rho, mu, qt, dt, order, precond=None):
        u, p, uh, Nh, t = s
        t2 = t + dt
        u2, p2, uh2, Nh2, info = self._step_impl(
            u, p, uh, Nh, rho, mu, qt, self._ramped_ubc_traced(t2),
            dt, order, precond=precond,
        )
        return (u2, p2, tuple(uh2), tuple(Nh2), t2), info

    def chunk_check(self, infos):
        """Convergence guard over a chunk's stacked per-step info (one
        host fetch per chunk; role of the per-step deferred check)."""
        if not infos:
            return
        vals = {k: np.asarray(v) for k, v in infos.items()}
        if "p_res" in vals and not (
            np.all(vals["p_res"] < 1e-3) and np.all(vals["v_res"] < 1e-3)
        ):
            raise FloatingPointError(
                f"implicit solve did not converge in chunk: "
                f"{ {k: v.max() for k, v in vals.items()} }"
            )
        # keep the newest scalars for the screen report
        self._pending_info = {k: v[-1] for k, v in vals.items()}

    # -- internals ---------------------------------------------------------
    def _convection(self, u):
        """-M^-1_lumped (v,(u.grad)u) nodal convection acceleration."""
        tab = self.tab
        c = h1.convection_apply(tab, u, u)
        return -c / h1.mass_lumped_diag(tab)[:, None]

    def _curl(self, u):
        """Nodal curl via lumped projections of component gradients.

        2-D: returns scalar omega [nd]; 3-D: vector [nd, 3]
        (reference: ComputeCurl2D/3D, src/tomboulides.cpp:1720-1731)."""
        tab = self.tab
        g = [h1.grad_at_dofs(tab, u[:, d]) for d in range(u.shape[-1])]
        if tab.dim == 2:
            return g[1][:, 0] - g[0][:, 1]
        return jnp.stack(
            [g[2][:, 1] - g[1][:, 2],
             g[0][:, 2] - g[2][:, 0],
             g[1][:, 0] - g[0][:, 1]], axis=-1
        )

    def _curl_curl(self, u):
        tab = self.tab
        w = self._curl(u)
        if tab.dim == 2:
            gw = h1.grad_at_dofs(tab, w)
            # curl(w zhat) = (dw/dy, -dw/dx)
            return jnp.stack([gw[:, 1], -gw[:, 0]], axis=-1)
        return self._curl(w)

    def _step_impl(self, u, p, u_hist, N_hist, rho, mu, qt, ubc_vals, dt,
                   order, precond=None):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        ab = (coeff.ab1, coeff.ab2, coeff.ab3)
        mask = self.vel_mask
        ubc = ubc_vals
        inv_rho = 1.0 / rho

        # ---- Step 2: vstar/dt (reference :1930-2000) ----
        N_now = self._convection(u)
        N_ext = ab[0] * N_now + ab[1] * N_hist[0] + ab[2] * N_hist[1]
        if self.body_force is not None:
            N_ext = N_ext + self.body_force(tab.xyz) / rho[:, None]
        if self.gravity is not None:
            N_ext = N_ext + self.gravity[None, :]
        hist = -(bd[1] * u + bd[2] * u_hist[0] + bd[3] * u_hist[1]) / dt
        ustar_dt = N_ext + hist  # acceleration: vstar/dt

        # ---- Step 3: pressure Poisson, rotational form ----
        # pp_div = vstar/dt + nu (-curl curl u_ext + 4/3 grad Qt)
        #          + (2 S(u_ext) grad mu - 2/3 Qt grad mu) / rho
        u_ext = ab[0] * u + ab[1] * u_hist[0] + ab[2] * u_hist[1]
        nu = mu * inv_rho
        pp_div = ustar_dt - nu[:, None] * self._curl_curl(u_ext)
        pp_div = pp_div + (4.0 / 3.0) * nu[:, None] * h1.grad_at_dofs(tab, qt)
        # variable-viscosity terms (reference S_poisson_coeff :875-879)
        gmu = h1.grad_at_dofs(tab, mu)
        gu = [h1.grad_at_dofs(tab, u_ext[:, d]) for d in range(tab.dim)]
        graduT_gmu = jnp.stack(
            [jnp.einsum("nd,nd->n", gu[d], gmu) for d in range(tab.dim)],
            axis=-1,
        )  # (grad u)^T grad(mu)
        gradu_gmu = jnp.stack(
            [sum(gu[k][:, d] * gmu[:, k] for k in range(tab.dim))
             for d in range(tab.dim)], axis=-1,
        )  # (grad u) grad(mu)
        twoS_gmu = graduT_gmu + gradu_gmu
        pp_div = pp_div + (
            twoS_gmu - (2.0 / 3.0) * qt[:, None] * gmu
        ) * inv_rho[:, None]

        # weak RHS: (grad q, pp_div) + (bd0/dt)[(q, Qt) - oint q u_bc.n]
        b = h1.weak_divergence(tab, pp_div) \
            + (bd[0] / dt) * h1.mass_apply(tab, qt)
        if self._vel_face_sel is not None:
            b = b - (bd[0] / dt) * h1.surface_normal_form(
                tab, ubc, self._vel_face_sel
            )

        def lap(v):
            return h1.diffusion_apply(tab, v, inv_rho)

        pdiag = h1.stiffness_diag(tab, inv_rho)
        if self.pres_mask is not None:
            pmask = self.pres_mask
            pbc = self.pres_bc_values
            b = (b - lap(pbc * (1.0 - pmask))) * pmask
            pdiag_c = pdiag * pmask + (1.0 - pmask)

            def lap_m(v):
                return lap(v * pmask) * pmask + v * (1.0 - pmask)

            if precond is not None:
                # lagged dense-direct factor (h1 dense-direct section):
                # exact for the factor-time rho, a near-exact
                # preconditioner for the current one
                M_p = h1.direct_precond(precond[0])
            elif self._pmg is not None:
                # mask-aware two-level V(1,1): the coarse operator is the
                # same 1/rho Laplacian on the order-1 space with the
                # pressure-Dirichlet mask injected at the vertices (the
                # reference preconditions this solve with LOR BoomerAMG,
                # src/tomboulides.cpp:1582-1610; measured here on the
                # reacting 1152-elem p2 case: 129 -> ~25 CG iters)
                tab_c = self._pmg["tab_c"]
                c2f = self._pmg["c2f"]
                inv_rho_c = inv_rho[c2f]
                pmask_c = pmask[c2f]

                def lap_c_m(v):
                    return h1.diffusion_apply(
                        tab_c, v * pmask_c, inv_rho_c
                    ) * pmask_c + v * (1.0 - pmask_c)

                diag_cc = h1.stiffness_diag(tab_c, inv_rho_c) * pmask_c \
                    + (1.0 - pmask_c)
                M_p = h1.pmg_precond(
                    lap_m, pdiag_c, lap_c_m, diag_cc,
                    self._pmg["P_ids"], self._pmg["P_wts"],
                    self._pmg["nc"],
                )
            else:
                M_p = h1.chebyshev_precond(lap_m, pdiag_c, degree=3)
            p_new, p_iters, p_res = h1.cg_solve(
                lap, b, x0=p * pmask, diag=pdiag_c, dirichlet_mask=pmask,
                M=M_p, tol=self.cg_tol, maxiter=self.cg_maxiter,
                return_info=True,
            )
            p_new = p_new * pmask + pbc * (1.0 - pmask)
        else:
            if self._ortho:
                b = b - jnp.mean(b)
            M_p = None
            if precond is not None:
                M_p = h1.direct_precond(precond[0])
            elif self._pmg is not None:
                # p-multigrid V(1,1): coarse operator = same 1/rho
                # Laplacian on the order-1 space, coefficient injected at
                # the vertices
                tab_c = self._pmg["tab_c"]
                inv_rho_c = inv_rho[self._pmg["c2f"]]

                def lap_c(v):
                    return h1.diffusion_apply(tab_c, v, inv_rho_c)

                M_p = h1.pmg_precond(
                    lap, pdiag, lap_c, h1.stiffness_diag(tab_c, inv_rho_c),
                    self._pmg["P_ids"], self._pmg["P_wts"], self._pmg["nc"],
                    ortho=self._ortho,
                )
            p_new, p_iters, p_res = h1.cg_solve(
                lap, b, x0=p, diag=pdiag, M=M_p,
                tol=self.cg_tol, maxiter=self.cg_maxiter, return_info=True,
            )
            if self._ortho:
                p_new = p_new - jnp.mean(p_new)

        # ---- Step 4: Helmholtz velocity solve (reference :1895-1930) ----
        # rhs = (v, rho vstar/dt - grad p + 1/3 grad(mu Qt) + S_mom)
        gradp = h1.grad_at_dofs(tab, p_new)
        S_mom = graduT_gmu - qt[:, None] * gmu
        rhs_nodal = rho[:, None] * ustar_dt - gradp + S_mom \
            + (1.0 / 3.0) * h1.grad_at_dofs(tab, mu * qt)
        rhs = h1.mass_apply(tab, rhs_nodal)

        def helm(v):
            return (bd[0] / dt) * h1.mass_apply(tab, rho[:, None] * v) + \
                h1.diffusion_apply(tab, v, mu)

        diag = (bd[0] / dt) * h1.mass_lumped_diag(tab, rho) \
            + h1.stiffness_diag(tab, mu)
        rhs = (rhs - helm(ubc * (1.0 - mask)[:, None])) * mask[:, None]
        diag_c = diag * mask + (1.0 - mask)

        if precond is not None:
            # all velocity components in ONE multi-RHS CG with the lagged
            # dense factor: one operator sweep per iteration for every
            # component, 1-3 iterations typical
            u_new, v_iters, v_res = h1.cg_solve_multi(
                helm, rhs, x0=u * mask[:, None],
                diag=diag_c[:, None], dirichlet_mask=mask[:, None],
                M=h1.direct_precond(precond[1]),
                tol=self.cg_tol, maxiter=self.cg_maxiter,
                return_info=True,
            )
        else:
            def helm_s(v):
                return helm(v[:, None])[:, 0]

            def helm_m(v):
                return helm_s(v * mask) * mask + v * (1.0 - mask)

            M_helm = h1.chebyshev_precond(helm_m, diag_c, degree=2)
            sols = [
                h1.cg_solve(
                    helm_s, rhs[:, d], x0=u[:, d] * mask,
                    diag=diag_c, dirichlet_mask=mask, M=M_helm,
                    tol=self.cg_tol, maxiter=self.cg_maxiter,
                    return_info=True,
                )
                for d in range(tab.dim)
            ]
            u_new = jnp.stack([s[0] for s in sols], axis=-1)
            v_iters = sum(s[1] for s in sols)
            v_res = jnp.max(jnp.stack([s[2] for s in sols]))
        u_new = u_new * mask[:, None] + ubc * (1.0 - mask)[:, None]

        u_hist_new = (u, u_hist[0], u_hist[1])
        N_hist_new = (N_now, N_hist[0], N_hist[1])
        info = {"p_iters": p_iters, "p_res": p_res,
                "v_iters": v_iters, "v_res": v_res}
        return u_new, p_new, u_hist_new, N_hist_new, info

    def compute_dissipation(self):
        """Viscous dissipation integral (diagnostics)."""
        tab = self.tab
        mu = self.thermo.viscosity()
        Ku = h1.diffusion_apply(tab, self.u, mu)
        return jnp.sum(self.u * Ku)

    def dissipation_field(self, u_mean):
        """Per-dof turbulent dissipation of the FLUCTUATING velocity,
        eps = 2 (mu_total/rho) sum_ij (d u'_i/dx_j)^2 with u' = u - <u>
        (reference: Tomboulides::computeDissipation,
        src/tomboulides.cpp:1454-1529; registered as a time-averaged
        statistics field).  Planar components only (axisym swirl
        gradients are not included, matching the reference's nvel=dim
        gradient set)."""
        tab = self.tab
        up = self.u - u_mean
        g = jnp.stack(
            [h1.grad_at_dofs(tab, up[:, d]) for d in range(up.shape[-1])],
            axis=1,
        )
        rho = self.thermo.density()
        mu = self.thermo.viscosity()
        if self.turb is not None:
            mu = mu + rho * self.turb.eddy_viscosity()
        return 2.0 * (mu / rho) * jnp.einsum("nij,nij->n", g, g)
