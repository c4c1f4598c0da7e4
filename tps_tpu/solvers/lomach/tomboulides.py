"""Tomboulides-style fractional-step variable-density flow solver.

The role of the reference Tomboulides class (reference: src/tomboulides.cpp:
1530-2036, Tomboulides 1997 splitting): BDF/EXT time discretization with an
extrapolated convection term, a 1/rho-weighted pressure Poisson solve, and a
viscous Helmholtz velocity solve.  This implementation uses the incremental
pressure-correction form of the split (the curl-curl boundary treatment of
the exact Tomboulides scheme is tracked as a refinement): all solves are
matrix-free CG with Jacobi preconditioning on the shared H1 substrate.
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
    value: tuple  # velocity vector (callable(x) later)


class Tomboulides(FlowBase):
    def __init__(self, tab, thermo, turb=None, vel_bcs=(), pres_refdof=True,
                 body_force=None, sponge=None, cg_tol=1e-10, cg_maxiter=1000,
                 mesh=None):
        self.tab = tab
        self.thermo = thermo
        self.turb = turb
        self.sponge = sponge
        self.vel_bcs = tuple(vel_bcs)
        self.body_force = body_force
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

        # velocity Dirichlet machinery
        if self.vel_bcs:
            masks, vals = [], jnp.zeros((nd, dim))
            free = np.ones(nd)
            for bc in self.vel_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                free[dofs] = 0.0
                vals = vals.at[jnp.asarray(dofs)].set(jnp.asarray(bc.value))
            self.vel_mask = jnp.asarray(free)
            self.vel_bc_values = vals
        else:
            self.vel_mask = jnp.ones(nd)
            self.vel_bc_values = jnp.zeros((nd, dim))

        # pressure: pure Neumann -> orthogonalize against constants
        self._ortho = True

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))

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
        (self.u, self.p, u_hist, N_hist, info) = self._step_jit(
            self.u, self.p, tuple(self.u_hist), tuple(self.N_hist),
            rho, mu, qt, self.vel_bc_values, jnp.asarray(dt),
            order=coeff.order,
        )
        self.u_hist = list(u_hist)
        self.N_hist = list(N_hist)
        self.solve_info = {k: float(v) for k, v in info.items()}
        # loud failure on a diverged solve (the reference's hypre solvers
        # print iterations/residual and abort on non-convergence)
        if not (self.solve_info["p_res"] < 1e-3
                and self.solve_info["v_res"] < 1e-3):
            raise FloatingPointError(
                f"implicit solve did not converge: {self.solve_info}"
            )

    # -- internals ---------------------------------------------------------
    def _convection(self, u):
        """-M^-1_lumped (v,(u.grad)u) nodal convection acceleration."""
        tab = self.tab
        c = h1.convection_apply(tab, u, u)
        return -c / h1.mass_lumped_diag(tab)[:, None]

    def _step_impl(self, u, p, u_hist, N_hist, rho, mu, qt, ubc_vals, dt, order):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        ab = (coeff.ab1, coeff.ab2, coeff.ab3)

        Ml = h1.mass_lumped_diag(tab)
        N_now = self._convection(u)
        N_ext = ab[0] * N_now + ab[1] * N_hist[0] + ab[2] * N_hist[1]
        if self.body_force is not None:
            N_ext = N_ext + self.body_force(tab.xyz) / rho[:, None]

        # BDF history term: -(1/dt) sum_j bd_j u^{n+1-j}
        hist = -(bd[1] * u + bd[2] * u_hist[0] + bd[3] * u_hist[1]) / dt

        # 1) Helmholtz predictor:
        #    (bd0/dt) rho M u* + K_mu u* = rho M (hist + N_ext) - M grad p^n
        gradp = h1.grad_at_dofs(tab, p)
        rhs = h1.mass_apply(tab, rho[:, None] * (hist + N_ext) - gradp[:, :])
        mask = self.vel_mask

        def helm(v):
            return (bd[0] / dt) * h1.mass_apply(tab, rho[:, None] * v) + \
                h1.diffusion_apply(tab, v, mu)

        diag = (bd[0] / dt) * h1.mass_lumped_diag(tab, rho) + h1.stiffness_diag(tab, mu)
        # lift inhomogeneous velocity BCs (argument, so ramped/interpolated
        # inlet values don't retrace the jit)
        ubc = ubc_vals
        rhs = (rhs - helm(ubc * (1.0 - mask)[:, None])) * mask[:, None]
        diag_c = diag * mask + (1.0 - mask)

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
        u_star = jnp.stack([s[0] for s in sols], axis=-1)
        v_iters = sum(s[1] for s in sols)
        v_res = jnp.max(jnp.stack([s[2] for s in sols]))
        u_star = u_star * mask[:, None] + ubc * (1.0 - mask)[:, None]

        # 2) pressure correction: div((1/rho) grad phi) = (bd0/dt)(div u* - Qt)
        # Weak form with homogeneous-Neumann phi and impermeable/periodic
        # boundaries (u*.n surface term vanishes):
        #   (grad v, (1/rho) grad phi) = (bd0/dt) [ (grad v, u*) + (v, Qt) ]
        b = (bd[0] / dt) * (
            h1.weak_divergence(tab, u_star) + h1.mass_apply(tab, qt)
        )
        if self._ortho:
            b = b - jnp.mean(b)

        inv_rho = 1.0 / rho

        def lap(v):
            return h1.diffusion_apply(tab, v, inv_rho)

        pdiag = h1.stiffness_diag(tab, inv_rho)
        M_p = None
        if self._pmg is not None:
            # p-multigrid V(1,1): coarse operator = same 1/rho Laplacian on
            # the order-1 space, coefficient injected at the vertices
            tab_c = self._pmg["tab_c"]
            inv_rho_c = inv_rho[self._pmg["c2f"]]

            def lap_c(v):
                return h1.diffusion_apply(tab_c, v, inv_rho_c)

            M_p = h1.pmg_precond(
                lap, pdiag, lap_c, h1.stiffness_diag(tab_c, inv_rho_c),
                self._pmg["P_ids"], self._pmg["P_wts"], self._pmg["nc"],
                ortho=self._ortho,
            )
        phi, p_iters, p_res = h1.cg_solve(
            lap, b, x0=jnp.zeros_like(p), diag=pdiag, M=M_p,
            tol=self.cg_tol, maxiter=self.cg_maxiter, return_info=True,
        )
        if self._ortho:
            phi = phi - jnp.mean(phi)

        # 3) velocity update and pressure accumulation
        gphi = h1.grad_at_dofs(tab, phi)
        u_new = u_star - (dt / bd[0]) * inv_rho[:, None] * gphi
        u_new = u_new * mask[:, None] + ubc * (1.0 - mask)[:, None]
        p_new = p + phi

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
