"""Four-equation zeta-f RANS model for the low-Mach path.

The role of the reference ZetaModel (src/zetaModel.cpp, "code-friendly"
zeta-f of Hanjalic, Popovac & Hadziabdic 2004): transport equations for the
turbulent kinetic energy k, its dissipation rate eps, the wall-normal
velocity-scale ratio v2 (zeta = v2/k), and the elliptic-relaxation variable
f.  Each transport equation is an implicit BDF Helmholtz solve with
explicit convection, diffusion coefficient mu + mu_t/sigma, and
semi-implicit destruction; f solves the elliptic relaxation equation
L^2 lap(f) - f = rhs.  Constants follow the reference defaults
(src/zetaModel.hpp:238-250, src/zetaModel.cpp:70-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import TemporalCoefficients, TurbModelBase

TANH_HALF = 0.54930615


class ZetaModel(TurbModelBase):
    def __init__(self, tab, flow, thermo, wall_attrs=(), inlet_bcs=(),
                 tke_ic=1.0e-4, tdr_ic=1.0e-8,
                 Cmu=0.22, sigmaK=1.0, sigmaE=1.3, sigmaZ=1.2,
                 Ce2=1.9, C1=1.4, C2=0.3, Ct=6.0, Cl=0.23, Cn=70.0,
                 tke_min=1.0e-12, tdr_min=1.0e-12, zeta_min=1.0e-12,
                 v2_min=0.667e-12, tts_min=1.0e-12, tls_min=1.0e-12,
                 tts_max=100.0, tls_max=100.0, mut_min=1.0e-12,
                 pk_min=1.0e-14, cg_tol=1e-10, cg_maxiter=500):
        self.tab = tab
        self.flow = flow
        self.thermo = thermo
        self.c = dict(Cmu=Cmu, sigmaK=sigmaK, sigmaE=sigmaE, sigmaZ=sigmaZ,
                      Ce2=Ce2, C1=C1, C2=C2, Ct=Ct, Cl=Cl, Cn=Cn,
                      tke_min=tke_min, tdr_min=tdr_min, zeta_min=zeta_min,
                      v2_min=v2_min, tts_min=tts_min, tls_min=tls_min,
                      tts_max=tts_max, tls_max=tls_max, mut_min=mut_min,
                      pk_min=pk_min)
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter

        nd = tab.ndofs
        self.k = jnp.full(nd, float(tke_ic))
        self.eps = jnp.full(nd, float(tdr_ic))
        self.v2 = jnp.full(nd, (2.0 / 3.0) * float(tke_ic))
        self.f = jnp.zeros(nd)
        self.k_hist = [self.k, self.k]
        self.eps_hist = [self.eps, self.eps]
        self.v2_hist = [self.v2, self.v2]
        self._mut = jnp.full(nd, mut_min)

        # wall dofs: k = v2 = f = 0; eps gets the wall value nu lap(k)
        free = np.ones(nd)
        if wall_attrs:
            wd = np.asarray(h1.boundary_dofs(tab, tuple(wall_attrs)))
            free[wd] = 0.0
        self.wall_mask = jnp.asarray(free)

        # inlet Dirichlet values: list of (attrs, k, eps[, v2]) tuples;
        # k/eps/v2 may be scalars or per-dof arrays (e.g. interpolated from
        # an external tke/v2 profile, reference setInletTurbScalars,
        # src/gaussianInterpExtData.cpp:910-1096)
        k_free = np.array(free)
        kin_vals = jnp.zeros(nd)
        ein_vals = jnp.zeros(nd)
        for bc in inlet_bcs:
            dofs = np.asarray(h1.boundary_dofs(tab, tuple(bc[0])))
            k_free[dofs] = 0.0
            kin_vals = kin_vals.at[jnp.asarray(dofs)].set(bc[1])
            ein_vals = ein_vals.at[jnp.asarray(dofs)].set(bc[2])
        # v2 defaults to (2/3) k everywhere (seeded only AFTER every k is
        # written, so tke-only inlets processed in any order keep it);
        # explicit v2 profiles override in a second pass
        v2in_vals = (2.0 / 3.0) * kin_vals
        for bc in inlet_bcs:
            if len(bc) > 3 and bc[3] is not None:
                dofs = np.asarray(h1.boundary_dofs(tab, tuple(bc[0])))
                v2in_vals = v2in_vals.at[jnp.asarray(dofs)].set(bc[3])
        self.dir_mask = jnp.asarray(k_free)
        self.k_bc = kin_vals
        self.eps_bc = ein_vals
        self.v2_bc = v2in_vals

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))

    # -- interface ---------------------------------------------------------
    def eddy_viscosity(self):
        """Kinematic eddy viscosity nu_t (flow adds rho * nu_t to mu)."""
        return self._mut / jnp.maximum(self.thermo.density(), 1e-300)

    @property
    def zeta(self):
        return self.v2 / jnp.maximum(self.k, self.c["tke_min"])

    def step(self, coeff: TemporalCoefficients, dt: float):
        u = self.flow.velocity()
        rho = self.thermo.density()
        mu = self.thermo.viscosity()
        (self.k, self.eps, self.v2, self.f, self._mut,
         kh, eh, vh) = self._step_jit(
            self.k, self.eps, self.v2,
            tuple(self.k_hist), tuple(self.eps_hist), tuple(self.v2_hist),
            u, rho, mu, jnp.asarray(dt), order=coeff.order,
        )
        self.k_hist, self.eps_hist, self.v2_hist = list(kh), list(eh), list(vh)

    # -- chunked-scan adapters (LoMachSolver.solve_chunk, rich protocol:
    # the carry is the full transported state, not just nu_t) --------------
    def chunk_pack(self):
        return (self.k, self.eps, self.v2, self.f, self._mut,
                tuple(self.k_hist), tuple(self.eps_hist),
                tuple(self.v2_hist))

    def chunk_unpack(self, st):
        (self.k, self.eps, self.v2, self.f, self._mut, kh, eh, vh) = st
        self.k_hist, self.eps_hist, self.v2_hist = list(kh), list(eh), list(vh)

    def chunk_nut_from(self, st, rho):
        """Kinematic eddy viscosity carried by the chunk state."""
        return st[4] / jnp.maximum(rho, 1e-300)

    def chunk_step(self, st, u, rho, mu, dt, order):
        k, eps, v2, _f, _mut, kh, eh, vh = st
        return self._step_impl(k, eps, v2, kh, eh, vh, u, rho, mu, dt,
                               order)

    # -- internals ---------------------------------------------------------
    def _scales(self, k, eps, v2, rho, mu, smag):
        c = self.c
        nu = mu / rho
        eps_c = jnp.maximum(eps, c["tdr_min"])
        T1 = k / eps_c
        T2 = (0.6 / (np.sqrt(6.0) * c["Cmu"])) * k / (
            jnp.maximum(smag, 1e-14) * jnp.maximum(v2, c["v2_min"])
        )
        T3 = c["Ct"] * jnp.sqrt(jnp.maximum(nu / eps_c, 0.0))
        w = jnp.tanh(TANH_HALF * T1 / jnp.maximum(T3, 1e-300))
        tts = jnp.clip(w * T1 + (1.0 - w) * T3, c["tts_min"], c["tts_max"])
        tts_strain = jnp.maximum(T2, c["tts_min"])

        L1 = k**1.5 / eps_c
        L3 = c["Cn"] * (nu**3 / eps_c) ** 0.25
        w = jnp.tanh(TANH_HALF * L1 / jnp.maximum(L3, 1e-300))
        tls = jnp.maximum(c["Cl"] * (w * L1 + (1.0 - w) * L3), c["tls_min"])
        w = jnp.tanh(TANH_HALF * tls / c["tls_max"])
        tls = (1.0 - w) * tls + w * c["tls_max"]
        return tts, tts_strain, tls

    def _step_impl(self, k, eps, v2, k_hist, eps_hist, v2_hist,
                   u, rho, mu, dt, order):
        tab = self.tab
        c = self.c
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        Ml = h1.mass_lumped_diag(tab)

        # velocity gradient and strain at dofs
        g = jnp.stack(
            [h1.grad_at_dofs(tab, u[:, d]) for d in range(tab.dim)], axis=1
        )  # [nd, comp, dim]
        S = 0.5 * (g + jnp.swapaxes(g, 1, 2))
        smag = jnp.sqrt(2.0 * jnp.einsum("nij,nij->n", S, S))
        divu = jnp.trace(g, axis1=1, axis2=2)

        tts, tts_strain, tls = self._scales(k, eps, v2, rho, mu, smag)

        # eddy viscosity at current state
        mut = c["Cmu"] * rho * jnp.minimum(v2, (2.0 / 3.0) * k) * jnp.minimum(
            tts, tts_strain
        )
        mut = jnp.maximum(mut, c["mut_min"])

        # production P_k = tau : grad(u), tau = 2 mut S - 2/3 (mut divu + rho k) I
        tau = 2.0 * mut[:, None, None] * S
        dd = jnp.arange(tab.dim)
        tau = tau.at[:, dd, dd].add(
            (-(2.0 / 3.0) * (mut * divu + rho * k))[:, None]
        )
        prod = jnp.maximum(jnp.einsum("nij,nij->n", tau, g), c["pk_min"])

        zeta = jnp.clip(v2 / jnp.maximum(k, c["tke_min"]), c["zeta_min"], 2.0 / 3.0)
        k_c = jnp.maximum(k, c["tke_min"])
        eps_c = jnp.maximum(eps, c["tdr_min"])

        def transport_solve(q, q_hist, sigma, src, react, mask, bc_vals):
            """Implicit BDF advection-diffusion-reaction solve for q."""
            hist = -(bd[1] * q + bd[2] * q_hist[0] + bd[3] * q_hist[1]) / dt
            adv = h1.convection_apply(tab, q, u) / Ml
            rhs = h1.mass_apply(tab, rho * (hist - adv) + src)
            kdiff = mu + mut / sigma

            # the implicit destruction coefficient spikes ~eps/k_min on the
            # Dirichlet wall rows (k floored); those rows are replaced by
            # identity anyway, but a consistent-mass treatment leaks the
            # spike into neighboring FREE rows where the quadrature
            # interpolant overshoots NEGATIVE, making the operator
            # indefinite and breaking CG.  Zero the coefficient on
            # constrained rows (its value there is immaterial).
            react_c = jnp.maximum(react, 0.0) * mask

            def helm(v):
                return ((bd[0] / dt) * h1.mass_apply(tab, rho * v)
                        + h1.mass_apply(tab, react_c * v)
                        + h1.diffusion_apply(tab, v, kdiff))

            diag = ((bd[0] / dt) * h1.mass_lumped_diag(tab, rho)
                    + Ml * react_c
                    + h1.stiffness_diag(tab, kdiff))
            rhs = (rhs - helm(bc_vals * (1.0 - mask))) * mask
            diag = diag * mask + (1.0 - mask)
            out = h1.cg_solve(helm, rhs, x0=q * mask, diag=diag,
                              dirichlet_mask=mask, tol=self.cg_tol,
                              maxiter=self.cg_maxiter)
            return out * mask + bc_vals * (1.0 - mask)

        # ---- k equation: destruction rho*eps treated as reaction rho/T1 ----
        k_new = transport_solve(
            k, k_hist, c["sigmaK"], prod, rho * eps_c / k_c,
            self.dir_mask, self.k_bc,
        )
        k_new = jnp.maximum(k_new, c["tke_min"])

        # ---- eps equation ----
        ce1 = jnp.clip(1.4 * (1.0 + 0.05 / jnp.sqrt(zeta)),
                       1.4 * (1.0 + 0.05 * np.sqrt(1.5)), 1.55)
        # wall value: eps_wall = nu * lap(k) ~ nu * Minv(-K k)
        nu = mu / rho
        lap_k = -h1.diffusion_apply(tab, k_new, None) / Ml
        eps_wall = jnp.maximum(nu * lap_k, c["tdr_min"])
        eps_bc = jnp.where(self.wall_mask < 0.5, eps_wall, self.eps_bc)
        eps_new = transport_solve(
            eps, eps_hist, c["sigmaE"], ce1 * prod / tts,
            rho * c["Ce2"] / tts, self.dir_mask, eps_bc,
        )
        eps_new = jnp.maximum(eps_new, c["tdr_min"])

        # ---- f elliptic relaxation:  (M/L^2 + K) f = M g / L^2 ----
        # g = [2/3 (C1-1) - (C1-6) zeta]/T + C2 P/(rho k)
        gsrc = ((2.0 / 3.0) * (c["C1"] - 1.0) - (c["C1"] - 6.0) * zeta) / tts \
            + c["C2"] * prod / (rho * k_c)
        L2 = jnp.maximum(tls * tls, 1e-300)

        def helm_f(v):
            return h1.mass_apply(tab, v / L2) + h1.diffusion_apply(tab, v, None)

        diag_f = h1.mass_lumped_diag(tab, 1.0 / L2) + h1.stiffness_diag(tab, None)
        mask = self.wall_mask
        rhs_f = h1.mass_apply(tab, gsrc / L2) * mask
        diag_f = diag_f * mask + (1.0 - mask)
        f_new = h1.cg_solve(helm_f, rhs_f, x0=self.f * 0.0, diag=diag_f,
                            dirichlet_mask=mask, tol=self.cg_tol,
                            maxiter=self.cg_maxiter)
        f_new = f_new * mask  # f = 0 at walls

        # ---- v2 equation: production rho k f, destruction 6 rho eps zeta ----
        v2_new = transport_solve(
            v2, v2_hist, c["sigmaZ"], rho * k_new * jnp.maximum(f_new, 0.0),
            6.0 * rho * eps_new / jnp.maximum(k_new, c["tke_min"]),
            self.dir_mask, self.v2_bc,
        )
        v2_new = jnp.clip(v2_new, c["v2_min"], (2.0 / 3.0) * k_new)

        # ---- final eddy viscosity at n+1 ----
        tts, tts_strain, _ = self._scales(k_new, eps_new, v2_new, rho, mu, smag)
        mut_new = c["Cmu"] * rho * jnp.minimum(v2_new, (2.0 / 3.0) * k_new) \
            * jnp.minimum(tts, tts_strain)
        mut_new = jnp.maximum(mut_new, c["mut_min"])

        return (k_new, eps_new, v2_new, f_new, mut_new,
                (k, k_hist[0]), (eps, eps_hist[0]), (v2, v2_hist[0]))
