"""LTE table-based low-Mach thermo-chemistry.

The role of the reference LteThermoChem (reference: src/lte_thermo_chem.cpp):
an implicit energy equation with all properties from equilibrium tables
rho(T), cp(T), mu(T), kappa(T), sigma(T) (1-D in T at the operating
pressure, or 2-D in (T, rho)), plus the Joule-heating source and optional
net-emission radiation sink used by the coupled plasma-torch cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...fem import h1
from ...physics.lte import _eval2
from .base import TemporalCoefficients, ThermoChemBase


class LteThermoChem(ThermoChemBase):
    def __init__(self, tab, flow=None, rho_table=None, cp_table=None,
                 mu_table=None, kappa_table=None, sigma_table=None,
                 radiation=None, temp_bcs=(), qt_bcs=(), weight_q=None,
                 T_init=300.0, cg_tol=1e-10, cg_maxiter=500):
        self.tab = tab
        self.flow = flow
        # optional quad-point volume weight (radius for axisymmetric runs)
        self.weight_q = weight_q
        self.rho_table = rho_table
        self.cp_table = cp_table
        self.mu_table = mu_table
        self.kappa_table = kappa_table
        self.sigma_table = sigma_table
        self.radiation = radiation
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter

        import numpy as np

        nd = tab.ndofs
        self.T = jnp.full(nd, float(T_init))
        self.T_hist = [self.T, self.T]
        self.Qt = jnp.zeros(nd)
        self.joule_heating = jnp.zeros(nd)

        if temp_bcs:
            free = np.ones(nd)
            vals = jnp.zeros(nd)
            for bc in temp_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                free[dofs] = 0.0
                vals = vals.at[jnp.asarray(dofs)].set(bc.value)
            self.T_mask = jnp.asarray(free)
            self.T_bc = vals
            self.T = self.T * self.T_mask + vals * (1.0 - self.T_mask)
            self.T_hist = [self.T, self.T]
        else:
            self.T_mask = jnp.ones(nd)
            self.T_bc = jnp.zeros(nd)

        # Qt = 0 Dirichlet at isothermal walls (reference:
        # AddQtDirichletBC, src/lte_thermo_chem.cpp:546)
        qt_free = np.ones(nd)
        for attrs in qt_bcs:
            qt_free[h1.boundary_dofs(tab, attrs)] = 0.0
        self.Qt_mask = jnp.asarray(qt_free)

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))
        # jitted property lookups: eager per-op dispatch of the table
        # interpolations costs ~0.3 ms/op through the hosted-TPU tunnel
        # (tables are immutable closures; T rides as the argument)
        self._tab_jit = jax.jit(
            lambda tbl, T: _eval2(tbl, T, T), static_argnums=0
        )
        # lagged dense-direct factor for the T-Helmholtz (same lever as
        # reacting_flow / Tomboulides: fem/h1.py dense-direct section)
        self._direct = None
        self._direct_age = None
        self._refresh_jit = jax.jit(self._precond_build)

    _PRECOND_REFRESH = 16

    def _precond_build(self, T, dt, bd0):
        tab = self.tab
        rho_cp = (_eval2(self.rho_table, T, T)
                  * _eval2(self.cp_table, T, T))
        kappa = _eval2(self.kappa_table, T, T)
        if self.weight_q is None:
            m_coef = rho_cp
            k_coef = kappa
        else:
            wq = self.weight_q
            m_coef = h1.to_quad(tab, rho_cp) * wq
            k_coef = h1.to_quad(tab, kappa) * wq
        He_e = (bd0 / dt) * h1.element_mass(tab, m_coef) \
            + h1.element_stiffness(tab, k_coef)
        He = h1.dense_constrain(h1.assemble_dense(tab, He_e),
                                mask=self.T_mask)
        # (weighted) consistent-mass factor for the Qt l2_project: the
        # Jacobi-CG mass solve burns ~11 f32 iterations per step on the
        # radius-weighted mass (coupled-torch profile, round 5); with
        # the dense factor it converges in 1-2.  Time-constant, but
        # refactoring with the batch keeps the plumbing uniform.
        Mw_e = h1.element_mass(
            tab, None if self.weight_q is None else self.weight_q)
        Mw = h1.assemble_dense(tab, Mw_e)
        L = h1.dense_cholesky(jnp.stack([He, Mw]))
        return L[0], L[1]

    def precond_refresh(self, dt, order, force=False):
        if not h1.dense_capable(self.tab):
            return
        age = self._direct_age
        if not force and age is not None and age < self._PRECOND_REFRESH:
            return
        bd0 = TemporalCoefficients.bdf(order).bd0
        self._direct = self._refresh_jit(
            self.T, jnp.asarray(dt), jnp.asarray(bd0))
        self._direct_age = 0

    def chunk_precond(self):
        return self._direct

    def set_temperature(self, T0):
        self.T = jnp.asarray(T0)
        self.T = self.T * self.T_mask + self.T_bc * (1.0 - self.T_mask)
        self.T_hist = [self.T, self.T]

    # -- property fields ---------------------------------------------------
    def density(self):
        return self._tab_jit(self.rho_table, self.T)

    def viscosity(self):
        return self._tab_jit(self.mu_table, self.T)

    def conductivity(self):
        return self._tab_jit(self.kappa_table, self.T)

    def plasma_conductivity(self):
        """sigma(T) for the EM coupling (reference lte_thermo_chem Joule path)."""
        if self.sigma_table is None:
            return jnp.zeros_like(self.T)
        return self._tab_jit(self.sigma_table, self.T)

    def set_joule_heating(self, qj):
        self.joule_heating = jnp.asarray(qj)

    def thermal_divergence(self):
        return self.Qt

    def step(self, coeff: TemporalCoefficients, dt: float):
        vel = (
            self.flow.velocity()
            if self.flow is not None
            else jnp.zeros((self.tab.ndofs, self.tab.dim))
        )
        self.precond_refresh(dt, coeff.order)
        if self._direct_age is not None:
            self._direct_age += 1
        self.T, self.Qt, hist = self._step_jit(
            self.T, tuple(self.T_hist), vel, self.joule_heating,
            self.T_bc, self.T_mask, self.Qt_mask, jnp.asarray(dt),
            order=coeff.order, precond=self._direct,
        )
        self.T_hist = list(hist)

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_pack(self):
        return (self.T, tuple(self.T_hist), self.Qt)

    def chunk_unpack(self, s):
        T, hist, Qt = s
        self.T, self.T_hist, self.Qt = T, list(hist), Qt

    def chunk_step(self, s, vel, dt, order, precond=None):
        T, hist, _Qt = s
        T2, Qt2, hist2 = self._step_impl(
            T, hist, vel, self.joule_heating, self.T_bc, self.T_mask,
            self.Qt_mask, dt, order, precond=precond,
        )
        return (T2, tuple(hist2), Qt2)

    def chunk_props(self, s):
        T = s[0]
        return _eval2(self.rho_table, T, T), _eval2(self.mu_table, T, T)

    def chunk_qt(self, s):
        return s[2]

    def _step_impl(self, T, T_hist, vel, qj, tbc_vals, tmask, qt_mask, dt,
                   order, precond=None):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)

        rho = _eval2(self.rho_table, T, T)
        cp = _eval2(self.cp_table, T, T)
        kappa = _eval2(self.kappa_table, T, T)
        rho_cp = rho * cp

        hist = -(bd[1] * T + bd[2] * T_hist[0] + bd[3] * T_hist[1]) / dt
        adv = h1.convection_apply(tab, T, vel) / h1.mass_lumped_diag(tab)
        src = qj
        if self.radiation is not None:
            src = src + self.radiation.energy_sink(T)
        wq = self.weight_q
        # wrapped coefficients (per-shard stacked under element sharding)
        wq_c = h1.as_coef(tab, wq)
        kq = kappa if wq is None else h1.as_coef(
            tab, h1.to_quad(tab, kappa) * wq
        )
        rhs = h1.mass_apply(tab, rho_cp * (hist - adv) + src, coef=wq_c)

        mask = tmask
        # argument, not closure (see thermo_chem._step_impl)
        Tbc = tbc_vals

        def helm(v):
            return (bd[0] / dt) * h1.mass_apply(tab, rho_cp * v, coef=wq_c) \
                + h1.diffusion_apply(tab, v, kq)

        diag = (bd[0] / dt) * jnp.abs(
            h1.mass_lumped_diag(tab, rho_cp if wq is None else wq_c)
        ) + h1.stiffness_diag(tab, kq)
        rhs = (rhs - helm(Tbc * (1.0 - mask))) * mask
        diag = diag * mask + (1.0 - mask)
        M_T = (h1.direct_precond(precond[0])
               if precond is not None else None)
        T_new = h1.cg_solve(helm, rhs, x0=T * mask, diag=diag,
                            dirichlet_mask=mask, M=M_T, tol=self.cg_tol,
                            maxiter=self.cg_maxiter)
        T_new = T_new * mask + Tbc * (1.0 - mask)

        # Thermal divergence in the operator form (reference computeQt,
        # src/lte_thermo_chem.cpp:1430-1466: Qt = -(R/(Cp p)) Mq^-1
        # [LQ{T_next} - jh]): Qt = -(drho/dT / rho) DT/Dt with
        # DT/Dt = [div(kappa grad T) + q_J - q_rad] / (rho cp) evaluated
        # from the DIFFUSION+SOURCE operators, never the material
        # derivative — the D/Dt form feeds the constraint velocity back
        # into Qt and is unconditionally unstable for strong wall cooling.
        # Using the table drho/dT keeps LTE generality (reference's scalar
        # Rgas/Cp is the ideal-gas special case).
        dT = 1e-3 * jnp.maximum(T_new, 1.0)
        drho_dT = (_eval2(self.rho_table, T_new + dT, T_new)
                   - _eval2(self.rho_table, T_new - dT, T_new)) / (2 * dT)
        rho_new = _eval2(self.rho_table, T_new, T_new)
        cp_new = _eval2(self.cp_table, T_new, T_new)
        kq_new = _eval2(self.kappa_table, T_new, T_new)
        kq_new = kq_new if wq is None else h1.as_coef(
            tab, h1.to_quad(tab, kq_new) * wq
        )
        lap = h1.l2_project(tab, -h1.diffusion_apply(tab, T_new, kq_new),
                            coef=wq_c,
                            M=(h1.direct_precond(precond[1])
                               if precond is not None else None))
        src_new = qj
        if self.radiation is not None:
            src_new = src_new + self.radiation.energy_sink(T_new)
        DTDt = (lap + src_new) / (rho_new * cp_new)
        Qt = -(drho_dT / rho_new) * DTDt * qt_mask

        return T_new, Qt, (T, T_hist[0])
