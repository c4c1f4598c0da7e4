"""Finite-rate reacting low-Mach thermo-chemistry (the ReactingFlow model).

The role of the reference ReactingFlow (reference: src/reactingFlow.cpp:
1997-3400): operator-split temperature and species transport with chemistry
sub-stepping inside each flow step, mixture properties from perfect-gas
species data, open/closed thermodynamic pressure, and the plasma
conductivity / thermal divergence hooks consumed by the flow solver.

Time discretization per flow step dt (BDF on the transport, explicit
sub-stepped chemistry — the reference's evalSubstepNumber uses a
data-dependent count; here the count is a static bound, trace-friendly):

  1. implicit advection-diffusion solve for each species mass fraction Y_s
  2. implicit advection-diffusion solve for T
  3. n_substeps explicit chemistry updates of (Y, T) with production rates
     and heat release
  4. rho = p_th W_mix / (R T); Qt = (1/T) DT/Dt + ... for the divergence
     constraint
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import UNIVERSAL_GAS_CONSTANT as _R
from ...fem import h1
from .base import TemporalCoefficients, ThermoChemBase
from .thermo_chem import TemperatureDirichlet


class ReactingFlow(ThermoChemBase):
    def __init__(self, tab, flow=None, species_names=(), mw=(), molar_cv_over_R=(),
                 formation_energy=(), chemistry=None, p_thermo=101325.0,
                 closed_system=False, mu0=1.68e-5, Pr=0.71, Sc=0.71,
                 n_substeps=4, temp_bcs=(), T_init=300.0, Y_init=None,
                 cg_tol=1e-10, cg_maxiter=500):
        self.tab = tab
        self.flow = flow
        self.species_names = list(species_names)
        self.mw = np.asarray(mw, dtype=np.float64)
        self.nsp = len(self.mw)
        self.molar_cv = np.asarray(molar_cv_over_R) * _R
        self.molar_cp = self.molar_cv + _R
        self.hf = np.asarray(formation_energy, dtype=np.float64)  # J/mol
        self.chemistry = chemistry
        self.p_thermo = p_thermo
        self.closed_system = closed_system
        self.mu0 = mu0
        self.Pr = Pr
        self.Sc = Sc
        self.n_substeps = n_substeps
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter

        nd = tab.ndofs
        self.T = jnp.full(nd, float(T_init))
        if Y_init is None:
            Y0 = np.zeros((nd, self.nsp))
            Y0[:, -1] = 1.0  # background species
        else:
            Y0 = np.broadcast_to(np.asarray(Y_init), (nd, self.nsp)).copy()
        self.Y = jnp.asarray(Y0)
        self.T_hist = [self.T, self.T]
        self.Y_hist = [self.Y, self.Y]
        self.Qt = jnp.zeros(nd)

        if temp_bcs:
            free = np.ones(nd)
            vals = jnp.zeros(nd)
            for bc in temp_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                free[dofs] = 0.0
                vals = vals.at[jnp.asarray(dofs)].set(bc.value)
            self.T_mask = jnp.asarray(free)
            self.T_bc = vals
        else:
            self.T_mask = jnp.ones(nd)
            self.T_bc = jnp.zeros(nd)

        if closed_system:
            self._mass0 = float(h1.integrate(tab, self.density()))

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))

    # -- mixture properties on nodes ---------------------------------------
    def _mixture_mw(self, Y):
        """Mean molar mass W = 1 / sum(Y_s / W_s)."""
        return 1.0 / jnp.einsum("ns,s->n", jnp.maximum(Y, 0.0),
                                jnp.asarray(1.0 / self.mw))

    def density(self):
        W = self._mixture_mw(self.Y)
        return self.p_thermo * W / (_R * self.T)

    def _cp_mass(self, Y):
        """Mixture specific heat [J/kg/K]."""
        return jnp.einsum("ns,s->n", jnp.maximum(Y, 0.0),
                          jnp.asarray(self.molar_cp / self.mw))

    def viscosity(self):
        return self.mu0 * (self.T / 273.0) ** 0.7

    def conductivity(self):
        return self._cp_mass(self.Y) / self.Pr * self.viscosity()

    def thermal_divergence(self):
        return self.Qt

    def number_densities(self):
        """n_s [mol/m^3] from (rho, Y)."""
        rho = self.density()
        return rho[:, None] * jnp.maximum(self.Y, 0.0) / jnp.asarray(self.mw)

    def plasma_conductivity(self, transport=None):
        """Hook for EM coupling (reference: reactingFlow.cpp:3192)."""
        if transport is None:
            return jnp.zeros(self.tab.ndofs)
        n_sp = self.number_densities()
        raise NotImplementedError  # full transport-coupled path: later round

    # ----------------------------------------------------------------------
    def step(self, coeff: TemporalCoefficients, dt: float):
        vel = (
            self.flow.velocity()
            if self.flow is not None
            else jnp.zeros((self.tab.ndofs, self.tab.dim))
        )
        (self.T, self.Y, self.Qt, T_hist, Y_hist) = self._step_jit(
            self.T, self.Y, tuple(self.T_hist), tuple(self.Y_hist),
            vel, jnp.asarray(dt), order=coeff.order,
        )
        self.T_hist = list(T_hist)
        self.Y_hist = list(Y_hist)
        if self.closed_system:
            W = self._mixture_mw(self.Y)
            inv = float(h1.integrate(self.tab, W / self.T))
            self.p_thermo = self._mass0 * _R / inv

    def _helmholtz_solve(self, rho_c, kappa, x0, rhs, bd0, dt, mask, bc_vals):
        tab = self.tab

        def op(v):
            return (bd0 / dt) * h1.mass_apply(tab, rho_c * v) + \
                h1.diffusion_apply(tab, v, kappa)

        diag = (bd0 / dt) * h1.mass_lumped_diag(tab, rho_c) + \
            h1.stiffness_diag(tab, kappa)
        rhs = (rhs - op(bc_vals * (1.0 - mask))) * mask
        diag = diag * mask + (1.0 - mask)
        out = h1.cg_solve(op, rhs, x0=x0 * mask, diag=diag, dirichlet_mask=mask,
                          tol=self.cg_tol, maxiter=self.cg_maxiter)
        return out * mask + bc_vals * (1.0 - mask)

    def _step_impl(self, T, Y, T_hist, Y_hist, vel, dt, order):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        Ml = h1.mass_lumped_diag(tab)

        W = self._mixture_mw(Y)
        rho = self.p_thermo * W / (_R * T)
        cp = self._cp_mass(Y)
        mu = self.mu0 * (T / 273.0) ** 0.7
        kappa = cp / self.Pr * mu
        diff = mu / self.Sc  # rho D

        ones = jnp.ones_like(self.T_mask)

        # 1) species transport: rho (dY/dt + u.grad Y) = div(rho D grad Y)
        Y_new = []
        for s in range(self.nsp):
            hist = -(bd[1] * Y[:, s] + bd[2] * Y_hist[0][:, s]
                     + bd[3] * Y_hist[1][:, s]) / dt
            adv = h1.convection_apply(tab, Y[:, s], vel) / Ml
            rhs = h1.mass_apply(tab, rho * (hist - adv))
            Y_new.append(self._helmholtz_solve(
                rho, diff, Y[:, s], rhs, bd[0], dt, ones, jnp.zeros_like(T)))
        Y_new = jnp.stack(Y_new, axis=-1)
        # renormalize mass fractions
        Y_new = jnp.clip(Y_new, 0.0, 1.0)
        Y_new = Y_new / jnp.sum(Y_new, axis=-1, keepdims=True)

        # 2) temperature transport
        rc = rho * cp
        histT = -(bd[1] * T + bd[2] * T_hist[0] + bd[3] * T_hist[1]) / dt
        advT = h1.convection_apply(tab, T, vel) / Ml
        rhsT = h1.mass_apply(tab, rc * (histT - advT))
        T_new = self._helmholtz_solve(rc, kappa, T, rhsT, bd[0], dt,
                                      self.T_mask, self.T_bc)

        # 3) chemistry sub-steps (static count; reference sub-steps with a
        #    data-dependent count, reactingFlow.cpp:2219)
        if self.chemistry is not None and self.chemistry.num_reactions > 0:
            sub_dt = dt / self.n_substeps
            mw = jnp.asarray(self.mw)

            def substep(_, carry):
                Ts, Ys = carry
                Ws = self._mixture_mw(Ys)
                rhos = self.p_thermo * Ws / (_R * Ts)
                n_sp = rhos[:, None] * jnp.maximum(Ys, 0.0) / mw
                _, creation = self.chemistry.source(n_sp, Ts, Ts)
                dY = creation / rhos[:, None]  # kg/m^3/s -> dY/dt
                # heat release: -sum_s hf_s/W_s * dY_s/dt / cp
                hf_mass = jnp.asarray(self.hf / self.mw)
                cps = self._cp_mass(Ys)
                dT = -jnp.einsum("ns,s->n", dY, hf_mass) / cps
                Ys2 = jnp.clip(Ys + sub_dt * dY, 0.0, 1.0)
                Ys2 = Ys2 / jnp.sum(Ys2, axis=-1, keepdims=True)
                Ts2 = Ts + sub_dt * dT
                return (Ts2, Ys2)

            T_new, Y_new = jax.lax.fori_loop(
                0, self.n_substeps, substep, (T_new, Y_new)
            )
            T_new = T_new * self.T_mask + self.T_bc * (1.0 - self.T_mask)

        # 4) thermal divergence Qt = (1/T) DT/Dt - (1/W) DW/Dt
        dTdt = (bd[0] * T_new + bd[1] * T + bd[2] * T_hist[0]
                + bd[3] * T_hist[1]) / dt
        ugT = h1.convection_apply(tab, T_new, vel) / Ml
        W_new = self._mixture_mw(Y_new)
        dWdt = (W_new - W) / dt
        Qt = (dTdt + ugT) / T_new - dWdt / W_new

        return T_new, Y_new, Qt, (T, T_hist[0]), (Y, Y_hist[0])
