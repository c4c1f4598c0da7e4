"""Low-Mach thermo-chemistry models.

CaloricallyPerfectThermoChem mirrors the reference's implicit
advection-diffusion temperature equation with Sutherland viscosity and
open/closed thermodynamic pressure (reference: src/calorically_perfect.cpp):
  rho cp (dT/dt + u . grad T) = div(kappa grad T) + dp_th/dt + sources
solved with BDF/EXT in time and matrix-free CG in space; density follows the
thermodynamic (not hydrodynamic) pressure: rho = p_th / (R T).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import TemporalCoefficients, ThermoChemBase


@dataclass
class TemperatureDirichlet:
    attrs: tuple
    value: float


class CaloricallyPerfectThermoChem(ThermoChemBase):
    def __init__(self, tab, flow=None, gas_constant=287.058, gamma=1.4,
                 p_thermo=101325.0, closed_system=False,
                 mu0=1.68e-5, sutherland_T0=273.0, sutherland_S0=110.4,
                 Pr=0.71, constant_mu=None, temp_bcs=(), qt_bcs=(),
                 heat_source=None,
                 sponge=None, weight_q=None, sw_stab=False, reh_factor=0.5,
                 reh_offset=1.0, T_init=300.0, cg_tol=1e-10,
                 cg_maxiter=1000):
        self.tab = tab
        self.flow = flow
        self.sponge = sponge
        # optional quadrature-point volume weight (radius for axisymmetric
        # runs; reference loMach/axisymmetric thermo path)
        self.weight_q = weight_q
        # SUPG streamwise stabilization (reference:
        # loMach/calperfect/streamwise-stabilization, utils.cpp
        # streamwiseTensor/csupgFactor; defaults Reh_factor 0.5, offset 1)
        self.sw_stab = sw_stab
        self.reh_factor = reh_factor
        self.reh_offset = reh_offset
        self.R = gas_constant
        self.gamma = gamma
        self.cp = gamma * gas_constant / (gamma - 1.0)
        self.p_thermo = p_thermo
        self.closed_system = closed_system
        self.mu0 = mu0
        self.sT0 = sutherland_T0
        self.sS0 = sutherland_S0
        self.Pr = Pr
        self.constant_mu = constant_mu
        self.heat_source = heat_source
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter

        nd = tab.ndofs
        self.T = jnp.full(nd, float(T_init))
        self.T_hist = [self.T, self.T]
        self.Qt = jnp.zeros(nd)

        if temp_bcs:
            free = np.ones(nd)
            vals = jnp.zeros(nd)
            for bc in temp_bcs:
                dofs = h1.boundary_dofs(tab, bc.attrs)
                free[dofs] = 0.0
                vals = vals.at[jnp.asarray(dofs)].set(bc.value)
            self.T_mask = jnp.asarray(free)
            self.T_bc_values = vals
            self.T = self.T * self.T_mask + vals * (1.0 - self.T_mask)
            self.T_hist = [self.T, self.T]
        else:
            self.T_mask = jnp.ones(nd)
            self.T_bc_values = jnp.zeros(nd)

        # Qt = 0 Dirichlet at isothermal walls (reference: AddQtDirichletBC,
        # src/calorically_perfect.cpp:422-424) — kills the spurious
        # divergence spike in the wall-adjacent layer
        qt_free = np.ones(nd)
        for attrs in qt_bcs:
            qt_free[h1.boundary_dofs(tab, attrs)] = 0.0
        self.Qt_mask = jnp.asarray(qt_free)

        # closed system: conserve initial mass (reference updateThermoP)
        if closed_system:
            rho0 = self.p_thermo / (self.R * self.T)
            self._mass0 = float(h1.integrate(tab, rho0))

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))

    # -- interfaces --------------------------------------------------------
    def set_temperature(self, T0):
        self.T = jnp.asarray(T0)
        self.T = self.T * self.T_mask + self.T_bc_values * (1.0 - self.T_mask)
        self.T_hist = [self.T, self.T]

    # uniform BC-array name across thermo models (LteThermoChem and
    # ReactingFlow call it T_bc); the solver's ext-data wiring uses T_bc
    @property
    def T_bc(self):
        return self.T_bc_values

    @T_bc.setter
    def T_bc(self, v):
        self.T_bc_values = v

    def density(self):
        return self.p_thermo / (self.R * self.T)

    def viscosity(self, T=None):
        # T defaults to the stored field; jitted callers must pass their
        # traced T (a closure read would bake the initial field)
        T = self.T if T is None else T
        if self.constant_mu is not None:
            return jnp.full(self.tab.ndofs, self.constant_mu)
        return self.mu0 * (T / self.sT0) ** 1.5 * (
            (self.sT0 + self.sS0) / (T + self.sS0)
        )

    def conductivity(self):
        return self.cp / self.Pr * self.viscosity()

    def thermal_divergence(self):
        return self.Qt

    def step(self, coeff: TemporalCoefficients, dt: float):
        vel = (
            self.flow.velocity()
            if self.flow is not None
            else jnp.zeros((self.tab.ndofs, self.tab.dim))
        )
        rho = self.density()
        kappa = self.conductivity()
        if self.sponge is not None:
            # sponge scales the thermal diffusivity
            # (reference: src/calorically_perfect.cpp:463)
            kappa = kappa * self.sponge.multiplier()
        self.T, self.Qt, hist = self._step_jit(
            self.T, tuple(self.T_hist), vel, rho, kappa,
            self.T_bc_values, self.T_mask, self.Qt_mask,
            jnp.asarray(self.p_thermo), jnp.asarray(dt),
            order=coeff.order,
        )
        self.T_hist = list(hist)
        if self.closed_system:
            # adjust p_thermo to conserve mass: M = int p/(R T)
            # (device scalar: no per-step host sync; consumed outside jit)
            self.p_thermo = self._mass0 * self.R / h1.integrate(
                self.tab, 1.0 / self.T)

    # -- chunked-scan adapters (LoMachSolver.solve_chunk): the model state
    # as an explicit pytree + a traced step over it, so a scan can carry
    # the whole thermo/flow system inside one jit ----------------------------
    def chunk_pack(self):
        return (self.T, tuple(self.T_hist), self.Qt,
                jnp.asarray(self.p_thermo))

    def chunk_unpack(self, s):
        T, hist, Qt, p = s
        self.T, self.T_hist, self.Qt = T, list(hist), Qt
        if self.closed_system:
            self.p_thermo = p

    def chunk_step(self, s, vel, dt, order):
        T, hist, Qt, p = s
        rho = p / (self.R * T)
        kappa = self.cp / self.Pr * self.viscosity(T)
        if self.sponge is not None:
            kappa = kappa * self.sponge.multiplier()
        T2, Qt2, hist2 = self._step_impl(
            T, hist, vel, rho, kappa, self.T_bc_values, self.T_mask,
            self.Qt_mask, p, dt, order,
        )
        if self.closed_system:
            p = self._mass0 * self.R / h1.integrate(self.tab, 1.0 / T2)
        return (T2, tuple(hist2), Qt2, p)

    def chunk_props(self, s):
        T, _hist, _qt, p = s
        return p / (self.R * T), self.viscosity(T)

    def chunk_qt(self, s):
        return s[2]

    # -- internals ---------------------------------------------------------
    def _step_impl(self, T, T_hist, vel, rho, kappa, tbc_vals, tmask,
                   qt_mask, p_thermo, dt, order):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)

        rho_cp = rho * self.cp
        hist = -(bd[1] * T + bd[2] * T_hist[0] + bd[3] * T_hist[1]) / dt

        wq = self.weight_q  # None (planar) or radius at quad points (axisym)
        # wrapped coefficients (per-shard stacked under element sharding)
        wq_c = h1.as_coef(tab, wq)
        if wq is None:
            kq_c = kappa  # nodal
            kq_cp_c = kappa / self.cp
        else:
            kq_g = h1.to_quad(tab, kappa) * wq
            kq_c = h1.as_coef(tab, kq_g)
            kq_cp_c = h1.as_coef(tab, kq_g / self.cp)

        # explicit advection at time n: nodal u.grad(T), mass-weighted by rho cp
        adv = h1.convection_apply(tab, T, vel) / h1.mass_lumped_diag(tab)
        rhs = h1.mass_apply(tab, rho_cp * (hist - adv), coef=wq_c)
        if self.heat_source is not None:
            rhs = rhs + h1.mass_apply(tab, self.heat_source(tab.xyz),
                                      coef=wq_c)

        mask = tmask
        # argument, not closure: interpolated-inlet temperatures update
        # per step and a closed-over array would be baked at first trace
        Tbc = tbc_vals

        if self.sw_stab:
            # SUPG: anisotropic streamwise diffusion
            # K = rho Csupg(Reh) h |u| (u u^T / |u|^2),
            # Reh = rho h |u| / mu, Csupg = f (tanh(Reh) + offset)
            uq = jnp.stack(
                [h1.to_quad(tab, vel[:, d]) for d in range(vel.shape[-1])],
                axis=-1,
            )
            umag = jnp.sqrt(jnp.sum(uq * uq, axis=-1))
            rho_q = h1.to_quad(tab, rho)
            mu_q = h1.to_quad(tab, self.viscosity(T))
            h_q = h1.grid_scale_q(tab, getattr(tab, "order", 1))
            Reh = rho_q * h_q * umag / jnp.maximum(mu_q, 1e-300)
            csupg = self.reh_factor * (jnp.tanh(Reh) + self.reh_offset)
            # cp factor makes the streamwise addition act as a conductivity
            # in the rho*cp-scaled temperature equation
            coef = rho_q * self.cp * csupg * h_q * umag
            if wq is not None:
                coef = coef * wq
            udir = uq / jnp.maximum(umag, 1e-8)[..., None]
            K_supg = coef[..., None, None] * (
                udir[..., :, None] * udir[..., None, :]
            )
        else:
            K_supg = None

        def helm(v):
            out = (bd[0] / dt) * h1.mass_apply(tab, rho_cp * v, coef=wq_c) + \
                h1.diffusion_apply(tab, v, kq_c)
            if K_supg is not None:
                out = out + h1.diffusion_apply_tensor(tab, v, K_supg)
            return out

        diag = (bd[0] / dt) * jnp.abs(
            h1.mass_lumped_diag(tab, rho_cp if wq is None else wq_c)
        ) + h1.stiffness_diag(tab, kq_c)
        rhs = (rhs - helm(Tbc * (1.0 - mask))) * mask
        diag_c = diag * mask + (1.0 - mask)
        T_new = h1.cg_solve(helm, rhs, x0=T * mask, diag=diag_c,
                            dirichlet_mask=mask, tol=self.cg_tol,
                            maxiter=self.cg_maxiter)
        T_new = T_new * mask + Tbc * (1.0 - mask)

        # thermal divergence in the Thomas-Olson operator form
        # Qt = (R/(p cp)) [div(kappa grad T) + q] = (1/(rho cp T)) [...]
        # evaluated from the DIFFUSION operator, not the material
        # derivative (reference computeQtTO, src/calorically_perfect.cpp:
        # 1050-1077: Qt = -(Rgas/p) Mq^-1 [LQ{T_next}], LQ built from
        # kappa/cp). The D T/Dt form feeds the constraint velocity back
        # into Qt through u.grad(T) and is unconditionally unstable for
        # strong wall cooling.
        lq = h1.diffusion_apply(tab, T_new, kq_cp_c)
        if K_supg is not None:
            lq = lq + h1.diffusion_apply_tensor(tab, T_new, K_supg / self.cp)
        qdiv = h1.l2_project(tab, -lq, coef=wq_c)
        if self.heat_source is not None:
            qdiv = qdiv + self.heat_source(tab.xyz) / self.cp
        Qt = (self.R / p_thermo) * qdiv * qt_mask

        return T_new, Qt, (T, T_hist[0])
