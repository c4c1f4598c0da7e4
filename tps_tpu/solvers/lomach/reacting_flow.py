"""Finite-rate reacting low-Mach thermo-chemistry (the ReactingFlow model).

The reference ReactingFlow (reference: src/reactingFlow.cpp, 4144 LoC)
couples operator-split temperature/species transport with chemistry
sub-stepping inside each flow step, mixture properties from the shared
plasma physics stack, and the plasma-conductivity / Joule-heating hooks
consumed by the EM coupling.  This implementation supports two tiers:

* **full plasma tier** — a `PerfectMixture` + molecular transport model
  (the same objects the compressible path uses, built from
  [plasma_models]/[species]/[reactions]):
  - per-species diffusivities from the transport model's flux properties
    (reference: updateDiffusivity, src/reactingFlow.cpp:3100+)
  - plasma conductivity via the transport model's electrical conductivity
    (reference: evaluatePlasmaConductivityGF, src/reactingFlow.cpp:3192)
  - Joule heating + net-emission radiation sink in the temperature
    equation (reference: temperatureStep linear forms, :1759-1786)
  - heat of formation consistent with the mixture's formation energies
    (reference: heatOfFormation, :2700+)
* **simple tier** — constant Lewis/Schmidt closures from explicit species
  arrays (no transport model), kept for lightweight combustion cases.

Time discretization per flow step dt (reference: step() :1997-2120):

  PART I   implicit BDF advection-diffusion solves for each ACTIVE
           species mass fraction and for T (chemistry excluded when
           operator-split); ambipolar electron from quasi-neutrality;
           last species = 1 - sum (speciesLastStep); cross-diffusion,
           Joule heating and radiation in the T equation.
  PART II  nSub chemistry substeps from (T_n, Y_n): each adds 1/nSub of
           the transport increment (substepState star state,
           :2156-2180) plus dt/nSub of the reaction source
           (speciesSubstep/temperatureSubstep :2373-2656).  The substep
           count is a static bound (trace-friendly) instead of the
           reference's data-dependent evalSubstepNumber.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import UNIVERSAL_GAS_CONSTANT as _R
from ...fem import h1
from .base import TemporalCoefficients, ThermoChemBase


class ReactingFlow(ThermoChemBase):
    def __init__(self, tab, flow=None, species_names=(), mw=(), molar_cv_over_R=(),
                 formation_energy=(), chemistry=None, p_thermo=101325.0,
                 closed_system=False, mu0=1.68e-5, Pr=0.71, Sc=0.71,
                 n_substeps=4, temp_bcs=(), qt_bcs=(), spec_bcs=(),
                 T_init=300.0, Y_init=None,
                 cg_tol=1e-10, cg_maxiter=500,
                 mixture=None, transport=None, radiation=None,
                 operator_split=True, const_plasma_conductivity=0.0,
                 chemistry_base=None, ramp_start=-1.0, ramp_time=-1.0):
        self.tab = tab
        self.flow = flow
        self.mixture = mixture
        self.transport = transport
        self.radiation = radiation
        self.operator_split = operator_split
        self.const_plasma_conductivity = const_plasma_conductivity
        if mixture is not None:
            self.species_names = list(species_names)
            self.mw = np.asarray(mixture.mw, dtype=np.float64)
            self.molar_cv = np.asarray(mixture.molar_cv, dtype=np.float64)
            self.hf = np.asarray(mixture.formation_energy, dtype=np.float64)
            self.n_active = mixture.num_active_species
            self.i_electron = mixture.i_electron
            self.ambipolar = bool(getattr(mixture, "ambipolar", False))
        else:
            self.species_names = list(species_names)
            self.mw = np.asarray(mw, dtype=np.float64)
            self.molar_cv = np.asarray(molar_cv_over_R) * _R
            self.hf = np.asarray(formation_energy, dtype=np.float64)
            self.n_active = len(self.mw) - 1  # all but the background
            self.i_electron = -1
            self.ambipolar = False
        self.nsp = len(self.mw)
        self.molar_cp = self.molar_cv + _R
        self.chemistry = chemistry
        # chemistry-model ramping after a restart (reference:
        # loMach/reactingFlow/ramp-chem, src/reactingFlow.cpp:652-682,
        # 2697-2710): inside (ramp_start, ramp_start + ramp_time) the
        # reaction source blends linearly from the [reactions_base]
        # chemistry to the active one; outside the window the active
        # chemistry applies (ramp_start is normally the restart time)
        self.chemistry_base = chemistry_base
        self.ramp_start = float(ramp_start)
        self.ramp_time = float(ramp_time)
        self.time = 0.0
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
        else:
            self.T_mask = jnp.ones(nd)
            self.T_bc = jnp.zeros(nd)

        # Qt = 0 Dirichlet at isothermal walls (reference:
        # AddQtDirichletBC, src/reactingFlow.cpp:1391)
        qt_free = np.ones(nd)
        for attrs in qt_bcs:
            qt_free[h1.boundary_dofs(tab, attrs)] = 0.0
        self.Qt_mask = jnp.asarray(qt_free)

        # species Dirichlet BCs (reference: AddSpecDirichletBC at inlets
        # src/reactingFlow.cpp:1279,1317 and walls :3302/:1393): each entry
        # is (attrs, Y_values[nsp] or None for zero active species, i.e. a
        # pure-background inflow/wall)
        spec_free = np.ones(nd)
        ybc = np.zeros((nd, self.nsp))
        ybc[:, -1] = 1.0
        for attrs, vals in spec_bcs:
            dofs = h1.boundary_dofs(tab, attrs)
            spec_free[dofs] = 0.0
            if vals is None:
                # pure background (last-wins at corner dofs shared between
                # patches, so a wall next to an inlet stays zero-species)
                v = np.zeros(self.nsp)
                v[-1] = 1.0
            else:
                v = np.asarray(vals, dtype=np.float64)
                v = np.clip(v, 0.0, None)
                v = v / max(v.sum(), 1e-300)
            ybc[dofs] = v
        self.Y_mask = jnp.asarray(spec_free)
        self.Y_bc = jnp.asarray(ybc)
        if spec_bcs:
            # imprint the BC composition on the IC at constrained dofs
            Ym = self.Y_mask[:, None]
            self.Y = self.Y * Ym + self.Y_bc * (1.0 - Ym)
            self.Y_hist = [self.Y, self.Y]

        if closed_system:
            self._mass0 = float(h1.integrate(tab, self.density()))

        self._step_jit = jax.jit(self._step_impl, static_argnames=("order",))
        # jitted property evaluations: viscosity/conductivity run the full
        # collision-integral transport chain — evaluated EAGERLY they cost
        # hundreds of per-op dispatches (~0.3 ms each on the hosted-TPU
        # tunnel).  p_thermo rides as an ARGUMENT (mutable on closed
        # systems; a closure would bake the first-trace value)
        self._props_jit = jax.jit(
            lambda T, Y, p: self._transport_props(T, Y, p=p)
        )
        self._density_jit = jax.jit(
            lambda T, Y, p: p * self._mixture_mw(Y) / (_R * T)
        )

        # lagged dense-direct factors for the T + species Helmholtz solves
        # (fem/h1.py dense-direct section; refreshed every chunk)
        self._direct = None
        self._direct_age = None
        self._refresh_jit = jax.jit(self._precond_build)

    _PRECOND_REFRESH = 16

    @property
    def _n_solved(self):
        return self.n_active if self.mixture is not None else self.nsp - 1

    def _precond_build(self, T, Y, p, dt, bd0):
        tab = self.tab
        rho = p * self._mixture_mw(Y) / (_R * T)
        cp = self._cp_mass(Y)
        diff, _mu, kappa = self._transport_props(T, Y, p=p)
        ops = [(bd0 / dt) * h1.element_mass(tab, rho * cp)
               + h1.element_stiffness(tab, kappa)]
        for s in range(self._n_solved):
            ops.append((bd0 / dt) * h1.element_mass(tab, rho)
                       + h1.element_stiffness(tab, diff[:, s]))
        K = h1.assemble_dense(tab, jnp.stack(ops))
        masks = jnp.stack(
            [self.T_mask] + [self.Y_mask] * self._n_solved)
        K = h1.dense_constrain(K, mask=masks)
        L = h1.dense_cholesky(K)
        return L[0], L[1:]

    def precond_refresh(self, dt, order, force=False):
        if not h1.dense_capable(self.tab):
            return
        age = self._direct_age
        if not force and age is not None and age < self._PRECOND_REFRESH:
            return
        bd0 = TemporalCoefficients.bdf(order).bd0
        self._direct = self._refresh_jit(
            self.T, self.Y, jnp.asarray(self.p_thermo),
            jnp.asarray(dt), jnp.asarray(bd0))
        self._direct_age = 0

    def chunk_precond(self):
        return self._direct

    def set_temperature(self, T0):
        self.T = jnp.asarray(T0)
        self.T = self.T * self.T_mask + self.T_bc * (1.0 - self.T_mask)
        self.T_hist = [self.T, self.T]

    # -- mixture properties on nodes ---------------------------------------
    def _mixture_mw(self, Y):
        """Mean molar mass W = 1 / sum(Y_s / W_s)."""
        return 1.0 / jnp.einsum("ns,s->n", jnp.maximum(Y, 0.0),
                                jnp.asarray(1.0 / self.mw))

    def density(self):
        jf = getattr(self, "_density_jit", None)
        if jf is not None:
            return jf(self.T, self.Y, jnp.asarray(self.p_thermo))
        W = self._mixture_mw(self.Y)
        return self.p_thermo * W / (_R * self.T)

    def _cp_mass(self, Y):
        """Mixture specific heat [J/kg/K]."""
        return jnp.einsum("ns,s->n", jnp.maximum(Y, 0.0),
                          jnp.asarray(self.molar_cp / self.mw))

    def _conserved_state(self, T, Y, vel=None, p=None):
        """Per-node conserved state in the mixture's layout, for the shared
        transport/EOS machinery (reference: evaluatePlasmaConductivityGF
        builds exactly this primitive->conserved state,
        src/reactingFlow.cpp:3192-3227)."""
        mix = self.mixture
        p = self.p_thermo if p is None else p
        W = self._mixture_mw(Y)
        rho = p * W / (_R * T)
        nd = T.shape[0]
        nvel = mix.nvel
        if vel is None:
            v = jnp.zeros((nd, nvel))
        else:
            v = jnp.concatenate(
                [vel, jnp.zeros((nd, nvel - vel.shape[-1]))], axis=-1
            ) if vel.shape[-1] < nvel else vel[..., :nvel]
        n_active = rho[:, None] * jnp.maximum(Y[:, : self.n_active], 0.0) \
            / jnp.asarray(self.mw[: self.n_active])
        parts = [rho[:, None], v, T[:, None], n_active]
        if mix.two_temperature:
            parts.append(T[:, None])  # single-T low-Mach: Te = Th
        Up = jnp.concatenate(parts, axis=-1)
        return mix.conservatives(Up), Up

    def _transport_props(self, T, Y, p=None):
        """Per-species rho*D [nd, nsp], viscosity, conductivity from the
        molecular transport model (full tier) or Pr/Sc closures."""
        if self.transport is None or self.mixture is None:
            cp = self._cp_mass(Y)
            mu = self.mu0 * (T / 273.0) ** 0.7
            kappa = cp / self.Pr * mu
            diff = jnp.broadcast_to((mu / self.Sc)[:, None],
                                    Y.shape)  # rho D, all species equal
            return diff, mu, kappa
        mix = self.mixture
        p = self.p_thermo if p is None else p
        U, Up = self._conserved_state(T, Y, p=p)
        zeros_grad = jnp.zeros(U.shape[:-1] + (mix.num_equations, mix.dim),
                               U.dtype)
        props = self.transport.flux_properties(mix, U, Up, zeros_grad)
        W = self._mixture_mw(Y)
        rho = p * W / (_R * T)
        # diffusivity is per-species D_s [m^2/s] -> rho D_s
        diff = rho[:, None] * props["diffusivity"]
        kappa = props["kappa"] + props.get("kappa_e", 0.0)
        return diff, props["visc"], kappa

    def viscosity(self):
        if self.transport is not None and self.mixture is not None:
            return self._props_jit(self.T, self.Y,
                                   jnp.asarray(self.p_thermo))[1]
        return self.mu0 * (self.T / 273.0) ** 0.7

    def conductivity(self):
        if self.transport is not None and self.mixture is not None:
            return self._props_jit(self.T, self.Y,
                                   jnp.asarray(self.p_thermo))[2]
        return self._cp_mass(self.Y) / self.Pr * self.viscosity()

    def thermal_divergence(self):
        return self.Qt

    def number_densities(self):
        """n_s [mol/m^3] from (rho, Y)."""
        rho = self.density()
        return rho[:, None] * jnp.maximum(self.Y, 0.0) / jnp.asarray(self.mw)

    def plasma_conductivity(self, transport=None):
        """Electrical conductivity at nodes for the EM coupling
        (reference: evaluatePlasmaConductivityGF, src/reactingFlow.cpp:3192)."""
        if self.const_plasma_conductivity > 0.0:
            return jnp.full(self.tab.ndofs, self.const_plasma_conductivity)
        tr = transport if transport is not None else self.transport
        if tr is None or self.mixture is None:
            return jnp.zeros(self.tab.ndofs)

        if getattr(self, "_sigma_jit", None) is None:
            import jax

            def _sigma(T, Y, p, _tr=tr):
                U, Up = self._conserved_state(T, Y, p=p)
                return _tr.electric_conductivity(U, Up)

            self._sigma_jit = (tr, jax.jit(_sigma))
        tr0, jf = self._sigma_jit
        if tr0 is tr:
            return jf(self.T, self.Y, jnp.asarray(self.p_thermo))
        U, Up = self._conserved_state(self.T, self.Y)
        return tr.electric_conductivity(U, Up)

    def set_joule_heating(self, qj):
        self.joule_heating = jnp.asarray(qj)

    # ----------------------------------------------------------------------
    def step(self, coeff: TemporalCoefficients, dt: float):
        vel = (
            self.flow.velocity()
            if self.flow is not None
            else jnp.zeros((self.tab.ndofs, self.tab.dim))
        )
        self.precond_refresh(dt, coeff.order)
        if self._direct_age is not None:
            self._direct_age += 1
        (self.T, self.Y, self.Qt, T_hist, Y_hist) = self._step_jit(
            self.T, self.Y, tuple(self.T_hist), tuple(self.Y_hist),
            vel, self.joule_heating, jnp.asarray(self.p_thermo),
            self.T_bc, self.T_mask, self.Qt_mask, self.Y_bc, self.Y_mask,
            jnp.asarray(dt), jnp.asarray(self.time), order=coeff.order,
            precond=self._direct,
        )
        self.time += float(dt)
        self.T_hist = list(T_hist)
        self.Y_hist = list(Y_hist)
        if self.closed_system:
            # device-scalar update (no per-step host sync; flows back into
            # the next step as an argument)
            W = self._mixture_mw(self.Y)
            self.p_thermo = self._mass0 * _R / h1.integrate(
                self.tab, W / self.T)

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_pack(self):
        return (self.T, self.Y, tuple(self.T_hist), tuple(self.Y_hist),
                self.Qt, jnp.asarray(self.p_thermo),
                jnp.asarray(self.time))

    def chunk_unpack(self, s):
        T, Y, th, yh, Qt, p, t = s
        self.T, self.Y, self.Qt = T, Y, Qt
        self.T_hist, self.Y_hist = list(th), list(yh)
        self.time = float(t)
        if self.closed_system:
            self.p_thermo = p

    def chunk_step(self, s, vel, dt, order, precond=None):
        T, Y, th, yh, _Qt, p, t = s
        T2, Y2, Qt2, th2, yh2 = self._step_impl(
            T, Y, th, yh, vel, self.joule_heating, p,
            self.T_bc, self.T_mask, self.Qt_mask, self.Y_bc, self.Y_mask,
            dt, t, order, precond=precond,
        )
        if self.closed_system:
            W = self._mixture_mw(Y2)
            p = self._mass0 * _R / h1.integrate(self.tab, W / T2)
        return (T2, Y2, tuple(th2), tuple(yh2), Qt2, p, t + dt)

    def chunk_props(self, s):
        T, Y, _th, _yh, _qt, p, _t = s
        rho = p * self._mixture_mw(Y) / (_R * T)
        _diff, mu, _kappa = self._transport_props(T, Y, p=p)
        return rho, mu

    def chunk_qt(self, s):
        return s[4]

    def _helmholtz_solve(self, rho_c, kappa, x0, rhs, bd0, dt, mask, bc_vals,
                         L=None):
        tab = self.tab

        def op(v):
            return (bd0 / dt) * h1.mass_apply(tab, rho_c * v) + \
                h1.diffusion_apply(tab, v, kappa)

        diag = (bd0 / dt) * h1.mass_lumped_diag(tab, rho_c) + \
            h1.stiffness_diag(tab, kappa)
        rhs = (rhs - op(bc_vals * (1.0 - mask))) * mask
        diag = diag * mask + (1.0 - mask)
        M = None if L is None else h1.direct_precond(L)
        out = h1.cg_solve(op, rhs, x0=x0 * mask, diag=diag, dirichlet_mask=mask,
                          M=M, tol=self.cg_tol, maxiter=self.cg_maxiter)
        return out * mask + bc_vals * (1.0 - mask)

    def _close_species(self, Y):
        """Ambipolar electron + background closure (reference: step()
        quasi-neutrality block + speciesLastStep)."""
        Y = jnp.clip(Y, 0.0, 1.0)
        if self.ambipolar and self.i_electron >= 0:
            # Y_e = m_e sum_active (q_s / m_s) Y_s
            z = np.asarray(self.mixture.charges)[: self.n_active]
            fac = jnp.asarray(z / self.mw[: self.n_active])
            Ye = self.mw[self.i_electron] * jnp.einsum(
                "ns,s->n", Y[:, : self.n_active], fac
            )
            Y = Y.at[:, self.i_electron].set(jnp.clip(Ye, 0.0, 1.0))
        # background species takes up the remainder
        others = jnp.sum(Y[:, :-1], axis=-1)
        Y = Y.at[:, -1].set(jnp.clip(1.0 - others, 0.0, 1.0))
        return Y / jnp.sum(Y, axis=-1, keepdims=True)

    def _reaction_source(self, T, Y, p=None, t=None):
        """(dY/dt [1/s], heat release dT/dt [K/s]) at nodes."""
        p = self.p_thermo if p is None else p
        W = self._mixture_mw(Y)
        rho = p * W / (_R * T)
        mw = jnp.asarray(self.mw)
        n_sp = rho[:, None] * jnp.maximum(Y, 0.0) / mw
        _, creation = self.chemistry.source(n_sp, T, T)  # kg/m^3/s
        if self.chemistry_base is not None and t is not None:
            # progress rates are linear in the forward coefficients, so
            # blending creation rates == the reference's kfwd blend
            _, cb = self.chemistry_base.source(n_sp, T, T)
            w = jnp.clip((t - self.ramp_start) / self.ramp_time, 0.0, 1.0)
            inside = (t > self.ramp_start) \
                & (t < self.ramp_start + self.ramp_time)
            creation = jnp.where(inside, cb + w * (creation - cb), creation)
        dY = creation / rho[:, None]
        # heat of formation: -sum_s hf_s w_s (reference: heatOfFormation)
        hf_mass = jnp.asarray(self.hf / self.mw)  # J/kg
        cp = self._cp_mass(Y)
        dT = -jnp.einsum("ns,s->n", creation, hf_mass) / (rho * cp)
        return dY, dT

    def _step_impl(self, T, Y, T_hist, Y_hist, vel, joule, p_thermo,
                   tbc_vals, tmask, qt_mask, ybc_vals, ymask, dt, t_now,
                   order, precond=None):
        tab = self.tab
        coeff = TemporalCoefficients.bdf(order)
        bd = (coeff.bd0, coeff.bd1, coeff.bd2, coeff.bd3)
        Ml = h1.mass_lumped_diag(tab)

        W = self._mixture_mw(Y)
        # p_thermo is an ARGUMENT, not a closure: a closed-over python float
        # is baked at first trace and closed-system pressure updates would
        # silently never reach the jitted step
        rho = p_thermo * W / (_R * T)
        cp = self._cp_mass(Y)
        diff, mu, kappa = self._transport_props(T, Y, p=p_thermo)

        ones = jnp.ones_like(tmask)

        # ---- PART I: implicit advection-diffusion transport ----
        # active species only; electron (ambipolar) and the background are
        # algebraic closures (reference: step() :2030-2060, speciesLastStep)
        n_solved = self.n_active if self.mixture is not None else self.nsp - 1
        Y_new = jnp.array(Y)
        for s in range(n_solved):
            hist = -(bd[1] * Y[:, s] + bd[2] * Y_hist[0][:, s]
                     + bd[3] * Y_hist[1][:, s]) / dt
            adv = h1.convection_apply(tab, Y[:, s], vel) / Ml
            rhs = h1.mass_apply(tab, rho * (hist - adv))
            if not self.operator_split and self.chemistry is not None \
                    and self.chemistry.num_reactions > 0:
                dY_all, _ = self._reaction_source(T, Y, p=p_thermo, t=t_now)
                rhs = rhs + h1.mass_apply(tab, rho * dY_all[:, s])
            Y_new = Y_new.at[:, s].set(self._helmholtz_solve(
                rho, diff[:, s], Y[:, s], rhs, bd[0], dt, ymask,
                ybc_vals[:, s],
                L=None if precond is None else precond[1][s]))
        Y_new = self._close_species(Y_new)

        # temperature: rho cp DT/Dt = div(k grad T) + crossDiff + jh - rad
        rc = rho * cp
        histT = -(bd[1] * T + bd[2] * T_hist[0] + bd[3] * T_hist[1]) / dt
        advT = h1.convection_apply(tab, T, vel) / Ml
        rhsT = h1.mass_apply(tab, rc * (histT - advT))

        # cross-diffusion: sum_s cp_s (rho D_s grad Y_s) . grad T
        # (reference: crossDiffusion, src/reactingFlow.cpp:2700+)
        gT = h1.grad_at_dofs(tab, T)
        cp_s = jnp.asarray(self.molar_cp / self.mw)
        cross = jnp.zeros_like(T)
        for s in range(self.nsp):
            gY = h1.grad_at_dofs(tab, Y_new[:, s])
            cross = cross + cp_s[s] * diff[:, s] * jnp.einsum(
                "nd,nd->n", gY, gT
            )
        src_T = cross + joule
        if self.radiation is not None:
            src_T = src_T + self.radiation.energy_sink(T)  # negative sink
        if not self.operator_split and self.chemistry is not None \
                and self.chemistry.num_reactions > 0:
            _, dT_chem = self._reaction_source(T, Y, p=p_thermo, t=t_now)
            src_T = src_T + rc * dT_chem
        rhsT = rhsT + h1.mass_apply(tab, src_T)
        T_new = self._helmholtz_solve(
            rc, kappa, T, rhsT, bd[0], dt, tmask, tbc_vals,
            L=None if precond is None else precond[0])

        # ---- PART II: operator-split chemistry substeps ----
        # star increments distribute the transport delta over the substeps
        # (reference: substepState :2156, species/temperatureSubstep)
        if self.operator_split and self.chemistry is not None \
                and self.chemistry.num_reactions > 0:
            nsub = self.n_substeps
            sub_dt = dt / nsub
            dY_star = (Y_new - Y) / nsub
            dT_star = (T_new - T) / nsub

            def substep(_, carry):
                Ts, Ys = carry
                dY, dT = self._reaction_source(Ts, Ys, p=p_thermo, t=t_now)
                Ys2 = self._close_species(Ys + dY_star + sub_dt * dY)
                Ts2 = Ts + dT_star + sub_dt * dT
                return (Ts2, Ys2)

            T_new, Y_new = jax.lax.fori_loop(0, nsub, substep, (T, Y))
            T_new = T_new * tmask + tbc_vals * (1.0 - tmask)
            # reimpose the species Dirichlet values after the chemistry
            # substeps (the reference's essential dofs are never touched
            # by the substep updates)
            Y_new = Y_new * ymask[:, None] + ybc_vals * (1.0 - ymask[:, None])
            Y_new = self._close_species(Y_new)

        # ---- thermal divergence, operator form (reference computeQtTO,
        # src/reactingFlow.cpp:3378-3445: Qt = -(Rmix/(Cpmix p)) Mq^-1
        # [LQ{T_next} - jh - Ms hw - crossDiff]) ----
        # Evaluated from the diffusion + source operators, never the
        # material derivative: the DT/Dt form feeds the constraint
        # velocity back into Qt through u.grad(T) and is unconditionally
        # unstable under strong wall cooling. The reference's QtTO also
        # drops the D(W)/Dt molecular-weight term.
        W_new = self._mixture_mw(Y_new)
        cp_new = self._cp_mass(Y_new)
        rho_new = p_thermo * W_new / (_R * T_new)
        lap = h1.l2_project(tab, -h1.diffusion_apply(tab, T_new, kappa))
        src_q = cross + joule
        if self.radiation is not None:
            src_q = src_q + self.radiation.energy_sink(T_new)
        if self.chemistry is not None and self.chemistry.num_reactions > 0:
            _, dT_chem = self._reaction_source(T_new, Y_new, p=p_thermo, t=t_now)
            src_q = src_q + rho_new * cp_new * dT_chem
        Qt = (lap + src_q) / (rho_new * cp_new * T_new) * qt_mask

        return T_new, Y_new, Qt, (T, T_hist[0]), (Y, Y_hist[0])
