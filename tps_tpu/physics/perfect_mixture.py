"""Multi-species two-temperature perfect-gas mixture EOS.

Vectorized re-implementation of the reference PerfectMixture behavior
(reference: src/equation_of_state.cpp:473-1750):

Species ordering convention (identical to the reference,
SetSpeciesStateIndices src/equation_of_state.hpp:137-146):
  mixture species [0 .. nsp-1] = [ions/neutrals ..., electron, background]
  iElectron = nsp-2, iBackground = nsp-1
  active species = first (nsp-1) (non-ambipolar: includes electron)
                 or first (nsp-2) (ambipolar: electron from quasineutrality)
State layout:
  U  = [rho, rho*u (nvel), rho*E, rho_s = MW_s n_s (active), rho*e_e (2T)]
  Up = [rho, u (nvel), T_h, n_s (active number densities), T_e (2T)]
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..constants import UNIVERSAL_GAS_CONSTANT

_R = UNIVERSAL_GAS_CONSTANT
_TINY = 1.0e-30


@dataclass(frozen=True, eq=False)
class PerfectMixture:
    dim: int
    nvel: int
    # per-species parameters in mixture ordering (tuple of floats)
    mw: tuple  # molar mass [kg/mol]
    charges: tuple  # signed charge numbers
    formation_energy: tuple  # [J/mol]
    molar_cv_over_R: tuple  # molar CV / R (e.g. 1.5 monatomic)
    ambipolar: bool = False
    two_temperature: bool = False
    const_plasma_conductivity: float = 0.0
    # per-species lumped level degeneracy g_s (ini [species/*]/level_degeneracy,
    # reference: GasParams::SPECIES_DEGENERACY, src/M2ulPhyS.cpp:3057);
    # only used by the LTE species initialization. None -> all 1.
    degeneracy: tuple | None = None

    def __post_init__(self):
        ns = self.num_species
        assert ns >= 2, "need at least electron + background"
        assert self.charges[self.i_background] == 0.0, "background must be neutral"
        assert self.formation_energy[self.i_electron] == 0.0
        assert self.formation_energy[self.i_background] == 0.0

    # -- sizes & indices ---------------------------------------------------
    @property
    def num_species(self) -> int:
        return len(self.mw)

    @property
    def i_electron(self) -> int:
        return self.num_species - 2

    @property
    def i_background(self) -> int:
        return self.num_species - 1

    @property
    def num_active_species(self) -> int:
        return self.num_species - (2 if self.ambipolar else 1)

    @property
    def num_equations(self) -> int:
        return self.nvel + 2 + self.num_active_species + (1 if self.two_temperature else 0)

    @property
    def i_th(self) -> int:
        return self.nvel + 1

    @property
    def i_te(self) -> int:
        return self.num_equations - 1

    # -- parameter vectors -------------------------------------------------
    def _arr(self, t):
        return jnp.asarray(np.asarray(t, dtype=np.float64))

    @property
    def molar_cv(self):
        return self._arr(self.molar_cv_over_R) * _R

    @property
    def molar_cp(self):
        return self.molar_cv + _R

    @property
    def gas_constant(self):
        """Background-species specific gas constant (GetGasConstant)."""
        return _R / self.mw[self.i_background]

    @property
    def specific_heat_ratio(self):
        """Background-species heat ratio (GetSpecificHeatRatio)."""
        cv = self.molar_cv_over_R[self.i_background] * _R
        return (cv + _R) / cv

    # -- species number densities -----------------------------------------
    def _active_slice(self, X):
        na = self.num_active_species
        return X[..., self.nvel + 2 : self.nvel + 2 + na]

    def ambipolar_electron_density(self, n_active):
        z = self._arr(self.charges)[: self.num_active_species]
        ne = jnp.einsum("...s,s->...", n_active, z)
        return jnp.maximum(ne, 0.0)

    def number_densities(self, U):
        """n_sp [..., nsp] from conserved state (computeNumberDensities)."""
        rho = U[..., 0]
        na = self.num_active_species
        mw = self._arr(self.mw)
        n_active = self._active_slice(U) / mw[:na]
        if self.ambipolar:
            n_e = self.ambipolar_electron_density(n_active)
        else:
            n_e = n_active[..., self.i_electron]
        rhoB = rho - jnp.einsum("...s,s->...", n_active, mw[:na])
        if self.ambipolar:
            rhoB = rhoB - n_e * mw[self.i_electron]
        n_B = rhoB / mw[self.i_background]
        if self.ambipolar:
            return jnp.concatenate(
                [n_active, n_e[..., None], n_B[..., None]], axis=-1
            )
        return jnp.concatenate([n_active, n_B[..., None]], axis=-1)

    def _heavies_cv(self, n_sp):
        """Volumetric heat capacity of heavy species (J/m^3/K)."""
        cv = self.molar_cv
        ie = self.i_electron
        mask = jnp.ones(self.num_species).at[ie].set(0.0)
        return jnp.einsum("...s,s->...", n_sp, cv * mask)

    def _heavies_cp(self, n_sp):
        cp = self.molar_cp
        mask = jnp.ones(self.num_species).at[self.i_electron].set(0.0)
        return jnp.einsum("...s,s->...", n_sp, cp * mask)

    def heavies_gamma(self, n_sp):
        """Heavy-species mixture heat ratio (computeHeaviesMixtureHeatRatio)."""
        cv = self._heavies_cv(n_sp)
        mask = np.ones(self.num_species)
        mask[self.i_electron] = 0.0
        n_h = jnp.einsum("...s,s->...", n_sp, jnp.asarray(mask))
        return 1.0 + n_h * _R / cv

    # -- temperatures / pressure ------------------------------------------
    def temperatures(self, U, n_sp=None):
        """(T_h, T_e) from conserved state (computeTemperaturesBase)."""
        if n_sp is None:
            n_sp = self.number_densities(U)
        ne = n_sp[..., self.i_electron]
        cv_e = self.molar_cv[self.i_electron]
        C = self._heavies_cv(n_sp)
        if not self.two_temperature:
            C = C + ne * cv_e
        hf = self._arr(self.formation_energy)
        total_e = U[..., self.i_th] - jnp.einsum(
            "...s,s->...", n_sp[..., : self.num_species - 2], hf[: self.num_species - 2]
        )
        ke = 0.5 * jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / U[..., 0]
        Th = total_e - ke
        if self.two_temperature:
            Th = Th - U[..., self.i_te]
        Th = Th / C
        if self.two_temperature:
            Te = U[..., self.i_te] / jnp.maximum(ne, _TINY) / cv_e
        else:
            Te = Th
        return Th, Te

    def pressure_base(self, n_sp, Th, Te):
        mask = np.ones(self.num_species)
        mask[self.i_electron] = 0.0
        n_h = jnp.einsum("...s,s->...", n_sp, jnp.asarray(mask))
        ne = n_sp[..., self.i_electron]
        p = n_h * Th + ne * (Te if self.two_temperature else Th)
        return p * _R

    def pressure(self, U):
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)
        return self.pressure_base(n_sp, Th, Te)

    def electron_pressure(self, U):
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)
        return n_sp[..., self.i_electron] * _R * Te

    def temperature(self, U):
        return self.temperatures(U)[0]

    def _n_sp_from_primitives(self, Up):
        na = self.num_active_species
        mw = self._arr(self.mw)
        n_active = Up[..., self.nvel + 2 : self.nvel + 2 + na]
        if self.ambipolar:
            n_e = self.ambipolar_electron_density(n_active)
        else:
            n_e = n_active[..., self.i_electron]
        rhoB = Up[..., 0] - jnp.einsum("...s,s->...", n_active, mw[:na])
        if self.ambipolar:
            rhoB = rhoB - n_e * mw[self.i_electron]
        n_B = rhoB / mw[self.i_background]
        if self.ambipolar:
            return jnp.concatenate([n_active, n_e[..., None], n_B[..., None]], -1)
        return jnp.concatenate([n_active, n_B[..., None]], -1)

    def pressure_from_primitives(self, Up):
        n_sp = self._n_sp_from_primitives(Up)
        Th = Up[..., self.i_th]
        Te = Up[..., self.i_te] if self.two_temperature else Th
        return self.pressure_base(n_sp, Th, Te)

    # -- conversions -------------------------------------------------------
    def primitives(self, U):
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)
        rho = U[..., 0:1]
        vel = U[..., 1 : 1 + self.nvel] / rho
        na = self.num_active_species
        parts = [rho, vel, Th[..., None], n_sp[..., :na]]
        if self.two_temperature:
            parts.append(Te[..., None])
        return jnp.concatenate(parts, axis=-1)

    def conservatives(self, Up):
        rho = Up[..., 0:1]
        mom = rho * Up[..., 1 : 1 + self.nvel]
        na = self.num_active_species
        mw = self._arr(self.mw)
        n_active = Up[..., self.nvel + 2 : self.nvel + 2 + na]
        rho_s = n_active * mw[:na]
        n_sp = self._n_sp_from_primitives(Up)
        ne = n_sp[..., self.i_electron]
        cv_e = self.molar_cv[self.i_electron]
        Th = Up[..., self.i_th]

        C = self._heavies_cv(n_sp)
        if self.two_temperature:
            Ue = ne * cv_e * Up[..., self.i_te]
        else:
            C = C + ne * cv_e
            Ue = None
        total_e = 0.5 * rho[..., 0] * jnp.sum(
            Up[..., 1 : 1 + self.nvel] ** 2, axis=-1
        ) + C * Th
        if self.two_temperature:
            total_e = total_e + Ue
        hf = self._arr(self.formation_energy)
        total_e = total_e + jnp.einsum(
            "...s,s->...", n_sp[..., : self.num_species - 2], hf[: self.num_species - 2]
        )
        parts = [rho, mom, total_e[..., None], rho_s]
        if self.two_temperature:
            parts.append(Ue[..., None])
        return jnp.concatenate(parts, axis=-1)

    # -- wave speeds -------------------------------------------------------
    def speed_of_sound_from_conserved(self, U):
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)
        p = self.pressure_base(n_sp, Th, Te)
        gamma = self.heavies_gamma(n_sp)
        return jnp.sqrt(gamma * p / U[..., 0])

    def max_char_speed(self, U):
        rho = U[..., 0]
        v2 = jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / (rho * rho)
        return jnp.sqrt(v2) + self.speed_of_sound_from_conserved(U)

    def sound_speed_from_T(self, T):
        return jnp.sqrt(self.specific_heat_ratio * self.gas_constant * T)

    def pressure_derivative(self, dUp_dn, U):
        """Directional dp/dn from primitive gradients along a direction
        (reference: PerfectMixture::ComputePressureDerivative).

        dUp_dn: [..., neq] gradient of [rho, vel, Th, n_active, (Te)];
        p = R (n_heavy Th + n_e Te), so the chain rule needs the implied
        electron/background number-density gradients."""
        nvel, na = self.nvel, self.num_active_species
        mw = self._arr(self.mw)
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)

        gn_active = dUp_dn[..., nvel + 2 : nvel + 2 + na]
        if self.ambipolar:
            z = self._arr(self.charges)[:na]
            ne_grad = jnp.einsum("...s,s->...", gn_active, z)
        else:
            ne_grad = (
                gn_active[..., self.i_electron]
                if na > 0 else jnp.zeros_like(dUp_dn[..., 0])
            )
        nB_grad = dUp_dn[..., 0] - jnp.einsum("...s,s->...", gn_active, mw[:na])
        if self.ambipolar:
            nB_grad = nB_grad - mw[self.i_electron] * ne_grad
        nB_grad = nB_grad / mw[self.i_background]

        # heavy number-density gradient = all species except the electron
        # (ambipolar actives already exclude the electron)
        nh_grad = jnp.sum(gn_active, axis=-1) + nB_grad
        if not self.ambipolar and na > 0:
            nh_grad = nh_grad - ne_grad

        mask = np.ones(self.num_species)
        mask[self.i_electron] = 0.0
        n_h = jnp.einsum("...s,s->...", n_sp, jnp.asarray(mask))
        ne = n_sp[..., self.i_electron]

        dTh = dUp_dn[..., self.i_th]
        if self.two_temperature:
            dTe = dUp_dn[..., self.i_te]
            dp = nh_grad * Th + n_h * dTh + ne_grad * Te + ne * dTe
        else:
            dp = (nh_grad + ne_grad) * Th + (n_h + ne) * dTh
        return _R * dp

    def conserved_from_convective_flux(self, mean_flux, normal):
        """Mixed-out conserved state whose convective normal flux equals
        `mean_flux` (reference:
        PerfectMixture::computeConservedStateFromConvectiveFlux,
        src/equation_of_state.cpp:1744-1824): per-species number-density
        fluxes, electron flux (quasineutral under ambipolar), the quadratic
        for pressure with formation-energy and two-temperature corrections,
        then the primitive inversion."""
        nvel, na, nsp = self.nvel, self.num_active_species, self.num_species
        mw = self._arr(self.mw)
        hf = self._arr(self.formation_energy)
        cp = self.molar_cp
        mdot = mean_flux[0]

        n_flux = mean_flux[nvel + 2 : nvel + 2 + na] / mw[:na]
        form_flux = jnp.sum(n_flux * hf[:na])
        nB_flux = mdot - jnp.sum(mean_flux[nvel + 2 : nvel + 2 + na])
        if self.ambipolar:
            z = self._arr(self.charges)[:na]
            ne_flux = jnp.sum(n_flux * z)
            form_flux = form_flux + ne_flux * hf[self.i_electron]
            nB_flux = nB_flux - ne_flux * mw[self.i_electron]
        else:
            ne_flux = n_flux[self.i_electron]
        nB_flux = nB_flux / mw[self.i_background]
        form_flux = form_flux + nB_flux * hf[self.i_background]

        Te = None
        if self.two_temperature:
            Te = mean_flux[self.i_te] / cp[self.i_electron] / ne_flux

        # heavy molar mixture heat capacity from the fluxes (electron
        # included only in the single-temperature case)
        heavy = [sp for sp in range(nsp - 2)]
        n_mix = jnp.sum(n_flux[jnp.asarray(heavy, dtype=int)]) if heavy else 0.0
        cp_mix = (
            jnp.sum(n_flux[jnp.asarray(heavy, dtype=int)]
                    * cp[jnp.asarray(heavy, dtype=int)])
            if heavy else 0.0
        )
        n_mix = n_mix + nB_flux
        cp_mix = cp_mix + nB_flux * cp[self.i_background]
        if not self.two_temperature:
            n_mix = n_mix + ne_flux
            cp_mix = cp_mix + ne_flux * cp[self.i_electron]
        cp_mix = cp_mix / n_mix

        mom_n = jnp.sum(mean_flux[1 : 1 + self.dim] * normal[: self.dim])
        A = 1.0 - 2.0 * cp_mix / _R
        B = 2.0 * mom_n * (cp_mix / _R - 1.0)
        C = -2.0 * mdot * mean_flux[self.i_th] + jnp.sum(
            mean_flux[1 : 1 + nvel] ** 2
        )
        if self.two_temperature:
            C = C + 2.0 * mdot * ne_flux * (cp[self.i_electron] - cp_mix) * Te
        C = C + 2.0 * mdot * form_flux
        p = (-B - jnp.sqrt(B * B - 4.0 * A * C)) / (2.0 * A)

        Th = (mom_n - p) / mdot * p / _R
        if self.two_temperature:
            Th = Th - ne_flux * Te
        Th = Th / n_mix

        rho = mdot * mdot / (mom_n - p)
        n_full = jnp.zeros(nvel, mean_flux.dtype).at[: self.dim].set(
            normal[: self.dim]
        )
        vel = (mean_flux[1 : 1 + nvel] - p * n_full) / mdot
        n_active = n_flux * mdot / (mom_n - p)
        parts = [rho[None], vel, Th[None], n_active]
        if self.two_temperature:
            parts.append(Te[None])
        return self.conservatives(jnp.concatenate(parts))

    # -- species views -----------------------------------------------------
    def species_enthalpies(self, U):
        """Volumetric species enthalpies n_s (Cp_s T + h_f)  [J/m^3]."""
        n_sp = self.number_densities(U)
        Th, Te = self.temperatures(U, n_sp)
        cp = self.molar_cp
        hf = self._arr(self.formation_energy)
        Tsp = jnp.broadcast_to(Th[..., None], n_sp.shape)
        Tsp = Tsp.at[..., self.i_electron].set(Te)
        return n_sp * (cp * Tsp + hf)

    def species_primitives(self, U):
        """(X, Y, n) mole/mass fractions + number densities
        (computeSpeciesPrimitives)."""
        n_sp = self.number_densities(U)
        rho = U[..., 0]
        mw = self._arr(self.mw)
        Y = n_sp * mw / rho[..., None]
        n_tot = jnp.sum(n_sp, axis=-1, keepdims=True)
        X = n_sp / n_tot
        return X, Y, n_sp

    def mole_fraction_gradient(self, n_sp, grad_up):
        """grad X [..., nsp, dim] from primitive gradients
        (ComputeMoleFractionGradient)."""
        nvel, na, ns = self.nvel, self.num_active_species, self.num_species
        mw = self._arr(self.mw)
        gn_active = grad_up[..., nvel + 2 : nvel + 2 + na, :]  # [.., na, d]
        if self.ambipolar:
            z = self._arr(self.charges)[:na]
            ne_grad = jnp.einsum("...sd,s->...d", gn_active, z)
        else:
            ne_grad = gn_active[..., self.i_electron, :]
        nB_grad = grad_up[..., 0, :] - jnp.einsum("...sd,s->...d", gn_active, mw[:na])
        if self.ambipolar:
            nB_grad = nB_grad - mw[self.i_electron] * ne_grad
        nB_grad = nB_grad / mw[self.i_background]

        totalN = jnp.sum(n_sp, axis=-1)
        totalN_grad = jnp.sum(gn_active, axis=-2) + nB_grad
        if self.ambipolar:
            totalN_grad = totalN_grad + ne_grad

        parts = [gn_active]
        if self.ambipolar:
            parts.append(ne_grad[..., None, :])
        parts.append(nB_grad[..., None, :])
        gn_all = jnp.concatenate(parts, axis=-2)  # [..., nsp, dim]
        tN = totalN[..., None, None]
        return gn_all / tN - (n_sp[..., None] / tN**2) * totalN_grad[..., None, :]

    def mass_fraction_gradient(self, rho, n_sp, grad_up):
        """grad Y [..., nsp, dim] (ComputeMassFractionGradient behavior):
        dY_s = (MW_s/rho) dn_s - (MW_s n_s / rho^2) drho."""
        nvel, na = self.nvel, self.num_active_species
        mw = self._arr(self.mw)
        gn_active = grad_up[..., nvel + 2 : nvel + 2 + na, :]
        if self.ambipolar:
            z = self._arr(self.charges)[:na]
            ne_grad = jnp.einsum("...sd,s->...d", gn_active, z)
        else:
            ne_grad = gn_active[..., self.i_electron, :]
        nB_grad = grad_up[..., 0, :] - jnp.einsum("...sd,s->...d", gn_active, mw[:na])
        if self.ambipolar:
            nB_grad = nB_grad - mw[self.i_electron] * ne_grad
        nB_grad = nB_grad / mw[self.i_background]
        parts = [gn_active]
        if self.ambipolar:
            parts.append(ne_grad[..., None, :])
        parts.append(nB_grad[..., None, :])
        gn_all = jnp.concatenate(parts, axis=-2)
        grho = grad_up[..., 0, :]
        r = rho[..., None, None]
        return (mw[:, None] * gn_all) / r - (
            (mw * n_sp)[..., None] / r**2
        ) * grho[..., None, :]

    # -- BC helpers --------------------------------------------------------
    def stagnant_state_with_temp(self, U, T_wall):
        """Zero-velocity state at wall temperature
        (computeStagnantStateWithTemp)."""
        n_sp = self.number_densities(U)
        ne = n_sp[..., self.i_electron]
        Ch = self._heavies_cv(n_sp)
        Ue = ne * self.molar_cv[self.i_electron] * T_wall
        hf = self._arr(self.formation_energy)
        e_tot = Ch * T_wall + Ue + jnp.einsum(
            "...s,s->...", n_sp[..., : self.num_species - 2], hf[: self.num_species - 2]
        )
        out = U.at[..., 1 : 1 + self.nvel].set(0.0)
        out = out.at[..., self.i_th].set(e_tot)
        if self.two_temperature:
            out = out.at[..., self.i_te].set(Ue)
        return out

    def modify_energy_for_pressure(self, U, p, modify_electron_energy=False):
        """Adjust total energy so pressure equals p (modifyEnergyForPressure)."""
        n_sp = self.number_densities(U)
        ne = n_sp[..., self.i_electron]
        cv_e = self.molar_cv[self.i_electron]

        if self.two_temperature and not modify_electron_energy:
            Te = U[..., self.i_te] / (ne + _TINY) / cv_e
            pe = ne * _R * Te
            n_for_T = jnp.sum(n_sp, axis=-1) - ne
        else:
            pe = jnp.zeros_like(ne)
            n_for_T = jnp.sum(n_sp, axis=-1)
        Th = (p - pe) / (n_for_T * _R)

        C = self._heavies_cv(n_sp)
        rE = C * Th
        if self.two_temperature:
            Ue = ne * cv_e * Th if modify_electron_energy else U[..., self.i_te]
        else:
            Ue = ne * cv_e * Th
        rE = rE + Ue
        rE = rE + 0.5 * jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / U[..., 0]
        hf = self._arr(self.formation_energy)
        rE = rE + jnp.einsum(
            "...s,s->...", n_sp[..., : self.num_species - 2], hf[: self.num_species - 2]
        )
        out = U.at[..., self.i_th].set(rE)
        if self.two_temperature:
            out = out.at[..., self.i_te].set(Ue)
        return out


def saha_ionization_fraction(n_total, T, ionization_energy_J_per_mol,
                             g_ratio=6.0):
    """Saha equilibrium ionization fraction x = n_e / n_nuclei for a single
    positive ion species (the role of PerfectMixture::GetSpeciesFromLTE,
    reference: src/equation_of_state.cpp:1910+, 'weakly ionized perfect
    gas' assumptions).

    n_total in mol/m^3 (nuclei), T in K; g_ratio = 2 g_ion / g_neutral
    (argon: 2 * 6 / 1 -> ion ground multiplicity ~6 vs closed-shell 1).
    """
    import jax.numpy as jnp

    from ..constants import (
        AVOGADRO_NUMBER,
        BOLTZMANN_CONSTANT,
        ELECTRON_MASS,
        PI,
        PLANCK_CONSTANT,
        UNIVERSAL_GAS_CONSTANT,
    )

    lam = PLANCK_CONSTANT / jnp.sqrt(
        2.0 * PI * ELECTRON_MASS * BOLTZMANN_CONSTANT * T
    )
    # S = (g_ratio / lambda^3) exp(-E_ion / R T)  [1/m^3] -> molar
    S = (g_ratio / lam**3) * jnp.exp(
        -ionization_energy_J_per_mol / (UNIVERSAL_GAS_CONSTANT * T)
    ) / AVOGADRO_NUMBER
    # x^2 / (1 - x) = S / n  ->  x = (-s + sqrt(s^2 + 4 s)) / 2, s = S/n
    s = S / jnp.maximum(n_total, 1e-300)
    x = 0.5 * (-s + jnp.sqrt(s * s + 4.0 * s))
    return jnp.clip(x, 0.0, 1.0)


def _lte_level_structure(mixture):
    """Static (numpy) description of the neutral level system: lumped
    excited neutral levels among the actives, the single positive ion,
    and per-species degeneracies (level_degeneracy in the ini)."""
    charges = np.asarray(mixture.charges)
    na = mixture.num_active_species
    g = np.asarray(
        mixture.degeneracy
        if getattr(mixture, "degeneracy", None) is not None
        else np.ones(mixture.num_species)
    )
    ions = [
        sp for sp in range(na)
        if charges[sp] > 0.0 and sp != mixture.i_electron
    ]
    if len(ions) != 1:
        raise NotImplementedError(
            "LTE species initialization supports exactly one positive ion "
            f"(found {len(ions)} among the active species); the reference "
            "makes the same assumption (src/equation_of_state.cpp:1902-1905)"
        )
    levels = [
        sp for sp in range(na)
        if charges[sp] == 0.0 and sp != mixture.i_electron
    ]
    return levels, ions[0], g


def species_from_lte(mixture, rho, T):
    """Primitive active-species number densities [..., n_active] at LTE for
    a weakly-ionized atomic mixture at (rho, T): Saha equation for the
    ionization balance with the neutral partition function over the lumped
    excited levels, then Boltzmann level populations (reference:
    PerfectMixture::GetSpeciesFromLTE(T, p, n_sp),
    src/equation_of_state.cpp:1894-1966; level degeneracies from the ini
    [species/*]/level_degeneracy, src/M2ulPhyS.cpp:3057).

    The reference works from the table pressure (n_0 = p/(R T)); here the
    nuclei density comes from the mass density directly
    (n_nuc = rho / mw_background, exact when every heavy species carries
    one background nucleus), so mass is preserved instead of pressure.
    """
    import jax.numpy as jnp

    from ..constants import (
        AVOGADRO_NUMBER,
        BOLTZMANN_CONSTANT,
        ELECTRON_MASS,
        PI,
        PLANCK_CONSTANT,
        UNIVERSAL_GAS_CONSTANT,
    )

    mw = np.asarray(mixture.mw)
    hf = np.asarray(mixture.formation_energy)
    levels, i_ion, g = _lte_level_structure(mixture)
    ib = mixture.i_background

    n_nuc = rho / mw[ib]

    # neutral partition function: ground state (+1) plus the lumped levels
    RT = UNIVERSAL_GAS_CONSTANT * T
    Q_n = 1.0
    for sp in levels:
        Q_n = Q_n + g[sp] * jnp.exp(-hf[sp] / RT)
    Q_i = g[i_ion]
    Q_e = 2.0
    mr32 = (mw[i_ion] / mw[ib]) ** 1.5

    # Saha coefficient S = mr32 (Q_e Q_i / Q_n) / (lambda_e^3 N_A)
    # exp(-E_ion/RT), lambda_e = h / sqrt(2 pi m_e k T).  Evaluated in log
    # space: 2 pi m_e k T ~ 1e-52 underflows f32 (lambda -> inf, S -> 0),
    # which silently de-ionized the f32 production path.
    log_lam3 = 3.0 * (
        float(np.log(PLANCK_CONSTANT))
        - 0.5 * (
            float(np.log(2.0 * PI * ELECTRON_MASS * BOLTZMANN_CONSTANT))
            + jnp.log(T)
        )
    )
    S = jnp.exp(
        float(np.log(mr32 * Q_e / AVOGADRO_NUMBER))
        + jnp.log(Q_i / Q_n)
        - log_lam3
        - hf[i_ion] / RT
    )  # [mol/m^3]
    # Saha: n_e^2 = S * n_neutral with n_neutral = n_nuc - n_e
    n_e = 0.5 * (-S + jnp.sqrt(S * S + 4.0 * S * n_nuc))
    n_e = jnp.clip(n_e, 0.0, n_nuc)
    n_neutral = n_nuc - n_e

    out = [None] * mixture.num_active_species
    for sp in levels:
        out[sp] = n_neutral * g[sp] * jnp.exp(-hf[sp] / RT) / Q_n
    out[i_ion] = n_e
    if not mixture.ambipolar:
        out[mixture.i_electron] = n_e
    return jnp.stack(out, axis=-1)


def state_from_lte(mixture, U, newton_iters=30):
    """Full conserved state at LTE from the bulk fields of `U` (density,
    momentum, total energy; species/electron-energy slots ignored).

    The role of io/restartFromLTE + M2ulPhyS::initilizeSpeciesFromLTE
    (reference: src/M2ulPhyS.cpp:2388-2470): the reference interpolates T
    from the LTE e_rev/thermo tables, then preserves (T, p) and adjusts
    rho slightly.  Here the temperature is instead solved self-consistently
    from the mixture's own thermodynamics — Newton on
    e_int(T; Saha species at (rho, T)) = rhoE - ke — which preserves mass,
    momentum, AND energy exactly and needs no external table files.
    Two-temperature mixtures get Te = T (reference :2455)."""
    import jax
    import jax.numpy as jnp

    from ..constants import UNIVERSAL_GAS_CONSTANT as _Ru

    mw = np.asarray(mixture.mw)
    nvel, na = mixture.nvel, mixture.num_active_species
    rho = U[..., 0]
    mom = U[..., 1 : 1 + nvel]
    ke = 0.5 * jnp.sum(mom * mom, axis=-1) / rho
    e_target = U[..., mixture.i_th] - ke

    def _e_int(T):
        n_act = species_from_lte(mixture, rho, T)
        parts = [rho[..., None], jnp.zeros_like(mom), T[..., None], n_act]
        if mixture.two_temperature:
            parts.append(T[..., None])
        Up0 = jnp.concatenate(parts, axis=-1)
        return mixture.conservatives(Up0)[..., mixture.i_th]

    # initial guess: all-neutral background gas
    cv_bg = mixture.molar_cv_over_R[mixture.i_background] * _Ru
    T = jnp.maximum(e_target / (rho / mw[mixture.i_background] * cv_bg), 200.0)
    for _ in range(newton_iters):
        resid, dresid = jax.jvp(
            lambda TT: _e_int(TT) - e_target, (T,), (jnp.ones_like(T),)
        )
        # dresid = d(rhoE)/dT >= rho cv > 0 analytically; the guard only
        # protects against float roundoff producing 0/0 -> NaN
        step = resid / jnp.where(dresid > 0.0, dresid, 1.0)
        T = jnp.maximum(jnp.where(dresid > 0.0, T - step, T), 200.0)

    n_act = species_from_lte(mixture, rho, T)
    vel = mom / rho[..., None]
    parts = [rho[..., None], vel, T[..., None], n_act]
    if mixture.two_temperature:
        parts.append(T[..., None])
    return mixture.conservatives(jnp.concatenate(parts, axis=-1))
