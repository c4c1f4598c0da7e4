"""Argon ternary collision-integral transport (ArgonMinimalTransport).

Vectorized re-implementation of the reference GasMinimalTransport behavior
(reference: src/gas_transport.cpp:39-520) for the Ar / Ar+ / e- system:
Chapman-Enskog first-order species viscosities and conductivities averaged
by mole fraction, optional third-order electron thermal conductivity
(Devoto L-matrix form, reference :403-487), Curtiss-Hirschfelder averaged
diffusivities from binary diffusion coefficients, ambipolar field and
mixture drift, and mass-conservation-corrected diffusion velocities
(reference: src/transport_properties.cpp:59-200).

Mixture species ordering expected: [Ar+, e-, Ar] (ion, electron, background).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import (
    AVOGADRO_NUMBER,
    BOLTZMANN_CONSTANT,
    ELECTRON_CHARGE,
    PI,
    VACUUM_PERMITTIVITY,
)
from . import collision_integrals as ci

_KB = BOLTZMANN_CONSTANT
_XEPS = 1.0e-30
_DEBYE_FACTOR = _KB * VACUUM_PERMITTIVITY / ELECTRON_CHARGE / ELECTRON_CHARGE
_QE_OVER_KB = ELECTRON_CHARGE / _KB

VISCOSITY_FACTOR = 5.0 / 16.0 * np.sqrt(PI * _KB)
K_OVER_ETA_FACTOR = 15.0 / 4.0 * _KB
DIFFUSIVITY_FACTOR = 3.0 / 16.0 * np.sqrt(2.0 * PI * _KB) / AVOGADRO_NUMBER
MF_FREQ_FACTOR = 4.0 / 3.0 * AVOGADRO_NUMBER * np.sqrt(8.0 * _KB / PI)


@dataclass(frozen=True, eq=False)
class ArgonMinimalTransport:
    """Transport for the [Ar+, e-, Ar] mixture."""

    mixture: object
    third_order_electron_thermal_conductivity: bool = True
    # artificial multipliers (reference setArtificialMultipliers)
    visc_mult: float = 1.0
    bulk_visc_mult: float = 1.0
    kappa_mult: float = 1.0
    kappa_e_mult: float = 1.0
    diff_mult: float = 1.0
    mobil_mult: float = 1.0

    @property
    def i_ion(self):
        return 0

    @property
    def i_electron(self):
        return self.mixture.i_electron  # = 1 for the ternary mixture

    @property
    def i_neutral(self):
        return self.mixture.i_background  # = 2

    def _masses(self):
        """Per-molecule masses (reference divides MW by Avogadro)."""
        return np.asarray(self.mixture.mw) / AVOGADRO_NUMBER

    # ------------------------------------------------------------------
    def _collision_inputs(self, n_sp, Th, Te):
        ne = n_sp[..., self.i_electron]
        ni = n_sp[..., self.i_ion]
        n_over_t = (ne + _XEPS) / Te + (ni + _XEPS) / Th
        debye_len = jnp.sqrt(_DEBYE_FACTOR / AVOGADRO_NUMBER / n_over_t)
        debye_circle = PI * debye_len**2
        ndim_te = debye_len * 4.0 * PI * _DEBYE_FACTOR * Te
        ndim_th = debye_len * 4.0 * PI * _DEBYE_FACTOR * Th
        return debye_len, debye_circle, ndim_te, ndim_th

    def _third_order_ke(self, X_sp, debye_circle, Te, ndim_te):
        """Devoto third-order electron thermal conductivity
        (reference: gas_transport.cpp:403-487)."""
        m = self._masses()
        Q2 = [debye_circle * f(ndim_te) for f in (ci.rep22, ci.rep23, ci.rep24)]
        Q1i = [debye_circle * f(ndim_te)
               for f in (ci.att11, ci.att12, ci.att13, ci.att14, ci.att15)]
        Q1n = [f(Te) for f in (ci.eAr11, ci.eAr12, ci.eAr13, ci.eAr14, ci.eAr15)]

        def L11(Q):
            return 6.25 * Q[0] - 15.0 * Q[1] + 12.0 * Q[2]

        def L12(Q):
            return 10.9375 * Q[0] - 39.375 * Q[1] + 57.0 * Q[2] - 30.0 * Q[3]

        def L22(Q):
            return (19.140625 * Q[0] - 91.875 * Q[1] + 199.5 * Q[2]
                    - 210.0 * Q[3] + 90.0 * Q[4])

        Xe = X_sp[..., self.i_electron]
        Xi = X_sp[..., self.i_ion]
        Xn = X_sp[..., self.i_neutral]
        sq2 = np.sqrt(2.0)
        l11 = sq2 * Xe * Q2[0] + Xi * L11(Q1i) + Xn * L11(Q1n)
        l12 = (sq2 * Xe * (1.75 * Q2[0] - 2.0 * Q2[1]) + Xi * L12(Q1i)
               + Xn * L12(Q1n))
        l22 = (sq2 * Xe * (4.8125 * Q2[0] - 7.0 * Q2[1] + 5.0 * Q2[2])
               + Xi * L22(Q1i) + Xn * L22(Q1n))
        return (VISCOSITY_FACTOR * K_OVER_ETA_FACTOR
                * jnp.sqrt(2.0 * Te / m[self.i_electron]) * Xe
                / (l11 - l12 * l12 / l22))

    # ------------------------------------------------------------------
    def flux_properties(self, mixture, U, Up, grad_up, efield=None, **kw):
        """Viscosity, conductivities, and species diffusion velocities."""
        mix = self.mixture
        m = self._masses()
        ii, ie, ib = self.i_ion, self.i_electron, self.i_neutral

        X_sp, Y_sp, n_sp = mix.species_primitives(U)
        n_tot = jnp.sum(n_sp, axis=-1)
        Th = Up[..., mix.i_th]
        Te = Up[..., mix.i_te] if mix.two_temperature else Th

        dl, dc, ndim_te, ndim_th = self._collision_inputs(n_sp, Th, Te)

        # species viscosities (electron viscosity neglected)
        visc_i = VISCOSITY_FACTOR * jnp.sqrt(m[ii] * Th) / (ci.rep22(ndim_th) * dc)
        visc_n = VISCOSITY_FACTOR * jnp.sqrt(m[ib] * Th) / ci.ArAr22(Th)
        sp_visc = jnp.stack([visc_i, jnp.zeros_like(visc_i), visc_n], axis=-1)
        sp_kappa = sp_visc * K_OVER_ETA_FACTOR / m

        visc = jnp.einsum("...s,...s->...", X_sp, sp_visc)
        kappa = jnp.einsum("...s,...s->...", X_sp, sp_kappa)

        if self.third_order_electron_thermal_conductivity:
            kappa_e = self._third_order_ke(X_sp, dc, Te, ndim_te)
        else:
            kappa_e = (VISCOSITY_FACTOR * K_OVER_ETA_FACTOR
                       * jnp.sqrt(Te / m[ie]) * X_sp[..., ie]
                       / (ci.rep22(ndim_te) * dc))

        # binary diffusion coefficients (symmetric, diagonal unused)
        def muw(a, b):
            return m[a] * m[b] / (m[a] + m[b])

        d_en = DIFFUSIVITY_FACTOR * jnp.sqrt(Te / muw(ie, ib)) / n_tot / ci.eAr11(Te)
        d_ni = DIFFUSIVITY_FACTOR * jnp.sqrt(Th / muw(ib, ii)) / n_tot / ci.ArAr1P11(Th)
        d_ei = (DIFFUSIVITY_FACTOR * jnp.sqrt(Te / muw(ii, ie)) / n_tot
                / (ci.att11(ndim_te) * dc))

        # Curtiss-Hirschfelder: D_s = (1 - Y_s) / sum_{j != s} (X_j+eps)/D_sj
        Xe_ = X_sp[..., ie] + _XEPS
        Xi_ = X_sp[..., ii] + _XEPS
        Xn_ = X_sp[..., ib] + _XEPS
        D_ion = (1.0 - Y_sp[..., ii]) / (Xe_ / d_ei + Xn_ / d_ni)
        D_ele = (1.0 - Y_sp[..., ie]) / (Xi_ / d_ei + Xn_ / d_en)
        D_neu = (1.0 - Y_sp[..., ib]) / (Xi_ / d_ni + Xe_ / d_en)
        diff = jnp.stack([D_ion, D_ele, D_neu], axis=-1) * self.diff_mult

        charges = jnp.asarray(np.asarray(mix.charges))
        Tsp = jnp.stack([Th, Te, Th], axis=-1)
        mobility = _QE_OVER_KB * charges / Tsp * diff * self.mobil_mult

        # concentration-driven diffusion velocities
        gradX = mix.mole_fraction_gradient(n_sp, grad_up)  # [..., nsp, dim]
        dv = -diff[..., None] * gradX / (X_sp[..., None] + _XEPS)

        if mix.ambipolar:
            dv = _add_ambipolar_efield(mobility, n_sp, charges, dv)
        if efield is not None:
            dv = dv + jnp.where(charges[..., None] != 0.0,
                                mobility[..., None] * efield[..., None, :], 0.0)
        dv = _correct_mass_diffusion_flux(Y_sp, dv)

        return {
            "visc": visc * self.visc_mult,
            "bulk_visc": jnp.zeros_like(visc),
            "kappa": kappa * self.kappa_mult,
            "kappa_e": kappa_e * self.kappa_e_mult,
            "diff_vel": dv,
            "diffusivity": diff,
            "mobility": mobility,
            "n_sp": n_sp,
        }

    # ------------------------------------------------------------------
    def source_properties(self, U, Up, grad_up, efield=None):
        """Transport for the source terms: electric conductivity, e-heavy
        momentum-transfer collision frequencies, diffusion velocities
        (reference: GasMinimalTransport::ComputeSourceMolecularTransport,
        src/gas_transport.cpp:592-790)."""
        mix = self.mixture
        m = self._masses()
        ii, ie, ib = self.i_ion, self.i_electron, self.i_neutral

        X_sp, Y_sp, n_sp = mix.species_primitives(U)
        n_tot = jnp.sum(n_sp, axis=-1)
        Th = Up[..., mix.i_th]
        Te = Up[..., mix.i_te] if mix.two_temperature else Th

        dl, dc, ndim_te, ndim_th = self._collision_inputs(n_sp, Th, Te)

        Qea = ci.eAr11(Te)
        Qie = ci.att11(ndim_te) * dc

        # momentum-transfer collision frequencies of electrons with heavies
        vfac = MF_FREQ_FACTOR * jnp.sqrt(Te / m[ie])
        mf = jnp.zeros_like(n_sp)
        mf = mf.at[..., ii].set(vfac * n_sp[..., ii] * Qie)
        mf = mf.at[..., ib].set(vfac * n_sp[..., ib] * Qea)

        # binary diffusion + Curtiss-Hirschfelder (same as flux path)
        def muw(a, b):
            return m[a] * m[b] / (m[a] + m[b])

        d_en = DIFFUSIVITY_FACTOR * jnp.sqrt(Te / muw(ie, ib)) / n_tot / Qea
        d_ni = DIFFUSIVITY_FACTOR * jnp.sqrt(Th / muw(ib, ii)) / n_tot / ci.ArAr1P11(Th)
        d_ei = DIFFUSIVITY_FACTOR * jnp.sqrt(Te / muw(ii, ie)) / n_tot / Qie
        Xe_ = X_sp[..., ie] + _XEPS
        Xi_ = X_sp[..., ii] + _XEPS
        Xn_ = X_sp[..., ib] + _XEPS
        D_ion = (1.0 - Y_sp[..., ii]) / (Xe_ / d_ei + Xn_ / d_ni)
        D_ele = (1.0 - Y_sp[..., ie]) / (Xi_ / d_ei + Xn_ / d_en)
        D_neu = (1.0 - Y_sp[..., ib]) / (Xi_ / d_ni + Xe_ / d_en)
        diff = jnp.stack([D_ion, D_ele, D_neu], axis=-1) * self.diff_mult

        charges = jnp.asarray(np.asarray(mix.charges))
        Tsp = jnp.stack([Th, Te, Th], axis=-1)
        mobility = _QE_OVER_KB * charges / Tsp * diff * self.mobil_mult

        from ..constants import MOLAR_ELECTRON_CHARGE

        sigma = MOLAR_ELECTRON_CHARGE * jnp.einsum(
            "...s,...s,s->...", mobility, n_sp, charges
        )

        gradX = mix.mole_fraction_gradient(n_sp, grad_up)
        dv = -diff[..., None] * gradX / (X_sp[..., None] + _XEPS)
        if mix.ambipolar:
            dv = _add_ambipolar_efield(mobility, n_sp, charges, dv)
        if efield is not None:
            dv = dv + jnp.where(charges[..., None] != 0.0,
                                mobility[..., None] * efield[..., None, :], 0.0)
        dv = _correct_mass_diffusion_flux(Y_sp, dv)

        return {
            "sigma": sigma,
            "mf_freq": mf,
            "diff_vel": dv,
            "n_sp": n_sp,
            "mobility": mobility,
            "diffusivity": diff,
        }

    def electric_conductivity(self, U, Up):
        """Mixture electric conductivity sigma = sum_s mu_s n_s z_s * F
        (reference computeMixtureElectricConductivity; used for Joule
        coupling)."""
        mix = self.mixture
        props = self.flux_properties(mix, U, Up,
                                     jnp.zeros(U.shape[:-1] + (mix.num_equations, mix.dim), U.dtype))
        charges = jnp.asarray(np.asarray(mix.charges))
        # mobility [m^2/(V s) * mol] convention follows the reference: sigma
        # in reference units uses molar number densities and MOLARELECTRONCHARGE
        from ..constants import MOLAR_ELECTRON_CHARGE

        return MOLAR_ELECTRON_CHARGE * jnp.einsum(
            "...s,...s,s->...", props["mobility"], props["n_sp"], charges
        )


@dataclass(frozen=True, eq=False)
class ConstantPlasmaTransport:
    """Constant-coefficient multi-species transport (reference:
    ConstantTransport with per-species diffusivities and momentum-transfer
    frequencies, src/transport_properties.cpp:303-452).

    Diffusion velocities are concentration-driven with the CONSTANT
    per-species diffusivities, V_s = -D_s grad(X_s)/(X_s+eps), plus the
    ambipolar zero-current field (mobility mu_s = qe/kB * Z_s / T_s * D_s),
    external-field drift, and the mass-conservation correction — the exact
    pipeline of the reference's ComputeFluxMolecularTransport.  The
    source-side properties supply the mixture electric conductivity and
    the constant e-heavy momentum-transfer frequencies
    (ComputeSourceMolecularTransport, :389-452)."""

    mixture: object
    visc: float = 0.0
    bulk_visc: float = 0.0
    kappa: float = 0.0
    kappa_e: float = 0.0
    diffusivity: tuple = ()  # per species, MIXTURE order [.., E, bg]
    mt_freq: tuple = ()      # per species, MIXTURE order

    def _diffusion(self, mix, U, Up, grad_up, efield):
        X_sp, Y_sp, n_sp = mix.species_primitives(U)
        Th = Up[..., mix.i_th]
        Te = Up[..., mix.i_te] if mix.two_temperature else Th
        nsp = mix.num_species
        charges = jnp.asarray(np.asarray(mix.charges))
        diff = jnp.asarray(np.asarray(self.diffusivity, dtype=np.float64),
                           U.dtype)
        diff = jnp.broadcast_to(diff, X_sp.shape)
        ie = mix.i_electron
        Tsp = jnp.stack(
            [Te if sp == ie else Th for sp in range(nsp)], axis=-1)
        mobility = _QE_OVER_KB * charges / Tsp * diff
        gradX = mix.mole_fraction_gradient(n_sp, grad_up)
        dv = -diff[..., None] * gradX / (X_sp[..., None] + _XEPS)
        if mix.ambipolar:
            dv = _add_ambipolar_efield(mobility, n_sp, charges, dv)
        if efield is not None:
            dv = dv + jnp.where(charges[..., None] != 0.0,
                                mobility[..., None] * efield[..., None, :],
                                0.0)
        dv = _correct_mass_diffusion_flux(Y_sp, dv)
        return dv, mobility, n_sp, diff

    def flux_properties(self, mixture, U, Up, grad_up, efield=None, **kw):
        mix = self.mixture
        shape = U.shape[:-1]
        dt = U.dtype
        dv, mobility, n_sp, diff = self._diffusion(mix, U, Up, grad_up,
                                                   efield)
        return {
            "visc": jnp.full(shape, self.visc, dtype=dt),
            "bulk_visc": jnp.full(shape, self.bulk_visc, dtype=dt),
            "kappa": jnp.full(shape, self.kappa, dtype=dt),
            "kappa_e": jnp.full(shape, self.kappa_e, dtype=dt),
            "diff_vel": dv,
            "diffusivity": diff,
            "mobility": mobility,
            "n_sp": n_sp,
        }

    def source_properties(self, U, Up, grad_up, efield=None):
        mix = self.mixture
        dv, mobility, n_sp, diff = self._diffusion(mix, U, Up, grad_up,
                                                   efield)
        charges = jnp.asarray(np.asarray(mix.charges))
        from ..constants import MOLAR_ELECTRON_CHARGE

        sigma = MOLAR_ELECTRON_CHARGE * jnp.einsum(
            "...s,...s,s->...", mobility, n_sp, charges
        )
        mf = jnp.broadcast_to(
            jnp.asarray(np.asarray(self.mt_freq, dtype=np.float64), U.dtype),
            n_sp.shape,
        )
        return {
            "sigma": sigma,
            "mf_freq": mf,
            "diff_vel": dv,
            "n_sp": n_sp,
            "mobility": mobility,
            "diffusivity": diff,
        }

    def electric_conductivity(self, U, Up):
        mix = self.mixture
        zero_grad = jnp.zeros(
            U.shape[:-1] + (mix.num_equations, mix.dim), U.dtype)
        _, mobility, n_sp, _ = self._diffusion(mix, U, Up, zero_grad, None)
        charges = jnp.asarray(np.asarray(mix.charges))
        from ..constants import MOLAR_ELECTRON_CHARGE

        return MOLAR_ELECTRON_CHARGE * jnp.einsum(
            "...s,...s,s->...", mobility, n_sp, charges
        )


def _add_ambipolar_efield(mobility, n_sp, charges, dv):
    """Zero-current ambipolar electric field correction
    (reference: transport_properties.cpp:115-135)."""
    mho = jnp.einsum("...s,...s,s->...", mobility, n_sp, charges)
    ambE = -jnp.einsum("...sd,...s,s->...d", dv, n_sp, charges)
    ambE = ambE / (mho[..., None] + _XEPS)
    return dv + mobility[..., None] * ambE[..., None, :]


def _correct_mass_diffusion_flux(Y_sp, dv):
    """Subtract the mass-averaged drift so sum_s Y_s V_s = 0
    (reference: transport_properties.cpp:59-71)."""
    Vc = jnp.einsum("...s,...sd->...d", Y_sp, dv)
    return dv - Vc[..., None, :]


# ---------------------------------------------------------------------------
# General mixture transport from per-pair collision integrals
# ---------------------------------------------------------------------------

# collision kinds -> {(l, r): Omega(T)} evaluators; Coulomb kinds take the
# nondimensional temperature and are scaled by the Debye circle at runtime
_NEUTRAL_KINDS = {
    "AR_AR": {(1, 1): ci.ArAr11, (2, 2): ci.ArAr22},
    "AR_AR1P": {(1, 1): ci.ArAr1P11},
    "AR_E": {(1, r): getattr(ci, f"eAr1{r}") for r in range(1, 6)},
    "N2_N2": {(1, 1): ci.N2N211, (2, 2): ci.N2N222},
    "N2_N21P": {(1, 1): ci.N2N21P11},
    "N2_NI": {(1, 1): ci.N2Ni11, (2, 2): ci.N2Ni22},
    "N2_NI1P": {(1, 1): ci.N2Ni1P11},
    "NI_NI": {(1, 1): ci.NiNi11, (2, 2): ci.NiNi22},
    "NI_NI1P": {(1, 1): ci.NiNi1P11},
    "N2_E": {(1, r): getattr(ci, f"eN21{r}") for r in range(1, 6)},
    "NI_E": {(1, r): getattr(ci, f"eNi1{r}") for r in range(1, 6)},
}
_CLMB = {
    "CLMB_ATT": {(1, 1): ci.att11, (1, 2): ci.att12, (1, 3): ci.att13,
                 (1, 4): ci.att14, (1, 5): ci.att15, (2, 2): ci.att22,
                 (2, 3): ci.att23, (2, 4): ci.att24},
    "CLMB_REP": {(1, 1): ci.rep11, (1, 2): ci.rep12, (1, 3): ci.rep13,
                 (1, 4): ci.rep14, (1, 5): ci.rep15, (2, 2): ci.rep22,
                 (2, 3): ci.rep23, (2, 4): ci.rep24},
}

# species-name pair -> collision kind (order-insensitive), mirroring the
# valid tags of the reference dispatch (src/gas_transport.cpp:995-1283)
_NAME_PAIR_KINDS = {
    frozenset(["Ar"]): "AR_AR",
    frozenset(["Ar", "Ar.+1"]): "AR_AR1P",
    frozenset(["Ar", "E"]): "AR_E",
    frozenset(["N2"]): "N2_N2",
    frozenset(["N2", "N2.+1"]): "N2_N21P",
    frozenset(["N2", "N"]): "N2_NI",
    frozenset(["N2", "N.+1"]): "N2_NI1P",
    frozenset(["N"]): "NI_NI",
    frozenset(["N", "N.+1"]): "NI_NI1P",
    frozenset(["N2", "E"]): "N2_E",
    frozenset(["N", "E"]): "NI_E",
}


@dataclass(frozen=True, eq=False)
class GasMixtureTransport(ArgonMinimalTransport):
    """General N-species collision-integral transport.

    The role of the reference GasMixtureTransport (src/gas_transport.cpp:
    874-1660): the same Chapman-Enskog machinery as the ternary argon model,
    driven by a per-species-pair collision-integral dispatch table.  Charged
    pairs use the screened-Coulomb fits (attractive/repulsive by the product
    of charges); neutral/name-specific pairs use the tabulated argon or
    nitrogen fits.  Unknown neutral pairs may be supplied via
    `extra_pairs` {(i, j): {(l, r): callable}}.

    `species_names` are in MIXTURE order (same ordering as mixture.mw).
    """

    species_names: tuple = ()
    extra_pairs: object = None

    def __post_init__(self):
        mix = self.mixture
        names = list(self.species_names)
        nsp = mix.num_species
        if len(names) != nsp:
            raise ValueError("species_names must match mixture.num_species")
        charges = np.asarray(mix.charges)
        table = {}
        for i in range(nsp):
            for j in range(i, nsp):
                if self.extra_pairs and (i, j) in self.extra_pairs:
                    table[(i, j)] = dict(self.extra_pairs[(i, j)])
                    continue
                zi, zj = charges[i], charges[j]
                if zi != 0.0 and zj != 0.0:  # charged pair -> screened Coulomb
                    kind = "CLMB_REP" if zi * zj > 0 else "CLMB_ATT"
                    table[(i, j)] = ("CLMB", _CLMB[kind])
                    continue
                key = frozenset([names[i]] if i == j else [names[i], names[j]])
                if key in _NAME_PAIR_KINDS:
                    table[(i, j)] = ("T", _NEUTRAL_KINDS[_NAME_PAIR_KINDS[key]])
                else:
                    raise NotImplementedError(
                        f"no collision-integral data for pair "
                        f"({names[i]}, {names[j]}); pass extra_pairs"
                    )
        object.__setattr__(self, "_pair_table", table)

    def _omega(self, i, j, l, r, Th, Te, dc, ndim_th, ndim_te):
        """Q^(l,r)(i, j) at the pair's governing temperature."""
        mix = self.mixture
        key = (min(i, j), max(i, j))
        entry = self._pair_table[key]
        is_e = (i == mix.i_electron) or (j == mix.i_electron)
        if isinstance(entry, tuple) and entry[0] == "CLMB":
            fns = entry[1]
            T = ndim_te if is_e else ndim_th
            return dc * fns[(l, r)](T)
        fns = entry[1]
        T = Te if is_e else Th
        return fns[(l, r)](T)

    def _third_order_ke_general(self, X_sp, Th, Te, dc, ndim_th, ndim_te):
        """Devoto third-order electron thermal conductivity, summed over all
        species (reference: gas_transport.cpp:1388-1407)."""
        mix = self.mixture
        m = self._masses()
        ie = mix.i_electron

        def L_funcs(Q):
            l11 = 6.25 * Q[0] - 15.0 * Q[1] + 12.0 * Q[2]
            l12 = 10.9375 * Q[0] - 39.375 * Q[1] + 57.0 * Q[2] - 30.0 * Q[3]
            l22 = (19.140625 * Q[0] - 91.875 * Q[1] + 199.5 * Q[2]
                   - 210.0 * Q[3] + 90.0 * Q[4])
            return l11, l12, l22

        Q2 = [self._omega(ie, ie, 2, r, Th, Te, dc, ndim_th, ndim_te)
              for r in (2, 3, 4)]
        Xe = X_sp[..., ie]
        sq2 = np.sqrt(2.0)
        l11 = sq2 * Xe * Q2[0]
        l12 = sq2 * Xe * (1.75 * Q2[0] - 2.0 * Q2[1])
        l22 = sq2 * Xe * (4.8125 * Q2[0] - 7.0 * Q2[1] + 5.0 * Q2[2])
        for sp in range(mix.num_species):
            if sp == ie:
                continue
            Q1 = [self._omega(ie, sp, 1, r, Th, Te, dc, ndim_th, ndim_te)
                  for r in (1, 2, 3, 4, 5)]
            a11, a12, a22 = L_funcs(Q1)
            Xs = X_sp[..., sp]
            l11 = l11 + Xs * a11
            l12 = l12 + Xs * a12
            l22 = l22 + Xs * a22
        return (VISCOSITY_FACTOR * K_OVER_ETA_FACTOR
                * jnp.sqrt(2.0 * Te / m[ie]) * Xe
                / (l11 - l12 * l12 / l22))

    def _common(self, U, Up, grad_up, efield):
        mix = self.mixture
        m = self._masses()
        nsp = mix.num_species
        ie = mix.i_electron

        X_sp, Y_sp, n_sp = mix.species_primitives(U)
        n_tot = jnp.sum(n_sp, axis=-1)
        Th = Up[..., mix.i_th]
        Te = Up[..., mix.i_te] if mix.two_temperature else Th

        dl, dc, ndim_te, ndim_th = self._collision_inputs(n_sp, Th, Te)

        # binary diffusion for all pairs; Curtiss-Hirschfelder average
        denom = [jnp.zeros_like(Th) for _ in range(nsp)]
        for i in range(nsp):
            for j in range(i + 1, nsp):
                is_e = (i == ie) or (j == ie)
                Tij = Te if is_e else Th
                muw = m[i] * m[j] / (m[i] + m[j])
                Q11 = self._omega(i, j, 1, 1, Th, Te, dc, ndim_th, ndim_te)
                d_ij = DIFFUSIVITY_FACTOR * jnp.sqrt(Tij / muw) / n_tot / Q11
                denom[i] = denom[i] + (X_sp[..., j] + _XEPS) / d_ij
                denom[j] = denom[j] + (X_sp[..., i] + _XEPS) / d_ij
        diff = jnp.stack(
            [(1.0 - Y_sp[..., s]) / denom[s] for s in range(nsp)], axis=-1
        ) * self.diff_mult

        charges = jnp.asarray(np.asarray(mix.charges))
        Tsp = jnp.stack([Te if s == ie else Th for s in range(nsp)], axis=-1)
        mobility = _QE_OVER_KB * charges / Tsp * diff * self.mobil_mult

        gradX = mix.mole_fraction_gradient(n_sp, grad_up)
        dv = -diff[..., None] * gradX / (X_sp[..., None] + _XEPS)
        if mix.ambipolar:
            dv = _add_ambipolar_efield(mobility, n_sp, charges, dv)
        if efield is not None:
            dv = dv + jnp.where(charges[..., None] != 0.0,
                                mobility[..., None] * efield[..., None, :], 0.0)
        dv = _correct_mass_diffusion_flux(Y_sp, dv)
        return (X_sp, Y_sp, n_sp, n_tot, Th, Te, dc, ndim_th, ndim_te,
                diff, mobility, dv, charges)

    def flux_properties(self, mixture, U, Up, grad_up, efield=None, **kw):
        mix = self.mixture
        m = self._masses()
        nsp = mix.num_species
        ie = mix.i_electron

        (X_sp, Y_sp, n_sp, n_tot, Th, Te, dc, ndim_th, ndim_te,
         diff, mobility, dv, charges) = self._common(U, Up, grad_up, efield)

        visc = jnp.zeros_like(Th)
        kappa = jnp.zeros_like(Th)
        for sp in range(nsp):
            if sp == ie:
                continue  # electron viscosity neglected
            Q22 = self._omega(sp, sp, 2, 2, Th, Te, dc, ndim_th, ndim_te)
            v = VISCOSITY_FACTOR * jnp.sqrt(m[sp] * Th) / Q22
            visc = visc + X_sp[..., sp] * v
            kappa = kappa + X_sp[..., sp] * v * K_OVER_ETA_FACTOR / m[sp]

        if self.third_order_electron_thermal_conductivity:
            kappa_e = self._third_order_ke_general(
                X_sp, Th, Te, dc, ndim_th, ndim_te)
        else:
            Qee = self._omega(ie, ie, 2, 2, Th, Te, dc, ndim_th, ndim_te)
            kappa_e = (VISCOSITY_FACTOR * K_OVER_ETA_FACTOR
                       * jnp.sqrt(Te / m[ie]) * X_sp[..., ie] / Qee)

        return {
            "visc": visc * self.visc_mult,
            "bulk_visc": jnp.zeros_like(visc),
            "kappa": kappa * self.kappa_mult,
            "kappa_e": kappa_e * self.kappa_e_mult,
            "diff_vel": dv,
            "diffusivity": diff,
            "mobility": mobility,
            "n_sp": n_sp,
        }

    def source_properties(self, U, Up, grad_up, efield=None):
        mix = self.mixture
        m = self._masses()
        nsp = mix.num_species
        ie = mix.i_electron

        (X_sp, Y_sp, n_sp, n_tot, Th, Te, dc, ndim_th, ndim_te,
         diff, mobility, dv, charges) = self._common(U, Up, grad_up, efield)

        # electron momentum-transfer collision frequencies with every heavy
        vfac = MF_FREQ_FACTOR * jnp.sqrt(Te / m[ie])
        mf = jnp.zeros_like(n_sp)
        for sp in range(nsp):
            if sp == ie:
                continue
            Q11 = self._omega(ie, sp, 1, 1, Th, Te, dc, ndim_th, ndim_te)
            mf = mf.at[..., sp].set(vfac * n_sp[..., sp] * Q11)

        from ..constants import MOLAR_ELECTRON_CHARGE

        sigma = MOLAR_ELECTRON_CHARGE * jnp.einsum(
            "...s,...s,s->...", mobility, n_sp, charges
        )
        return {
            "sigma": sigma,
            "mf_freq": mf,
            "diff_vel": dv,
            "n_sp": n_sp,
            "mobility": mobility,
            "diffusivity": diff,
        }
