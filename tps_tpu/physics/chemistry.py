"""Finite-rate chemistry: reaction models + mass-action network.

Mirrors the reference Chemistry/Reaction behavior (reference:
src/chemistry.cpp:38-300, src/reaction.cpp:41-117):
  k_f from per-reaction models (Arrhenius, Hoffert-Lien, tabulated,
  externally-injected "grid function" rates), equilibrium constants for
  detailed balance, progress rates by mass action over molar number
  densities, creation rates in mass units.

All evaluation is vectorized over an arbitrary batch of points; the
(static, small) reaction list is unrolled at trace time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..constants import BOLTZMANN_CONSTANT, UNIVERSAL_GAS_CONSTANT

_R = UNIVERSAL_GAS_CONSTANT


@dataclass(frozen=True)
class Arrhenius:
    """k = A T^b exp(-E / (R T)) (reference: src/reaction.cpp:41-48)."""

    A: float
    b: float
    E: float

    def __call__(self, T, extern_rate=None, **kw):
        return self.A * T**self.b * jnp.exp(-self.E / _R / T)


@dataclass(frozen=True)
class HoffertLien:
    """Hoffert & Lien (1967) partially-ionized argon rate
    (reference: src/reaction.cpp:50-61): k = A T^b (E/kB/T + 2) exp(-E/kB/T)."""

    A: float
    b: float
    E: float

    def __call__(self, T, extern_rate=None, **kw):
        tf = self.E / BOLTZMANN_CONSTANT / T
        return self.A * T**self.b * (tf + 2.0) * jnp.exp(-tf)


@dataclass(frozen=True, eq=False)
class TabulatedRate:
    """Rate from a 1-D table in temperature (reference: src/reaction.cpp:63-83)."""

    table: object  # tables.LinearTable

    def __call__(self, T, extern_rate=None, **kw):
        return self.table(T)


@dataclass(frozen=True)
class ExternalRate:
    """Externally-injected per-point rate (the reference's
    GridFunctionReaction, used by the Boltzmann interface fetch path,
    src/reaction.cpp:85-117).  `extern_rate` carries the injected field."""

    comp: int

    def __call__(self, T, extern_rate=None, **kw):
        if extern_rate is None:
            return jnp.zeros_like(T)
        return extern_rate[..., self.comp]


@dataclass(frozen=True, eq=False)
class Chemistry:
    """Reaction network over a PerfectMixture-ordered species set."""

    mixture: object
    # [nreact, nsp] stoichiometric coefficients
    reactant_stoich: np.ndarray
    product_stoich: np.ndarray
    models: tuple  # per-reaction rate models (callables above)
    reaction_energies: tuple  # [nreact] J/mol
    detailed_balance: tuple  # [nreact] bool
    equilibrium_params: tuple  # [nreact] (A, b, E) for A T^b exp(-E/T)
    min_temperature: float = 0.0

    @property
    def num_reactions(self):
        return len(self.models)

    def electron_involved(self):
        """Reaction uses Te if the electron participates as a reactant
        (reference isElectronInvolvedAt)."""
        ie = self.mixture.i_electron
        return [self.reactant_stoich[r, ie] > 0 for r in range(self.num_reactions)]

    # ------------------------------------------------------------------
    def forward_rates(self, Th, Te, extern_rate=None, n_sp=None):
        """k_f per reaction: [..., nreact]."""
        Thl = jnp.maximum(Th, self.min_temperature)
        Tel = jnp.maximum(Te, self.min_temperature)
        einv = self.electron_involved()
        out = []
        for r, model in enumerate(self.models):
            T = Tel if einv[r] else Thl
            out.append(model(T, extern_rate=extern_rate, n_sp=n_sp,
                              Th=Thl, Te=Tel))
        return jnp.stack(out, axis=-1)

    def equilibrium_constants(self, Th, Te):
        """K_c per reaction (only meaningful under detailed balance)."""
        Thl = jnp.maximum(Th, self.min_temperature)
        Tel = jnp.maximum(Te, self.min_temperature)
        einv = self.electron_involved()
        out = []
        for r in range(self.num_reactions):
            if self.detailed_balance[r]:
                A, b, E = self.equilibrium_params[r]
                T = Tel if einv[r] else Thl
                out.append(A * T**b * jnp.exp(-E / T))
            else:
                out.append(jnp.zeros_like(Th))
        return jnp.stack(out, axis=-1)

    def progress_rates(self, n_sp, kfwd, keq):
        """Mass-action progress rates [..., nreact]; n_sp in mol/m^3."""
        out = []
        ns = jnp.maximum(n_sp, 0.0)
        for r in range(self.num_reactions):
            rs = self.reactant_stoich[r]
            ps = self.product_stoich[r]
            fwd = jnp.ones_like(n_sp[..., 0])
            for sp in range(n_sp.shape[-1]):
                if rs[sp] != 0:
                    fwd = fwd * ns[..., sp] ** float(rs[sp])
            rate = fwd
            if self.detailed_balance[r]:
                bwd = jnp.ones_like(fwd)
                for sp in range(n_sp.shape[-1]):
                    if ps[sp] != 0:
                        bwd = bwd * ns[..., sp] ** float(ps[sp])
                rate = rate - bwd / keq[..., r]
            out.append(kfwd[..., r] * rate)
        return jnp.stack(out, axis=-1)

    def creation_rates(self, progress):
        """Mass creation rates [..., nsp] in kg/m^3/s."""
        net = self.product_stoich - self.reactant_stoich  # [nr, nsp]
        mw = np.asarray(self.mixture.mw)
        w = jnp.asarray(net * mw[None, :])
        return jnp.einsum("...r,rs->...s", progress, w)

    # convenience: everything at once
    def source(self, n_sp, Th, Te, extern_rate=None):
        kf = self.forward_rates(Th, Te, extern_rate, n_sp=n_sp)
        kc = self.equilibrium_constants(Th, Te)
        pr = self.progress_rates(n_sp, kf, kc)
        cr = self.creation_rates(pr)
        return pr, cr
