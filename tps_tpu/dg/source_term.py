"""Chemistry/EM source term for the compressible plasma solver.

Mirrors the behavior of reference SourceTerm::updateTerms
(reference: src/source_term.cpp:62-258): per-point reaction creation rates,
optically-thin radiation sink, and for two-temperature mixtures the
electron-energy sinks (electron-impact reaction energy, electron pressure
work, elastic electron-heavy energy exchange).  Also evaluates the plasma
conductivity field used by EM coupling.

Implemented as a forcing callable `(t, tab, U, Up, grad_up) -> dU/dt`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import UNIVERSAL_GAS_CONSTANT as _R


@dataclass(frozen=True, eq=False)
class SourceTerm:
    mixture: object
    transport: object  # needs .source_properties
    chemistry: object | None = None
    radiation: object | None = None
    efield: object | None = None  # optional [..., nvel] electric field
    extern_rate: object | None = None  # injected reaction rates (Boltzmann bus)

    def __call__(self, t, tab, U, Up, grad_up, fields=None):
        fields = fields or {}
        mix = self.mixture
        nvel = mix.nvel
        neq = mix.num_equations
        if grad_up is None:
            grad_up = jnp.zeros(U.shape[:-1] + (neq, mix.dim), U.dtype)

        # clip species (reference source_term.cpp:127-131)
        na = mix.num_active_species
        sl = slice(nvel + 2, nvel + 2 + na)
        Uc = U.at[..., sl].set(jnp.maximum(U[..., sl], 0.0))
        Upc = Up.at[..., sl].set(jnp.maximum(Up[..., sl], 0.0))

        efield = fields.get("efield", self.efield)
        props = self.transport.source_properties(Uc, Upc, grad_up, efield=efield)
        n_sp = props["n_sp"]
        Th = Upc[..., mix.i_th]
        Te = Upc[..., mix.i_te] if mix.two_temperature else Th

        src = jnp.zeros_like(U)

        progress = None
        if self.chemistry is not None and self.chemistry.num_reactions > 0:
            progress, creation = self.chemistry.source(
                n_sp, Th, Te, extern_rate=fields.get("extern_rate", self.extern_rate)
            )
            src = src.at[..., sl].add(creation[..., :na])

        if self.radiation is not None:
            src = src.at[..., mix.i_th].add(self.radiation.energy_sink(Th))

        if mix.two_temperature:
            ie = mix.i_electron
            # electron-impact reaction energy sink
            if progress is not None:
                einv = self.chemistry.electron_involved()
                for r in range(self.chemistry.num_reactions):
                    if einv[r]:
                        src = src.at[..., mix.i_te].add(
                            -self.chemistry.reaction_energies[r] * progress[..., r]
                        )
            # work by electron pressure: u . grad(pe)
            ne = n_sp[..., ie]
            charges = np.asarray(mix.charges)
            gn_active = grad_up[..., nvel + 2 : nvel + 2 + na, :]
            if mix.ambipolar:
                ne_grad = jnp.einsum("...sd,s->...d", gn_active, jnp.asarray(charges[:na]))
            else:
                ne_grad = gn_active[..., ie, :]
            gradTe = grad_up[..., mix.i_te, :]
            gradPe = _R * (ne_grad * Te[..., None] + ne[..., None] * gradTe)
            u = Upc[..., 1 : 1 + mix.dim]
            src = src.at[..., mix.i_te].add(
                jnp.einsum("...d,...d->...", gradPe, u)
            )
            # elastic electron-heavy energy exchange
            mw = np.asarray(mix.mw)
            me = mw[ie]
            for sp in range(mix.num_species):
                if sp == ie:
                    continue
                msp = mw[sp]
                coup = 2.0 * me * msp / (msp + me) ** 2
                energy = (
                    1.5 * _R * (Te - Th)
                    * coup * ne * props["mf_freq"][..., sp]
                )
                src = src.at[..., mix.i_te].add(-energy)

        return src

    def plasma_conductivity(self, U, Up, grad_up=None):
        """sigma(T) field for EM coupling (reference: plasma_conductivity_
        write in SourceTerm::updateTerms)."""
        mix = self.mixture
        if grad_up is None:
            grad_up = jnp.zeros(U.shape[:-1] + (mix.num_equations, mix.dim), U.dtype)
        return self.transport.source_properties(U, Up, grad_up)["sigma"]
