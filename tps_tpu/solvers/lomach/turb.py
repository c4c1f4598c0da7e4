"""Algebraic LES subgrid models for the low-Mach path.

Smagorinsky / Sigma eddy viscosity over H1 velocity gradients (mirrors
reference: src/algebraicSubgridModels.cpp behavior; model constants follow
the reference defaults).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import TurbModelBase


class AlgebraicSubgridModel(TurbModelBase):
    """model: 'smagorinsky' (Cs ~ 0.12), 'sigma' (Cs ~ 1.35), or 'wale'
    (Cw ~ 0.5; reference: src/algebraicSubgridModels.cpp:67-78)."""

    def __init__(self, tab, flow, model="smagorinsky", const=None):
        self.tab = tab
        self.flow = flow
        self.model = model
        if const is None:
            const = {"smagorinsky": 0.12, "sigma": 1.35, "wale": 0.5}[model]
        self.const = const
        # grid scale: per-dof length from element volumes
        detJc = np.asarray(tab.detJ).mean(axis=1)  # ~ elem volume
        h_el = detJc ** (1.0 / tab.dim)
        h_dof = np.zeros(tab.ndofs)
        cnt = np.zeros(tab.ndofs)
        ed = np.asarray(tab.elem_dofs)
        for e in range(tab.ne):
            h_dof[ed[e]] += h_el[e]
            cnt[ed[e]] += 1
        self.delta = jnp.asarray(h_dof / np.maximum(cnt, 1)) / max(tab.order, 1)
        self._nut = jnp.zeros(tab.ndofs)

    def step(self, coeff, dt):
        self._nut = self.nut_of(self.flow.velocity())

    def nut_of(self, u):
        """nu_t as a pure (traced) function of the velocity field —
        shared by the per-step path and the chunked scan."""
        tab = self.tab
        # nodal velocity gradient via lumped projection, per component
        g = jnp.stack(
            [h1.grad_at_dofs(tab, u[:, d]) for d in range(tab.dim)], axis=1
        )  # [ndofs, comp, dim] = du_comp/dx_dim
        S = 0.5 * (g + jnp.swapaxes(g, 1, 2))
        if self.model == "smagorinsky":
            smag = jnp.sqrt(2.0 * jnp.einsum("nij,nij->n", S, S))
            return (self.const * self.delta) ** 2 * smag
        elif self.model == "wale":
            # Nicoud & Ducros 1999 via the Ducros direct formula
            # (reference: src/algebraicSubgridModels.cpp:324-452)
            O = 0.5 * (g - jnp.swapaxes(g, 1, 2))
            S2 = jnp.einsum("nik,nkj->nij", S, S)
            O2 = jnp.einsum("nik,nkj->nij", O, O)
            Smag2 = jnp.einsum("nij,nij->n", S, S)
            Omag2 = jnp.einsum("nij,nij->n", O, O)
            SSOO = jnp.einsum("nij,nij->n", S2, O2)
            G2 = jnp.maximum(
                (Smag2**2 + Omag2**2) / 6.0
                + (2.0 / 3.0) * Smag2 * Omag2 + 2.0 * SSOO,
                0.0,
            )
            omega = G2**1.5 / jnp.maximum(Smag2**2.5 + G2**1.25, 1e-12)
            return (self.const * self.delta) ** 2 * omega
        else:  # sigma model (Nicoud et al. 2011)
            G = jnp.einsum("nki,nkj->nij", g, g)
            # eigenvalues of symmetric G (ascending)
            ev = jnp.linalg.eigvalsh(G)
            ev = jnp.clip(ev, 0.0, None)
            s3, s2, s1 = jnp.sqrt(ev[:, 0]), jnp.sqrt(ev[:, 1]), jnp.sqrt(ev[:, -1])
            denom = jnp.maximum(s1 * s1, 1e-30)
            D = s3 * (s1 - s2) * (s2 - s3) / denom
            return (self.const * self.delta) ** 2 * D

    def eddy_viscosity(self):
        return self._nut

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_nut(self, u):
        return self.nut_of(u)

    def chunk_pack(self):
        return self._nut

    def chunk_unpack(self, nut):
        self._nut = nut
