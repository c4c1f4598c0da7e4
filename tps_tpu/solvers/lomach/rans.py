"""RANS turbulence models for the low-Mach path.

AlgebraicRans mirrors the reference (src/algebraic_rans.cpp:120-191):
  nu_t = rho * min(kappa d_wall, max_mixing_length)^2 * |omega|
with |omega| the vorticity magnitude from the H1 velocity field.
StaticRans (src/static_rans.cpp): a frozen user-supplied eddy-viscosity
field.  The four-equation zeta-f model (src/zetaModel.cpp) is tracked for a
later round.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...fem import h1
from .base import TurbModelBase


class AlgebraicRans(TurbModelBase):
    def __init__(self, tab, flow, thermo, wall_distance, kappa=0.41,
                 max_mixing_length=1.0e30):
        self.tab = tab
        self.flow = flow
        self.thermo = thermo
        self.dist = jnp.asarray(wall_distance)
        self.kappa = kappa
        self.max_len = max_mixing_length
        self._nut = jnp.zeros(tab.ndofs)

    def step(self, coeff, dt):
        self._nut = self.nut_of(self.flow.velocity())

    def nut_of(self, u):
        """nu_t as a pure (traced) function of the velocity field."""
        tab = self.tab
        g = jnp.stack(
            [h1.grad_at_dofs(tab, u[:, d]) for d in range(tab.dim)], axis=1
        )  # [nd, comp, dim]
        if tab.dim == 2:
            omega = g[:, 1, 0] - g[:, 0, 1]
            mag = jnp.abs(omega)
        else:
            wx = g[:, 2, 1] - g[:, 1, 2]
            wy = g[:, 0, 2] - g[:, 2, 0]
            wz = g[:, 1, 0] - g[:, 0, 1]
            mag = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        ell = jnp.minimum(self.kappa * self.dist, self.max_len)
        # nu_t (kinematic); flow adds rho * nu_t to mu
        return ell * ell * mag

    def eddy_viscosity(self):
        return self._nut

    # -- chunked-scan adapters (LoMachSolver.solve_chunk) ------------------
    def chunk_nut(self, u):
        return self.nut_of(u)

    def chunk_pack(self):
        return self._nut

    def chunk_unpack(self, nut):
        self._nut = nut


class StaticRans(TurbModelBase):
    """Frozen eddy-viscosity field (reference: src/static_rans.cpp)."""

    def __init__(self, tab, nut_field):
        self._nut = jnp.asarray(np.broadcast_to(nut_field, (tab.ndofs,)))

    def eddy_viscosity(self):
        return self._nut

    # frozen field: trivially chunkable
    def chunk_nut(self, u):
        return self._nut

    def chunk_pack(self):
        return self._nut

    def chunk_unpack(self, nut):
        self._nut = nut
