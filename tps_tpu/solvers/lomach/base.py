"""Low-Mach solver family: model interfaces + temporal coefficients.

Mirrors the reference's plug-in architecture (reference: src/loMach.hpp:76-264,
src/split_flow_base.hpp:71, src/thermo_chem_base.hpp:75, src/turb_model_base.hpp:74,
src/sponge_base.hpp:67): the orchestrator owns the mesh/H1 space and steps
extData -> thermoChem -> flow -> turbModel each time step, with BDF/EXT
temporal coefficients shared by all models.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class TemporalCoefficients:
    """BDF-k implicit + EXT-k explicit extrapolation coefficients
    (reference: temporalSchemeCoefficients src/loMach.hpp:76-103)."""

    order: int = 1
    bd0: float = 1.0
    bd1: float = -1.0
    bd2: float = 0.0
    bd3: float = 0.0
    ab1: float = 1.0
    ab2: float = 0.0
    ab3: float = 0.0

    @classmethod
    def bdf(cls, order: int) -> "TemporalCoefficients":
        """Constant-dt coefficients, ramping order 1..3."""
        if order <= 1:
            return cls(1, 1.0, -1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        if order == 2:
            return cls(2, 1.5, -2.0, 0.5, 0.0, 2.0, -1.0, 0.0)
        return cls(3, 11.0 / 6.0, -3.0, 1.5, -1.0 / 3.0, 3.0, -3.0, 1.0)


class FlowBase:
    """Velocity solver interface (reference: src/split_flow_base.hpp:71-151)."""

    def initialize_self(self):
        pass

    def initialize_operators(self):
        pass

    def step(self, coeff: TemporalCoefficients, dt: float):
        raise NotImplementedError

    def velocity(self):
        raise NotImplementedError


class ZeroFlow(FlowBase):
    """No flow (reference: split_flow_base.hpp:152)."""

    def __init__(self, tab):
        import jax.numpy as jnp

        self._vel = jnp.zeros((tab.ndofs, tab.dim))

    def step(self, coeff, dt):
        pass

    def velocity(self):
        return self._vel


class ThermoChemBase:
    """Thermo-chemistry interface (reference: src/thermo_chem_base.hpp:75-205)."""

    def initialize_self(self):
        pass

    def step(self, coeff: TemporalCoefficients, dt: float):
        raise NotImplementedError

    def density(self):
        raise NotImplementedError

    def viscosity(self):
        raise NotImplementedError

    def thermal_divergence(self):
        """Q_t = -(1/rho)(d rho/dt): velocity divergence constraint."""
        raise NotImplementedError


class ConstantPropertyThermoChem(ThermoChemBase):
    """Fixed rho/mu/Qt (reference: thermo_chem_base.hpp:207)."""

    def __init__(self, tab, rho=1.0, mu=1.0e-3, qt=0.0):
        import jax.numpy as jnp

        self._rho = jnp.full(tab.ndofs, rho)
        self._mu = jnp.full(tab.ndofs, mu)
        self._qt = jnp.full(tab.ndofs, qt)

    def step(self, coeff, dt):
        pass

    def density(self):
        return self._rho

    def viscosity(self):
        return self._mu

    def thermal_divergence(self):
        return self._qt


class TurbModelBase:
    """Eddy-viscosity interface (reference: src/turb_model_base.hpp:74)."""

    def step(self, coeff, dt):
        pass

    def eddy_viscosity(self):
        raise NotImplementedError


class ZeroTurbModel(TurbModelBase):
    def __init__(self, tab):
        import jax.numpy as jnp

        self._nut = jnp.zeros(tab.ndofs)

    def eddy_viscosity(self):
        return self._nut

    # chunked scan: no eddy viscosity, nothing carried
    def chunk_nut(self, u):
        return None

    def chunk_pack(self):
        return None

    def chunk_unpack(self, nut):
        pass


class SpongeBase:
    """Damping-coefficient field interface (reference: src/sponge_base.hpp:67)."""

    def multiplier(self):
        raise NotImplementedError


class ExternalDataBase:
    """External inlet-data interface (reference: src/externalData_base.hpp:72)."""

    def step(self):
        pass
