"""Tps2Boltzmann: the TPS <-> external-Boltzmann-solver field bus.

Mirrors the reference interface (reference: src/tps2Boltzmann.hpp:68-180,
push/fetch semantics src/M2ulPhyS2Boltzmann.cpp:40-101): a set of named
fields on the flow solver's dof layout, with the same Index taxonomy, so
reference-style Python time-loop drivers (src/tps-time-loop.py,
src/tps-bte_0d3v.py) port directly:

    interface = Tps2Boltzmann(tps)
    tps.init_interface(interface)
    while ...:
        tps.solve_step()
        tps.push(interface)          # n_sp [1/m^3], T_h, T_e, E-field
        boltzmann.solve(interface)   # external solver fills ReactionRates
        tps.fetch(interface)         # rates -> chemistry (ExternalRate)

In this framework fields are jax arrays of shape [ne, ndof, k]; "native" and
"interface" spaces coincide (resampling hooks kept for parity).
"""

from __future__ import annotations

import numpy as np

from ..constants import AVOGADRO_NUMBER


class Tps2Boltzmann:
    # Index taxonomy (reference: tps2Boltzmann.hpp:70-87)
    ElectricField = 0
    SpeciesDensities = 1
    HeavyTemperature = 2
    ElectronTemperature = 3
    ElectronMobility = 4
    ElectronDiffusion = 5
    ReactionRates = 6
    All = 7

    def __init__(self, tps=None):
        self.tps = tps
        self.initialized = False
        self.fields = {}
        self.time = 0.0
        self.dt = 0.0
        self.nspecies = 0
        self.nreactions = 0
        self.nfields_efield = 0

    # -- lifecycle (called by solver.init_interface) -----------------------
    def setup(self, nspecies, nreactions, n_efield_comps, shape):
        import jax.numpy as jnp

        self.nspecies = nspecies
        self.nreactions = nreactions
        self.nfields_efield = n_efield_comps
        z = lambda k: jnp.zeros(shape + (k,))
        self.fields = {
            self.ElectricField: z(n_efield_comps),
            self.SpeciesDensities: z(nspecies),
            self.HeavyTemperature: z(1),
            self.ElectronTemperature: z(1),
            self.ElectronMobility: z(1),
            self.ElectronDiffusion: z(1),
            self.ReactionRates: z(nreactions),
        }
        self.initialized = True

    def is_initialized(self):
        return self.initialized

    # -- accessors (reference pybind API names) ----------------------------
    def Field(self, index):
        return self.fields[index]

    def setField(self, index, value):
        import jax.numpy as jnp

        self.fields[index] = jnp.asarray(value)

    def Nspecies(self):
        return self.nspecies

    def NeFieldComps(self):
        return self.nfields_efield

    def nComponents(self, index):
        return self.fields[index].shape[-1]

    def setTimeStep(self, dt):
        self.dt = dt

    def setCurrentTime(self, t):
        self.time = t

    # host-side numpy views (the zero-copy HostRead/HostWrite analog)
    def host(self, index):
        return np.asarray(self.fields[index])

    def HostRead(self, index):
        """Flat numpy view (reference pybind HostRead semantics)."""
        return np.asarray(self.fields[index]).reshape(-1)

    def HostWrite(self, index):
        """Mutable flat numpy copy; call commit(index, arr) to store back.
        (The reference returns a zero-copy device pointer; jax arrays are
        immutable, so the write-back is explicit.)"""
        return np.array(self.fields[index]).reshape(-1)

    def commit(self, index, flat):
        import jax.numpy as jnp

        self.fields[index] = jnp.asarray(
            np.asarray(flat).reshape(self.fields[index].shape)
        )

    def EfieldAngularFreq(self):
        cfg = getattr(self.tps, "config", None)
        raw = getattr(cfg, "raw", None) if cfg is not None else None
        if raw is not None:
            return 2.0 * np.pi * raw.get("em/current_frequency", 0.0)
        return 0.0

    def getReactionEquation(self, r):
        cfg = getattr(self.tps, "config", None)
        raw = getattr(cfg, "raw", None) if cfg is not None else None
        if raw is not None:
            return raw.get(f"reactions/reaction{r + 1}/equation", f"reaction{r + 1}")
        return f"reaction{r + 1}"

    def saveDataCollection(self, cycle=0, time=0.0, outdir=None):
        """Dump all interface fields to an HDF5 snapshot (the role of the
        reference's ParaView data collection save)."""
        import os

        import h5py

        base = outdir or getattr(
            getattr(self.tps, "config", None), "outdir", "output"
        )
        os.makedirs(base, exist_ok=True)
        names = {
            self.ElectricField: "electric_field",
            self.SpeciesDensities: "species_densities",
            self.HeavyTemperature: "heavy_temperature",
            self.ElectronTemperature: "electron_temperature",
            self.ElectronMobility: "electron_mobility",
            self.ElectronDiffusion: "electron_diffusion",
            self.ReactionRates: "reaction_rates",
        }
        path = os.path.join(base, f"boltzmann_interface_{cycle:06d}.h5")
        with h5py.File(path, "w") as f:
            f.attrs["cycle"] = cycle
            f.attrs["time"] = time
            for idx, name in names.items():
                f[name] = np.asarray(self.fields[idx])
        return path


# ---------------------------------------------------------------------------
# solver-side push/fetch implementations (wired into CompressibleSolver)
# ---------------------------------------------------------------------------


def compressible_init_interface(solver, interface: Tps2Boltzmann):
    mix = solver.mixture
    n_react = (
        solver.plasma.chemistry.num_reactions
        if solver.plasma is not None and solver.plasma.chemistry is not None
        else 0
    )
    interface.setup(
        nspecies=mix.num_species,
        nreactions=n_react,
        n_efield_comps=mix.nvel,
        shape=solver.U.shape[:-1],
    )


def compressible_push(solver, interface: Tps2Boltzmann):
    """n_sp [1/m^3] (Avogadro-scaled), T_h, T_e -> interface
    (reference: M2ulPhyS::push, src/M2ulPhyS2Boltzmann.cpp:40-88)."""
    import jax.numpy as jnp

    mix = solver.mixture
    U = solver.U
    n_sp = mix.number_densities(U)
    Th, Te = mix.temperatures(U, n_sp)
    interface.setField(interface.SpeciesDensities, AVOGADRO_NUMBER * n_sp)
    interface.setField(interface.HeavyTemperature, Th[..., None])
    interface.setField(interface.ElectronTemperature, Te[..., None])
    efield = getattr(solver, "efield", None)
    if efield is not None:
        # EM-solve E-field amplitude in component 0 (reference: the coupled
        # driver fills the interface's ElectricField slot from the EM mesh,
        # src/cycle_avg_joule_coupling.cpp:290-330)
        e = jnp.zeros(efield.shape + (interface.NeFieldComps(),),
                      dtype=efield.dtype)
        interface.setField(
            interface.ElectricField, e.at[..., 0].set(efield)
        )
    interface.setTimeStep(solver.dt)
    interface.setCurrentTime(solver.time)


def compressible_fetch(solver, interface: Tps2Boltzmann):
    """Install external reaction rates into the chemistry
    (reference: M2ulPhyS::fetch -> Chemistry::setGridFunctionRates)."""
    import jax.numpy as jnp

    rates = interface.Field(interface.ReactionRates)
    solver.fields["extern_rate"] = jnp.asarray(rates)
