"""HDF5 checkpoint / restart.

Mirrors the reference restart organizer's behavior (reference: src/io.cpp,
src/io.hpp:85-274): named solution fields under /solution, run metadata as
root attributes (iteration, time, dt, order, dofs, nprocs), single-file
or per-shard layouts.  Fields are registered per solver; the compressible
solver stores the conserved state by equation name like the reference does.
"""

from __future__ import annotations

import os

import numpy as np


def _state_field_names(mixture):
    """Equation component names matching the reference's conventions."""
    names = ["density"]
    comps = ["x-mom", "y-mom", "z-mom"]
    for d in range(mixture.nvel):
        names.append(comps[d])
    names.append("rho-E")
    nact = mixture.num_active_species
    for s in range(nact):
        names.append(f"rho-Y_{s}")
    if mixture.two_temperature:
        names.append("rhoE_e")
    return names


class RestartIO:
    """Write/read restart files for a solver with .U/.iter/.time/.dt."""

    def __init__(self, config, solver):
        self.config = config
        self.outdir = config.outdir
        os.makedirs(self.outdir, exist_ok=True)

    def path(self):
        return os.path.join(self.outdir, "restart_output.sol.h5")

    def write(self, solver):
        import h5py

        names = _state_field_names(solver.mixture)
        U = np.asarray(solver.U)  # [ne, ndof, neq]
        with h5py.File(self.path(), "w") as f:
            f.attrs["iteration"] = solver.iter
            f.attrs["time"] = solver.time
            f.attrs["dt"] = solver.dt
            f.attrs["order"] = solver.config.order
            f.attrs["nprocs"] = 1
            f.attrs["dofs_global"] = U.shape[0] * U.shape[1]
            g = f.create_group("solution")
            for k, name in enumerate(names):
                # dof-major flat layout like the reference GridFunctions
                g.create_dataset(name, data=U[:, :, k].reshape(-1))

    def read(self, solver):
        import h5py

        names = _state_field_names(solver.mixture)
        path = self.path()
        if not os.path.exists(path):
            raise FileNotFoundError(f"restart file not found: {path}")
        with h5py.File(path, "r") as f:
            solver.iter = int(f.attrs["iteration"])
            solver.time = float(f.attrs["time"])
            solver.dt = float(f.attrs["dt"])
            ne, ndof, neq = solver.U.shape
            cols = []
            for name in names:
                cols.append(np.asarray(f["solution"][name]).reshape(ne, ndof))
            U = np.stack(cols, axis=-1)
        import jax.numpy as jnp

        solver.U = jnp.asarray(U, dtype=solver.dtype)
        return solver
