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

    @property
    def outdir(self):
        return self.config.outdir

    def path(self):
        os.makedirs(self.outdir, exist_ok=True)
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
            stored_order = int(f.attrs.get("order", solver.config.order))
            ne, ndof, neq = solver.U.shape
            cols = []
            for name in names:
                cols.append(np.asarray(f["solution"][name]).reshape(ne, -1))
            U = np.stack(cols, axis=-1)
        if stored_order != solver.config.order:
            # variable-order restart (reference [io]/restartMode variableP,
            # IOFamily::readChangeOrder src/io.hpp:219): resample each
            # element's nodal values onto the new order's node set
            U = _resample_order(
                U, solver.mesh.geom, stored_order, solver.config.order,
                "gauss-legendre" if solver.config.basis_type == 0
                else "gauss-lobatto",
            )
        import jax.numpy as jnp

        solver.U = jnp.asarray(U, dtype=solver.dtype)
        return solver


def _resample_order(U, geom, order_from, order_to, basis):
    """Per-element nodal resampling between polynomial orders.

    U: [ne, ndof_from, neq] -> [ne, ndof_to, neq].  Interpolation when
    raising order (exact); least-squares-free collocation when lowering."""
    from ..mesh.reference_element import ReferenceElement

    ref_from = ReferenceElement(geom=geom, order=order_from, basis=basis)
    ref_to = ReferenceElement(geom=geom, order=order_to, basis=basis)
    R = ref_from.eval_basis(ref_to.nodes)  # [ndof_to, ndof_from]
    return np.einsum("td,ndk->ntk", R, U)
