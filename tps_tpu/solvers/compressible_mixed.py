"""Ini-driven compressible solver on mixed tri/quad meshes.

Instantiated by the `flow` factory (solvers/compressible.py) when the mesh
file holds both element types (reference cases:
test/inputs/input.cyl-2d.case*.ini on test/meshes/cyl-2d-mixed.msh).  The
state is one element-batched array per geometry bucket; the face coupling
lives in dg/mixed.py.  Physics models, BC option parsing, CFL control, and
the time-loop services are shared with CompressibleSolver.

Runs element-sharded under [mesh]/partitions (per-bucket halo exchange,
psum-assembled tri/quad interface buffers; dg/mixed.py
build_sharded_mixed).  Characteristic-BC patch means are patch-GLOBAL: a
patch crossing the tri/quad seam accumulates one quadrature-weighted mean
over both buckets' faces (and all shards), like the reference's per-patch
subcommunicators.
"""

from __future__ import annotations

import time as _time

import numpy as np

from ..dg.mixed import (
    advance_bc_states_mixed,
    build_mixed_tables,
    compute_rhs_mixed,
    init_bc_states_mixed,
    make_bc_slices,
)
from ..dg.rhs import RHSContext
from ..time.integrators import get_integrator
from ..utils.cases import isentropic_vortex, taylor_green_2d, uniform_state
from .compressible import CompressibleSolver


class _TreeVec:
    """Pytree wrapper giving tuple states the vector arithmetic the shared
    RK integrators expect (used only inside traced step functions)."""

    __slots__ = ("t",)

    def __init__(self, t):
        self.t = t

    def _map2(self, other, f):
        import jax

        return _TreeVec(jax.tree.map(f, self.t, other.t))

    def __add__(self, other):
        return self._map2(other, lambda a, b: a + b)

    def __mul__(self, s):
        import jax

        return _TreeVec(jax.tree.map(lambda a: a * s, self.t))

    __rmul__ = __mul__

    def __truediv__(self, s):
        import jax

        return _TreeVec(jax.tree.map(lambda a: a / s, self.t))


class MixedCompressibleSolver(CompressibleSolver):
    """Explicit DG compressible flow on a mixed tri+quad mesh."""

    def initialize(self):
        import jax
        import jax.numpy as jnp

        rc = self.config
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.mesh = self._premade_mesh
        self._build = None
        self.nparts = 1
        self._mixed = True
        self._smx = None

        if rc.raw is not None:
            self.nparts = max(int(rc.raw.get("mesh/partitions", 1) or 1), 1)

        basis = "gauss-legendre" if rc.basis_type == 0 else "gauss-lobatto"
        quad_rule = ("gauss-legendre" if rc.integration_rule == 0
                     else "gauss-lobatto")
        if self.nparts > 1:
            from ..dg.mixed import (
                build_sharded_mixed,
                localize_mixed,
                make_bc_slices_sharded,
                mixed_spec_tree,
            )

            paxis = int(rc.raw.get("mesh/partition_axis", 0) or 0)
            self._smx = build_sharded_mixed(
                self.mesh, order=rc.order, nparts=self.nparts, basis=basis,
                quad_rule=quad_rule,
                axisymmetric=rc.axisymmetric, partition_axis=paxis,
            )
            self.mt_np = self._smx.global_mt  # unsharded (IO/viz/BC setup)
            self.mt = self._smx.stacked.to_jax(self.dtype)
        else:
            self.mt_np = build_mixed_tables(
                self.mesh, order=rc.order, basis=basis, quad_rule=quad_rule,
                axisymmetric=rc.axisymmetric,
            )
            self.mt = self.mt_np.to_jax(self.dtype)

        dim = self.mesh.dim
        nvel = 3 if (rc.axisymmetric and dim == 2) else dim
        forcings = self._build_physics(dim, nvel)

        bc_by_attr = {spec.patch: self._make_bc(spec) for spec in rc.bcs}
        if self._smx is not None:
            slices = make_bc_slices_sharded(self._smx, bc_by_attr)
        else:
            slices = make_bc_slices(self.mt_np, bc_by_attr)
        axis = "dd" if self._smx is not None else None
        self.ctxs = tuple(
            RHSContext(fluxes=self.fluxes, riemann=self.riemann,
                       bcs=slices[b], forcings=tuple(forcings),
                       axis_name=axis)
            for b in range(2)
        )

        # initial condition per bucket (global dof coordinates)
        mix = self.mixture
        U_global = tuple(
            self._bucket_ic(jnp.asarray(tab.xyz_dof, self.dtype))
            for tab in self.mt_np.buckets
        )
        if self._smx is not None:
            from ..parallel.partition import scatter_state

            self.U = tuple(
                jnp.asarray(scatter_state(sb, np.asarray(Ug)), self.dtype)
                for sb, Ug in zip(self._smx.builds, U_global)
            )
        else:
            self.U = U_global
        self.time = 0.0
        self.iter = 0
        self.fields = {}

        self.hmin = float(
            min(np.min(np.asarray(t.delta)) for t in self.mt_np.buckets)
            * max(rc.order, 1)
        )
        base_int = get_integrator(rc.integrator)

        def _step_body(mt_loc, Us, t, dt, bc_states):
            def rf(tv, tt):
                dU, aux = compute_rhs_mixed(mt_loc, self.ctxs, tv.t, tt,
                                            bc_states=bc_states)
                return _TreeVec(dU), aux

            out, aux = base_int(rf, _TreeVec(Us), t, dt)
            bc2 = advance_bc_states_mixed(mt_loc, self.ctxs, out.t,
                                          bc_states, dt)
            return out.t, bc2, aux["max_char_speed"]

        if self._smx is None:
            self._step_mixed = jax.jit(
                lambda Us, t, dt, bc: _step_body(self.mt, Us, t, dt, bc))
            self._init_bc_mixed = jax.jit(
                lambda us: init_bc_states_mixed(self.mt, self.ctxs, us))
        else:
            from functools import partial

            from jax.sharding import PartitionSpec as PS

            from ..parallel.sharding import device_mesh, shard_map

            self._jmesh = device_mesh(self.nparts, devices=rc.devices)
            specs = mixed_spec_tree(self.mt, "dd")
            uspec = tuple(PS("dd") for _ in self.U)

            @partial(shard_map, mesh=self._jmesh,
                     in_specs=(specs, uspec, PS(), PS(), PS("dd")),
                     out_specs=(uspec, PS("dd"), PS()))
            def _step_sm(mt_s, Us, t, dt, bc_states):
                mtl = localize_mixed(mt_s)
                Ul = tuple(u[0] for u in Us)
                bl = jax.tree.map(lambda a: a[0], bc_states)
                U2, bc2, mcs = _step_body(mtl, Ul, t, dt, bl)
                return (tuple(u[None] for u in U2),
                        jax.tree.map(lambda a: a[None], bc2), mcs)

            _step_jit = jax.jit(_step_sm)
            self._step_mixed = lambda Us, t, dt, bc: _step_jit(
                self.mt, Us, t, dt, bc)

            @partial(shard_map, mesh=self._jmesh,
                     in_specs=(specs, uspec), out_specs=PS("dd"))
            def _init_sm(mt_s, Us):
                mtl = localize_mixed(mt_s)
                sts = init_bc_states_mixed(mtl, self.ctxs,
                                           tuple(u[0] for u in Us))
                return jax.tree.map(lambda a: a[None], sts)

            _init_jit = jax.jit(_init_sm)
            self._init_bc_mixed = lambda us: _init_jit(self.mt, us)

        self.bc_states = self._init_bc_mixed(self.U)
        self._mcs_fn_mixed = jax.jit(
            lambda us: jnp.maximum(
                *[jnp.max(mix.max_char_speed(u)) for u in us]
            )
        )

        if rc.dt_fixed > 0:
            self.dt = rc.dt_fixed
        else:
            mcs0 = float(self._mcs_fn_mixed(U_global))
            self.dt = rc.cfl * self.hmin / mcs0 / dim

        self._wall0 = _time.perf_counter()
        self._io = None
        self._history = None
        if rc.enable_restart or rc.restart_cycle:
            self.read_restart()

        # statistics per bucket (reference: Averaging engine)
        from ..io.averaging import Averaging

        self.averaging_b = [
            Averaging(start_iter=rc.avg_start_iter,
                      sample_interval=max(rc.avg_sample_interval, 1),
                      enabled=rc.avg_enabled)
            for _ in self.mt.buckets
        ]
        self._enable_paraview = bool(
            rc.raw.get("io/enableParaview", 0) if rc.raw is not None else 0
        )

    def _bucket_ic(self, xyz):
        rc = self.config
        mix = self.mixture
        if rc.ic.case == "isentropic_vortex":
            return mix.conservatives(isentropic_vortex(xyz, 0.0, mix))
        if rc.ic.case == "taylor_green_2d":
            return mix.conservatives(taylor_green_2d(xyz, mix))
        rho = rc.ic.rho
        vel = [rc.ic.rhoU / rho, rc.ic.rhoV / rho, rc.ic.rhoW / rho]
        T = rc.ic.pressure / (mix.gas_constant * rho)
        return mix.conservatives(
            uniform_state(xyz, mix, rho, vel, T)
        ).astype(self.dtype)

    def _make_bc(self, spec):
        if spec.kind == "interpolate":
            raise NotImplementedError("BC 'interpolate' on mixed meshes")
        return super()._make_bc(spec)

    def _patch_area(self, spec):
        """Quadrature area of a boundary patch across both buckets."""
        total = 0.0
        for tab in self.mt_np.buckets:
            attrs = np.asarray(tab.f_bdr_attr)
            sel = attrs == spec.patch
            nrm = np.linalg.norm(
                np.asarray(tab.f_nor[tab.nfi:])[sel], axis=-1)
            total += float(
                np.sum(np.asarray(tab.f_wts[tab.nfi:])[sel] * nrm))
        return total

    def state_global(self):
        """Per-bucket global states (owned rows gathered when sharded)."""
        import jax.numpy as jnp

        if self._smx is None:
            return self.U
        from ..parallel.partition import gather_state

        return tuple(
            jnp.asarray(gather_state(sb, np.asarray(u)), self.dtype)
            for sb, u in zip(self._smx.builds, self.U)
        )

    # ------------------------------------------------------------------
    def solve_step(self):
        import jax.numpy as jnp

        rc = self.config
        U2, self.bc_states, mcs = self._step_mixed(
            self.U, jnp.asarray(self.time, self.dtype),
            jnp.asarray(self.dt, self.dtype), self.bc_states,
        )
        self.U = U2
        self.time += self.dt
        self.iter += 1

        if any(avg.enabled for avg in self.averaging_b):
            for avg, U in zip(self.averaging_b, self.state_global()):
                if avg.enabled:
                    avg.add_sample(self.iter, self.mixture.primitives(U),
                                   self.mixture.nvel)

        self._post_step_services(mcs)

    def _restart_io_ready(self):
        return True  # self-contained h5 writer (no RestartIO instance)

    def solve_end(self):
        self._drain_mcs_queue(0)
        self.write_restart()
        if self._enable_paraview:
            self.visualization()

    # -- IO -----------------------------------------------------------------
    def _restart_path(self):
        import os as _os

        _os.makedirs(self.config.outdir, exist_ok=True)
        return _os.path.join(self.config.outdir, "restart_output.sol.h5")

    def write_restart(self):
        import h5py

        with h5py.File(self._restart_path(), "w") as f:
            f.attrs["iteration"] = self.iter
            f.attrs["time"] = float(self.time)
            f.attrs["dt"] = float(self.dt)
            f.attrs["order"] = self.config.order
            f.attrs["mixed"] = True
            for g, U in zip(self.mesh.geoms, self.state_global()):
                f.create_dataset(f"solution/{g}", data=np.asarray(U))

    def read_restart(self):
        import os as _os

        import h5py
        import jax.numpy as jnp

        path = self._restart_path()
        if not _os.path.exists(path):
            raise FileNotFoundError(f"restart file not found: {path}")
        with h5py.File(path) as f:
            self.iter = int(f.attrs["iteration"])
            self.time = float(f.attrs["time"])
            self.dt = float(f.attrs["dt"])
            us = []
            for g, tab in zip(self.mesh.geoms, self.mt_np.buckets):
                arr = np.asarray(f[f"solution/{g}"])
                if arr.shape[0] != tab.ne:
                    raise ValueError(
                        f"restart mesh mismatch: bucket {g} has {arr.shape[0]}"
                        f" elements, expected {tab.ne}")
                us.append(jnp.asarray(arr, self.dtype))
        if self._smx is not None:
            from ..parallel.partition import scatter_state

            us = [jnp.asarray(scatter_state(sb, np.asarray(u)), self.dtype)
                  for sb, u in zip(self._smx.builds, us)]
        self.U = tuple(us)
        if getattr(self, "bc_states", None) is not None:
            # re-seed characteristic ghosts from the restored state
            self.bc_states = self._init_bc_mixed(self.U)

    def check_nan(self, verbose=False) -> int:
        bad = sum(int(np.sum(~np.isfinite(np.asarray(U))))
                  for U in self.state_global())
        if verbose and bad:
            print(f"found {bad} non-finite state entries across buckets")
        return bad

    def visualization(self):
        import os as _os

        import jax.numpy as jnp

        from ..io.visualization import write_vtk_dg

        mix = self.mixture
        _os.makedirs(self.config.outdir, exist_ok=True)
        paths = []
        for g, part, tab, U in zip(self.mesh.geoms, self.mesh.parts,
                                   self.mt_np.buckets, self.state_global()):
            Up = mix.primitives(jnp.asarray(U))
            fields = {
                "density": np.asarray(Up[..., 0]),
                "velocity": np.asarray(Up[..., 1 : 1 + mix.nvel]),
                "temperature": np.asarray(Up[..., mix.i_th]),
                "pressure": np.asarray(mix.pressure(jnp.asarray(U))),
            }
            path = _os.path.join(
                self.config.outdir, f"solution_{g}_{self.iter:08d}.vtk"
            )
            write_vtk_dg(path, tab, fields, mesh=part)
            paths.append(path)
        return paths

    # -- interop: not wired for mixed meshes --------------------------------
    def init_interface(self, interface):
        raise NotImplementedError("Tps2Boltzmann bus on mixed meshes")
