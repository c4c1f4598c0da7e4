"""shard_map plumbing: one SPMD program over a jax device mesh.

Couples the stacked per-shard tables from `partition.build_sharded_tables`
to `dg.rhs.compute_rhs` running under `jax.shard_map` with a 1-D domain-
decomposition mesh axis ("dd").  Scales the element dimension the way the
reference scales over MPI ranks (SURVEY.md §2.6), but with XLA collectives
on ICI instead of MPI.
"""

from __future__ import annotations

from dataclasses import fields, replace
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import PartitionSpec as P

from ..dg.discretization import DGTables
from ..dg.rhs import compute_rhs
from .partition import SHARED_FIELDS

_META = ("dim", "order", "ne", "ndof", "nq", "nlf", "nqf", "nfi", "nfb",
         "n_combo", "roll_info")

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def device_mesh(n: int | None = None, axis: str = "dd", backend: str | None = None,
                devices=None) -> JaxMesh:
    """1-D device mesh with `n` devices.  Falls back to the host CPU backend
    when the default backend has too few devices (virtual-device testing).
    `devices` restricts the mesh to an explicit subset (split-communicator
    analog, parallel.comm.DeviceGroup)."""
    if devices is not None:
        devs = list(devices)
    else:
        devs = jax.devices(backend) if backend else jax.devices()
        if n is not None and len(devs) < n and backend is None:
            devs = jax.devices("cpu")
    if n is not None:
        if len(devs) < n:
            raise ValueError(f"need {n} devices, have {len(devs)}")
        devs = devs[:n]
    return JaxMesh(np.array(devs), (axis,))


def tab_spec_tree(tab: DGTables, axis: str) -> DGTables:
    """DGTables-shaped tree of PartitionSpecs: shared fields replicated,
    per-shard fields split along the leading shard axis."""
    kw = {}
    for f in fields(DGTables):
        v = getattr(tab, f.name)
        if f.name in _META:
            kw[f.name] = v
        elif v is None:
            kw[f.name] = None
        elif f.name in SHARED_FIELDS:
            kw[f.name] = P()
        else:
            kw[f.name] = P(axis)
    return kw["__class__"] if False else DGTables(**kw)


def localize_tables(tab: DGTables) -> DGTables:
    """Strip the size-1 shard axis that shard_map leaves on sharded fields."""
    kw = {}
    for f in fields(DGTables):
        v = getattr(tab, f.name)
        if f.name in _META or v is None or f.name in SHARED_FIELDS:
            kw[f.name] = v
        else:
            kw[f.name] = v[0]
    return DGTables(**kw)


def make_sharded_step(ctx, tab: DGTables, integrator, mesh: JaxMesh, axis: str = "dd"):
    """Build a jitted SPMD step: (tab_stacked, U_stacked, t, dt) ->
    (U_next_stacked, max_char_speed).

    `tab` must be the stacked (to_jax-converted) tables; `ctx` any RHSContext
    (its axis_name is overridden).
    """
    ctx = replace(ctx, axis_name=axis)
    specs = tab_spec_tree(tab, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs, P(axis), P(), P()),
        out_specs=(P(axis), P()),
    )
    def _step(tab_s, U_s, t, dt):
        tl = localize_tables(tab_s)
        U = U_s[0]
        rhs = lambda u, tt: compute_rhs(ctx, tl, u, tt)
        U_next, aux = integrator(rhs, U, t, dt)
        return U_next[None], aux["max_char_speed"]

    return jax.jit(_step)


def make_sharded_rhs(ctx, tab: DGTables, mesh: JaxMesh, axis: str = "dd"):
    """Jitted SPMD single RHS evaluation (for tests/diagnostics)."""
    ctx = replace(ctx, axis_name=axis)
    specs = tab_spec_tree(tab, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs, P(axis)),
        out_specs=(P(axis), P()),
    )
    def _rhs(tab_s, U_s):
        tl = localize_tables(tab_s)
        y, aux = compute_rhs(ctx, tl, U_s[0])
        return y[None], aux["max_char_speed"]

    return jax.jit(_rhs)
