"""Domain decomposition: N-shard results must match single-device bitwise
(the analog of the reference's multi-rank vs serial restart comparisons,
test/cyl3d.test:115-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_2d
from tps_tpu.parallel.partition import build_sharded_tables, gather_state, scatter_state
from tps_tpu.parallel.sharding import device_mesh, make_sharded_rhs, make_sharded_step
from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.transport import DryAirTransport
from tps_tpu.time.integrators import rk4
from tps_tpu.utils.cases import isentropic_vortex


def _setup(eq_system="euler"):
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(8, 8, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
    tr = DryAirTransport(mix.gas_constant, mix.specific_heat_ratio) if eq_system != "euler" else None
    fl = Fluxes(mixture=mix, transport=tr, eq_system=eq_system)
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    return mix, mesh, ctx


@pytest.mark.parametrize("nparts", [2, 8])
@pytest.mark.parametrize("eq_system", ["euler", "navier-stokes"])
def test_sharded_rhs_matches_single(nparts, eq_system):
    mix, mesh, ctx = _setup(eq_system)
    tab1 = build_tables(mesh, order=2).to_jax(jnp.float64)
    U = mix.conservatives(isentropic_vortex(tab1.xyz_dof, 0.0, mix))
    y1, aux1 = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab1, U)

    build = build_sharded_tables(mesh, order=2, nparts=nparts)
    tabN = build.tables.to_jax(jnp.float64)
    UN = jnp.asarray(scatter_state(build, np.asarray(U)))
    jm = device_mesh(nparts)
    yN, mcsN = make_sharded_rhs(ctx, tabN, jm)(tabN, UN)
    yNg = gather_state(build, np.asarray(yN))
    assert float(np.abs(yNg - np.asarray(y1)).max()) < 1e-12
    assert abs(float(mcsN) - float(aux1["max_char_speed"])) < 1e-12


def test_sharded_step_matches_single():
    mix, mesh, ctx = _setup()
    tab1 = build_tables(mesh, order=2).to_jax(jnp.float64)
    U = mix.conservatives(isentropic_vortex(tab1.xyz_dof, 0.0, mix))
    step1 = jax.jit(
        lambda t, u: rk4(lambda uu, tt: compute_rhs(ctx, t, uu), u, 0.0, 0.01)[0]
    )
    U1 = step1(tab1, U)

    build = build_sharded_tables(mesh, order=2, nparts=8)
    tabN = build.tables.to_jax(jnp.float64)
    UN = jnp.asarray(scatter_state(build, np.asarray(U)))
    jm = device_mesh(8)
    UN1, _ = make_sharded_step(ctx, tabN, rk4, jm)(
        tabN, UN, jnp.asarray(0.0), jnp.asarray(0.01)
    )
    UNg = gather_state(build, np.asarray(UN1))
    assert float(np.abs(UNg - np.asarray(U1)).max()) < 1e-12


def test_partition_persistence(tmp_path):
    """Partition save/load roundtrip (reference partition.Np.h5 role)."""
    from tps_tpu.parallel.partition import (
        coordinate_partition,
        load_partition,
        save_partition,
    )

    mesh = box_2d(8, 8)
    part = coordinate_partition(mesh, 4)
    path = tmp_path / "partition.4p.h5"
    save_partition(path, part, 4)
    back = load_partition(path, expected_ne=mesh.num_elements,
                          expected_nparts=4)
    assert np.array_equal(back, part)
    # reusing the persisted partition reproduces identical sharded tables
    b1 = build_sharded_tables(mesh, order=1, nparts=4, partition=part)
    b2 = build_sharded_tables(mesh, order=1, nparts=4, partition=back)
    assert np.array_equal(b1.tables.global_ids, b2.tables.global_ids)
    try:
        load_partition(path, expected_nparts=8)
    except ValueError:
        pass
    else:
        raise AssertionError("expected nparts mismatch error")
