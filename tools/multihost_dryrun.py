#!/usr/bin/env python3
"""Multi-host (DCN) dryrun: one process of an N-process jax
multi-controller run with V virtual CPU devices each.

    python tools/multihost_dryrun.py <coordinator> <num_processes> \
        <process_id> <local_devices>

Every process executes the same program (the reference's mpirun model,
src/tps.cpp:72-74): initialize the runtime, build the 2-D
[dcn, dd] mesh and the flat process-spanning `dd` mesh, run a psum
sanity and one full sharded compressible DG step whose element shards
span both hosts. Prints MULTIHOST_OK on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid, nloc = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]))
    from tps_tpu.parallel.comm import (
        flat_multi_host_devices,
        init_multi_host,
        multi_host_mesh,
    )

    init_multi_host(coord, nproc, pid, local_device_count=nloc)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    ndev = nproc * nloc
    assert len(jax.devices()) == ndev, (len(jax.devices()), ndev)

    # psum sanity over both mesh axes (DCN outer, ICI inner)
    mesh2 = multi_host_mesh()
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from functools import partial

    @jax.jit
    @partial(shard_map, mesh=mesh2, in_specs=P("dcn", "dd"),
             out_specs=P())
    def total(x):
        return jax.lax.psum(jax.lax.psum(jnp.sum(x), "dd"), "dcn")

    x = np.arange(ndev * 4.0).reshape(nproc, nloc * 4)
    t = float(total(x))
    assert abs(t - x.sum()) < 1e-9, (t, x.sum())

    # one sharded DG step over the flat process-spanning `dd` axis:
    # contiguous element blocks land per device, process-major, so most
    # halo faces stay on-host (ICI)
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.parallel.partition import build_sharded_tables
    from tps_tpu.parallel.sharding import device_mesh, make_sharded_step
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.physics.transport import DryAirTransport
    from tps_tpu.time.integrators import rk4
    from tps_tpu.utils.cases import isentropic_vortex

    dtype = jnp.float32
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(4 * ndev, 4, x1=10.0, y1=4.0,
                  periodic_x=True, periodic_y=True)
    build = build_sharded_tables(mesh, order=2, nparts=ndev)
    tab = build.tables.to_jax(dtype)
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant, mix.specific_heat_ratio),
        eq_system="navier-stokes",
    )
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    jm = device_mesh(ndev, devices=flat_multi_host_devices())
    step = make_sharded_step(ctx, tab, rk4, jm)

    xyz = np.asarray(build.tables.xyz_dof)
    Up0 = isentropic_vortex(jnp.asarray(xyz, dtype), 0.0, mix)
    U0 = mix.conservatives(Up0)
    U1, mcs = step(tab, U0, jnp.asarray(0.0, dtype), jnp.asarray(1e-3, dtype))
    assert bool(jnp.isfinite(mcs)), "non-finite wave speed"
    # only this process's shards are addressable; check them
    for sh in U1.addressable_shards:
        assert bool(jnp.all(jnp.isfinite(sh.data))), "non-finite local shard"
    print(f"MULTIHOST_OK pid={pid} devices={ndev} mcs={float(mcs):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
