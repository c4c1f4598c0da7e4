"""Split-communicator analog: device groups.

The reference Tps accepts an arbitrary MPI communicator so Python drivers
can run several solver instances on disjoint rank subsets in one job
(reference: src/tps.cpp:72 Tps(MPI_Comm), test/test_tps_splitcomm.py,
test/cyl3d.python.splitcomm.test).  The TPU-native analog is a subset of
the jax device list: each Tps instance's device meshes (DG domain
decomposition, element-sharded H1 assembly) are built over its group's
devices only, so two instances can run side by side without contending
for the same chips.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DeviceGroup:
    """A subset of jax devices for one solver instance."""

    devices: tuple

    @property
    def size(self) -> int:
        return len(self.devices)

    @classmethod
    def world(cls, backend=None) -> "DeviceGroup":
        import jax

        return cls(tuple(jax.devices(backend)))

    @classmethod
    def split(cls, n_groups: int, color: int, backend=None) -> "DeviceGroup":
        """MPI_Comm_split analog: partition the device list into n_groups
        contiguous blocks and return block `color`."""
        import jax

        devs = jax.devices(backend)
        n = len(devs)
        if n_groups > n:
            raise ValueError(f"cannot split {n} devices into {n_groups} groups")
        lo = (color * n) // n_groups
        hi = ((color + 1) * n) // n_groups
        return cls(tuple(devs[lo:hi]))


# ---------------------------------------------------------------------------
# Multi-host (DCN) backend
#
# The reference scales across nodes with MPI (src/tps.cpp:72-74,200-239).
# The TPU-native analog is jax's multi-controller runtime: every host runs
# the SAME program (python -m tps_tpu --runFile deck --coordinator ...),
# jax.distributed.initialize glues the processes, and jax.devices() then
# spans all hosts.  Device meshes built over the global device list make
# shard_map programs span hosts transparently — XLA routes the collective
# legs crossing processes over DCN and the on-host legs over ICI.  Inputs
# passed as identical host (numpy) arrays on every process are treated as
# replicated, which is exactly how the solver feeds its static tables.


def init_multi_host(coordinator_address, num_processes, process_id,
                    local_device_count=None):
    """Initialize the multi-controller runtime (reference: MPI_Init /
    MPI_Session in Tps::Tps, src/tps.cpp:72-74).

    Call ONCE per process before any jax array op.  `local_device_count`
    forces N virtual CPU devices per process (testing without hardware)."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )


def multi_host_mesh(axis_dcn="dcn", axis_ici="dd"):
    """2-D global device mesh [n_processes, local_devices]: the outer axis
    crosses hosts (collectives ride DCN), the inner axis stays on-host
    (ICI).  Lay coarse domain blocks over `dcn` and fine blocks over `dd`
    so halo traffic stays on ICI (SURVEY.md 2.6 TPU-native equivalent of
    the reference's multi-node MPI decomposition)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nproc = max(d.process_index for d in devs) + 1
    per = len(devs) // nproc
    arr = np.array(devs[: nproc * per]).reshape(nproc, per)
    return Mesh(arr, (axis_dcn, axis_ici))


def flat_multi_host_devices():
    """Global device list ordered process-major: the 1-D `dd` domain axis
    over all hosts (contiguous element blocks land on one host, so most
    halo faces stay on ICI)."""
    import jax

    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
