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
