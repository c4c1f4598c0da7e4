"""Split-communicator analog: two Tps instances on disjoint device groups
(reference: Tps(MPI_Comm) src/tps.cpp:72, test/test_tps_splitcomm.py,
test/cyl3d.python.splitcomm.test)."""

import os

import numpy as np

from tps_tpu.harness import Tps
from tps_tpu.parallel.comm import DeviceGroup

HERE = os.path.dirname(__file__)


def _channel_ini(outdir, partitions):
    return f"""
[solver]
type = flow
[flow]
order = 2
maxIters = 3
outputFreq = 100
fluid = dry_air
equation_system = navier-stokes
[mesh]
generator = box2d
nx = 8
ny = 4
x1 = 1.0
y1 = 0.2
partitions = {partitions}
[time]
cfl = 0.12
integrator = rk3
[initialConditions]
rho = 1.2
rhoU = 24.0
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/inlet1]
patch = 4
type = subsonic
density = 1.2
uvw = '20 0 0'
[boundaryConditions/outlet1]
patch = 2
type = subsonicPressure
pressure = 101300
[boundaryConditions/wall1]
patch = 1
type = viscous_isothermal
temperature = 300
[boundaryConditions/wall2]
patch = 3
type = viscous_isothermal
temperature = 300
[boundaryConditions]
numWalls = 2
numInlets = 1
numOutlets = 1
[io]
outdirBase = {outdir}
"""


def _make(tmp_path, name, group, partitions):
    out = str(tmp_path / name)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "run.ini")
    with open(path, "w") as f:
        f.write(_channel_ini(out, partitions))
    tps = Tps(comm=group)
    tps.parse_command_line_args(["tps", "--runFile", path, "--device", "cpu"])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    return tps


def test_device_group_split():
    g0 = DeviceGroup.split(2, 0, backend="cpu")
    g1 = DeviceGroup.split(2, 1, backend="cpu")
    assert g0.size + g1.size == DeviceGroup.world("cpu").size
    assert not set(d.id for d in g0.devices) & set(d.id for d in g1.devices)


def test_two_instances_on_disjoint_device_groups(tmp_path):
    """Two sharded flow instances stepped side by side, each confined to
    its own half of the device list; results match an unsplit run."""
    g0 = DeviceGroup.split(2, 0, backend="cpu")
    g1 = DeviceGroup.split(2, 1, backend="cpu")

    tA = _make(tmp_path, "a", g0, partitions=g0.size)
    tB = _make(tmp_path, "b", g1, partitions=g1.size)

    # the instances' device meshes are disjoint
    dA = set(d.id for d in tA.solver._jmesh.devices.flatten())
    dB = set(d.id for d in tB.solver._jmesh.devices.flatten())
    assert dA and dB and not (dA & dB)

    # interleaved stepping (the reference splitcomm test drives both
    # instances from one Python loop)
    for _ in range(3):
        tA.solve_step()
        tB.solve_step()

    # reference run without a device group
    tR = _make(tmp_path, "r", None, partitions=1)
    for _ in range(3):
        tR.solve_step()

    UR = tR.solver.state_global()
    np.testing.assert_allclose(tA.solver.state_global(), UR, rtol=0, atol=0)
    np.testing.assert_allclose(tB.solver.state_global(), UR, rtol=0, atol=0)
