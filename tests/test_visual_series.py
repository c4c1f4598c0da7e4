"""--visual snapshot-series postprocess mode.

Reference: `tps --visual` with [post-process/visualization] re-reads
archived restart snapshots startIter..endIter, recomputes derived fields
per snapshot, reports the MMS solution error when enabled, and saves one
visualization dump per snapshot (M2ulPhyS::visualization,
src/M2ulPhyS.cpp:4073-4154; ini keys parsed at :3759-3766).
"""

import os

import numpy as np
import pytest

from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)

VORTEX = open(os.path.join(HERE, "inputs", "vortex2d.ini")).read()


def _build(ini_text, path, extra_args=()):
    with open(path, "w") as f:
        f.write(ini_text)
    tps = Tps()
    tps.parse_command_line_args(
        ["tps", "--runFile", str(path), "--device", "cpu", *extra_args])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    return tps


def test_visual_series_produces_vtk_per_snapshot(tmp_path):
    ini = VORTEX.replace("outdirBase = /tmp/tps_tpu_test_output",
                         f"outdirBase = {tmp_path}/out")
    # 1) produce an archived snapshot series (the role of the user's
    #    checkpoint archive in the reference workflow)
    a = _build(ini, tmp_path / "run.ini")
    s = a.solver
    from tps_tpu.io.restart import RestartIO

    io = RestartIO(s.config, s)
    prefix = str(tmp_path / "snap")
    for k in range(5):
        if k:
            s.solve_step()
        if k % 2 == 0:
            io.write(s, path=f"{prefix}-{s.iter:08d}.h5")

    # 2) postprocess the series under --visual
    ini_pp = ini + f"""
[post-process/visualization]
prefix = {prefix}
start-iter = 0
end-iter = 4
frequency = 2
"""
    b = _build(ini_pp, tmp_path / "pp.ini", extra_args=("--visualization",))
    assert b.solver.config.postprocess == {
        "prefix": prefix, "start_iter": 0, "end_iter": 4, "freq": 2}
    paths = b.solver.visualization()
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p)
        txt = open(p).read()
        # per-snapshot derived fields: gradient-recomputed vorticity
        assert "vorticity" in txt
    # snapshot iteration/time flowed from the files into the dumps
    assert sorted(os.path.basename(p) for p in paths) == [
        "solution_00000000.vtk", "solution_00000002.vtk",
        "solution_00000004.vtk"]
    # the vortex spins: vorticity must be nonzero somewhere
    w = b.solver._vorticity_global()
    assert float(np.abs(w).max()) > 1e-3


def test_visual_series_reports_mms_error(tmp_path, capsys):
    ini = f"""
[solver]
type = flow
[flow]
order = 2
integrationRule = 1
basisType = 1
maxIters = 2
outputFreq = 100
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 6
ny = 6
x1 = 3.02
y1 = 3.02
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk4
[mms]
isEnabled = True
name = euler_2d
[io]
outdirBase = {tmp_path}/out
"""
    a = _build(ini, tmp_path / "run.ini")
    s = a.solver
    from tps_tpu.io.restart import RestartIO

    io = RestartIO(s.config, s)
    prefix = str(tmp_path / "snap")
    io.write(s, path=f"{prefix}-{s.iter:08d}.h5")

    ini_pp = ini + f"""
[post-process/visualization]
prefix = {prefix}
start-iter = 0
end-iter = 0
frequency = 1
"""
    b = _build(ini_pp, tmp_path / "pp.ini", extra_args=("--visualization",))
    paths = b.solver.visualization()
    assert len(paths) == 1
    out = capsys.readouterr().out
    assert "L2 solution error" in out
    # the snapshot IS the projected exact state: interpolation-level error
    err = float(out.split("L2 solution error =")[1].split()[0])
    assert err < 1e-8


def test_visual_series_missing_snapshot_raises(tmp_path):
    ini = VORTEX.replace("outdirBase = /tmp/tps_tpu_test_output",
                         f"outdirBase = {tmp_path}/out")
    ini += f"""
[post-process/visualization]
prefix = {tmp_path}/nothere
start-iter = 0
end-iter = 0
frequency = 1
"""
    b = _build(ini, tmp_path / "pp.ini", extra_args=("--visualization",))
    with pytest.raises(FileNotFoundError):
        b.solver.visualization()
