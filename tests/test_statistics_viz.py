"""Statistics engine, history file, and ParaView output tests."""

import os

import jax.numpy as jnp
import numpy as np

from tps_tpu.harness import Tps
from tps_tpu.io.averaging import Averaging

HERE = os.path.dirname(__file__)


def test_averaging_mean_and_reynolds():
    avg = Averaging(start_iter=0, sample_interval=1)
    rng = np.random.RandomState(0)
    samples = [jnp.asarray(rng.randn(4, 5, 4)) for _ in range(20)]
    for i, s in enumerate(samples):
        avg.add_sample(i, s, nvel=2)
    stack = np.stack([np.asarray(s) for s in samples])
    mean_np = stack.mean(axis=0)
    assert np.allclose(np.asarray(avg.mean()), mean_np, atol=1e-12)
    # Reynolds stress = <u'v'>
    vel = stack[..., 1:3]
    uv = (vel[..., 0] * vel[..., 1]).mean(axis=0) - vel[..., 0].mean(0) * vel[
        ..., 1
    ].mean(0)
    rey = np.asarray(avg.reynolds_stresses(2))
    assert np.allclose(rey[..., 1], uv, atol=1e-12)


def test_history_and_viz_through_harness(tmp_path):
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "vortex2d.ini")
    tps.parse_input()
    tps.config.outdir = str(tmp_path)
    tps.config.raw.values["io/enableHistory"] = "1"
    tps.config.raw.values["io/enableParaview"] = "1"
    tps.config.avg_enabled = True
    tps.config.avg_start_iter = 1
    tps.config.avg_sample_interval = 1
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    s = tps.solver
    assert s.averaging.n_samples >= 4

    hist = tmp_path / "history.hist"
    assert hist.exists()
    lines = hist.read_text().strip().splitlines()
    assert lines[0].startswith("iter,time")
    assert len(lines) == 1 + s.iter

    vtks = list(tmp_path.glob("solution_*.vtk"))
    assert len(vtks) == 1
    txt = vtks[0].read_text()
    assert "DATASET UNSTRUCTURED_GRID" in txt
    assert "SCALARS density" in txt
    assert "VECTORS velocity" in txt
    assert "VECTORS mean_velocity" in txt


def test_pfield_interpolate_cli(tmp_path):
    """Checkpoint transfer between meshes (utils/pfield_interpolate role)."""
    import subprocess
    import sys

    import h5py

    src_ini = tmp_path / "src.ini"
    dst_ini = tmp_path / "dst.ini"
    base = """
[solver]
type = flow
[flow]
order = 2
maxIters = 2
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = %d
ny = %d
x1 = 10.0
y1 = 10.0
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.12
integrator = rk4
[initialConditions]
case = isentropic_vortex
[io]
outdirBase = %s
"""
    src_ini.write_text(base % (8, 8, tmp_path / "src_out"))
    dst_ini.write_text(base % (12, 12, tmp_path / "dst_out"))

    import tps_tpu
    repo = os.path.dirname(os.path.dirname(tps_tpu.__file__))
    r = subprocess.run(
        [sys.executable, "-m", "tps_tpu.harness", "-run", str(src_ini), "--device", "cpu"],
        cwd=repo,
    )
    assert r.returncode == 0
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "pfield_interpolate.py"),
         str(src_ini), str(dst_ini), "--device", "cpu"],
        cwd=repo,
    )
    assert r.returncode == 0
    with h5py.File(tmp_path / "dst_out" / "restart_output.sol.h5") as f:
        rho = f["solution/density"][:]
    assert rho.shape[0] == 12 * 12 * 9  # ne * ndof at p=2
    import numpy as np
    assert np.isfinite(rho).all() and rho.min() > 0.3 and rho.max() < 1.1


def test_lomach_averaging_dissipation_and_restart(tmp_path):
    """loMach statistics parity (reference: Averaging registration in
    Tomboulides::initializeStats, src/tomboulides.cpp:1412-1450): the
    time-averaged DISSIPATION of the fluctuating velocity rides the
    sample vector, means/RMS appear in the VTK dump, and the running
    statistics are restartable fields."""
    from tps_tpu.harness import Tps

    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 6
x1 = 6.283185307179586
y1 = 6.283185307179586
periodic_x = 1
periodic_y = 1
[loMach]
flow-solver = tomboulides
thermo-solver = constant-property
order = 2
maxIters = 6
outputFreq = 6
[loMach/constprop]
rho = 1.0
mu = 0.01
[loMach/tomboulides]
ic = tgv2d
[averaging]
startIter = 1
sampleFreq = 1
[time]
dt_fixed = 1e-3
[io]
outdirBase = {tmp_path}/out
""")
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    s = tps.solver
    assert s.averaging.n_samples >= 5
    dim = s.tab.dim
    mu = np.asarray(s.averaging.mean_up)
    assert mu.shape[-1] == dim + 3  # rho, u, T, dissipation
    eps_mean = mu[:, 2 + dim]
    assert np.isfinite(eps_mean).all() and (eps_mean >= -1e-14).all()
    assert eps_mean.max() > 0  # TGV shear dissipates

    path = s.visualization()
    txt = open(path).read()
    assert "mean_dissipation" in txt and "reynolds_stress" in txt

    # statistics survive a restart
    tps2 = Tps()
    tps2.input_file = str(ini)
    tps2.parse_input()
    tps2.config.raw.values["io/enableRestart"] = "1"
    tps2.config.raw.values["loMach/maxIters"] = "8"
    tps2.choose_devices()
    tps2.choose_solver()
    tps2.initialize()
    s2 = tps2.solver
    assert s2.averaging.n_samples == s.averaging.n_samples
    assert np.allclose(np.asarray(s2.averaging.mean_up), mu)
    tps2.solve()
    assert s2.averaging.n_samples > s.averaging.n_samples
