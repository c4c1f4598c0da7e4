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
