"""Restartable statistics (mean/RMS) + golden-solution comparison.

The reference makes the Averaging fields restartable IO families
(/meanSolution, /rmsData with attr samplesMean — src/M2ulPhyS.cpp:640-680,
src/io.cpp:66-132) and pins regressions with h5diff per-field tolerances
(test/soln_differ).  These tests cover both analogs.
"""

import os
import subprocess
import sys

import numpy as np

from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)

VORTEX_AVG = """
[solver]
type = flow
[flow]
order = 2
integrationRule = 0
basisType = 0
maxIters = {maxiters}
outputFreq = 100
useRoe = 0
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 6
ny = 6
x1 = 10.0
y1 = 10.0
periodic_x = 1
periodic_y = 1
{mesh_extra}
[time]
cfl = 0.12
integrator = rk4
[averaging]
startIter = 1
sampleFreq = 1
enableContinuation = 1
[io]
outdirBase = {outdir}
enableRestart = {restart}
"""


def _run_vortex(tmp_path, max_iters, restart=0, mesh_extra=""):
    os.makedirs(tmp_path, exist_ok=True)
    ini = tmp_path / f"run_{max_iters}_{restart}.ini"
    ini.write_text(
        VORTEX_AVG.format(maxiters=max_iters, outdir=tmp_path,
                          restart=restart, mesh_extra=mesh_extra)
    )
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    return tps.solver


def test_averaging_restart_continuation(tmp_path):
    """Checkpoint at iter 3, restart, continue to 6: the running mean and
    Reynolds stresses match an uninterrupted 6-iter run (the reference's
    restartable-statistics behavior)."""
    s_a = _run_vortex(tmp_path / "a", 3)
    assert s_a.averaging.n_samples == 3  # iters 1,2,3 sampled

    ckpt = tmp_path / "a" / "restart_output.sol.h5"
    assert ckpt.exists()
    import h5py

    with h5py.File(ckpt, "r") as f:
        assert int(f.attrs["samplesMean"]) == 3
        assert "meanDens" in f["meanSolution"]
        assert {"uu", "uv", "vv"} <= set(f["rmsData"])

    s_b = _run_vortex(tmp_path / "a", 6, restart=1)
    s_c = _run_vortex(tmp_path / "c", 6)
    assert s_b.averaging.n_samples == s_c.averaging.n_samples == 6
    np.testing.assert_allclose(
        np.asarray(s_b.averaging.mean()), np.asarray(s_c.averaging.mean()),
        rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(s_b.averaging.reynolds_stresses(2)),
        np.asarray(s_c.averaging.reynolds_stresses(2)),
        rtol=0, atol=1e-12,
    )


def test_averaging_restores_reference_dataset_spellings(tmp_path):
    """VERDICT r4 item 10: a reference-written checkpoint stores the mean
    temperature primitive under its legacy name ('mean-p' in 2-D,
    'mean-E' in 3-D) and species number densities under 'mean-Y<sp>'
    (src/M2ulPhyS.cpp:642-661).  Rewriting our checkpoint with those
    spellings must restore the accumulated statistics via the alias map
    instead of dropping them."""
    import h5py

    s_a = _run_vortex(tmp_path / "a", 3)
    mean_ref = np.asarray(s_a.averaging.mean()).copy()
    ckpt = tmp_path / "a" / "restart_output.sol.h5"
    with h5py.File(ckpt, "r+") as f:
        g = f["meanSolution"]
        data = np.asarray(g["mean-T"])
        del g["mean-T"]
        g["mean-p"] = data  # the reference's 2-D spelling of Up[iTh]

    s_b = _run_vortex(tmp_path / "a", 3, restart=1)  # restart AT iter 3
    assert s_b.averaging.n_samples == 3
    np.testing.assert_allclose(
        np.asarray(s_b.averaging.mean()), mean_ref, rtol=0, atol=1e-13,
    )


def test_averaging_survives_shard_count_change(tmp_path):
    """Statistics written from a 2-shard run restore into a single-shard
    run (per-shard /meanSolution + /rmsData ride the loc_to_glob_elem
    maps like the solution does)."""
    s_sh = _run_vortex(tmp_path, 3, mesh_extra="partitions = 2")
    assert s_sh.averaging.n_samples == 3
    mean_g = s_sh.field_global(np.asarray(s_sh.averaging.mean()))
    assert (tmp_path / "restart_output.sol.0.h5").exists()

    s_one = _run_vortex(tmp_path, 3, restart=1)  # restarts AT iter 3
    assert s_one.averaging.n_samples == 3
    np.testing.assert_allclose(
        np.asarray(s_one.averaging.mean()), mean_g, rtol=0, atol=1e-13,
    )


def _soln_differ(args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soln_differ.py")]
        + args, capture_output=True, text=True, cwd=REPO,
    )


def test_soln_differ_tool(tmp_path):
    """tools/soln_differ.py: identical checkpoints pass, a perturbation
    beyond tolerance fails with the offending dataset reported."""
    _run_vortex(tmp_path, 2)
    ckpt = str(tmp_path / "restart_output.sol.h5")
    import shutil

    pert = str(tmp_path / "perturbed.h5")
    shutil.copy(ckpt, pert)
    r = _soln_differ(["-d", "2", "-a", ckpt, ckpt])
    assert r.returncode == 0, r.stdout + r.stderr
    import h5py

    with h5py.File(pert, "r+") as f:
        d = f["solution/density"]
        d[0] = d[0] + 1e-9
    r = _soln_differ(["-d", "2", ckpt, pert])
    assert r.returncode == 1
    assert "density" in r.stdout


def test_golden_argon_regression(tmp_path):
    """Run the ternary argon plasma deck and compare (incl. species
    densities, soln_differ -s) against the committed golden — the role of
    the reference's argon_minimal.binary/ternary regression tests."""
    golden = os.path.join(HERE, "ref_solns", "argon_minimal.4iters.h5")
    assert os.path.exists(golden), "golden checkpoint missing"
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "argon_minimal.ini")
    tps.parse_input()
    tps.config.outdir = str(tmp_path)
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    ckpt = str(tmp_path / "restart_output.sol.h5")
    r = _soln_differ(
        ["-d", "2", "-s", "-t", "2e-10", "-u", "2e-8", "-e", "1e-11",
         "-y", "1e-9", "-r", ckpt, golden]
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_golden_vortex_regression(tmp_path):
    """Run the committed vortex deck and compare against the committed
    golden checkpoint within the reference's soln_differ tolerances
    (abs 2e-13 on rho, 2e-11 on momenta, rel 1e-14 on rho-E scaled up
    ~1e3 for cross-XLA-version reproducibility headroom)."""
    golden = os.path.join(HERE, "ref_solns", "vortex2d.5iters.h5")
    assert os.path.exists(golden), "golden checkpoint missing"
    s = _run_vortex(tmp_path, 5)
    ckpt = str(tmp_path / "restart_output.sol.h5")
    r = _soln_differ(
        ["-d", "2", "-t", "2e-10", "-u", "2e-8", "-e", "1e-11", "-r",
         ckpt, golden]
    )
    assert r.returncode == 0, r.stdout + r.stderr
