"""Harness lifecycle tests: CLI-style runs over ini inputs + restart
roundtrip (the role of the reference's bats regression drivers,
test/cyl3d.test)."""

import os

import numpy as np
import pytest

from tps_tpu.config.ini import IniInput
from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)


def _run(ini, max_iters=None):
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", ini)
    tps.parse_input()
    if max_iters is not None:
        tps.config.max_iters = max_iters
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    return tps


def test_ini_parser():
    text = """
[flow]
order = 3            # comment
mesh = meshes/x.msh
[boundaryConditions/inlet1]
patch = 1
uvw = '20 0 0'
[boundaryConditions]
numInlets = 1
"""
    inp = IniInput.parse(text)
    assert inp.get("flow/order", 1) == 3
    assert inp.get("flow/mesh") == "meshes/x.msh"
    assert inp.get_vec("boundaryConditions/inlet1/uvw") == [20.0, 0.0, 0.0]
    assert inp.sections_under("boundaryConditions") == ["inlet1"]
    assert inp.get("flow/missing", 7) == 7


def _total_mass(solver):
    tab = solver.tables_np
    U = np.asarray(solver.U)
    rq = np.einsum("qd,nd->nq", tab.Bvol, U[..., 0])
    return float(np.einsum("q,nq,nq->", tab.wq, tab.detJ, rq))


def test_vortex_lifecycle():
    tps = _run("vortex2d.ini")
    solver = tps.solver
    U0_mass = _total_mass(solver)
    tps.solve()
    assert solver.iter == 5
    assert solver.time > 0
    assert solver.check_nan() == 0
    # DG + periodic BCs conserve total mass to roundoff
    U1_mass = _total_mass(solver)
    assert abs(U1_mass - U0_mass) / abs(U0_mass) < 1e-12
    assert tps.get_status() == 0


def test_channel_bcs_run():
    tps = _run("channel2d.ini")
    solver = tps.solver
    assert len(solver.bc_slices) == 4
    tps.solve()
    assert solver.iter == 4
    assert solver.check_nan() == 0
    Up = np.asarray(solver.primitives())
    assert Up[..., 0].min() > 0  # density positive
    assert 200 < Up[..., solver.mixture.i_th].mean() < 400


def test_restart_roundtrip(tmp_path):
    tps = _run("channel2d.ini", max_iters=2)
    tps.config.outdir = str(tmp_path)
    tps.solve()
    solver = tps.solver
    U_end = np.asarray(solver.U).copy()
    it_end, t_end = solver.iter, solver.time

    tps2 = _run("channel2d.ini")
    tps2.config.outdir = str(tmp_path)
    tps2.solver.read_restart()
    assert tps2.solver.iter == it_end
    assert abs(tps2.solver.time - t_end) < 1e-15
    assert np.array_equal(np.asarray(tps2.solver.U), U_end)


def test_cli_main(tmp_path, capsys):
    from tps_tpu.harness import main

    ini = os.path.join(HERE, "inputs", "vortex2d.ini")
    status = main(["tps-tpu", "--runFile", ini])
    assert status == 0
