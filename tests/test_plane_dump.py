"""[planeDump] plane-sampled ASCII dumps through the production front door
(reference: parsePlaneDump src/M2ulPhyS.cpp:2811-2832; dump loop at
:2052-2096 writes ./planeData/plane<iter>.txt every outputFreq via gslib
plane interpolation), plus the GRVY-analog hierarchical timer summary
emitted at solver teardown (grvy_timer_summarize, src/M2ulPhyS.cpp:1623).
"""

import glob
import os

import numpy as np
import pytest

from tps_tpu.harness import main

HERE = os.path.dirname(__file__)


def _flow_deck(tmp_path, plane_section):
    return f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 4
outputFreq = 2
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 4
ny = 4
x1 = 10.0
y1 = 10.0
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk2
[initialConditions]
case = isentropic_vortex
[io]
outdirBase = {tmp_path}/out
{plane_section}
"""


def _run(tmp_path, text):
    ini = tmp_path / "deck.ini"
    ini.write_text(text)
    return main(["tps", "--runFile", str(ini)])


def test_plane_dump_primitive(tmp_path, capsys):
    status = _run(tmp_path, _flow_deck(tmp_path, """
[planeDump]
isEnabled = True
norm = 1.0 0.0 0.0
point = 5.0 5.0 0.0
samples = 12
primitive = True
"""))
    assert status == 0
    files = sorted(glob.glob(str(tmp_path / "out" / "planeData" / "plane*.txt")))
    # outputFreq=2, maxIters=4 -> dumps at iter 2 and 4
    names = [os.path.basename(f) for f in files]
    assert "plane2.txt" in names and "plane4.txt" in names
    with open(files[-1]) as f:
        header = f.readline()
        assert header.startswith("# iter")
        cols = f.readline().strip().split(",")
    # 2-D primitive state: x, y then rho, u, v, p columns
    assert cols[:2] == ["x", "y"]
    assert len(cols) == 2 + 4
    data = np.genfromtxt(files[-1], delimiter=",", skip_header=2)
    assert data.shape == (12, 6)
    assert np.isfinite(data).all()
    # samples on the plane x=5 inside the domain carry physical density
    inside = (data[:, 1] >= 0.0) & (data[:, 1] <= 10.0)
    assert inside.any()
    assert (data[inside, 2] > 0.1).all()
    # teardown timer summary (grvy_timer_summarize analog)
    outtext = capsys.readouterr().out
    assert "timer summary" in outtext
    assert "io/planeDump" in outtext


def test_plane_dump_conserved(tmp_path):
    status = _run(tmp_path, _flow_deck(tmp_path, """
[planeDump]
isEnabled = True
norm = 0.0 1.0 0.0
point = 5.0 5.0 0.0
samples = 8
conserved = True
"""))
    assert status == 0
    files = glob.glob(str(tmp_path / "out" / "planeData" / "plane*.txt"))
    assert files
    data = np.genfromtxt(files[0], delimiter=",", skip_header=2)
    assert data.shape == (8, 6)  # x, y + 4 conserved
    assert np.isfinite(data).all()


def test_plane_dump_requires_one_kind(tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        _run(tmp_path, _flow_deck(tmp_path, """
[planeDump]
isEnabled = True
norm = 1.0 0.0 0.0
point = 5.0 5.0 0.0
samples = 4
conserved = True
primitive = True
"""))
