"""Harness-level smoke tests: every registered solver type must run
end-to-end through the production front door (`Tps`/`main()`), the analog
of the reference's bats suite driving the `tps` binary per input deck
(reference: test/Makefile.am:91-137 runs tps --runFile <deck> for each
solver family).

Round-2 lesson: all coupling/EM tests constructed solver classes
directly, so the registry bug that made `python -m tps_tpu` fail on 4 of
6 solver types was never caught. These tests pin the product path.
"""

import os

import h5py
import numpy as np
import pytest

from tps_tpu.harness import main
from tps_tpu.solvers.base import SOLVER_REGISTRY

HERE = os.path.dirname(__file__)

ALL_TYPES = ("flow", "loMach", "em", "em-axi", "cycle-avg-joule-coupled",
             "independent-coupled")


def test_registry_complete():
    """All six reference solver types are registered after importing the
    harness (reference: Tps::chooseSolver dispatch, src/tps.cpp:247-278)."""
    for name in ALL_TYPES:
        assert name in SOLVER_REGISTRY, f"'{name}' missing from registry"


def _em_axi_section(tmp_path):
    return """
[em]
generator = box2d
nx = 6
ny = 6
x0 = 0.0
x1 = 0.03
y0 = -0.01
y1 = 0.02
ring1/center = 0.018 0.005
ring1/halfwidth = 0.005 0.005
current_amplitude = 1e6
current_frequency = 1e5
max_iter = 120
"""


def _run_main(tmp_path, text):
    ini = tmp_path / "deck.ini"
    ini.write_text(text)
    return main(["tps", "--runFile", str(ini)])


def test_cli_flow(tmp_path):
    status = _run_main(tmp_path, f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 2
outputFreq = 100
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
""")
    assert status == 0


def test_cli_lomach(tmp_path):
    status = _run_main(tmp_path, f"""
[solver]
type = loMach
[loMach]
flow-solver = tomboulides
thermo-solver = constant-property
order = 2
maxIters = 2
[loMach/constprop]
rho = 1.0
mu = 0.01
[loMach/tomboulides]
ic = tgv2d
[mesh]
generator = box2d
nx = 4
ny = 4
x1 = 6.283185307179586
y1 = 6.283185307179586
periodic_x = 1
periodic_y = 1
[time]
dt_fixed = 1e-3
[io]
outdirBase = {tmp_path}/out
""")
    assert status == 0


def test_cli_em_axi(tmp_path):
    status = _run_main(tmp_path, f"""
[solver]
type = em-axi
{_em_axi_section(tmp_path)}
[io]
outdirBase = {tmp_path}/out
""")
    assert status == 0


def test_cli_em_3d(tmp_path):
    status = _run_main(tmp_path, f"""
[solver]
type = em
[em]
mesh_n = 4
domain_size = 1.0
numCoils = 1
coil1/z0 = 0.0
coil1/r1 = 0.2
coil1/r2 = 0.3
coil1/half_height = 0.1
current_amplitude = 1e6
current_frequency = 1e5
max_iter = 60
rtol = 1e-6
[io]
outdirBase = {tmp_path}/out
""")
    assert status == 0


def _lte_table(tmp_path):
    T = np.linspace(200.0, 20000.0, 199)
    data = np.stack(
        [T, 1.8e-5 * (T / 300.0) ** 0.7, 0.025 * (T / 300.0) ** 0.8,
         np.where(T > 6000.0, 50.0 * (T - 6000.0) / 14000.0, 0.0),
         np.full_like(T, 287.0), np.full_like(T, 1004.0)], axis=1)
    tf = tmp_path / "lte.h5"
    with h5py.File(tf, "w") as f:
        f["T_mu_kap_sig_R_Cp"] = data
    return tf


def test_cli_cycle_avg_joule_coupled(tmp_path):
    """The flagship coupled-torch path through the CLI front door
    (reference: cycle-avg-joule-coupled decks under test/inputs/plasma.*)."""
    tf = _lte_table(tmp_path)
    status = _run_main(tmp_path, f"""
[solver]
type = cycle-avg-joule-coupled
[cycle-avg-joule-coupled]
plasma-solver = lomach
axisymmetric = 1
solve-em-every-n = 2
input-power = 50.0
[mesh]
generator = box2d
nx = 4
ny = 4
x1 = 0.01
y1 = 0.01
periodic_y = 1
[loMach]
order = 1
axisymmetric = 1
flow-solver = zero-flow
thermo-solver = lte-thermo-chem
maxIters = 3
[loMach/ltethermo]
table-file = {tf}
[initialConditions]
temperature = 8000.0
[time]
dt_fixed = 1e-6
{_em_axi_section(tmp_path)}
[io]
outdirBase = {tmp_path}/out
""")
    assert status == 0


def test_cli_independent_coupled(tmp_path):
    status = _run_main(tmp_path, f"""
[solver]
type = independent-coupled
[flow]
order = 1
maxIters = 2
outputFreq = 100
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
{_em_axi_section(tmp_path)}
[io]
outdirBase = {tmp_path}/out
""")
    assert status == 0


def test_cli_torch_deck_runs():
    """The shipped flagship deck parses, constructs and initializes through
    choose_solver — the exact path that round 2 shipped broken."""
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.harness import Tps

    deck = os.path.join(HERE, "..", "examples", "cases",
                        "torch_axisym_coupled.ini")
    if not os.path.exists(os.path.join(
            HERE, "..", "examples", "cases", "lte_table.h5")):
        pytest.skip("lte_table.h5 not generated")
    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", deck])
    tps.parse_input()
    tps.config = parse_run_configuration(tps.iniput)
    tps.config.max_iters = 2
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    c = tps.solver
    for _ in range(2):
        c.solve_step()
    T = np.asarray(c.flow.thermo.T)
    assert np.isfinite(T).all()
