"""Cycle-averaged Joule coupling test (plasma.axisym / coupled analog):
argon flow + axisymmetric EM on different meshes, conductivity -> EM ->
power-controlled Joule heating -> flow energy."""

import os

import jax.numpy as jnp
import numpy as np

from tps_tpu.config.ini import IniInput
from tps_tpu.config.run_config import parse_run_configuration
from tps_tpu.interop.interpolation import FieldInterpolator
from tps_tpu.mesh.generators import box_2d
from tps_tpu.solvers.coupling import CycleAvgJouleCoupling
from tps_tpu.solvers.em.qms import QuasiMagnetostaticSolverAxiSym

HERE = os.path.dirname(__file__)


def test_field_interpolator_roundtrip():
    """DG field interpolated onto another mesh's points reproduces smooth
    functions."""
    from tps_tpu.dg.discretization import build_tables

    src = box_2d(8, 8)
    tab = build_tables(src, order=2)
    f = np.asarray(tab.xyz_dof[..., 0] ** 2 + tab.xyz_dof[..., 1])
    pts = np.random.RandomState(0).rand(40, 2) * 0.98 + 0.01
    interp = FieldInterpolator.build(src, 2, "gauss-legendre", pts)
    assert interp.found.all()
    vals = np.asarray(interp.from_dg(jnp.asarray(f)))
    exact = pts[:, 0] ** 2 + pts[:, 1]
    assert np.abs(vals - exact).max() < 1e-10


def test_cycle_avg_joule_coupling():
    ini_path = os.path.join(HERE, "inputs", "argon_minimal.ini")
    inp = IniInput.read(ini_path)
    # make flow mesh non-periodic & matching the EM domain region near axis
    inp.values["mesh/periodic_x"] = "1"
    inp.values["mesh/periodic_y"] = "1"
    inp.values["em/order"] = "1"
    inp.values["em/current_amplitude"] = "1e6"
    inp.values["em/current_frequency"] = "1e5"
    inp.values["cycle-avg-joule-coupled/solve-em-every-n"] = "2"
    # modest power + realistic seed ionization so the electron-energy
    # equation stays non-stiff over explicit steps
    inp.values["cycle-avg-joule-coupled/input-power"] = "0.5"
    inp.values["species/species3/initialMassFraction"] = "1.0e-4"
    inp.values["species/species2/initialMassFraction"] = "0.9999"
    # the explicit two-temperature relaxation is stiff; keep dt small
    inp.values["time/dt_fixed"] = "5e-8"
    rc = parse_run_configuration(inp)
    rc.max_iters = 4

    # EM mesh covering the flow box ([0,0.01]^2) plus coil ring outside
    em_mesh = box_2d(12, 12, x0=0.0, x1=0.04, y0=-0.015, y1=0.025)
    cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
    attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cent[:, 0] - 0.02) < 0.004) & (np.abs(cent[:, 1] - 0.005) < 0.004)
    attrs[ring] = 2
    em_mesh.elem_attrs = attrs

    coupled = CycleAvgJouleCoupling(rc)
    coupled._em_in = QuasiMagnetostaticSolverAxiSym(rc, mesh=em_mesh)
    coupled._em_in.initialize()
    coupled.initialize()

    E0 = float(jnp.sum(coupled.flow.U[..., coupled.flow.mixture.i_th]))
    coupled.solve()
    assert coupled.iter == 4
    assert coupled.flow.check_nan() == 0

    # power control: total EM joule heating == target
    total = coupled.em.total_joule_heating()
    assert abs(total - 0.5) / 0.5 < 1e-8

    # heating reached the flow: energy increased
    E1 = float(jnp.sum(coupled.flow.U[..., coupled.flow.mixture.i_th]))
    assert E1 > E0
    qj = np.asarray(coupled.flow.get_joule_heating())
    assert qj.max() > 0 and np.isfinite(qj).all()


def test_cycle_avg_joule_coupling_lomach(tmp_path):
    """Coupled torch with the low-Mach LTE plasma solver
    (cycle-avg-joule-coupled/plasma-solver = lomach, the reference's newer
    production path): sigma from the LTE table drives the EM solve, the
    power-controlled Joule heating returns to the thermo equation, and the
    plasma column heats up."""
    import h5py

    # LTE property table: conducting above 6 kK
    T = np.linspace(200.0, 20000.0, 199)
    data = np.stack(
        [T, 1.8e-5 * (T / 300.0) ** 0.7, 0.025 * (T / 300.0) ** 0.8,
         np.where(T > 6000.0, 50.0 * (T - 6000.0) / 14000.0, 0.0),
         np.full_like(T, 287.0), np.full_like(T, 1004.0)], axis=1)
    tf = tmp_path / "lte.h5"
    with h5py.File(tf, "w") as f:
        f["T_mu_kap_sig_R_Cp"] = data

    ini = tmp_path / "torch.ini"
    ini.write_text(f"""
[solver]
type = cycle-avg-joule-coupled
[cycle-avg-joule-coupled]
plasma-solver = lomach
axisymmetric = 1
solve-em-every-n = 2
input-power = 100.0
[mesh]
generator = box2d
nx = 6
ny = 6
x1 = 0.01
y1 = 0.01
periodic_y = 1
[loMach]
order = 1
axisymmetric = 1
flow-solver = zero-flow
thermo-solver = lte-thermo-chem
maxIters = 6
[loMach/ltethermo]
table-file = {tf}
[initialConditions]
temperature = 8000.0
[time]
dt_fixed = 1e-5
[io]
outdirBase = {tmp_path}/out
""")
    inp = IniInput.read(str(ini))
    rc = parse_run_configuration(inp)
    rc.max_iters = 6

    em_mesh = box_2d(10, 10, x0=0.0, x1=0.03, y0=-0.01, y1=0.02)
    cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
    attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cent[:, 0] - 0.018) < 0.004) & (np.abs(cent[:, 1] - 0.005) < 0.004)
    attrs[ring] = 2
    em_mesh.elem_attrs = attrs
    inp.values["em/current_amplitude"] = "1e6"
    inp.values["em/current_frequency"] = "1e5"

    coupled = CycleAvgJouleCoupling(rc)
    coupled._em_in = QuasiMagnetostaticSolverAxiSym(rc, mesh=em_mesh)
    coupled._em_in.initialize()
    coupled.initialize()
    assert coupled.plasma_kind == "lomach"

    T0 = float(np.asarray(coupled.flow.thermo.T).mean())
    for _ in range(rc.max_iters):
        coupled.solve_step()
    T1 = np.asarray(coupled.flow.thermo.T)
    assert np.isfinite(T1).all()
    assert T1.mean() > T0  # Joule heating raised the plasma temperature
    total = coupled.em.total_joule_heating()
    assert abs(total - 100.0) / 100.0 < 1e-8  # power control on target
    qj = np.asarray(coupled.flow.thermo.joule_heating)
    assert qj.max() > 0 and np.isfinite(qj).all()


def test_cycle_avg_joule_coupling_reacting(tmp_path):
    """Coupled axisymmetric torch with the finite-rate reacting low-Mach
    solver: sigma comes from the REACTING MIXTURE's transport model (not an
    LTE table) — reference: ReactingFlow::evaluatePlasmaConductivityGF
    (src/reactingFlow.cpp:3192) inside CycleAvgJouleCoupling."""
    import os

    here = os.path.dirname(__file__)
    argon = open(os.path.join(here, "inputs", "argon_minimal.ini")).read()
    # strip the [solver]/[io] sections of the compressible ini
    argon = argon.split("[plasma_models]", 1)[1]
    argon = "[plasma_models]" + argon.rsplit("[io]", 1)[0]

    ini = tmp_path / "torch_reacting.ini"
    ini.write_text(f"""
[solver]
type = cycle-avg-joule-coupled
[cycle-avg-joule-coupled]
plasma-solver = lomach
axisymmetric = 1
solve-em-every-n = 2
input-power = 100.0
eval-Rplasma = 1
[mesh]
generator = box2d
nx = 5
ny = 5
x1 = 0.01
y1 = 0.01
periodic_y = 1
[loMach]
order = 1
axisymmetric = 1
flow-solver = zero-flow
thermo-solver = reacting-flow
maxIters = 4
ambientPressure = 101325.0
openSystem = 1
[loMach/reacting]
sub-steps = 4
[initialConditions]
temperature = 9000.0
[time]
dt_fixed = 1e-7
[io]
outdirBase = {tmp_path}/out
""" + argon)
    inp = IniInput.read(str(ini))
    rc = parse_run_configuration(inp)
    rc.max_iters = 4

    em_mesh = box_2d(10, 10, x0=0.0, x1=0.03, y0=-0.01, y1=0.02)
    cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
    attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cent[:, 0] - 0.018) < 0.004) & (np.abs(cent[:, 1] - 0.005) < 0.004)
    attrs[ring] = 2
    em_mesh.elem_attrs = attrs
    inp.values["em/current_amplitude"] = "1e6"
    inp.values["em/current_frequency"] = "1e5"

    coupled = CycleAvgJouleCoupling(rc)
    coupled._em_in = QuasiMagnetostaticSolverAxiSym(rc, mesh=em_mesh)
    coupled._em_in.initialize()
    coupled.initialize()
    thermo = coupled.flow.thermo
    assert thermo.mixture is not None and thermo.transport is not None

    sigma0 = np.asarray(thermo.plasma_conductivity())
    assert np.all(np.isfinite(sigma0)) and sigma0.max() > 0

    T0 = float(np.asarray(thermo.T).mean())
    for _ in range(rc.max_iters):
        coupled.solve_step()
    T1 = np.asarray(thermo.T)
    assert np.isfinite(T1).all()
    assert T1.mean() > T0  # power-controlled Joule heating raises T
    total = coupled.em.total_joule_heating()
    assert abs(total - 100.0) / 100.0 < 1e-8
    # the hot plasma ionizes further -> conductivity rises
    sigma1 = np.asarray(thermo.plasma_conductivity())
    assert np.all(np.isfinite(sigma1))
    Y = np.asarray(thermo.Y)
    np.testing.assert_allclose(Y.sum(axis=-1), 1.0, atol=1e-12)

    # plasma R/L diagnostics (reference: eval_Rplasma,
    # cycle_avg_joule_coupling.cpp:434-478)
    assert coupled.plasma_resistance is not None
    assert coupled.plasma_resistance > 0
    assert coupled.plasma_inductance > 0
    # E-field amplitude interpolated back to the flow side
    efield = np.asarray(coupled.flow.efield)
    assert np.all(np.isfinite(efield)) and efield.max() > 0


def test_cycle_avg_joule_coupling_sharded_flow():
    """Cycle-avg EM coupling with a domain-decomposed ([mesh]/partitions)
    compressible flow solver: the coupling-facing solver APIs (sigma
    evaluation, Joule-heating injection) are global-layout, so the coupled
    run matches the single-device one."""
    def run(nparts):
        ini_path = os.path.join(HERE, "inputs", "argon_minimal.ini")
        inp = IniInput.read(ini_path)
        inp.values["mesh/periodic_x"] = "1"
        inp.values["mesh/periodic_y"] = "1"
        if nparts > 1:
            inp.values["mesh/partitions"] = str(nparts)
        inp.values["em/order"] = "1"
        inp.values["em/current_amplitude"] = "1e6"
        inp.values["em/current_frequency"] = "1e5"
        inp.values["cycle-avg-joule-coupled/solve-em-every-n"] = "2"
        inp.values["cycle-avg-joule-coupled/input-power"] = "0.5"
        inp.values["species/species3/initialMassFraction"] = "1.0e-4"
        inp.values["species/species2/initialMassFraction"] = "0.9999"
        inp.values["time/dt_fixed"] = "5e-8"
        rc = parse_run_configuration(inp)
        rc.max_iters = 4

        em_mesh = box_2d(12, 12, x0=0.0, x1=0.04, y0=-0.015, y1=0.025)
        cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
        attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
        ring = (np.abs(cent[:, 0] - 0.02) < 0.004) \
            & (np.abs(cent[:, 1] - 0.005) < 0.004)
        attrs[ring] = 2
        em_mesh.elem_attrs = attrs

        coupled = CycleAvgJouleCoupling(rc)
        coupled._em_in = QuasiMagnetostaticSolverAxiSym(rc, mesh=em_mesh)
        coupled._em_in.initialize()
        coupled.initialize()
        coupled.solve()
        assert coupled.flow.check_nan() == 0
        return np.asarray(coupled.flow.state_global()), \
            coupled.em.total_joule_heating()

    U1, q1 = run(1)
    U2, q2 = run(2)
    assert abs(q2 - q1) < 1e-10 * max(abs(q1), 1e-300)
    scale = np.abs(U1).max()
    assert np.abs(U2 - U1).max() < 1e-9 * scale


def test_coupled_chunked_matches_per_step(tmp_path):
    """CycleAvgJouleCoupling.solve() (flow steps chunked between EM
    solves) matches the per-step solve_step() loop: joule heating is
    constant between EM solves either way, so the EM cadence and the
    flow trajectory are unchanged."""
    import h5py

    T = np.linspace(200.0, 20000.0, 199)
    data = np.stack(
        [T, 1.8e-5 * (T / 300.0) ** 0.7, 0.025 * (T / 300.0) ** 0.8,
         np.where(T > 6000.0, 50.0 * (T - 6000.0) / 14000.0, 0.0),
         np.full_like(T, 287.0), np.full_like(T, 1004.0)], axis=1)

    def build(sub):
        d = tmp_path / sub
        d.mkdir()
        tf = d / "lte.h5"
        with h5py.File(tf, "w") as f:
            f["T_mu_kap_sig_R_Cp"] = data
        ini = d / "torch.ini"
        ini.write_text(f"""
[solver]
type = cycle-avg-joule-coupled
[cycle-avg-joule-coupled]
plasma-solver = lomach
axisymmetric = 1
solve-em-every-n = 4
input-power = 100.0
[mesh]
generator = box2d
nx = 6
ny = 9
x1 = 0.02
y1 = 0.08
[loMach]
order = 2
axisymmetric = 1
swirl = 1
flow-solver = tomboulides
thermo-solver = lte-thermo-chem
maxIters = 8
outputFreq = 1000
[loMach/ltethermo]
table-file = {tf}
[initialConditions]
profile = gaussian
temperature = 8000.0
backgroundTemperature = 300.0
center = '0.0 0.04'
width = '0.009 0.025'
[time]
dt_fixed = 2.5e-7
[boundaryConditions/inlet1]
patch = 1
type = inlet
velocity = '0.0 1.0'
rampTime = 2e-5
temperature = 300.0
[boundaryConditions/wall1]
patch = 2
type = viscous
temperature = 300.0
[boundaryConditions/outlet1]
patch = 3
type = outlet
pressure = 0.0
[io]
outdirBase = {d}/out
""")
        inp = IniInput.read(str(ini))
        rc = parse_run_configuration(inp)
        rc.max_iters = 8
        em_mesh = box_2d(10, 10, x0=0.0, x1=0.05, y0=-0.02, y1=0.10)
        cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
        attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
        ring = (np.abs(cent[:, 0] - 0.03) < 0.007) \
            & (np.abs(cent[:, 1] - 0.04) < 0.012)
        attrs[ring] = 2
        em_mesh.elem_attrs = attrs
        inp.values["em/current_amplitude"] = "1e6"
        inp.values["em/current_frequency"] = "1e5"
        coupled = CycleAvgJouleCoupling(rc)
        coupled._em_in = QuasiMagnetostaticSolverAxiSym(rc, mesh=em_mesh)
        coupled._em_in.initialize()
        coupled.initialize()
        return coupled

    a = build("ps")
    for _ in range(8):
        a.solve_step()
    b = build("ck")
    b.solve()
    assert b.iter == a.iter == 8
    T1 = np.asarray(a.flow.thermo.T)
    T2 = np.asarray(b.flow.thermo.T)
    assert np.abs(T2 - T1).max() / np.abs(T1).max() < 1e-8
    u1, u2 = np.asarray(a.flow.flow.u), np.asarray(b.flow.flow.u)
    assert np.abs(u2 - u1).max() <= 1e-8 * (np.abs(u1).max() + 1.0)
