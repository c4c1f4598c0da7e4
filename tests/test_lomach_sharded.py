"""Element-sharded H1 loMach: [mesh]/partitions N runs the implicit solver
family over a device mesh with psum-assembled operators.

VERDICT round-1 item 6: N-shard Tomboulides/thermo step must match the
single-device step to near machine precision."""

import numpy as np

from tps_tpu.harness import Tps

TGV_INI = """
[solver]
type = loMach

[loMach]
flow-solver = tomboulides
thermo-solver = constant-property
order = 2
maxIters = {iters}
outputFreq = 10000

[loMach/constprop]
rho = 1.0
mu = 0.01

[loMach/tomboulides]
ic = tgv2d

[mesh]
generator = box2d
nx = 8
ny = 8
x1 = 6.283185307179586
y1 = 6.283185307179586
periodic_x = 1
periodic_y = 1
partitions = {nparts}

[time]
enableConstantTimestep = True
dt_fixed = 1e-3
bdfOrder = 2
maxSolverIteration = 400
solverRelTolerance = 1.0e-12

[io]
outdirBase = {out}
"""


def _run(tmp_path, nparts, iters=5):
    import os

    out = str(tmp_path / f"p{nparts}")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "run.ini")
    with open(path, "w") as f:
        f.write(TGV_INI.format(nparts=nparts, out=out, iters=iters))
    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", path, "--device", "cpu"])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    return tps.solver


def test_sharded_lomach_matches_single(tmp_path, monkeypatch):
    # pin both runs to the SAME solver path: sharded spaces cannot use the
    # dense-direct lagged preconditioner, so disable it on the single-
    # device side too — the 1e-11 bar then measures sharding alone, not
    # (converged) CG-iterate path differences
    from tps_tpu.fem import h1
    monkeypatch.setattr(h1, "DENSE_DIRECT_MAX", 0)
    s1 = _run(tmp_path, 1)
    s4 = _run(tmp_path, 4)
    u1 = np.asarray(s1.flow.u)
    u4 = np.asarray(s4.flow.u)
    scale = np.abs(u1).max()
    assert np.abs(u4 - u1).max() / scale < 1e-11
    p1, p4 = np.asarray(s1.flow.p), np.asarray(s4.flow.p)
    assert np.abs(p4 - p1).max() / (np.abs(p1).max() + 1e-30) < 1e-9
    # the sharded run used the element-sharded substrate
    from tps_tpu.fem.h1 import ShardedH1

    assert isinstance(s4.tab, ShardedH1) and s4.tab.nparts == 4


def _run_axisym(tmp_path, nparts, iters=5, maxit=None, tag=""):
    """Axisymmetric LTE torch column (the flagship config family) under
    [mesh]/partitions (reference: axisym loMach runs under MPI like
    everything else, src/loMach.cpp:447)."""
    import h5py

    T = np.linspace(200.0, 20000.0, 199)
    data = np.stack(
        [T, 1.8e-5 * (T / 300.0) ** 0.7, 0.025 * (T / 300.0) ** 0.8,
         np.where(T > 6000.0, 50.0 * (T - 6000.0) / 14000.0, 0.0),
         np.full_like(T, 287.0), np.full_like(T, 1004.0)], axis=1)
    tf = tmp_path / f"lte{nparts}{tag}.h5"
    with h5py.File(tf, "w") as f:
        f["T_mu_kap_sig_R_Cp"] = data

    maxit_line = f"maxSolverIteration = {maxit}" if maxit else ""
    ini = tmp_path / f"axi{nparts}{tag}.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 9
x1 = 0.02
y1 = 0.08
partitions = {nparts}
[loMach]
order = 2
axisymmetric = 1
swirl = 1
flow-solver = tomboulides
thermo-solver = lte-thermo-chem
maxIters = {iters}
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
{maxit_line}
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
outdirBase = {tmp_path}/axi_out{nparts}{tag}
""")
    from tps_tpu.harness import Tps

    tps = Tps()
    tps.parse_command_line_args(
        ["tps", "--runFile", str(ini), "--device", "cpu"])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    return tps.solver


def test_axisym_dense_precond_changes_cost_not_answers(tmp_path,
                                                       monkeypatch):
    """VERDICT r4 item 1 regression guard: the lagged dense-direct
    preconditioner must change iteration counts, never the converged
    solution.  dense-on (default) vs dense-off (Jacobi CG given enough
    iterations to truly converge — at the default 500 cap the
    unpreconditioned r-momentum Helmholtz stalls at ~6e-9 relres, which
    was the round-4 sharded-parity failure's root cause)."""
    from tps_tpu.fem import h1

    s_on = _run_axisym(tmp_path, 1, tag="_on")
    monkeypatch.setattr(h1, "DENSE_DIRECT_MAX", 0)
    s_off = _run_axisym(tmp_path, 1, maxit=2000, tag="_off")
    assert s_on.flow._direct is not None
    assert s_off.flow._direct is None
    u_on, u_off = np.asarray(s_on.flow.u), np.asarray(s_off.flow.u)
    T_on, T_off = np.asarray(s_on.thermo.T), np.asarray(s_off.thermo.T)
    assert np.abs(u_off - u_on).max() / np.abs(u_on).max() < 1e-6
    assert np.abs(T_off - T_on).max() / np.abs(T_on).max() < 1e-8


def test_sharded_axisym_lomach_matches_single(tmp_path):
    s1 = _run_axisym(tmp_path, 1)
    s3 = _run_axisym(tmp_path, 3)
    from tps_tpu.fem.h1 import ShardedH1

    assert isinstance(s3.tab, ShardedH1) and s3.tab.nparts == 3
    T1, T3 = np.asarray(s1.thermo.T), np.asarray(s3.thermo.T)
    assert np.isfinite(T1).all() and np.isfinite(T3).all()
    assert np.abs(T3 - T1).max() / np.abs(T1).max() < 1e-8
    u1, u3 = np.asarray(s1.flow.u), np.asarray(s3.flow.u)
    assert np.abs(u3 - u1).max() / (np.abs(u1).max() + 1e-30) < 1e-6
    ut1, ut3 = np.asarray(s1.flow.ut), np.asarray(s3.flow.ut)
    assert np.abs(ut3 - ut1).max() <= 1e-6 * (np.abs(ut1).max() + 1.0)


def _run_axisym_supg(tmp_path, nparts, iters=5):
    """Axisymmetric calorically-perfect thermo WITH SUPG streamwise
    stabilization under [mesh]/partitions — exercises the sharded
    coefficient build (to_quad / grid_scale_q / diffusion_apply_tensor
    on axisymmetric radius-weighted tables)."""
    ini = tmp_path / f"axisupg{nparts}.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 9
x1 = 0.02
y1 = 0.08
partitions = {nparts}
[loMach]
order = 2
axisymmetric = 1
flow-solver = tomboulides
thermo-solver = calorically-perfect
maxIters = {iters}
outputFreq = 1000
[loMach/calperfect]
streamwise-stabilization = 1
[initialConditions]
profile = gaussian
temperature = 1500.0
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
outdirBase = {tmp_path}/axisupg_out{nparts}
""")
    from tps_tpu.harness import Tps

    tps = Tps()
    tps.parse_command_line_args(
        ["tps", "--runFile", str(ini), "--device", "cpu"])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    return tps.solver


def test_sharded_axisym_supg_matches_single(tmp_path):
    s1 = _run_axisym_supg(tmp_path, 1)
    s3 = _run_axisym_supg(tmp_path, 3)
    assert s1.thermo.sw_stab and s3.thermo.sw_stab
    T1, T3 = np.asarray(s1.thermo.T), np.asarray(s3.thermo.T)
    assert np.isfinite(T1).all() and np.isfinite(T3).all()
    assert np.abs(T3 - T1).max() / np.abs(T1).max() < 1e-8
    u1, u3 = np.asarray(s1.flow.u), np.asarray(s3.flow.u)
    assert np.abs(u3 - u1).max() / (np.abs(u1).max() + 1e-30) < 1e-6


def test_chunked_lomach_matches_per_step(tmp_path):
    """LoMachSolver.solve() with chunked scanning matches per-step
    solve_step() stepping (LTE axisym torch-column config)."""
    (tmp_path / "ps").mkdir()
    (tmp_path / "ck").mkdir()
    a = _run_axisym(tmp_path / "ps", 1, iters=0)
    b = _run_axisym(tmp_path / "ck", 1, iters=0)
    for _ in range(8):
        a.solve_step()
    b.max_iters_cfg = 8
    b.solve()  # per-step through BDF startup, then chunks
    assert b.iter == a.iter == 8
    # not bitwise: the chunk compiles the same math in one fusion context
    # (observed ~1e-10 relative after 8 steps)
    T1, T2 = np.asarray(a.thermo.T), np.asarray(b.thermo.T)
    assert np.abs(T2 - T1).max() / np.abs(T1).max() < 1e-8
    u1, u2 = np.asarray(a.flow.u), np.asarray(b.flow.u)
    assert np.abs(u2 - u1).max() <= 1e-8 * (np.abs(u1).max() + 1.0)
    ut1, ut2 = np.asarray(a.flow.ut), np.asarray(b.flow.ut)
    assert np.abs(ut2 - ut1).max() <= 1e-8 * (np.abs(ut1).max() + 1.0)
    np.testing.assert_allclose(float(b.time), float(a.time), rtol=1e-12)


def test_chunked_lomach_reacting_matches_per_step(tmp_path):
    """Chunked scanning parity for the reacting-flow thermo (argon
    chemistry, closed-system thermodynamic pressure carried in the
    chunk state)."""
    import os

    here = os.path.dirname(__file__)
    argon = open(os.path.join(here, "inputs", "argon_minimal.ini")).read()
    argon = "[plasma_models]" + argon.split("[plasma_models]", 1)[1]
    argon = argon.rsplit("[io]", 1)[0]

    def build(sub):
        d = tmp_path / sub
        d.mkdir()
        ini = d / "run.ini"
        ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 4
ny = 6
x1 = 0.01
y1 = 0.02
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = reacting-flow
maxIters = 8
outputFreq = 1000
[initialConditions]
profile = gaussian
temperature = 8000.0
backgroundTemperature = 2000.0
center = '0.005 0.01'
width = '0.003 0.006'
[time]
dt_fixed = 1e-7
[boundaryConditions/inlet1]
patch = 1
type = inlet
velocity = '0.0 1.0'
temperature = 2000.0
[boundaryConditions/wall1]
patch = 2
type = viscous
temperature = 2000.0
[boundaryConditions/outlet1]
patch = 3
type = outlet
pressure = 0.0
[boundaryConditions/wall2]
patch = 4
type = viscous
temperature = 2000.0
[io]
outdirBase = {d}/out
{argon}
""")
        tps = Tps()
        tps.parse_command_line_args(
            ["tps", "--runFile", str(ini), "--device", "cpu"])
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        return tps.solver

    a = build("ps")
    b = build("ck")
    for _ in range(8):
        a.solve_step()
    b.solve()
    assert b.iter == a.iter == 8
    T1, T2 = np.asarray(a.thermo.T), np.asarray(b.thermo.T)
    assert np.abs(T2 - T1).max() / np.abs(T1).max() < 1e-8
    Y1, Y2 = np.asarray(a.thermo.Y), np.asarray(b.thermo.Y)
    assert np.abs(Y2 - Y1).max() < 1e-8
    u1, u2 = np.asarray(a.flow.u), np.asarray(b.flow.u)
    assert np.abs(u2 - u1).max() <= 1e-8 * (np.abs(u1).max() + 1.0)
    np.testing.assert_allclose(float(b.thermo.p_thermo),
                               float(a.thermo.p_thermo), rtol=1e-10)


def test_chunked_lomach_with_sgs_matches_per_step(tmp_path):
    """Chunk parity with an ACTIVE turbulence model: the eddy viscosity
    rides the scan carry with the per-step lag semantics (flow uses the
    previous step's nu_t; turb updates after the flow)."""
    def build(sub):
        d = tmp_path / sub
        d.mkdir()
        ini = d / "run.ini"
        ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 8
ny = 8
x1 = 6.283185307179586
y1 = 6.283185307179586
periodic_x = 1
periodic_y = 1
[loMach]
flow-solver = tomboulides
thermo-solver = constant-property
turb-model = smagorinsky
order = 2
maxIters = 8
outputFreq = 10000
[loMach/constprop]
rho = 1.0
mu = 0.001
[loMach/tomboulides]
ic = tgv2d
[time]
enableConstantTimestep = True
dt_fixed = 1e-3
bdfOrder = 2
[io]
outdirBase = {d}/out
""")
        tps = Tps()
        tps.parse_command_line_args(
            ["tps", "--runFile", str(ini), "--device", "cpu"])
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        return tps.solver

    a = build("ps")
    b = build("ck")
    from tps_tpu.solvers.lomach.turb import AlgebraicSubgridModel

    assert isinstance(a.turb, AlgebraicSubgridModel)
    for _ in range(8):
        a.solve_step()
    b.solve()
    assert b.iter == a.iter == 8
    u1, u2 = np.asarray(a.flow.u), np.asarray(b.flow.u)
    assert np.abs(u2 - u1).max() <= 1e-8 * (np.abs(u1).max() + 1.0)
    n1 = np.asarray(a.turb.eddy_viscosity())
    n2 = np.asarray(b.turb.eddy_viscosity())
    assert np.abs(n2 - n1).max() <= 1e-8 * (np.abs(n1).max() + 1e-12)


def test_chunked_lomach_with_zeta_f_matches_per_step(tmp_path):
    """Chunk parity with the TRANSPORTED zeta-f model: the full 4-equation
    state (k, eps, v2, f + BDF histories) rides the scan carry via the
    rich chunk protocol (turb.chunk_step), with the same per-step lag
    semantics as the algebraic models."""
    def build(sub):
        d = tmp_path / sub
        d.mkdir()
        ini = d / "run.ini"
        ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 8
ny = 6
x1 = 6.283185307179586
y1 = 1.0
periodic_x = 1
[loMach]
flow-solver = tomboulides
thermo-solver = constant-property
turb-model = zeta-f
order = 2
maxIters = 8
outputFreq = 10000
[loMach/constprop]
rho = 1.0
mu = 0.001
[loMach/tomboulides]
ic = tgv2d
[ransModel]
walls = '1 3'
tke-ic = 1e-3
[time]
enableConstantTimestep = True
dt_fixed = 1e-3
bdfOrder = 2
[boundaryConditions/wall1]
patch = 1
type = viscous
[boundaryConditions/wall2]
patch = 3
type = viscous
[io]
outdirBase = {d}/out
""")
        tps = Tps()
        tps.parse_command_line_args(
            ["tps", "--runFile", str(ini), "--device", "cpu"])
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        return tps.solver

    a = build("ps")
    b = build("ck")
    from tps_tpu.solvers.lomach.zeta_model import ZetaModel

    assert isinstance(a.turb, ZetaModel)
    for _ in range(8):
        a.solve_step()
    b.solve()
    assert b.iter == a.iter == 8
    u1, u2 = np.asarray(a.flow.u), np.asarray(b.flow.u)
    assert np.abs(u2 - u1).max() <= 1e-8 * (np.abs(u1).max() + 1.0)
    for name in ("k", "eps", "v2", "f", "_mut"):
        q1 = np.asarray(getattr(a.turb, name))
        q2 = np.asarray(getattr(b.turb, name))
        assert np.abs(q2 - q1).max() <= 1e-8 * (np.abs(q1).max() + 1e-12), \
            name
    # the state actually evolved (the carry mattered)
    assert np.abs(np.asarray(a.turb.k) - 1e-3).max() > 1e-6
