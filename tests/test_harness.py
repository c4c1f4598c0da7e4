"""Harness lifecycle tests: CLI-style runs over ini inputs + restart
roundtrip (the role of the reference's bats regression drivers,
test/cyl3d.test)."""

import os

import numpy as np
import pytest

from tps_tpu.config.ini import IniInput
from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)


def _run(ini, max_iters=None, outdir=None, enable_restart=None):
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", ini)
    tps.parse_input()
    if max_iters is not None:
        tps.config.max_iters = max_iters
    if outdir is not None:
        tps.config.outdir = str(outdir)
    if enable_restart is not None:
        tps.config.enable_restart = enable_restart
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


def test_sgs_model_parsed_by_name():
    # the reference parses flow/sgsModel by NAME with legacy numeric
    # indices unsupported in-tree but accepted here (src/M2ulPhyS.cpp:2666-2692)
    from tps_tpu.config.run_config import parse_run_configuration

    base = "[solver]\ntype = flow\n[flow]\nmesh = none\n"
    for key, want in [("smagorinsky", "smagorinsky"), ("sigma", "sigma"),
                      ("none", "none"), ("1", "smagorinsky"), ("2", "sigma"),
                      ("0", "none")]:
        rc = parse_run_configuration(IniInput.parse(base + f"sgsModel = {key}\n"))
        assert rc.sgs_model == want, key
    with pytest.raises(ValueError):
        parse_run_configuration(IniInput.parse(base + "sgsModel = bogus\n"))


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


def test_bc_patch_report(capsys):
    # inlet/outlet surface-area + face-count log lines at BC init, the
    # reference's wedge.test contract (src/inletBC.cpp:311-312,
    # src/outletBC.cpp:339-340)
    _run("channel2d.ini")
    out = capsys.readouterr().out
    # channel2d: inlet patch 4 = x-min edge (length 0.2, ny=4 faces),
    # outlet patch 2 = x-max edge
    assert "[INLET]: Total Surface Area                = 2.00000e-01" in out
    assert "[INLET]: # of boundary faces               = 4" in out
    assert "[OUTLET]: Total Surface Area                = 0.20000" in out
    assert "[OUTLET]: # of boundary faces               = 4" in out


def test_roe_axisym_refused():
    # reference behavior (annulus.test): Roe + axisymmetric is an error
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.solvers.base import create_solver

    inp = IniInput.parse("""
[solver]
type = flow
[flow]
order = 1
axisymmetric = 1
useRoe = 1
fluid = dry_air
[mesh]
generator = box2d
nx = 2
ny = 2
[initialConditions]
rho = 1.2
rhoU = 0.
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/wall1]
patch = 1
type = inviscid
[boundaryConditions/wall2]
patch = 2
type = inviscid
[boundaryConditions/wall3]
patch = 3
type = inviscid
[boundaryConditions/wall4]
patch = 4
type = inviscid
[boundaryConditions]
numWalls = 4
""")
    rc = parse_run_configuration(inp)
    solver = create_solver(rc.solver_type, rc)
    with pytest.raises(ValueError, match="Roe flux not supported"):
        solver.initialize()


def test_restart_roundtrip(tmp_path):
    tps = _run("channel2d.ini", max_iters=2, outdir=tmp_path)
    tps.solve()
    solver = tps.solver
    U_end = np.asarray(solver.U).copy()
    it_end, t_end = solver.iter, solver.time

    # enableRestart => the solver reads the checkpoint at initialize()
    # (reference: src/M2ulPhyS.cpp:1930-1946)
    tps2 = _run("channel2d.ini", outdir=tmp_path, enable_restart=True)
    assert tps2.solver.iter == it_end
    assert abs(tps2.solver.time - t_end) < 1e-15
    assert np.array_equal(np.asarray(tps2.solver.U), U_end)


def test_partitioned_restart_roundtrip(tmp_path):
    """Per-shard restart files ([io]/restartMode = standard at nprocs > 1,
    reference test/cyl3d.test:115-204 incl. rank-count change): write with
    one decomposition, reassemble globally, restart a single-shard run."""
    from tps_tpu.io.restart import (
        _state_field_names,
        read_partitioned,
        write_partitioned,
    )

    tps = _run("channel2d.ini", max_iters=2, outdir=tmp_path)
    tps.solve()
    solver = tps.solver
    names = _state_field_names(solver.mixture)
    U_end = np.asarray(solver.U).copy()
    ne, ndof, neq = U_end.shape
    part = (np.arange(ne) * 3) // ne  # 3-shard block partition
    write_partitioned(tmp_path, U_end, part, names,
                      iteration=solver.iter, time=solver.time,
                      dt=solver.dt, order=solver.config.order)
    for p in range(3):
        assert (tmp_path / f"restart_output.sol.{p}.h5").exists()
    assert (tmp_path / "partition.3.h5").exists()

    U_back, attrs = read_partitioned(tmp_path, ne, ndof, names)
    assert np.array_equal(U_back, U_end)
    assert int(attrs["nprocs"]) == 3

    # the solver's own read path picks up the per-shard layout (the
    # partitioned -> serialized restart scenario)
    tps2 = _run("channel2d.ini", outdir=tmp_path, enable_restart=True)
    assert tps2.solver.iter == solver.iter
    assert np.array_equal(np.asarray(tps2.solver.U), U_end)

    # RestartIO.write dispatches to per-shard files when the solver
    # carries a partition (restartMode = standard)
    import shutil

    for p in range(3):
        os.remove(tmp_path / f"restart_output.sol.{p}.h5")
    shutil.rmtree(tmp_path / "restart", ignore_errors=True)
    solver.partition = (np.arange(ne) * 2) // ne
    solver.write_restart()
    assert (tmp_path / "restart_output.sol.1.h5").exists()
    U_back2, _ = read_partitioned(tmp_path, ne, ndof, names)
    assert np.array_equal(U_back2, U_end)


def test_cli_main(tmp_path, capsys):
    from tps_tpu.harness import main

    ini = os.path.join(HERE, "inputs", "vortex2d.ini")
    status = main(["tps-tpu", "--runFile", ini])
    assert status == 0


def test_nonreflecting_outlet():
    """Characteristic outlet: an outgoing pressure pulse leaves with less
    reflection than the reflecting pressure BC."""
    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.bc import InletBC, OutletBC, WallBC
    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import BCSlice, RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.time.integrators import rk4

    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(24, 3, x1=1.0, y1=0.125, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")

    def run(outlet_kind):
        attrs = np.asarray(tab.f_bdr_attr)
        bcs = []
        for a in sorted(set(attrs.tolist())):
            rows = np.where(attrs == a)[0]
            if a in (2, 4):  # both ends: outlets under test
                bc = OutletBC(pressure=101300.0, kind=outlet_kind)
            else:
                bc = WallBC(kind="inviscid")
            bcs.append(BCSlice(bc=bc, start=int(rows.min()), stop=int(rows.max()) + 1))
        ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl), bcs=tuple(bcs))
        x = tab.xyz_dof[..., 0]
        # right-going acoustic pulse: p-u-rho perturbations on the same
        # characteristic so exactly one wave exits through x=1
        rho0, p_inf = 1.2, 101300.0
        c0 = float(np.sqrt(1.4 * p_inf / rho0))
        dp = 2000.0 * jnp.exp(-((x - 0.6) / 0.06) ** 2)
        rho = rho0 + dp / c0**2
        u = dp / (rho0 * c0)
        T = (p_inf + dp) / (mix.gas_constant * rho)
        Up = jnp.stack([rho, u, jnp.zeros_like(x), T], axis=-1)
        U = mix.conservatives(Up)
        step = jax.jit(lambda u_, t, dt: rk4(
            lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u_, t, dt)[0])
        dt = 2e-6
        # pulse exits right by ~1.4 ms; run to 2 ms
        for i in range(1000):
            U = step(U, i * dt, dt)
        p = np.asarray(mix.pressure(U))
        return np.abs(p - 101300.0).max()

    resid_nr = run("nonReflectingPressure")
    resid_ref = run("subsonicPressure")
    assert resid_nr < 0.5 * resid_ref, (resid_nr, resid_ref)
    assert resid_nr < 300.0, resid_nr


def test_variable_order_restart(tmp_path):
    """Restart a p=1 run into a p=2 solver (reference variableP mode,
    test/cyl3d.test p1->p2 scenario)."""
    tps1 = _run("channel2d.ini", max_iters=2)
    tps1.config.outdir = str(tmp_path)
    tps1.solve()
    s1 = tps1.solver
    assert tps1.config.order == 2

    # new solver at higher order
    tps2 = Tps()
    tps2.input_file = os.path.join(HERE, "inputs", "channel2d.ini")
    tps2.parse_input()
    tps2.config.order = 3
    tps2.config.outdir = str(tmp_path)
    tps2.choose_devices()
    tps2.choose_solver()
    tps2.initialize()
    tps2.solver.read_restart()
    s2 = tps2.solver
    assert s2.iter == s1.iter and abs(s2.time - s1.time) < 1e-15
    # p2 -> p3 nodal interpolation is exact, so integrals must agree
    assert abs(_total_mass(s1) - _total_mass(s2)) < 1e-12 * _total_mass(s1)
    # run a few steps at the new order without blowing up
    tps2.config.max_iters = s2.iter + 2
    while s2.iter < tps2.config.max_iters:
        tps2.solve_step()
    assert s2.check_nan() == 0


def test_nonreflecting_inlet_and_massflow_outlet_exactness():
    """Characteristic inlets/outlets are exact on a matching uniform flow:
    the ghost state equals the interior, so the boundary flux equals the
    analytic convective normal flux."""
    import jax.numpy as jnp

    from tps_tpu.dg.bc import NonReflectingInletBC, OutletBC
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.physics.gas import DryAir

    mix = DryAir(dim=2, nvel=2)
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))

    rho, u, T = 1.2, 20.0, 300.0
    p = rho * mix.gas_constant * T
    n = 4
    UL = jnp.tile(jnp.asarray(
        [rho, rho * u, 0.0, p / (mix.specific_heat_ratio - 1.0)
         + 0.5 * rho * u * u]), (n, 1))
    grad = jnp.zeros((n, 4, 2))
    xyz = jnp.zeros((n, 2))
    delta = jnp.ones((n, 1))

    # analytic convective flux dotted with the outward normal
    def exact(nhat):
        F = np.asarray(fl.convective(UL))
        return np.einsum("ned,d->ne", F, nhat)

    # inlet: outward normal is -x (flow enters)
    nor_in = jnp.tile(jnp.asarray([-1.0, 0.0]), (n, 1))
    for kind in ("nonreflecting", "nonreflectingConstEntropy"):
        bc = NonReflectingInletBC(input_state=(rho, u, 0.0), kind=kind)
        f = np.asarray(bc.flux(ctx, UL, mix.primitives(UL), grad,
                               nor_in, xyz, delta, 0.0))
        assert np.allclose(f, exact(np.array([-1.0, 0.0])), atol=1e-10), kind

    # mass-flow outlet: outward normal +x, target mdot = rho*u*area
    nor_out = jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1))
    bc = OutletBC(kind="nonReflectingMassFlow", mass_flow=rho * u * 2.0,
                  area=2.0)
    f = np.asarray(bc.flux(ctx, UL, mix.primitives(UL), grad,
                           nor_out, xyz, delta, 0.0))
    assert np.allclose(f, exact(np.array([1.0, 0.0])), atol=1e-10)


def test_face_based_and_interpolated_inlets(tmp_path):
    """subsonicFaceBasedX and interpolate inlets run through the harness."""
    import numpy as _np

    ys = _np.linspace(0.0, 0.2, 20)
    csv = tmp_path / "inlet.csv"
    with open(csv, "w") as fh:
        fh.write("# no,x,y,z,T,u,v,w\n")
        for i, y in enumerate(ys):
            fh.write(f"{i},0.0,{y},0.0,300.0,20.0,0.0,0.0\n")

    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 3
fluid = dry_air
equation_system = navier-stokes
[mesh]
generator = box2d
nx = 8
ny = 4
x1 = 1.0
y1 = 0.2
[time]
cfl = 0.1
integrator = rk3
[initialConditions]
rho = 1.2
rhoU = 24.0
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/inlet1]
patch = 4
type = interpolate
name = {csv}
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
outdirBase = {tmp_path}/out
""")
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()
    assert tps.solver.check_nan() == 0

    # face-based inlet variant on the same case
    txt = ini.read_text().replace("type = interpolate", "type = subsonicFaceBasedX")
    txt = txt.replace(f"name = {csv}", "density = 1.2\nuvw = '20 0 0'")
    ini2 = tmp_path / "run2.ini"
    ini2.write_text(txt.replace(f"{tmp_path}/out", f"{tmp_path}/out2"))
    tps2 = Tps()
    tps2.input_file = str(ini2)
    tps2.parse_input()
    tps2.choose_devices()
    tps2.choose_solver()
    tps2.initialize()
    tps2.solve()
    assert tps2.solver.check_nan() == 0


def test_nan_guard_detects_planted_bug(tmp_path):
    """The reference validates its sanitizer tooling against planted bugs
    (test/valgrind.test:25-70 with badloop.cpp, cuda-memcheck.test with
    badcuda.cpp).  Same pattern for the NaN guard: plant a NaN in the
    state and assert the solver raises with a located report."""
    import jax.numpy as jnp
    import pytest

    from tps_tpu.harness import Tps

    ini = tmp_path / "run.ini"
    ini.write_text("""
[solver]
type = flow
[flow]
order = 1
maxIters = 5
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 4
ny = 4
periodic_x = 1
periodic_y = 1
[time]
dt_fixed = 1e-4
[initialConditions]
rho = 1.2
rhoU = 10.
rhoV = 0.
rhoW = 0.
pressure = 101300
""")
    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", str(ini)])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    tps.solve_step()  # healthy step first
    assert s.check_nan() == 0
    s.U = s.U.at[3, 0, 0].set(jnp.nan)  # planted bug
    assert s.check_nan() > 0
    # the max-char-speed NaN guard is fetched asynchronously with a small
    # step lag; it must fire within the lag window (or at drain)
    with pytest.raises(FloatingPointError, match="NaN/Inf detected"):
        for _ in range(12):
            tps.solve_step()
        s._drain_mcs_queue(0)


def test_no_nan_checkpoint_ever_written(tmp_path):
    """Invariant: the async lagged NaN guard may detect a NaN up to
    mcsLagSteps late, but a checkpoint can NEVER store NaN fields — the
    queue is drained (lag 0) before every write_restart (reference: the
    sanitizer runs before I/O in solveStep)."""
    import jax.numpy as jnp
    import pytest

    from tps_tpu.harness import Tps

    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 40
outputFreq = 2
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 4
ny = 4
periodic_x = 1
periodic_y = 1
[time]
dt_fixed = 1e-4
mcsLagSteps = 8
[initialConditions]
rho = 1.2
rhoU = 10.
rhoV = 0.
rhoW = 0.
pressure = 101300
[io]
outdirBase = {tmp_path}/out
enableRestart = 0
""")
    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", str(ini)])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    for _ in range(3):
        tps.solve_step()
    s.U = s.U.at[3, 0, 0].set(jnp.nan)  # planted bug mid-run
    with pytest.raises(FloatingPointError, match="NaN/Inf detected"):
        for _ in range(30):
            tps.solve_step()  # checkpoints every 2 steps, NaN lag 8
    # every checkpoint written before the failure is NaN-free
    import glob

    import h5py

    files = glob.glob(f"{tmp_path}/out/**/*.h5", recursive=True)
    checked = 0
    for fn in files:
        with h5py.File(fn, "r") as f:
            def walk(name, obj):
                nonlocal checked
                if hasattr(obj, "shape") and obj.dtype.kind == "f":
                    assert np.isfinite(np.asarray(obj)).all(), (fn, name)
                    checked += 1

            f.visititems(walk)
    # the run must actually have written checkpoints for this to mean
    # anything
    assert checked > 0, files


def test_chunked_solve_matches_per_step(tmp_path):
    """solve_chunk(n) is bitwise-identical to n solve_step() calls
    (chunked production loop; PERF.md round 3 dispatch amortization)."""
    import jax.numpy as jnp

    a = _run("channel2d.ini", max_iters=8, outdir=str(tmp_path / "a"))
    b = _run("channel2d.ini", max_iters=8, outdir=str(tmp_path / "b"))
    sa, sb = a.solver, b.solver
    for _ in range(8):
        sa.solve_step()
    sb.solve_chunk(4)
    sb.solve_chunk(4)
    assert sb.iter == sa.iter == 8
    np.testing.assert_array_equal(np.asarray(sa.U), np.asarray(sb.U))
    assert float(sa.dt) == float(sb.dt)
    np.testing.assert_allclose(float(sa.time), float(sb.time), rtol=1e-12)


def test_chunk_size_respects_service_boundaries(tmp_path):
    a = _run("channel2d.ini", max_iters=100, outdir=str(tmp_path / "c"))
    s = a.solver
    s.config.timing_freq = 100
    s.config.output_freq = 10
    s.config.exit_check_freq = 1000
    assert s._chunk_size() == 8  # largest power of two <= 10
    s.iter = 6
    assert s._chunk_size() == 4  # 4 steps to the output boundary
    s.iter = 9
    assert s._chunk_size() == 1
    s.config.output_freq = 1000
    s._io = None  # no restart IO -> output boundary not a constraint
    s.iter = 0
    assert s._chunk_size() == 64


def test_chunked_solve_with_stateful_bcs(tmp_path):
    """Chunked scanning carries the time-integrated characteristic BC
    ghost state through the scan: parity with per-step stepping on a
    nonReflectingPressure outlet (stateful CharacteristicOutletBC)."""
    import jax.numpy as jnp

    from tps_tpu.dg.rhs import has_stateful_bcs

    def build(sub):
        tps = _run("channel2d.ini", max_iters=8,
                   outdir=str(tmp_path / sub))
        return tps.solver

    # rewrite the deck's outlet to the stateful characteristic one
    import os

    src = open(os.path.join(HERE, "inputs", "channel2d.ini")).read()
    assert "subsonicPressure" in src
    mod = src.replace("type = subsonicPressure",
                      "type = nonReflectingPressure")
    pa = tmp_path / "nr.ini"
    pa.write_text(mod)

    def build_nr(sub):
        from tps_tpu.harness import Tps

        tps = Tps()
        tps.input_file = str(pa)
        tps.parse_input()
        tps.config.max_iters = 8
        tps.config.outdir = str(tmp_path / sub)
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        return tps.solver

    a = build_nr("a")
    assert has_stateful_bcs(a.ctx)
    b = build_nr("b")
    for _ in range(8):
        a.solve_step()
    b.solve_chunk(4)
    b.solve_chunk(4)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    # the BC ghost state itself matches
    for sa, sb in zip(a.bc_states, b.bc_states):
        if sa is not None:
            np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_flow_chunk_compile_failure_falls_back(monkeypatch):
    """Planted chunk-compile failure: the solve loop must disable chunking
    and finish per-step (hosted-TPU XLA has been observed to SIGILL on
    scanned programs; production runs must survive it)."""
    tps = _run("vortex2d.ini")
    s = tps.solver

    def boom(n):
        raise RuntimeError("planted chunk-compile failure")

    monkeypatch.setattr(s, "solve_chunk", boom)
    tps.solve()
    assert s.iter == s.config.max_iters
    assert getattr(s, "_chunk_disabled", False) is True
    assert s.check_nan() == 0


def test_die_file_early_exit(tmp_path):
    """DIE file triggers a clean early exit with STATUS_EARLY_EXIT and a
    checkpoint (reference die.test, src/utils.cpp:144-157)."""
    from tps_tpu.utils.job_management import STATUS_EARLY_EXIT

    tps = _run("channel2d.ini", max_iters=50, outdir=tmp_path,
               enable_restart=None)
    tps.config.exit_check_freq = 1
    (tmp_path / "DIE").write_text("")
    tps.solve()
    s = tps.solver
    assert s.status == STATUS_EARLY_EXIT
    assert tps.get_status() == STATUS_EARLY_EXIT
    assert s.iter < 50  # stopped well before maxIters


def test_walltime_checkpoint_resubmit(tmp_path, monkeypatch):
    """Near-walltime: checkpoint + STATUS_JOB_RESTART exit (reference
    Check_JobResubmit, src/utils.cpp:133 + M2ulPhyS.cpp:2160-2170)."""
    import time as _t

    from tps_tpu.utils.job_management import STATUS_JOB_RESTART

    tps = _run("channel2d.ini", max_iters=50, outdir=tmp_path)
    tps.config.exit_check_freq = 1
    tps.config.enable_auto_restart = True
    tps.config.rm_threshold = 3600  # everything is "almost done"
    monkeypatch.setenv("TPS_JOB_END_TIME", str(_t.time() + 60))
    tps.solve()
    s = tps.solver
    assert s.status == STATUS_JOB_RESTART
    assert s.iter < 50
    assert (tmp_path / "restart_output.sol.h5").exists()
