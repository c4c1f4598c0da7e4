"""Benchmark: three production-path metrics on one chip.

Prints ONE JSON line. The primary metric (fused periodic-box
DOF-steps/sec) keeps the round-1/2 series comparable; `extra_metrics`
records the two real-case paths the fused number excludes
(BASELINE.md north-star configs 2-3):

  - general_ns_box_ms_per_rhs: the BC'd (slot-path) 16^3 NS box with
    inviscid walls — every real-mesh case (cyl, plasma) runs this path.
    vs_baseline = round-2's 1.83 ms / measured (>= 1 means no slower).
    NOTE: round 2's 1.83 was a pure-RHS timing; this metric times the
    full production step (4 RHS + RK4 + wave-speed reduction + per-step
    dispatch) / 4, so ~0.3 ms/RHS of step overhead is included. The
    pure-RHS time measured under the same protocol as round 2 is
    ~1.9-2.0 ms.
  - argon_cli_ms_per_step: full production solve_step() on the argon
    plasma deck (examples/cases/argon_plasma_2d.ini) including the CLI
    services + async NaN/CFL machinery. vs_baseline = round-2's 8.8 ms
    / measured.

The reference publishes no numbers (BASELINE.md); its north star is
">=10x DOF-steps/sec over the CPU reference". We take 1e6 DOF-steps/sec
as a generous estimate of the reference's CPU-core throughput on
comparable p=2 DG Navier-Stokes (O(1us)/dof/rhs with ~4 RHS per RK4
step), so the primary baseline target is 1e7 DOF-steps/sec and
vs_baseline = value / 1e7 (kept as-is so the round series stays
comparable).

Round 4: that estimate is now CALIBRATED. `TPS_BENCH_CPU_CALIBRATE=1
python bench.py` measures this framework's own single-core CPU (host
JAX) throughput on the general, argon-1024, loMach-reacting and
coupled-torch configs and writes CALIBRATION.json; the gate metrics
then carry measured 10x-over-CPU targets: the loMach-reacting and
coupled-torch vs_baseline = (cpu_ms/10) / measured_ms, and the
DOF-steps metrics report `vs_cpu_10x` alongside the 1e7-series number.
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: the implicit-solver benches compile
# multi-minute programs (warmup only; never inside a timed section)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# TPS_BENCH_SMOKE=1: minimal step counts on the CPU backend (CI smoke of
# every bench path; timings meaningless)
SMOKE = bool(int(os.environ.get("TPS_BENCH_SMOKE", "0")))
# TPS_BENCH_CPU_CALIBRATE=1: measure this framework's own single-core
# CPU throughput on the gate configs and write CALIBRATION.json — the
# reference-CPU proxy that gives every gate metric a real denominator
# (the reference publishes no numbers; its north star is ">=10x the CPU
# reference", BASELINE.md)
CAL = bool(int(os.environ.get("TPS_BENCH_CPU_CALIBRATE", "0")))
if SMOKE or CAL:
    import jax

    jax.config.update("jax_platforms", "cpu")

BASELINE_DOF_STEPS_PER_SEC = 1.0e7  # 10x assumed 1e6 reference CPU
BASELINE_GENERAL_MS_PER_RHS = 1.83  # round-2 measured (PERF.md)
BASELINE_ARGON_MS_PER_STEP = 8.8  # round-2 measured (PERF.md)

HERE = os.path.dirname(os.path.abspath(__file__))


def _n(smoke_n, full_n):
    """Iteration count for the current mode: tiny for the CI smoke,
    moderate for the CPU calibration (single-core steps are ~100x the
    TPU's), full for the TPU gate."""
    if SMOKE:
        return smoke_n
    if CAL:
        return max(smoke_n, full_n // 8)
    return full_n


def _calibration():
    """CALIBRATION.json: measured single-core CPU ms/step for the gate
    configs (written by TPS_BENCH_CPU_CALIBRATE=1).  The 10x-over-CPU
    target for a metric is cpu_ms / 10."""
    path = os.path.join(HERE, "CALIBRATION.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def bench_fused():
    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.fused import maybe_build_fused
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_3d
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.physics.transport import DryAirTransport
    from tps_tpu.time.integrators import rk4
    from tps_tpu.utils.cases import uniform_state

    dtype = jnp.float32

    # 3-D viscous flow in a periodic box: the compute profile of the
    # reference's cyl3d case (hex elements, p=2, 5 equations, full NS).
    mix = DryAir(dim=3, nvel=3)
    n = 16
    mesh = box_3d(n, n, n, periodic=(True, True, True))
    tab_np = build_tables(mesh, order=2)
    tab = tab_np.to_jax(dtype)
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant, mix.specific_heat_ratio),
        eq_system="navier-stokes",
    )
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    # fused-minor-dim fast path (dg/fused.py): the production RHS on
    # structured periodic meshes; falls back to the slot path otherwise.
    # On TPU the two-kernel Pallas megakernel (dg/pallas_fused.py, all
    # intermediates in VMEM) is the default: 0.30 vs 1.44 ms/RHS measured
    # on v5e (PERF.md round 4). TPS_PALLAS=0 opts out.
    fused = None
    if (int(os.environ.get("TPS_PALLAS", "1"))
            and jax.default_backend() == "tpu"):
        from tps_tpu.dg.pallas_fused import maybe_build_pallas_fused

        fused = maybe_build_pallas_fused(tab_np, ctx, dtype=dtype)
    if fused is None:
        fused = maybe_build_fused(tab_np, ctx, dtype=dtype)

    xyz = tab.xyz_dof
    two_pi = 2 * np.pi
    Up = uniform_state(xyz, mix, 1.2, (10.0, 0.0, 0.0), 300.0)
    Up = Up.at[..., 1].add(
        5.0 * jnp.sin(two_pi * xyz[..., 0]) * jnp.cos(two_pi * xyz[..., 1]))
    Up = Up.at[..., 2].add(
        -5.0 * jnp.cos(two_pi * xyz[..., 0]) * jnp.sin(two_pi * xyz[..., 1]))
    U = mix.conservatives(Up).astype(dtype)

    ndof_total = tab.ne * tab.ndof  # solution points (per equation)
    nsteps = _n(4, 50)

    rhs_fn = fused if fused is not None else (
        lambda uu, t2: compute_rhs(ctx, tab, uu, t2)
    )
    if fused is not None:
        U = fused.to_fused(U)

    @jax.jit
    def run(U_in, t, dt):
        def body(carry, _):
            u, tt = carry
            u2, aux = rk4(rhs_fn, u, tt, dt)
            return (u2, tt + dt), aux["max_char_speed"]

        (Uf, _), mcs = jax.lax.scan(body, (U_in, t), None, length=nsteps)
        return Uf, mcs[-1]

    dt = jnp.asarray(5e-6, dtype)
    t = jnp.asarray(0.0, dtype)

    U1, mcs = run(U, t, dt)  # warmup + compile
    U1.block_until_ready()

    t0 = time.perf_counter()
    Uc, mcs = run(U, t, dt)
    Uc.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = nsteps / elapsed
    value = float(ndof_total * steps_per_sec)
    # measured single-core CPU DOF-steps/s on the same physics (general
    # path, CALIBRATION.json) — the calibrated version of the 1e6
    # estimate behind BASELINE_DOF_STEPS_PER_SEC
    cal = _calibration().get("general_cpu_dof_steps_per_sec")
    return {
        "metric": "DOF-steps/sec/chip (3D NS p=2 hex, RK4, f32)",
        "value": value,
        "unit": "dof*steps/s",
        "vs_baseline": value / BASELINE_DOF_STEPS_PER_SEC,
        "detail": {
            "elements": int(tab.ne),
            "ndof_per_elem": int(tab.ndof),
            "dofs": int(ndof_total),
            "steps_per_sec": steps_per_sec,
            "rk_substep_ms": 1e3 * elapsed / (nsteps * 4),
            "max_char_speed": float(mcs),
            "cpu_dof_steps_per_sec": cal,
            "vs_cpu_10x": value / (10.0 * cal) if cal else None,
        },
    }


def _make_solver(ini_text):
    import tps_tpu.harness  # noqa: F401 (registry side-effect)
    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.solvers.base import create_solver

    import tempfile

    f = tempfile.NamedTemporaryFile("w", suffix=".ini", delete=False)
    f.write(ini_text)
    f.close()
    inp = IniInput.read(f.name)
    rc = parse_run_configuration(inp)
    s = create_solver(rc.solver_type, rc)
    s.initialize()
    return s


def _bench_ns_box(gll):
    """BC'd 16^3 NS box (inviscid walls) on the general slot path at
    either the GL collocation the round-2/3 series measured (gll=False)
    or the reference-DEFAULT discretization (gll=True: basisType=1 GLL
    basis + integrationRule=1 GLL rule — the exact config whose RHS
    lands in the reference's MASA bracket; defaults
    /root/reference/src/M2ulPhyS.cpp:2671-2672, deck
    test/inputs/mms.euler.2d.quad.ini:8-9)."""
    import jax.numpy as jnp  # noqa: F401

    basis_lines = ("basisType = 1\nintegrationRule = 1" if gll
                   else "basisType = 0\nintegrationRule = 0")
    walls = "\n".join(
        f"[boundaryConditions/wall{i}]\npatch = {i}\ntype = inviscid\n"
        for i in range(1, 7)
    )
    s = _make_solver(f"""
[solver]
type = flow
[flow]
order = 2
maxIters = 4
outputFreq = 100000
timingFreq = 100000
fluid = dry_air
equation_system = navier-stokes
# GL basis/rule is the round-2/3 measurement series; GLL is the
# reference default (~4x more face/volume quadrature work +
# non-collocated mass)
{basis_lines}
[mesh]
generator = box3d
nx = 16
ny = 16
nz = 16
[time]
cfl = 0.1
integrator = rk4
[initialConditions]
rho = 1.2
rhoU = 12.0
rhoV = 0.0
rhoW = 0.0
pressure = 101300
{walls}
[boundaryConditions]
numWalls = 6
[io]
outdirBase = /tmp/tps_bench_general{'_gll' if gll else ''}
""")
    import jax

    # warmup/compile the chunked production path (solve() runs this when
    # no per-step diagnostics are enabled)
    # chunk 16: chunk 32 programs take >30 min in the hosted remote
    # compiler; with the wait-free guard drains the per-chunk overhead
    # is already amortized at 16
    ck = _n(2, 16)
    s.solve_chunk(ck)
    s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    nchunk = _n(1, 8)
    t0 = time.perf_counter()
    for _ in range(nchunk):
        s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    elapsed = time.perf_counter() - t0
    ms_per_rhs = 1e3 * elapsed / (nchunk * ck * 4)  # RK4: 4 RHS per step
    dofsteps = s.tables.ne * s.tables.ndof * nchunk * ck / elapsed
    return s, ms_per_rhs, dofsteps, nchunk * ck


def bench_general():
    """BC'd 16^3 NS box (inviscid walls): the general slot path that every
    real-mesh case runs (PERF.md 'General (slot) path')."""
    s, ms_per_rhs, dofsteps, steps = _bench_ns_box(gll=False)
    cal = _calibration().get("general_cpu_ms_per_rhs")
    return {
        "metric": "general-path ms/RHS (BC'd 16^3 NS box, p=2, chunked)",
        "value": ms_per_rhs,
        "unit": "ms",
        "vs_baseline": BASELINE_GENERAL_MS_PER_RHS / ms_per_rhs,
        "detail": {"elements": int(s.tables.ne),
                   "steps_timed": steps,
                   "dof_steps_per_sec": dofsteps,
                   "vs_cpu_10x": (cal / 10.0) / ms_per_rhs if cal
                   else None},
    }


def bench_general_gll():
    """The same NS box at the reference-default GLL discretization
    (VERDICT r4 item 2): the config that reproduces the reference's MASA
    RHS bracket, with its own CPU calibration — so 'matches the
    reference's numbers' and '>=10x CPU' are demonstrated on the SAME
    discretization."""
    s, ms_per_rhs, dofsteps, steps = _bench_ns_box(gll=True)
    cal = _calibration().get("general_gll_cpu_ms_per_rhs")
    return {
        "metric": ("general-path ms/RHS at reference-default GLL "
                   "(basisType=1, integrationRule=1)"),
        "value": ms_per_rhs,
        "unit": "ms",
        "vs_baseline": (cal / 10.0) / ms_per_rhs if cal else 0.0,
        "detail": {"elements": int(s.tables.ne),
                   "steps_timed": steps,
                   "dof_steps_per_sec": dofsteps,
                   "cpu_ms_per_rhs": cal,
                   "target_ms_per_rhs_10x_cpu":
                       cal / 10.0 if cal else None},
    }


def bench_argon():
    """Production solve_step() on the argon plasma deck: full CLI-path
    step incl. services and the async NaN/CFL machinery."""
    deck = os.path.join(HERE, "examples", "cases", "argon_plasma_2d.ini")
    with open(deck) as f:
        txt = f.read()
    # keep timing prints / restart writes (each one a ~24 ms relay round
    # trip, PERF.md round 4) out of the timed window; pin the GL basis
    # the round-2/3 series measured (ini default is the reference's GLL)
    txt = txt.replace("outputFreq = 100",
                      "outputFreq = 100000\ntimingFreq = 100000\n"
                      "basisType = 0\nintegrationRule = 0")
    s = _make_solver(txt)
    import jax

    # warmup/compile the chunked production path
    # chunk 16: chunk 32 programs take >30 min in the hosted remote
    # compiler; with the wait-free guard drains the per-chunk overhead
    # is already amortized at 16
    ck = _n(2, 16)
    s.solve_chunk(ck)
    s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    nchunk = _n(1, 8)
    t0 = time.perf_counter()
    for _ in range(nchunk):
        s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    elapsed = time.perf_counter() - t0
    ms_per_step = 1e3 * elapsed / (nchunk * ck)
    return {
        "metric": "argon plasma CLI ms/step (2-T, RK4, chunked)",
        "value": ms_per_step,
        "unit": "ms",
        "vs_baseline": BASELINE_ARGON_MS_PER_STEP / ms_per_step,
        "detail": {"elements": int(s.tables.ne),
                   "steps_timed": nchunk * ck},
    }


def bench_cyl():
    """Viscous flow past a cylinder on a curved O-grid at production
    resolution (BASELINE.md north-star config 2, cyl3d-class): curved
    elements (full batched inverse mass), isothermal wall +
    characteristic far field, chunked production stepping."""
    import jax

    s = _make_solver("""
[solver]
type = flow
[flow]
order = 2
maxIters = 4
outputFreq = 100000
timingFreq = 100000
fluid = dry_air
equation_system = navier-stokes
viscosityMultiplier = 1000.
[mesh]
generator = annulus2d
nr = 24
ntheta = 96
r0 = 0.5
r1 = 8.0
[time]
cfl = 0.15
integrator = rk4
[initialConditions]
rho = 1.2
rhoU = 40.
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/wall1]
patch = 4
type = viscous_isothermal
temperature = 300
[boundaryConditions/farfield1]
patch = 2
type = farfield
density = 1.2
uvw = '33.3 0 0'
pressure = 101300
[boundaryConditions]
numWalls = 1
numOutlets = 1
[io]
outdirBase = /tmp/tps_bench_cyl
""")
    # chunk 16: chunk 32 programs take >30 min in the hosted remote
    # compiler; with the wait-free guard drains the per-chunk overhead
    # is already amortized at 16
    ck = _n(2, 16)
    s.solve_chunk(ck)
    s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    nchunk = _n(1, 6)
    t0 = time.perf_counter()
    for _ in range(nchunk):
        s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    elapsed = time.perf_counter() - t0
    nsteps = nchunk * ck
    ms_per_rhs = 1e3 * elapsed / (nsteps * 4)
    dofsteps = s.tables.ne * s.tables.ndof * nsteps / elapsed
    return {
        "metric": "cyl O-grid ms/RHS (curved 2304-elem p=2 NS)",
        "value": ms_per_rhs,
        "unit": "ms",
        "vs_baseline": dofsteps / BASELINE_DOF_STEPS_PER_SEC,
        "detail": {"elements": int(s.tables.ne),
                   "dof_steps_per_sec": dofsteps,
                   "steps_timed": nsteps},
    }


def bench_argon_big():
    """Argon 2-T ternary plasma at production resolution (north-star
    config 3): 32x32 p=2 box, ambipolar + two-temperature + chemistry."""
    import jax

    deck = os.path.join(HERE, "examples", "cases", "argon_plasma_2d.ini")
    with open(deck) as f:
        txt = f.read()
    txt = txt.replace("nx = 6", "nx = 32").replace("ny = 6", "ny = 32")
    txt = txt.replace("order = 1", "order = 2")
    txt = txt.replace("outputFreq = 100",
                      "outputFreq = 100000\ntimingFreq = 100000\n"
                      "basisType = 0\nintegrationRule = 0")
    # at this resolution the ELECTRON-energy diffusion limit (dt ~ h^2 /
    # alpha_e) binds before the convective CFL (dt ~ h) that the CFL
    # controller tracks (the reference's dt formula is convective-only
    # too, src/M2ulPhyS.cpp:2013-2016); cfl=0.02 keeps dt under it
    txt = txt.replace("cfl = 0.1", "cfl = 0.02")
    s = _make_solver(txt)
    # chunk 16: chunk 32 programs take >30 min in the hosted remote
    # compiler; with the wait-free guard drains the per-chunk overhead
    # is already amortized at 16
    ck = _n(2, 16)
    s.solve_chunk(ck)
    s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    nchunk = _n(1, 6)
    t0 = time.perf_counter()
    for _ in range(nchunk):
        s.solve_chunk(ck)
    jax.block_until_ready(s.U)
    elapsed = time.perf_counter() - t0
    nsteps = nchunk * ck
    ms_per_step = 1e3 * elapsed / nsteps
    dofsteps = s.tables.ne * s.tables.ndof * nsteps / elapsed
    cal = _calibration().get("argon_big_cpu_dof_steps_per_sec")
    return {
        "metric": "argon plasma ms/step (1024-elem p=2, 2-T ternary)",
        "value": ms_per_step,
        "unit": "ms",
        "vs_baseline": dofsteps / BASELINE_DOF_STEPS_PER_SEC,
        "detail": {"elements": int(s.tables.ne),
                   "dof_steps_per_sec": dofsteps,
                   "steps_timed": nsteps,
                   # a non-DryAir gate config on the fused roll path
                   # (periodic plasma configs leave the slot path;
                   # VERDICT r4 item 3)
                   "fused_path": s._fused is not None,
                   "pallas": bool(s._fused_pallas),
                   "cpu_dof_steps_per_sec": cal,
                   "vs_cpu_10x": dofsteps / (10.0 * cal) if cal else None},
    }


def bench_lomach_reacting():
    """Low-Mach finite-rate reacting flow (north-star config 4,
    lomach-reacting class): Tomboulides split scheme + operator-split
    reacting thermo with argon 3-species chemistry, implicit Helmholtz/
    pressure solves, 24x48 p=2."""
    import jax

    deck = os.path.join(HERE, "examples", "cases", "argon_plasma_2d.ini")
    with open(deck) as f:
        argon = f.read()
    argon = "[plasma_models]" + argon.split("[plasma_models]", 1)[1]
    argon = argon.rsplit("[io]", 1)[0]
    s = _make_solver(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 24
ny = 48
x1 = 0.01
y1 = 0.02
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = reacting-flow
maxIters = 100
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
outdirBase = /tmp/tps_bench_lomach_react
{argon}
""")
    for _ in range(4):  # warmup/compile (BDF startup runs per-step)
        s.solve_step()
    # chunked production path.  The SCANNED chunk is known-broken on the
    # hosted TPU compiler for the reacting step — nondeterministically
    # either a SIGILL in the fusion cost model (rounds 3-5) or a
    # miscompiled loop ~200x slower than straight-line code (round-5
    # gate: 8398 ms/step vs 43) — so the gate deterministically uses the
    # UNROLLED chunk (straight-line code compiles and runs correctly,
    # ~23 ms/step warm), with per-step as the final fallback.
    chunked = True
    chunk_fail = ("scanned chunk skipped: hosted-compiler SIGILL or "
                  "miscompiled loop (PERF.md rounds 3-5); unrolled "
                  "chunk in use")
    try:
        s._chunk_unroll = True
        s._chunk_cache = {}
        s.solve_chunk(8)  # compile the unrolled chunk
        jax.block_until_ready(s.thermo.T)
    except Exception as e_unroll:
        chunked = False
        chunk_fail = (f"unrolled chunk failed: {type(e_unroll).__name__}: "
                      f"{str(e_unroll)[:300]}")
        s.solve_step()  # already compiled; per-step timing
        jax.block_until_ready(s.thermo.T)
    if chunked:
        # sanity probe: keep the faster of chunked vs per-step
        t0 = time.perf_counter()
        s.solve_chunk(8)
        jax.block_until_ready(s.thermo.T)
        chunk_probe = (time.perf_counter() - t0) / 8
        t0 = time.perf_counter()
        for _ in range(2):
            s.solve_step()
        jax.block_until_ready(s.thermo.T)
        step_probe = (time.perf_counter() - t0) / 2
        if chunk_probe > step_probe:
            chunked = False
            chunk_fail += (
                "; unrolled chunk probed slower than per-step "
                f"({1e3 * chunk_probe:.1f} vs {1e3 * step_probe:.1f} "
                "ms/step); per-step timing kept")
    nrep = _n(8, 24)  # multiple of the chunk size (8)
    t0 = time.perf_counter()
    if chunked:
        for _ in range(nrep // 8):
            s.solve_chunk(8)
    else:
        for _ in range(nrep):
            s.solve_step()
    jax.block_until_ready(s.thermo.T)
    elapsed = time.perf_counter() - t0
    ms_per_step = 1e3 * elapsed / nrep
    # 10x-over-CPU target from the measured single-core CPU calibration
    # (CALIBRATION.json, written by TPS_BENCH_CPU_CALIBRATE=1)
    cal = _calibration().get("lomach_reacting_cpu_ms_per_step")
    return {
        "metric": "loMach reacting ms/step (1152-elem p=2, argon chem)",
        "value": ms_per_step,
        "unit": "ms",
        "vs_baseline": (cal / 10.0) / ms_per_step if cal else 0.0,
        "detail": {"elements": 24 * 48, "steps_timed": nrep,
                   "chunked": chunked,
                   "chunk_unrolled": bool(getattr(s, "_chunk_unroll",
                                                  False)),
                   "chunk_fail_reason": chunk_fail,
                   "cpu_ms_per_step": cal,
                   "target_ms_per_step_10x_cpu":
                       cal / 10.0 if cal else None},
    }


def bench_torch_coupled():
    """Coupled axisymmetric plasma torch (north-star config 5): low-Mach
    LTE column + ring-coil EM, cycle-averaged Joule coupling with power
    control (solve-em-every-n = 10); mean ms per flow step including the
    amortized EM solves."""
    import jax

    deck = os.path.join(HERE, "examples", "cases",
                        "torch_axisym_coupled.ini")
    with open(deck) as f:
        txt = f.read()
    txt = txt.replace("outdirBase = output/torch",
                      "outdirBase = /tmp/tps_bench_torch")
    s = _make_solver(txt)
    # warmup through the chunk-aware coupled loop (compiles the EM solve,
    # the flow chunk scans, and the interpolators)
    s.flow.max_iters_cfg = _n(12, 24)
    s.solve()
    # reset the EM attribution counters: the warmup's solves carry the
    # one-time compile cost, which would pollute the warm em_solve_ms
    # average (observed: 789 ms "avg" when the warm solve is ~45 ms)
    s.em_solve_count = 0
    s.em_solve_ms_total = 0.0
    nrep = _n(12, 40)
    s.flow.max_iters_cfg = s.flow.iter + nrep
    t0 = time.perf_counter()
    s.solve()
    elapsed = time.perf_counter() - t0
    ms_per_step = 1e3 * elapsed / nrep
    cal = _calibration().get("torch_coupled_cpu_ms_per_step")
    # per-EM-solve attribution (VERDICT r3 #9): wall time + Krylov
    # iteration counts so the AMS/preconditioner work has a regression
    # guard and the coupled ms/step number has an attribution
    nem = getattr(s, "em_solve_count", 0)
    em_ms = (getattr(s, "em_solve_ms_total", 0.0) / nem) if nem else None
    return {
        "metric": "coupled torch ms/step (axisym LTE + EM every 10)",
        "value": ms_per_step,
        "unit": "ms",
        "vs_baseline": (cal / 10.0) / ms_per_step if cal else 0.0,
        "detail": {"steps_timed": nrep, "solve_em_every_n": 10,
                   "em_solve_ms": em_ms,
                   "em_solve_iters": getattr(s, "em_solve_iters_last", None),
                   "em_solves": nem,
                   "cpu_ms_per_step": cal,
                   "target_ms_per_step_10x_cpu":
                       cal / 10.0 if cal else None},
    }


def calibrate():
    """Measure this framework's single-core CPU throughput on the gate
    configs and write CALIBRATION.json.  This is the reference-CPU proxy
    behind every vs_baseline denominator: the reference publishes no
    numbers (BASELINE.md), so '10x over the CPU reference' is made
    falsifiable by measuring OUR OWN general/reacting/coupled paths on
    one CPU core and targeting cpu_ms / 10."""
    import platform
    import sys

    out = dict(_calibration())  # keep keys not re-measured this run
    out.update({
        "host": platform.node(),
        "nproc": os.cpu_count(),
        "platform": "cpu (jax host backend, single core)",
        "note": "single-core CPU proxy for the reference's CPU-core "
                "throughput; 10x targets = cpu_ms / 10. Proxy bound: "
                "the proxy is THIS framework's own jitted XLA:CPU "
                "single core, which on like-for-like DG loops is the "
                "same vectorized-compiled regime as the reference's "
                "C++/MFEM CPU path; no independent reference build "
                "exists in this environment to cross-check, so "
                "vs_cpu_10x inherits the proxy's (unbounded but "
                "same-order) uncertainty.",
    })
    # TPS_BENCH_CAL_ONLY=general_gll,... re-measures only those keys
    # (merging with the committed file) so one new gate metric does not
    # silently shift every other gate's denominator
    only = set(filter(None, os.environ.get(
        "TPS_BENCH_CAL_ONLY", "").split(",")))

    def want(name):
        return not only or name in only

    if want("general"):
        g = bench_general()
        out["general_cpu_ms_per_rhs"] = g["value"]
        out["general_cpu_dof_steps_per_sec"] = (
            g["detail"]["dof_steps_per_sec"])
    if want("general_gll"):
        gg = bench_general_gll()
        out["general_gll_cpu_ms_per_rhs"] = gg["value"]
        out["general_gll_cpu_dof_steps_per_sec"] = (
            gg["detail"]["dof_steps_per_sec"])
    if want("argon_big"):
        a = bench_argon_big()
        out["argon_big_cpu_ms_per_step"] = a["value"]
        out["argon_big_cpu_dof_steps_per_sec"] = (
            a["detail"]["dof_steps_per_sec"])
    if want("lomach_reacting"):
        lr = bench_lomach_reacting()
        out["lomach_reacting_cpu_ms_per_step"] = lr["value"]
    if want("torch_coupled"):
        tc = bench_torch_coupled()
        out["torch_coupled_cpu_ms_per_step"] = tc["value"]
    with open(os.path.join(HERE, "CALIBRATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), file=sys.__stdout__)


def main():
    import contextlib
    import sys

    global SMOKE
    with contextlib.ExitStack() as stack:
        # solver screen output (coupled-torch diagnostics etc.) goes to
        # stderr: the gate contract is ONE JSON line on stdout
        stack.enter_context(contextlib.redirect_stdout(sys.stderr))
        if CAL:
            calibrate()
        else:
            _run_benches()


def _run_benches():
    import json as _json
    import sys

    global SMOKE
    try:
        primary = bench_fused()
    except Exception as e:
        # backend unavailable (e.g. the hosted-TPU tunnel is down): fall
        # back to a CPU smoke pass so the gate still emits its JSON line,
        # flagged so the numbers are not mistaken for TPU timings
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass
        SMOKE = True
        primary = bench_fused()
        primary["detail"]["backend_fallback"] = (
            f"TPU backend unavailable ({type(e).__name__}); CPU smoke "
            "numbers, timings not meaningful"
        )
        primary["vs_baseline"] = 0.0
    extras = []
    for fn in (bench_general, bench_general_gll, bench_argon, bench_cyl,
               bench_argon_big, bench_lomach_reacting,
               bench_torch_coupled):
        try:
            extras.append(fn())
        except Exception as e:  # record the failure, keep the gate green
            extras.append({"metric": fn.__name__, "error": repr(e)})
    primary["extra_metrics"] = extras
    print(json.dumps(primary), file=sys.__stdout__)


if __name__ == "__main__":
    main()
