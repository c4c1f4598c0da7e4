"""Mixed tri/quad meshes: per-geometry buckets coupled through interface
faces (reference: MFEM mixed meshes, test/meshes/cyl-2d-mixed.msh used by
test/inputs/input.cyl-2d.case*.ini; element-type bucketing as in
src/dgNonlinearForm.cpp:96-104)."""

import jax
import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.bc import InletBC, OutletBC, WallBC
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.mixed import build_mixed_tables, compute_rhs_mixed, make_bc_slices
from tps_tpu.dg.rhs import RHSContext
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.mixed import mixed_box_2d
from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.transport import DryAirTransport
from tps_tpu.utils.cases import isentropic_vortex, uniform_state


def _contexts(mt, mix, eq_system, bc_by_attr):
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant, mix.specific_heat_ratio),
        eq_system=eq_system,
    )
    slices = make_bc_slices(mt, bc_by_attr) if bc_by_attr else ((), ())
    return tuple(
        RHSContext(fluxes=fl, riemann=Rusanov(fl), bcs=slices[b])
        for b in range(2)
    )


def test_mixed_tables_topology():
    mm = mixed_box_2d(6, 4, tri_from=0.5)
    mt = build_mixed_tables(mm, order=2)
    tri, quad = mt.buckets
    assert {b.ne for b in mt.buckets} == {12, 24}  # 3x4 quads + 2*3*4 tris
    assert mt.n_iface == 4  # one seam column
    # every real boundary face has a real attribute
    for tab in mt.buckets:
        nreal = tab.nfb - mt.n_iface
        assert set(np.asarray(tab.f_bdr_attr[:nreal])) <= {1, 2, 3, 4}
    # total area from the two buckets' Jacobians
    area = sum(
        float(np.einsum("q,nq->", np.asarray(b.wq), np.asarray(b.detJ)))
        for b in mt.buckets
    )
    assert abs(area - 1.0) < 1e-12


def test_mixed_free_stream_preservation():
    """Uniform flow through a mixed mesh gives RHS ~ 0 (interface flux
    consistency + BC well-balancedness), viscous path included."""
    mix = DryAir(dim=2, nvel=2)
    mm = mixed_box_2d(8, 6, tri_from=0.5)
    mt = build_mixed_tables(mm, order=2).to_jax(jnp.float64)

    rho, u0, T0 = 1.2, 40.0, 300.0
    p0 = rho * mix.gas_constant * T0
    bcs = {
        4: InletBC(input_state=(rho, u0, 0.0)),
        2: OutletBC(pressure=p0, kind="subsonicPressure"),
        1: WallBC(kind="slip"),
        3: WallBC(kind="slip"),
    }
    ctxs = _contexts(mt, mix, "navier-stokes", bcs)

    Us = tuple(
        mix.conservatives(uniform_state(b.xyz_dof, mix, rho, (u0, 0.0), T0))
        for b in mt.buckets
    )
    (dU_tri, dU_quad), aux = jax.jit(
        lambda us: compute_rhs_mixed(mt, ctxs, us)
    )(Us)
    scale = float(jnp.max(jnp.abs(Us[1])))
    assert float(jnp.max(jnp.abs(dU_tri))) < 1e-9 * scale
    assert float(jnp.max(jnp.abs(dU_quad))) < 1e-9 * scale
    assert np.isfinite(float(aux["max_char_speed"]))


def test_mixed_interface_conservation():
    """Slip walls all around + a smooth internal perturbation: the global
    mass/momentum/energy integrals are stationary to roundoff, which
    requires the two interface flux evaluations to cancel exactly."""
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mm = mixed_box_2d(6, 6, x1=10.0, y1=10.0, tri_from=0.5)
    mt = build_mixed_tables(mm, order=2).to_jax(jnp.float64)
    bcs = {a: WallBC(kind="slip") for a in (1, 2, 3, 4)}
    ctxs = _contexts(mt, mix, "euler", bcs)

    Us = tuple(
        mix.conservatives(isentropic_vortex(b.xyz_dof, 0.0, mix))
        for b in mt.buckets
    )
    # kill the mean flow so walls see no normal velocity issues at t=0
    Us = tuple(
        U.at[..., 1].add(-U[..., 0] * 1.0).at[..., 2].add(-U[..., 0] * 1.0)
        for U in Us
    )
    (d0, d1), _ = jax.jit(lambda us: compute_rhs_mixed(mt, ctxs, us))(Us)

    def total(tab, dU):
        dq = jnp.einsum("qd,nde->nqe", tab.Bvol, dU)
        return jnp.einsum("q,nq,nqe->e", tab.wq, tab.detJ, dq)

    tot = np.asarray(total(mt.buckets[0], d0) + total(mt.buckets[1], d1))
    # mass is conserved exactly (slip-wall mass flux = 0; interface cancels)
    assert abs(tot[0]) < 1e-11
    # energy flux through slip walls is zero too (u.n = 0 in the ghost pair)
    assert abs(tot[3]) < 1e-8


def test_mixed_vortex_accuracy_matches_pure_quad():
    """Advect the isentropic vortex on a mixed mesh; the L2 error against
    the exact solution is comparable to the pure-quad mesh at the same
    resolution (the interface does not degrade the scheme)."""
    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.rhs import compute_rhs
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.time.integrators import rk4

    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    n, L = 12, 10.0
    dt, nsteps = 0.02, 25

    def l2_exact(tab, U, t):
        Uex = mix.conservatives(isentropic_vortex(tab.xyz_dof, t, mix))
        w = tab.wq[None, :, None] * tab.detJ[..., None]
        num = jnp.sum(w * jnp.einsum("qd,nde->nqe", tab.Bvol, (U - Uex) ** 2))
        den = jnp.sum(w * jnp.einsum("qd,nde->nqe", tab.Bvol, Uex**2))
        return float(jnp.sqrt(num / den))

    # ---- mixed mesh run ----
    mm = mixed_box_2d(n, n, x1=L, y1=L, tri_from=0.5)
    mt = build_mixed_tables(mm, order=2).to_jax(jnp.float64)
    rho_f, T_f = 1.0, 1.0  # vortex far field (isentropic_vortex defaults)
    p_f = rho_f * mix.gas_constant * T_f
    bcs = {
        4: InletBC(input_state=(rho_f, 1.0, 1.0)),
        1: InletBC(input_state=(rho_f, 1.0, 1.0)),
        2: OutletBC(pressure=p_f, kind="nonReflectingPressure",
                    ref_vel_n="patch-mean"),
        3: OutletBC(pressure=p_f, kind="nonReflectingPressure",
                    ref_vel_n="patch-mean"),
    }
    ctxs = _contexts(mt, mix, "euler", bcs)
    Us = tuple(
        mix.conservatives(isentropic_vortex(b.xyz_dof, 0.0, mix))
        for b in mt.buckets
    )

    @jax.jit
    def step_mixed(us, t):
        # pytree RK4 over the (tri, quad) state tuple
        def rhs(u, tt):
            return compute_rhs_mixed(mt, ctxs, u, tt)[0]

        axpy = lambda a, x, y: jax.tree.map(lambda xi, yi: a * xi + yi, x, y)
        k1 = rhs(us, t)
        k2 = rhs(axpy(0.5 * dt, k1, us), t + 0.5 * dt)
        k3 = rhs(axpy(0.5 * dt, k2, us), t + 0.5 * dt)
        k4 = rhs(axpy(dt, k3, us), t + dt)
        return jax.tree.map(
            lambda u, a, b, c, d: u + dt / 6.0 * (a + 2 * b + 2 * c + d),
            us, k1, k2, k3, k4,
        )

    t = 0.0
    for _ in range(nsteps):
        Us = step_mixed(Us, t)
        t += dt
    err_mixed = max(
        l2_exact(mt.buckets[0], Us[0], t), l2_exact(mt.buckets[1], Us[1], t)
    )

    # ---- pure quad reference run ----
    mesh = box_2d(n, n, x1=L, y1=L)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    fl = Fluxes(mixture=mix, eq_system="euler")
    attrs = np.asarray(tab.f_bdr_attr)

    from tps_tpu.dg.rhs import BCSlice

    slices = []
    for attr, bc in bcs.items():
        rows = np.where(attrs == attr)[0]
        slices.append(BCSlice(bc=bc, start=int(rows.min()),
                              stop=int(rows.max()) + 1))
    slices.sort(key=lambda s: s.start)
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl), bcs=tuple(slices))
    U = mix.conservatives(isentropic_vortex(tab.xyz_dof, 0.0, mix))

    @jax.jit
    def step_quad(u, t):
        return rk4(lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u, t, dt)

    t = 0.0
    for _ in range(nsteps):
        U, _ = step_quad(U, t)
        t += dt
    err_quad = l2_exact(tab, U, t)

    assert err_mixed < 0.02, f"mixed-mesh vortex error too large: {err_mixed}"
    assert err_mixed < 3.0 * err_quad + 1e-4, (err_mixed, err_quad)


def test_readers_mixed(tmp_path):
    """MFEM-format and gmsh-2.2 mixed tri/quad files parse into a
    MixedMesh; pure-tri gmsh parses into a tri Mesh."""
    from tps_tpu.mesh.mfem_reader import read_mesh
    from tps_tpu.mesh.mixed import MixedMesh

    # 2 quads + 2 tris on a 3x2 vertex strip (x in 0..3, y in 0..1):
    # quads [0,1,4,3] [1,2,5,4]; third column split into tris
    mfem = tmp_path / "mix.mesh"
    mfem.write_text("""MFEM mesh v1.0

dimension
2

elements
4
1 3 0 1 5 4
1 3 1 2 6 5
2 2 2 3 7
2 2 2 7 6

boundary
8
1 1 0 1
1 1 1 2
1 1 2 3
2 1 3 7
3 1 7 6
3 1 6 5
3 1 5 4
4 1 4 0

vertices
8
2
0 0
1 0
2 0
3 0
0 1
1 1
2 1
3 1
""")
    mm = read_mesh(str(mfem))
    assert isinstance(mm, MixedMesh)
    assert mm.geoms == ("tri", "quad")
    assert mm.parts[0].num_elements == 2 and mm.parts[1].num_elements == 2
    from tps_tpu.dg.mixed import build_mixed_tables

    mt = build_mixed_tables(mm, order=1)
    assert mt.n_iface == 1  # the seam edge (2,6)
    area = sum(
        float(np.einsum("q,nq->", np.asarray(b.wq), np.asarray(b.detJ)))
        for b in mt.buckets
    )
    assert abs(area - 3.0) < 1e-12

    # gmsh 2.2: same mesh (1-based node ids), physical tags on segments
    gmsh = tmp_path / "mix.msh"
    gmsh.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
8
1 0 0 0
2 1 0 0
3 2 0 0
4 3 0 0
5 0 1 0
6 1 1 0
7 2 1 0
8 3 1 0
$EndNodes
$Elements
12
1 3 2 10 1 1 2 6 5
2 3 2 10 1 2 3 7 6
3 2 2 11 1 3 4 8
4 2 2 11 1 3 8 7
5 1 2 1 1 1 2
6 1 2 1 1 2 3
7 1 2 1 1 3 4
8 1 2 2 2 4 8
9 1 2 3 3 8 7
10 1 2 3 3 7 6
11 1 2 3 3 6 5
12 1 2 4 4 5 1
$EndElements
""")
    mg = read_mesh(str(gmsh))
    assert isinstance(mg, MixedMesh)
    mt2 = build_mixed_tables(mg, order=1)
    assert mt2.n_iface == 1
    # volume attributes survive per bucket
    assert set(np.asarray(mg.parts[0].elem_attrs)) == {11}
    assert set(np.asarray(mg.parts[1].elem_attrs)) == {10}

    # pure-tri gmsh now parses as a tri Mesh
    tri = tmp_path / "tri.msh"
    tri.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
6
1 2 2 1 1 1 2 3
2 2 2 1 1 1 3 4
3 1 2 1 1 1 2
4 1 2 2 2 2 3
5 1 2 3 3 3 4
6 1 2 4 4 4 1
$EndElements
""")
    tmesh = read_mesh(str(tri))
    assert tmesh.geom == "tri" and tmesh.num_elements == 2


def _write_mixed_mfem(path, nx=6, ny=4, x1=1.0, y1=0.4, tri_from=0.5):
    """Write a mixed_box_2d as an MFEM-format mesh file."""
    from tps_tpu.mesh.mixed import mixed_box_2d

    mm = mixed_box_2d(nx, ny, x1=x1, y1=y1, tri_from=tri_from)
    lines = ["MFEM mesh v1.0", "", "dimension", "2", "", "elements"]
    tri, quad = mm.parts
    lines.append(str(tri.num_elements + quad.num_elements))
    for e in quad.elements:
        lines.append("1 3 " + " ".join(str(int(v)) for v in e))
    for e in tri.elements:
        lines.append("1 2 " + " ".join(str(int(v)) for v in e))
    lines += ["", "boundary", str(len(mm.bdr_faces))]
    for f, a in zip(mm.bdr_faces, mm.bdr_attrs):
        lines.append(f"{int(a)} 1 " + " ".join(str(int(v)) for v in f))
    lines += ["", "vertices", str(len(mm.vertices)), "2"]
    for v in mm.vertices:
        lines.append(f"{v[0]} {v[1]}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_mixed_solver_ini_driven(tmp_path):
    """Ini-driven flow run on a mixed mesh file (reference:
    input.cyl-2d.caseA.ini style: subsonic inlet, nonreflecting pressure
    outlet, walls): time loop, restart roundtrip, VTK output."""
    import os

    from tps_tpu.harness import Tps

    meshfile = tmp_path / "mix.mesh"
    _write_mixed_mfem(meshfile)
    outdir = tmp_path / "out"
    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = flow

[flow]
mesh = {meshfile}
order = 1
maxIters = 6
outputFreq = 3
fluid = dry_air
equation_system = navier-stokes
refLength = 1.0

[io]
outdirBase = {outdir}
enableParaview = 1

[time]
cfl = 0.4
integrator = rk4

[initialConditions]
rho = 1.2
rhoU = 40.
rhoV = 0.
rhoW = 0.
pressure = 101300

[boundaryConditions/inlet1]
patch = 4
type = subsonic
density = 1.2
uvw = '33.3 0 0'

[boundaryConditions/outlet1]
patch = 2
type = nonReflectingPressure
pressure = 101300

[boundaryConditions/wall1]
patch = 1
type = inviscid

[boundaryConditions/wall2]
patch = 3
type = inviscid
""")
    tps = Tps()
    tps.parse_command_line_args(["tps", "--runFile", str(ini)])
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    from tps_tpu.solvers.compressible_mixed import MixedCompressibleSolver

    assert isinstance(tps.solver, MixedCompressibleSolver)
    tps.solve()
    s = tps.solver
    assert s.iter == 6
    assert s.check_nan() == 0
    # density stays near the free stream on this short run
    for U in s.U:
        rho = np.asarray(U[..., 0])
        assert 0.8 < rho.min() < rho.max() < 1.6

    # VTK per bucket
    vtks = [f for f in os.listdir(outdir) if f.endswith(".vtk")]
    assert any("tri" in f for f in vtks) and any("quad" in f for f in vtks)

    # restart roundtrip: rerun with enableRestart and more iters
    ini2 = tmp_path / "run2.ini"
    ini2.write_text(ini.read_text().replace(
        "maxIters = 6", "maxIters = 9").replace(
        "[io]", "[io]\nenableRestart = 1"))
    tps2 = Tps()
    tps2.parse_command_line_args(["tps", "--runFile", str(ini2)])
    tps2.parse_input()
    tps2.choose_devices()
    tps2.choose_solver()
    tps2.initialize()
    assert tps2.solver.iter == 6  # resumed
    tps2.solve()
    assert tps2.solver.iter == 9
    assert tps2.solver.check_nan() == 0


def test_mixed_nr_outlet_crossing_seam(tmp_path):
    """An NR pressure outlet patch that CROSSES the tri/quad seam (top
    boundary of a vertical channel, quads left of x=0.5, tris right):
    the characteristic patch mean is accumulated over BOTH buckets'
    face weights (one mean per patch, like the reference's per-patch
    subcommunicators) and the run matches a pure-quad reference of the
    same resolution to discretization error."""
    from tps_tpu.harness import Tps

    def run(meshspec, outdir):
        ini = tmp_path / f"{outdir}.ini"
        ini.write_text(f"""
[solver]
type = flow
[flow]
{meshspec if meshspec.startswith("mesh") else ""}
order = 1
maxIters = 12
outputFreq = 100
fluid = dry_air
equation_system = euler
refLength = 1.0
[io]
outdirBase = {tmp_path}/{outdir}
[time]
cfl = 0.3
integrator = rk3
{meshspec if not meshspec.startswith("mesh") else ""}
[initialConditions]
rho = 1.2
rhoU = 0.
rhoV = 48.
rhoW = 0.
pressure = 101300
[boundaryConditions/inlet1]
patch = 1
type = subsonic
density = 1.2
uvw = '0 40 0'
[boundaryConditions/outlet1]
patch = 3
type = nonReflectingPressure
pressure = 101300
[boundaryConditions/wall1]
patch = 4
type = inviscid
[boundaryConditions/wall2]
patch = 2
type = inviscid
""")
        tps = Tps()
        tps.parse_command_line_args(["tps", "--runFile", str(ini)])
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        tps.solve()
        return tps.solver

    meshfile = tmp_path / "seam.mesh"
    _write_mixed_mfem(meshfile, nx=8, ny=6, x1=1.0, y1=0.6, tri_from=0.5)
    s_mix = run(f"mesh = {meshfile}", "mix")
    s_quad = run("""[mesh]
generator = box2d
nx = 8
ny = 6
x1 = 1.0
y1 = 0.6""", "quad")
    assert s_mix.check_nan() == 0 and s_quad.check_nan() == 0
    # the outlet's threaded characteristic state exists in BOTH buckets
    st = s_mix.bc_states
    stateful = [x for b in st for x in b if x is not None]
    assert len(stateful) >= 2
    # mean outlet-adjacent pressure agrees with the pure-quad run to
    # discretization error
    import jax.numpy as jnp

    mixm = s_mix.mixture

    def mean_p_mixed(s):
        num = den = 0.0
        for U, tab in zip(s.U, s.mt.buckets):
            p = np.asarray(mixm.pressure(jnp.asarray(U)))
            y = np.asarray(tab.xyz_dof[..., 1])
            sel = y > 0.5
            num += p[sel].sum()
            den += sel.sum()
        return num / den

    pq = np.asarray(s_quad.mixture.pressure(jnp.asarray(s_quad.U)))
    yq = np.asarray(s_quad.tables.xyz_dof[..., 1])
    p_quad = pq[yq > 0.5].mean()
    p_mix = mean_p_mixed(s_mix)
    assert abs(p_mix - p_quad) / p_quad < 2e-3, (p_mix, p_quad)


def test_mixed_sharded_matches_single(tmp_path):
    """[mesh]/partitions on a mixed tri/quad mesh: per-bucket halo
    exchange + psum-assembled interface buffers reproduce the
    single-device run (including the NR pressure outlet and the seam
    coupling); one shard owns ZERO tri elements, exercising the empty-
    bucket-shard padding path."""
    from tps_tpu.harness import Tps

    meshfile = tmp_path / "mix.mesh"
    _write_mixed_mfem(meshfile, nx=8, ny=6, x1=1.0, y1=0.6, tri_from=0.5)

    def run(parts, outdir):
        ini = tmp_path / f"{outdir}.ini"
        ini.write_text(f"""
[solver]
type = flow
[flow]
mesh = {meshfile}
order = 1
maxIters = 8
outputFreq = 100
fluid = dry_air
equation_system = navier-stokes
refLength = 1.0
[mesh]
partitions = {parts}
partition_axis = 0
[io]
outdirBase = {tmp_path}/{outdir}
[time]
cfl = 0.3
integrator = rk3
[initialConditions]
rho = 1.2
rhoU = 40.
rhoV = 0.
rhoW = 0.
pressure = 101300
[boundaryConditions/inlet1]
patch = 4
type = subsonic
density = 1.2
uvw = '33.3 0 0'
[boundaryConditions/outlet1]
patch = 2
type = nonReflectingPressure
pressure = 101300
[boundaryConditions/wall1]
patch = 1
type = inviscid
[boundaryConditions/wall2]
patch = 3
type = inviscid
""")
        tps = Tps()
        tps.parse_command_line_args(
            ["tps", "--runFile", str(ini), "--device", "cpu"])
        tps.parse_input()
        tps.choose_devices()
        tps.choose_solver()
        tps.initialize()
        tps.solve()
        return tps.solver

    s1 = run(1, "a")
    s3 = run(3, "b")
    assert s3.nparts == 3 and s3._smx is not None
    # one shard owns zero tri elements (tris live at x >= 0.5)
    own0 = np.asarray(s3._smx.builds[0].tables.own_mask)
    assert (own0.sum(axis=1) == 0).any()
    assert s3.check_nan() == 0
    U1, U3 = s1.state_global(), s3.state_global()
    for a, c in zip(U1, U3):
        a, c = np.asarray(a), np.asarray(c)
        # psum partial-sum order differs across decompositions: ULP noise
        np.testing.assert_allclose(c, a, rtol=0, atol=5e-9 * np.abs(a).max())
    # restart roundtrip through the gathered writer
    s3.write_restart()
    s3.read_restart()
    for a, c in zip(U3, s3.state_global()):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a))


def test_mixed_stateless_patch_means_cross_seam():
    """The mass-flow outlet's density mean and the far-field "patch-mean"
    reference velocity are accumulated over BOTH buckets of a patch
    crossing the tri/quad seam (reference: bucket-agnostic per-patch
    subcommunicators, src/mpi_groups.hpp:44-78)."""
    from tps_tpu.dg.mixed import _stateless_patch_stats
    from tps_tpu.dg.operators import elem_traces

    mix = DryAir(dim=2, nvel=2, gas_constant=287.0)
    mm = mixed_box_2d(6, 4, tri_from=0.5)  # seam at x=0.5
    mt = build_mixed_tables(mm, order=2).to_jax(jnp.float64)
    # patch 3 (top) crosses the seam; give it a mass-flow NR outlet
    bcs = {
        1: WallBC(kind="inviscid"),
        2: WallBC(kind="inviscid"),
        4: WallBC(kind="inviscid"),
        3: OutletBC(kind="nonReflectingMassFlow", mass_flow=1.0, area=1.0,
                    pressure=101300.0),
    }
    ctxs = _contexts(mt, mix, "euler", bcs)

    # non-uniform density: rho varies with x so bucket-local means differ
    Us = []
    for b in mt.buckets:
        x = b.xyz_dof[..., 0]
        Up = uniform_state(b.xyz_dof, mix, 1.2, (5.0, 0.0), 300.0)
        Up = Up.at[..., 0].set(1.2 + 0.5 * x)
        Us.append(mix.conservatives(Up))
    Us = tuple(Us)

    trX = [
        elem_traces(tab, Us[b]).reshape(
            Us[b].shape[0] * tab.nlf, tab.nqf, -1)
        for b, tab in enumerate(mt.buckets)
    ]
    stats = _stateless_patch_stats(mt, ctxs, trX)
    bc3 = bcs[3]
    assert id(bc3) in stats and "rho_mean" in stats[id(bc3)]
    rho_mean = float(stats[id(bc3)]["rho_mean"])

    # manual two-bucket quadrature mean over patch-3 faces
    num = den = 0.0
    for b, tab in enumerate(mt.buckets):
        attrs = np.asarray(tab.f_bdr_attr)
        rows = np.where(attrs == 3)[0]
        if len(rows) == 0:
            continue
        ULb = np.asarray(trX[b][np.asarray(tab.bdr_slot)][..., :4])
        norb = np.asarray(tab.f_nor[tab.nfi:])
        w = np.asarray(tab.f_wts[tab.nfi:]) * np.linalg.norm(norb, axis=-1)
        num += float(np.sum(w[rows] * ULb[rows, :, 0]))
        den += float(np.sum(w[rows]))
        # both buckets must contribute faces (the patch crosses the seam)
        assert len(rows) > 0
    assert den > 0
    np.testing.assert_allclose(rho_mean, num / den, rtol=1e-12)
    # the mean differs from either bucket-local mean (rho varies with x)
    for b, tab in enumerate(mt.buckets):
        attrs = np.asarray(tab.f_bdr_attr)
        rows = np.where(attrs == 3)[0]
        ULb = np.asarray(trX[b][np.asarray(tab.bdr_slot)][..., :4])
        norb = np.asarray(tab.f_nor[tab.nfi:])
        w = np.asarray(tab.f_wts[tab.nfi:]) * np.linalg.norm(norb, axis=-1)
        local = np.sum(w[rows] * ULb[rows, :, 0]) / np.sum(w[rows])
        assert abs(local - rho_mean) > 1e-4, (b, local, rho_mean)

    # the RHS consumes the override (runs without error, finite output)
    ys, aux = compute_rhs_mixed(mt, ctxs, Us)
    for y in ys:
        assert np.all(np.isfinite(np.asarray(y)))
