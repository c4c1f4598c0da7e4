"""Mesh reader tests: MFEM v1.0 and Gmsh 2.2 ASCII formats."""

import os

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

from tps_tpu.dg.discretization import build_tables
from tps_tpu.mesh.mfem_reader import read_gmsh_mesh, read_mfem_mesh

MFEM_QUAD = """\
MFEM mesh v1.0

dimension
2

elements
2
1 3 0 1 4 3
2 3 1 2 5 4

boundary
6
1 1 0 1
1 1 1 2
2 1 2 5
3 1 5 4
3 1 4 3
4 1 3 0

vertices
6
2
0 0
1 0
2 0
0 1
1 1
2 1
"""

GMSH_QUAD = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
$EndNodes
$Elements
8
1 1 2 11 1 1 2
2 1 2 11 2 2 3
3 1 2 12 3 3 6
4 1 2 13 4 6 5
5 1 2 13 5 5 4
6 1 2 14 6 4 1
7 3 2 99 7 1 2 5 4
8 3 2 99 8 2 3 6 5
$EndElements
"""


def test_read_mfem_quad(tmp_path):
    p = tmp_path / "two.mesh"
    p.write_text(MFEM_QUAD)
    mesh = read_mfem_mesh(str(p))
    assert mesh.dim == 2 and mesh.geom == "quad"
    assert mesh.num_elements == 2 and mesh.num_vertices == 6
    faces = mesh.build_faces()
    assert len(faces.int_elem_l) == 1
    assert len(faces.bdr_elem) == 6
    assert sorted(set(faces.bdr_attr.tolist())) == [1, 2, 3, 4]
    # usable end-to-end: gradient of linear field is exact
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    from tps_tpu.dg.operators import dg_gradient

    xy = tab.xyz_dof
    g = dg_gradient(tab, (2 * xy[..., 0] - xy[..., 1])[..., None])
    assert np.allclose(np.asarray(g[..., 0, 0]), 2.0, atol=1e-11)
    assert np.allclose(np.asarray(g[..., 0, 1]), -1.0, atol=1e-11)


def test_read_gmsh_quad(tmp_path):
    p = tmp_path / "two.msh"
    p.write_text(GMSH_QUAD)
    mesh = read_gmsh_mesh(str(p))
    assert mesh.dim == 2 and mesh.geom == "quad"
    assert mesh.num_elements == 2
    faces = mesh.build_faces()
    assert len(faces.int_elem_l) == 1
    assert len(faces.bdr_elem) == 6
    assert set(faces.bdr_attr.tolist()) == {11, 12, 13, 14}


def test_inline_mesh_format():
    """MFEM 'INLINE mesh v1.0' files (reference: test/meshes/inline-*.mesh)
    parse into generated grids, including the triangle variant."""
    import os

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.mesh.mfem_reader import read_mfem_mesh

    ref = "/root/reference/test/meshes"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference meshes unavailable")

    m = read_mfem_mesh(os.path.join(ref, "inline-quad.mesh"))
    assert m.geom == "quad" and m.num_elements == 16
    assert np.allclose(m.vertices.max(axis=0), [1.0, 1.0])
    tab = build_tables(m, order=2)
    assert tab.nfb > 0

    m2 = read_mfem_mesh(os.path.join(ref, "inline-rectangle-quad.mesh"))
    assert m2.num_elements == 16 * 5
    assert np.allclose(m2.vertices.max(axis=0), [0.5, 1.0])

    m3 = read_mfem_mesh(os.path.join(ref, "inline-square-tri.mesh"))
    assert m3.geom == "tri" and m3.num_elements == 2 * 16
    build_tables(m3, order=2)


def test_stored_nodes_periodic_mesh():
    """Stored-nodes (L2 'nodes' section) periodic meshes reconstruct
    per-element geometry: the seam element must have the same width as the
    interior ones (reference: test/meshes/beam-quad-o3-s5-p.mesh)."""
    import os

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.mesh.mfem_reader import read_mfem_mesh

    path = "/root/reference/test/meshes/beam-quad-o3-s5-p.mesh"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference meshes unavailable")
    m = read_mfem_mesh(path)
    tab = build_tables(m, order=2)
    x = np.asarray(tab.xyz_dof)[..., 0]
    w = x.max(axis=1) - x.min(axis=1)
    assert np.allclose(w, w[0])  # uniform widths incl. the periodic seam
    assert tab.nfb == 0 or tab.nfb > 0  # builds without error


def test_beam_mesh_3d_and_input_migrator(tmp_path):
    """3-D stretched beam generator (reference utils/beam_mesh.cpp) and the
    legacy->ini input migrator (reference utils/update_input_file.py)."""
    import subprocess
    import sys

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.mesh.generators import beam_mesh

    m = beam_mesh(8, 3, length=4.0, width=1.0, stretch=1.2, dim=3)
    tab = build_tables(m, order=2)
    x = np.asarray(tab.xyz_dof)[..., 0]
    w = np.sort(np.unique(np.round(x.max(1) - x.min(1), 6)))
    assert len(w) == 8  # geometric progression of element widths
    assert abs(w[-1] / w[-2] - 1.2) < 1e-4

    old = tmp_path / "old.run"
    old.write_text(
        "POL_ORDER 3\nNMAX 100\nCFL 0.5\nINIT_RHO 1.2\n"
        "WALL 1 2 300.0\nINLET 2 0 1.2 10 0 0\nOUTLET 3 1 101300\n"
        "RESTART_SERIAL write\n"
    )
    r = subprocess.run(
        [sys.executable, "tools/update_input_file.py",
         "--infile", str(old)],
        capture_output=True, text=True, cwd=os.path.dirname(HERE),
    )
    assert r.returncode == 0, r.stderr
    from tps_tpu.config.ini import IniInput

    ini = IniInput.parse(open(str(old) + ".ini").read())
    assert ini.get("flow/order", 0) == 3
    assert ini.get("boundaryConditions/outlet1/type") == "nonReflectingPressure"
    assert ini.get("io/restartMode") == "singleFileWrite"


def test_refine_uniform_quad():
    """2-D uniform refinement: 4x elements, area and boundary length
    preserved, attrs propagate, and a DG solve on the refined mesh is
    consistent (face topology intact)."""
    from tps_tpu.fem import h1
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.mesh.refine import refine_uniform

    m = box_2d(3, 2, x1=1.5, y1=1.0)
    m.elem_attrs = np.arange(m.num_elements, dtype=np.int64) % 2 + 1
    r = refine_uniform(m, 2)  # two levels
    assert r.num_elements == 16 * m.num_elements
    t0 = h1.build_h1(m, order=1)
    t1 = h1.build_h1(r, order=1)
    a0 = float(np.einsum("q,nq->", t0.wq, t0.detJ))
    a1 = float(np.einsum("q,nq->", t1.wq, t1.detJ))
    assert abs(a0 - a1) < 1e-12 * a0
    assert r.bdr_faces.shape[0] == 4 * m.bdr_faces.shape[0]
    fi = r.build_faces()
    assert fi.bdr_elem.shape[0] == r.bdr_faces.shape[0]
    assert set(np.unique(r.bdr_attrs)) == set(np.unique(m.bdr_attrs))


def test_make_ic_sine_roundtrip(tmp_path):
    """tools/make_ic.py (role of utils/sine_ic.cpp etc.): imprint a sine
    blend profile on the conserved state, write the restart, and start a
    run from it."""
    import importlib.util
    import os

    import numpy as np

    ini = tmp_path / "r.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
order = 1
maxIters = 3
fluid = dry_air
equation_system = euler
[mesh]
generator = box2d
nx = 8
ny = 4
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk3
[initialConditions]
rho = 1.0
rhoU = 0.
rhoV = 0.
rhoW = 0.
pressure = 101325
[io]
outdirBase = {tmp_path}/out
[utils/sine_initial_condition]
offset = 0.5
scale = 0.4
solution1/Q1 = 1.0
solution1/Q2 = 10.0
solution1/Q3 = 0.0
solution1/Q4 = 253312.5
solution2/Q1 = 1.2
solution2/Q2 = 12.0
solution2/Q3 = 0.0
solution2/Q4 = 253312.5
""")
    here = os.path.dirname(__file__)
    spec = importlib.util.spec_from_file_location(
        "make_ic", os.path.join(here, "..", "tools", "make_ic.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.main([str(ini), "--profile", "sine"])

    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.solvers.base import create_solver
    import tps_tpu.harness  # noqa: F401

    inp = IniInput.read(str(ini))
    inp.values["io/enableRestart"] = "1"
    rc = parse_run_configuration(inp)
    rc.max_iters = 3
    s = create_solver("flow", rc)
    s.initialize()
    rho = np.asarray(s.U[..., 0])
    assert 0.99 < rho.min() < 1.01 and 1.19 < rho.max() < 1.21
    s.solve()
    assert s.check_nan() == 0


def _write_mfem_box(path, nx, ny, Lx, Ly):
    """Axis-aligned quad MFEM v1.0 mesh on [0,Lx]x[0,Ly] with the box_2d
    attribute convention (1=bottom, 2=right, 3=top, 4=left)."""
    nvx, nvy = nx + 1, ny + 1

    def vid(i, j):
        return i + nvx * j

    elems = []
    for j in range(ny):
        for i in range(nx):
            elems.append((vid(i, j), vid(i + 1, j), vid(i + 1, j + 1),
                          vid(i, j + 1)))
    bdr = []
    for i in range(nx):
        bdr.append((1, vid(i, 0), vid(i + 1, 0)))
        bdr.append((3, vid(i, nvy - 1), vid(i + 1, nvy - 1)))
    for j in range(ny):
        bdr.append((2, vid(nvx - 1, j), vid(nvx - 1, j + 1)))
        bdr.append((4, vid(0, j), vid(0, j + 1)))
    with open(path, "w") as f:
        f.write("MFEM mesh v1.0\n\ndimension\n2\n\n")
        f.write(f"elements\n{len(elems)}\n")
        for e in elems:
            f.write("1 3 " + " ".join(map(str, e)) + "\n")
        f.write(f"\nboundary\n{len(bdr)}\n")
        for a, v0, v1 in bdr:
            f.write(f"{a} 1 {v0} {v1}\n")
        f.write(f"\nvertices\n{nvx * nvy}\n2\n")
        for j in range(nvy):
            for i in range(nvx):
                f.write(f"{i * Lx / nx} {j * Ly / ny}\n")


def test_make_periodic_matches_generator():
    """[periodicity]-style gluing of a file mesh reproduces the generator's
    periodic topology: the Euler RHS of a smooth field is identical (after
    element/dof coordinate matching) to the natively periodic box_2d mesh
    (reference: MFEM MakePeriodic as driven by src/M2ulPhyS.cpp:296-312)."""
    import tempfile

    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.mesh.mesh import make_periodic
    from tps_tpu.mesh.refine import refine_uniform
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.utils.cases import isentropic_vortex

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "box.mesh")
        _write_mfem_box(path, 4, 4, 10.0, 10.0)
        mesh = read_mfem_mesh(path)
    mesh = refine_uniform(mesh, levels=1)  # 8x8
    mesh = make_periodic(mesh, [np.array([10.0, 0.0]), np.array([0.0, 10.0])])
    ref = box_2d(8, 8, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)

    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    fl = Fluxes(mixture=mix, eq_system="euler")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fluxes=fl))

    def rhs_sorted(m):
        tab = build_tables(m, order=2).to_jax(jnp.float64)
        U = mix.conservatives(isentropic_vortex(tab.xyz_dof, 0.0, mix))
        r, _ = compute_rhs(ctx, tab, U)
        xyz = np.asarray(tab.xyz_dof)  # [ne, ndof, 2]
        cen = xyz.mean(axis=1, keepdims=True) + 0 * xyz
        key = np.concatenate([cen, xyz], axis=-1).reshape(-1, 4)
        order = np.lexsort(key.T[::-1])
        return np.asarray(r).reshape(-1, r.shape[-1])[order], key[order]

    r1, k1 = rhs_sorted(mesh)
    r2, k2 = rhs_sorted(ref)
    assert np.abs(k1 - k2).max() < 1e-12  # same element/dof geometry
    assert np.abs(r1 - r2).max() < 1e-11  # identical RHS incl. glued faces

    # every boundary face was consumed by the gluing
    tab = build_tables(mesh, order=2)
    assert tab.f_bdr_attr.size == 0


def test_cli_periodicity_and_refinement(tmp_path):
    """[periodicity]/enablePeriodic + [flow]/refinement_levels through the
    CLI on a file mesh (reference: src/M2ulPhyS.cpp:296-312, 350-357)."""
    from tps_tpu.harness import main

    path = tmp_path / "box.mesh"
    _write_mfem_box(str(path), 3, 3, 10.0, 10.0)
    ini = tmp_path / "per.ini"
    ini.write_text(f"""
[solver]
type = flow
[flow]
mesh = {path}
order = 1
maxIters = 3
outputFreq = 100
fluid = dry_air
equation_system = euler
refinement_levels = 1
[periodicity]
enablePeriodic = 1
xTrans = 10.0
yTrans = 10.0
[time]
cfl = 0.1
integrator = rk2
[initialConditions]
case = isentropic_vortex
[io]
outdirBase = {tmp_path}/out_per
""")
    assert main(["tps", "--runFile", str(ini)]) == 0


def test_refine_uniform_periodic():
    """Uniform refinement of a fully periodic quad mesh re-glues the
    children with the original translations (reference: MFEM refines
    periodic meshes natively; the MMS deck path is 'periodic beam mesh
    + refinement', test/mms.euler.2d.quad.ini:5-6).  Free-stream
    preservation on the refined mesh proves every face is matched."""
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext, compute_rhs
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.mesh.refine import refine_uniform
    from tps_tpu.physics.gas import DryAir

    m = box_2d(4, 4, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
    m2 = refine_uniform(m, 2)
    assert m2.num_elements == 256
    # every refined boundary face glued: 4 sides x 16 faces / 2
    assert len(m2.periodic_pairs) == 32

    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    tab = build_tables(m2, order=2).to_jax(jnp.float64)
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    U0 = jnp.broadcast_to(
        mix.conservatives(jnp.asarray([1.0, 0.3, -0.2, 1.0])),
        (m2.num_elements, tab.ndof, 4),
    )
    dU, _ = compute_rhs(ctx, tab, U0, 0.0)
    assert float(jnp.abs(dU).max()) < 1e-12
