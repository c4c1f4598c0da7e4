"""External-data (Gaussian-interpolated) inlet profiles
(reference: src/gaussianInterpExtData.cpp)."""

import numpy as np

from tps_tpu.interop.ext_data import gaussian_interp, read_inlet_plane


def test_gaussian_interp_recovers_smooth_field():
    rng = np.random.RandomState(0)
    src = rng.rand(400, 3)
    src[:, 2] = 0.0
    f = np.sin(2 * np.pi * src[:, 0]) * np.cos(np.pi * src[:, 1])
    dst = rng.rand(100, 3) * 0.9 + 0.05
    dst[:, 2] = 0.0
    out = gaussian_interp(src, f[:, None], dst)[:, 0]
    expect = np.sin(2 * np.pi * dst[:, 0]) * np.cos(np.pi * dst[:, 1])
    assert np.abs(out - expect).mean() < 0.12


def test_csv_reader_and_ramped_inlet(tmp_path):
    import jax.numpy as jnp

    from tps_tpu.fem import h1
    from tps_tpu.interop.ext_data import GaussianInterpExtData
    from tps_tpu.mesh.generators import box_2d

    # synthetic inlet plane: parabolic profile u(y) along the x=0 edge
    ys = np.linspace(0.0, 1.0, 40)
    rows = []
    for i, y in enumerate(ys):
        u = 4.0 * y * (1.0 - y)
        rows.append([i, 0.0, y, 0.0, 300.0, u, 0.0, 0.0])
    path = tmp_path / "inletPlane.csv"
    with open(path, "w") as fh:
        fh.write("# no, x, y, z, T, u, v, w\n")
        for r in rows:
            fh.write(",".join(f"{v:.8e}" for v in r) + "\n")

    sx, T, vel, Y = read_inlet_plane(path)
    assert sx.shape == (40, 3) and (T == 300.0).all()

    mesh = box_2d(8, 8)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    ed = GaussianInterpExtData(tab, str(path), inlet_attrs=(4,), ramp_steps=4)
    y_bdr = np.asarray(tab.xyz)[ed.dofs, 1]
    expect = 4.0 * y_bdr * (1.0 - y_bdr)

    # full ramp after 4 steps
    for _ in range(4):
        ed.step()
    got = np.asarray(ed.velocity_values())
    assert np.abs(got[:, 0] - expect).max() < 0.08
    assert np.abs(got[:, 1]).max() < 1e-12

    # half ramp
    ed2 = GaussianInterpExtData(tab, str(path), inlet_attrs=(4,), ramp_steps=4)
    ed2.step()
    ed2.step()
    got2 = np.asarray(ed2.velocity_values())
    assert np.allclose(got2, 0.5 * got, atol=1e-12)


def test_lomach_interpolated_inlet(tmp_path):
    from tps_tpu.harness import Tps

    ys = np.linspace(0.0, 1.0, 30)
    path = tmp_path / "inlet.csv"
    with open(path, "w") as fh:
        fh.write("# header\n")
        for i, y in enumerate(ys):
            fh.write(f"{i},0.0,{y},0.0,300.0,{4.0 * y * (1 - y)},0.0,0.0\n")

    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 6
ny = 6
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = calorically-perfect
maxIters = 3
[time]
dt_fixed = 1e-3
[boundaryConditions/inlet1]
patch = 4
type = interpolate
name = {path}
rampSteps = 2
[boundaryConditions/wall1]
patch = 1
type = viscous
[boundaryConditions/wall2]
patch = 3
type = viscous
""")
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    for _ in range(3):
        tps.solve_step()
    s = tps.solver
    u = np.asarray(s.flow.velocity())
    assert np.isfinite(u).all()
    # inlet dofs carry the (fully ramped) parabolic profile
    dofs = s.ext_data[0].dofs
    y = np.asarray(s.tab.xyz)[dofs, 1]
    assert np.abs(u[dofs, 0] - 4 * y * (1 - y)).max() < 0.1
    # interpolated inlet TEMPERATURE became a Dirichlet value on the patch
    # (reference: temperature_gf_, src/gaussianInterpExtData.cpp)
    T = np.asarray(s.thermo.T)
    assert np.abs(T[dofs] - 300.0).max() < 1e-6
    assert np.asarray(s.thermo.T_mask)[dofs].max() == 0.0


def test_read_profile_formats(tmp_path):
    from tps_tpu.interop.ext_data import read_profile

    p1 = tmp_path / "ws.dat"
    p1.write_text("# x y z v\n0.0 0.5 0.0 1.5\n1.0 0.5 0.0 2.5\n")
    p2 = tmp_path / "c.csv"
    p2.write_text("x,y,z,v\n0.0,0.5,0.0,1.5\n1.0,0.5,0.0,2.5\n")
    a = read_profile(p1)
    b = read_profile(p2)
    assert a.shape == (2, 4) and np.allclose(a, b)


def test_volume_field_from_file(tmp_path):
    """setFieldTurbVisc analog: a linear nu_t(x) profile lands on every
    H1 dof within kernel-smoothing error."""
    import jax.numpy as jnp

    from tps_tpu.fem import h1
    from tps_tpu.interop.ext_data import volume_field_from_file
    from tps_tpu.mesh.generators import box_2d

    rng = np.random.RandomState(1)
    src = rng.rand(500, 2)
    rows = np.column_stack([src, np.zeros(len(src)), 1.0 + 2.0 * src[:, 0]])
    path = tmp_path / "nuT.csv"
    np.savetxt(path, rows, delimiter=",")

    tab = h1.build_h1(box_2d(6, 6), order=2).to_jax(jnp.float64)
    nut = np.asarray(volume_field_from_file(tab, str(path), fac=3.0))
    x = np.asarray(tab.xyz)[:, 0]
    assert np.abs(nut - 3.0 * (1.0 + 2.0 * x)).mean() < 0.25


def test_zeta_f_interpolated_inlet_and_static_rans_file(tmp_path):
    """zeta-f-file inlet tke/v2 profile (setInletTurbScalars analog) and
    static-rans visc-file, wired through the ini surface."""
    from tps_tpu.harness import Tps

    # tke/v2 profile along the inlet (x=0 edge): tke = 0.1 y, v2 = 0.05 y
    ys = np.linspace(0.0, 1.0, 25)
    tke_path = tmp_path / "tke.csv"
    with open(tke_path, "w") as fh:
        for y in ys:
            fh.write(f"0.0,{y},0.0,{0.1 * y},{0.05 * y}\n")
    nut_path = tmp_path / "nuT.csv"
    with open(nut_path, "w") as fh:
        for y in ys:
            for x in np.linspace(0, 1, 10):
                fh.write(f"{x},{y},0.0,{0.01 + 0.02 * x}\n")

    base = f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 5
ny = 5
[loMach]
order = 1
flow-solver = tomboulides
thermo-solver = constant-property
maxIters = 2
[time]
dt_fixed = 1e-4
[boundaryConditions/inlet1]
patch = 4
type = interpolate
name = {tmp_path / "inlet.csv"}
[boundaryConditions/wall1]
patch = 1
type = viscous
[boundaryConditions/wall2]
patch = 3
type = viscous
"""
    with open(tmp_path / "inlet.csv", "w") as fh:
        for i, y in enumerate(ys):
            fh.write(f"{i},0.0,{y},0.0,300.0,1.0,0.0,0.0\n")

    ini = tmp_path / "zeta.ini"
    ini.write_text(base + f"""
[loMach/more]
dummy = 0
[ransModel]
zeta-f-file = {tke_path}
bc-fac = 2.0
walls = '1 3'
""".replace("[loMach/more]\ndummy = 0\n", "") + "\n")
    # append turb model selection into the [loMach] section via raw keys
    txt = ini.read_text().replace("[loMach]\n", "[loMach]\nturb-model = zeta-f\n")
    ini.write_text(txt)

    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    from tps_tpu.fem import h1 as _h1

    dofs = np.asarray(_h1.boundary_dofs(s.tab, (4,)))
    y = np.asarray(s.tab.xyz)[dofs, 1]
    k_bc = np.asarray(s.turb.k_bc)[dofs]
    v2_bc = np.asarray(s.turb.v2_bc)[dofs]
    # bc-fac = 2 doubles the file profile
    assert np.abs(k_bc - 2.0 * 0.1 * y).max() < 0.03
    assert np.abs(v2_bc - 2.0 * 0.05 * y).max() < 0.02
    tps.solve_step()
    assert np.isfinite(np.asarray(s.turb.k)).all()

    # static-rans from a volume file
    ini2 = tmp_path / "srans.ini"
    txt2 = base.replace("[loMach]\n", "[loMach]\nturb-model = static-rans\n")
    ini2.write_text(txt2 + f"""
[loMach/static-rans]
visc-file = {nut_path}
visc-fac = 1.5
""")
    tps2 = Tps()
    tps2.input_file = str(ini2)
    tps2.parse_input()
    tps2.choose_devices()
    tps2.choose_solver()
    tps2.initialize()
    s2 = tps2.solver
    x = np.asarray(s2.tab.xyz)[:, 0]
    nut = np.asarray(s2.turb.eddy_viscosity())
    assert np.abs(nut - 1.5 * (0.01 + 0.02 * x)).mean() < 0.01
