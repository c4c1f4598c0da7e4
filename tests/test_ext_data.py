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
thermo-solver = constant-property
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
