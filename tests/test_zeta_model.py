"""zeta-f four-equation RANS model (reference: src/zetaModel.cpp)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d
from tps_tpu.solvers.lomach.base import (
    ConstantPropertyThermoChem,
    TemporalCoefficients,
)
from tps_tpu.solvers.lomach.zeta_model import ZetaModel


class _ShearFlow:
    """Frozen parabolic channel profile u(y) = 4 U y (1 - y)."""

    def __init__(self, tab, U=10.0):
        y = tab.xyz[:, 1]
        self._u = jnp.stack(
            [4.0 * U * y * (1.0 - y), jnp.zeros_like(y)], axis=-1
        )

    def velocity(self):
        return self._u


def _setup(n=12, order=2):
    mesh = box_2d(n, 4, x1=1.0, y1=1.0, periodic_x=True)
    tab = h1.build_h1(mesh, order=order).to_jax(jnp.float64)
    thermo = ConstantPropertyThermoChem(tab, rho=1.0, mu=1e-3)
    flow = _ShearFlow(tab)
    zm = ZetaModel(tab, flow, thermo, wall_attrs=(1, 3),
                   tke_ic=1e-2, tdr_ic=1e-2)
    return tab, zm


def test_zeta_channel_growth_and_wall_damping():
    tab, zm = _setup()
    for i in range(60):
        zm.step(TemporalCoefficients.bdf(min(i + 1, 2)), 5e-3)

    k = np.asarray(zm.k)
    eps = np.asarray(zm.eps)
    v2 = np.asarray(zm.v2)
    f = np.asarray(zm.f)
    nut = np.asarray(zm.eddy_viscosity())
    y = np.asarray(tab.xyz[:, 1])

    for arr in (k, eps, v2, f, nut):
        assert np.isfinite(arr).all()
    assert (k > 0).all() and (eps > 0).all() and (v2 > 0).all()
    # realizability: zeta = v2/k <= 2/3
    assert (v2 <= (2.0 / 3.0) * k + 1e-14).all()
    # wall Dirichlet: k and v2 vanish at walls
    wall = (y < 1e-12) | (y > 1.0 - 1e-12)
    assert np.abs(k[wall]).max() <= 1e-12  # at the tke_min floor
    assert np.abs(v2[wall]).max() <= 1e-12
    assert np.abs(f[wall]).max() < 1e-14
    # shear produces turbulence away from walls
    core = (y > 0.2) & (y < 0.8)
    assert k[core].mean() > 1e-2  # grown beyond IC
    # near-wall damping: nu_t = C_mu v2 T, and the elliptic relaxation
    # limits v2/k and the timescale T toward the wall, so the eddy
    # viscosity PER UNIT TKE must be damped near the wall even while k
    # itself peaks there (shear production).  (The raw nu_t comparison
    # used before was satisfied only by a spurious near-wall sink from an
    # indefinite implicit operator — fixed with the masked reaction term.)
    near = (y < 0.15) & ~wall
    ratio_near = (nut[near] / k[near]).mean()
    ratio_core = (nut[core] / k[core]).mean()
    assert ratio_near < 0.5 * ratio_core, (ratio_near, ratio_core)


def test_zeta_factory_runs(tmp_path):
    from tps_tpu.harness import Tps

    ini = tmp_path / "run.ini"
    ini.write_text("""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 8
ny = 4
periodic_x = 1
[loMach]
order = 2
flow-solver = tomboulides
thermo-solver = constant-property
turb-model = zeta-f
maxIters = 3
[time]
dt_fixed = 1e-3
[ransModel]
walls = '1 3'
tke-ic = 1e-3
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
    assert np.isfinite(np.asarray(s.turb.eddy_viscosity())).all()
    assert np.isfinite(np.asarray(s.flow.velocity())).all()
