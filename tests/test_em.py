"""Axisymmetric quasimagnetostatic solver tests (qms.axisym analog):
current loop B-field against the Biot-Savart analytic value, Joule heating
with conductive plasma."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.config.ini import IniInput
from tps_tpu.config.run_config import parse_run_configuration
from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d
from tps_tpu.solvers.em.qms import QuasiMagnetostaticSolverAxiSym

MU0 = 1.25663706e-6


def _ring_mesh(nr=24, nz=24, R=2.0, r0=0.5, z0=0.0, w=0.1):
    """(r,z) rectangle with a square coil-ring region (attr 2) at (r0,z0)."""
    mesh = box_2d(nr, nz, x0=0.0, x1=R, y0=-R, y1=R)
    cent = mesh.vertices[mesh.elements].mean(axis=1)
    attrs = np.ones(mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cent[:, 0] - r0) < w) & (np.abs(cent[:, 1] - z0) < w)
    attrs[ring] = 2
    mesh.elem_attrs = attrs
    return mesh


def _config(extra=""):
    ini = IniInput.parse(
        """
[solver]
type = em-axi
[em]
order = 2
current_amplitude = 1.0e6
current_frequency = 60.0
max_iter = 400
rtol = 1e-12
"""
        + extra
    )
    return parse_run_configuration(ini)


def test_loop_field_on_axis():
    """B_z on the axis of a current loop vs Biot-Savart."""
    mesh = _ring_mesh()
    rc = _config()
    em = QuasiMagnetostaticSolverAxiSym(rc, mesh=mesh)
    em.initialize()
    em.solve()

    # loop current: J = I/2 over ring area... the effective loop current is
    # the area integral of the current density: I_eff = J0/mu0 * area / ...
    # Use the solver's own coilCurrent-consistent normalization:
    tab = em.tab
    attrs = np.asarray(mesh.attributes())
    sel = jnp.asarray((attrs == 2).astype(float))
    area = float(jnp.sum(tab.wq[None, :] * tab.detJ * sel[:, None]))
    I_eff = 0.5 * em.current_amplitude * area  # total amp-turns

    # B_z(axis, z) from A: Bz = dA/dr + A/r -> at r=0 use 2*dA/dr limit
    g = h1.grad_at_dofs(tab, em.A_re)
    xyz = np.asarray(tab.xyz)
    on_axis = np.abs(xyz[:, 0]) < 1e-12
    z = xyz[on_axis, 1]
    Bz = 2.0 * np.asarray(g[on_axis, 0])  # lim r->0 (dA/dr + A/r) = 2 dA/dr

    r0 = 0.5
    Bz_exact = MU0 * I_eff * r0**2 / (2.0 * (r0**2 + z**2) ** 1.5)
    sel2 = np.abs(z) < 1.0  # away from outer boundary truncation
    rel = np.abs(Bz[sel2] - Bz_exact[sel2]) / Bz_exact[sel2].max()
    assert rel.max() < 0.08, rel.max()

    # coil current diagnostic consistent with the source normalization
    assert abs(em.coil_current() - I_eff) / I_eff < 1e-12
    assert em.magnetic_energy() > 0


def test_joule_heating_with_plasma():
    mesh = _ring_mesh()
    rc = _config()
    em = QuasiMagnetostaticSolverAxiSym(rc, mesh=mesh)
    em.initialize()
    # conductive plasma column near the axis
    xyz = np.asarray(em.tab.xyz)
    sigma = np.where((xyz[:, 0] < 0.3) & (np.abs(xyz[:, 1]) < 1.0), 1000.0, 0.0)
    em.set_plasma_conductivity(jnp.asarray(sigma))
    em.solve()
    q = np.asarray(em.joule_heating)
    assert np.isfinite(q).all() and q.min() >= 0
    assert q.max() > 0
    total = em.total_joule_heating()
    assert total > 0 and np.isfinite(total)
    # with sigma > 0 the imaginary part is nonzero
    assert float(jnp.abs(em.A_im).max()) > 0
    # power-control hook
    em.scale_joule_heating(2.0)
    assert abs(em.total_joule_heating() - 2 * total) / total < 1e-10


def test_axisym_qms_sharded_matches_single():
    """em/partitions N: the element-sharded (shard_map + psum) solve
    reproduces the single-device fields to solver tolerance (SURVEY 2.6:
    the reference runs every solver family under MPI)."""
    import jax.numpy as jnp

    from tps_tpu.config.run_config import RunConfiguration
    from tps_tpu.solvers.em.qms import QuasiMagnetostaticSolverAxiSym
    from tps_tpu.mesh.generators import box_2d

    # (r, z) in [0.05, 1.05] x [0, 1] with a coil-ring attribute band
    mesh = box_2d(10, 10, x0=0.05, x1=1.05, y0=0.0, y1=1.0)
    cc = mesh.vertices[mesh.elements].mean(axis=1)
    attrs = np.ones(mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cc[:, 0] - 0.6) < 0.15) & (np.abs(cc[:, 1] - 0.5) < 0.15)
    attrs[ring] = 2
    mesh.elem_attrs = attrs

    class _Cfg:
        def __init__(self, vals):
            self._v = dict(vals)
            self.raw = self

        def get(self, k, d=None):
            return self._v.get(k, d)

        def get_required(self, k, typ=str):
            return self._v[k]

    def run(nparts):
        cfg = _Cfg({"em/partitions": nparts, "em/current_amplitude": 1.0e4,
                    "em/current_frequency": 1.0e5, "em/rtol": 1e-12,
                    "em/max_iter": 400})
        s = QuasiMagnetostaticSolverAxiSym(cfg, mesh=mesh)
        s.initialize()
        sigma = 100.0 * np.exp(
            -((np.asarray(s.tab.xyz)[:, 0] - 0.3) ** 2) / 0.02)
        s.set_plasma_conductivity(sigma)
        s.solve()
        return np.asarray(s.A_re), np.asarray(s.A_im), s.total_joule_heating()

    a1, b1, q1 = run(1)
    a4, b4, q4 = run(4)
    scale = np.abs(a1).max() + np.abs(b1).max()
    assert np.abs(a4 - a1).max() < 1e-8 * scale
    assert np.abs(b4 - b1).max() < 1e-8 * scale
    assert abs(q4 - q1) <= 1e-6 * max(abs(q1), 1e-300)
    assert np.abs(a1).max() > 0
