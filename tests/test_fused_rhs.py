"""Fused-layout RHS fast path == general slot path (dg/fused.py).

The fused path folds the linear DG operators into shared weight matrices
over a fused (dof*eq) minor dim; it must reproduce rhs.compute_rhs to
rounding on structured periodic meshes (both Euler and Navier-Stokes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.fused import fusable, maybe_build_fused
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_2d, box_3d
from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.transport import DryAirTransport
from tps_tpu.utils.cases import uniform_state


def _setup(dim, eq_system, n=6, order=2):
    mix = DryAir(dim=dim, nvel=dim)
    if dim == 3:
        mesh = box_3d(n, n, n, periodic=(True, True, True))
    else:
        mesh = box_2d(n, n, x1=1.0, y1=1.0, periodic_x=True, periodic_y=True)
    tab_np = build_tables(mesh, order=order)
    tab = tab_np.to_jax(jnp.float64)
    transport = None if eq_system == "euler" else DryAirTransport(
        mix.gas_constant, mix.specific_heat_ratio
    )
    fl = Fluxes(mixture=mix, transport=transport, eq_system=eq_system)
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))

    xyz = tab.xyz_dof
    Up = uniform_state(xyz, mix, 1.2, (10.0,) + (0.0,) * (dim - 1), 300.0)
    two_pi = 2 * np.pi
    Up = Up.at[..., 1].add(
        5.0 * jnp.sin(two_pi * xyz[..., 0]) * jnp.cos(two_pi * xyz[..., 1])
    )
    Up = Up.at[..., 2].add(
        -5.0 * jnp.cos(two_pi * xyz[..., 0]) * jnp.sin(two_pi * xyz[..., 1])
    )
    Up = Up.at[..., dim + 1].mul(
        1.0 + 0.05 * jnp.sin(two_pi * xyz[..., 0])
    )
    U = mix.conservatives(Up)
    return mix, tab_np, tab, ctx, U


def _compare(dim, eq_system):
    mix, tab_np, tab, ctx, U = _setup(dim, eq_system)
    fused = maybe_build_fused(tab_np, ctx, dtype=jnp.float64)
    assert fused is not None

    y_ref, aux_ref = jax.jit(lambda u: compute_rhs(ctx, tab, u))(U)
    y2, aux = jax.jit(lambda u2: fused(u2))(fused.to_fused(U))
    y = fused.from_fused(y2)

    scale = float(jnp.max(jnp.abs(y_ref)))
    err = float(jnp.max(jnp.abs(y - y_ref))) / scale
    assert err < 1e-12, err
    np.testing.assert_allclose(
        float(aux["max_char_speed"]), float(aux_ref["max_char_speed"]),
        rtol=1e-13,
    )


def test_fused_euler_3d():
    _compare(3, "euler")


def test_fused_ns_3d():
    _compare(3, "navier-stokes")


def test_fused_ns_2d():
    _compare(2, "navier-stokes")


def test_fused_preconditions():
    """Unstructured/BC cases must NOT take the fused path."""
    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(4, 4, x1=1.0, y1=1.0, periodic_x=False, periodic_y=True)
    tab_np = build_tables(mesh, order=2)
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    assert not fusable(tab_np, ctx)  # boundary faces present


def test_fused_matches_slot_with_source_forcings():
    """Periodic plasma config (SourceTerm + JouleHeating forcings): the
    roll-based fused path now evaluates pointwise forcings after the DG
    part and must match the slot path to roundoff (the argon bench
    configs ride this path; dg/fused.py _POINTWISE_FORCINGS)."""
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    import tps_tpu.harness  # noqa: F401
    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.dg.fused import fusable, maybe_build_fused
    from tps_tpu.dg.rhs import compute_rhs
    from tps_tpu.solvers.base import create_solver

    import os

    deck = open(os.path.join(os.path.dirname(__file__), "..", "examples",
                             "cases", "argon_plasma_2d.ini")).read()
    deck = deck.replace("nx = 6", "nx = 8").replace("ny = 6", "ny = 8")
    deck = deck.replace("order = 1", "order = 2")
    deck = deck.replace("outputFreq = 100",
                        "outputFreq = 100000\nbasisType = 0\n"
                        "integrationRule = 0")
    f = tempfile.NamedTemporaryFile("w", suffix=".ini", delete=False)
    f.write(deck)
    f.close()
    rc = parse_run_configuration(IniInput.read(f.name))
    s = create_solver(rc.solver_type, rc)
    s.initialize()
    assert fusable(s.tables_np, s.ctx)
    assert type(s._fused).__name__ == "FusedRHS"

    U = jnp.asarray(s.U)
    xyz = s.tables.xyz_dof
    U = U.at[..., s.mixture.i_th].mul(
        1.0 + 0.05 * jnp.sin(2 * np.pi * xyz[..., 0] / 0.01)
        * jnp.cos(2 * np.pi * xyz[..., 1] / 0.01))

    y_slot, aux1 = compute_rhs(s.ctx, s.tables, U, 0.0)
    fus = maybe_build_fused(s.tables_np, s.ctx, jnp.float64)
    y_fus, aux2 = fus(fus.to_fused(U), 0.0)
    y_fus = y_fus.reshape(U.shape)
    y_slot = jnp.asarray(y_slot).reshape(U.shape)
    scale = float(jnp.abs(y_slot).max())
    assert float(jnp.abs(y_slot - y_fus).max()) / scale < 1e-11
    assert np.isclose(float(aux1["max_char_speed"]),
                      float(aux2["max_char_speed"]), rtol=1e-12)
