"""Pallas megakernel RHS vs the XLA fused path (dg/pallas_fused.py).

Runs the two-kernel Pallas RHS in interpreter mode (pure-JAX semantics,
no TPU needed) against FusedRHS on the same state: bitwise-level f64
agreement proves the kernel computes the identical DG operator.  The
hardware (Mosaic) compile + perf runs live in the bench, gated behind
TPS_PALLAS=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.fused import maybe_build_fused
from tps_tpu.dg.pallas_fused import build_pallas_fused, pallas_fusable
from tps_tpu.dg.rhs import RHSContext
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_3d
from tps_tpu.physics.gas import DryAir
from tps_tpu.physics.transport import DryAirTransport
from tps_tpu.utils.cases import uniform_state


def _setup(eq_system, n=(4, 4, 8), order=2):
    mix = DryAir(dim=3, nvel=3)
    mesh = box_3d(*n, periodic=(True, True, True))
    tab_np = build_tables(mesh, order=order)
    fl = Fluxes(
        mixture=mix,
        transport=DryAirTransport(mix.gas_constant,
                                  mix.specific_heat_ratio),
        eq_system=eq_system,
    )
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    tab = tab_np.to_jax(jnp.float64)
    xyz = tab.xyz_dof
    two_pi = 2 * np.pi
    Up = uniform_state(xyz, mix, 1.2, (10.0, 3.0, -2.0), 300.0)
    Up = Up.at[..., 1].add(
        5.0 * jnp.sin(two_pi * xyz[..., 0]) * jnp.cos(two_pi * xyz[..., 1]))
    Up = Up.at[..., 2].add(
        -5.0 * jnp.cos(two_pi * xyz[..., 0]) * jnp.sin(two_pi * xyz[..., 2]))
    Up = Up.at[..., 4].add(
        20.0 * jnp.sin(two_pi * xyz[..., 2]) * jnp.cos(two_pi * xyz[..., 1]))
    U = mix.conservatives(Up).astype(jnp.float64)
    return tab_np, ctx, U


@pytest.mark.parametrize("eq_system", ["euler", "navier-stokes"])
def test_pallas_matches_fused(eq_system):
    tab_np, ctx, U = _setup(eq_system)
    fused = maybe_build_fused(tab_np, ctx, dtype=jnp.float64)
    assert fused is not None
    pall = build_pallas_fused(tab_np, ctx, dtype=jnp.float64,
                              interpret=True)

    yx, auxx = fused(fused.to_fused(U))
    yx = fused.from_fused(yx)
    yp, auxp = pall(pall.to_fused(U))
    yp = pall.from_fused(yp)

    scale = float(jnp.max(jnp.abs(yx)))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                               atol=1e-11 * scale, rtol=1e-11)
    np.testing.assert_allclose(float(auxp["max_char_speed"]),
                               float(auxx["max_char_speed"]), rtol=1e-12)


def test_pallas_gate():
    tab_np, ctx, _ = _setup("navier-stokes", n=(16, 16, 16))
    assert pallas_fusable(tab_np, ctx)  # the bench box qualifies
    tab_small, ctx2, _ = _setup("navier-stokes", n=(4, 4, 8))
    assert not pallas_fusable(tab_small, ctx2)  # lanes < 128: XLA path
