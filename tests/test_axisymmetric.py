"""Axisymmetric compressible formulation tests (plasma.axisym substrate):
well-balancing of the geometric pressure source and swirl stability."""

import jax
import jax.numpy as jnp
import numpy as np

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.forcing import AxisymmetricSource
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.gas import DryAir


def _axi_setup(eq="euler"):
    mix = DryAir(dim=2, nvel=3)  # (r, z) + swirl
    # (r, z) strip away from the axis
    mesh = box_2d(6, 6, x0=0.2, x1=1.2, y0=0.0, y1=1.0, periodic_y=True)
    tab = build_tables(mesh, order=2, axisymmetric=True).to_jax(jnp.float64)
    tr = None
    if eq != "euler":
        from tps_tpu.physics.transport import DryAirTransport

        tr = DryAirTransport(mix.gas_constant, mix.specific_heat_ratio)
    fl = Fluxes(mixture=mix, transport=tr, eq_system=eq, axisymmetric=True)
    from tps_tpu.dg.bc import WallBC
    from tps_tpu.dg.rhs import BCSlice

    # attrs 2 (r=max) and 4 (r=min) remain as slip walls
    attrs = np.asarray(tab.f_bdr_attr)
    bcs = []
    start = 0
    for a in sorted(set(attrs.tolist())):
        rows = np.where(attrs == a)[0]
        bcs.append(BCSlice(bc=WallBC(kind="inviscid"), start=int(rows.min()),
                           stop=int(rows.max()) + 1))
    ctx = RHSContext(
        fluxes=fl, riemann=Rusanov(fl), bcs=tuple(bcs),
        forcings=(AxisymmetricSource(mixture=mix, fluxes=fl),),
    )
    return mix, tab, ctx


def test_axisym_uniform_state_well_balanced():
    """Uniform axial flow: the geometric pressure source must cancel the
    r-weighted volume/face pressure terms to discretization accuracy."""
    mix, tab, ctx = _axi_setup()
    neq = mix.num_equations  # 5: rho, rho*ur, rho*uz, rho*E, (ut in slot 3!)
    # layout: [rho, u_r, u_z, u_theta? ...] -> nvel=3: [rho, ur, uz, ut, T]
    Up = jnp.zeros(tab.xyz_dof.shape[:2] + (neq,))
    Up = Up.at[..., 0].set(1.2)
    Up = Up.at[..., 2].set(30.0)  # axial velocity u_z
    Up = Up.at[..., mix.i_th].set(300.0)
    U = mix.conservatives(Up)
    y, _ = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab, U)
    p = 1.2 * mix.gas_constant * 300.0
    # residual scale: the raw pressure source p/r ~ 5e5; balance to ~1e-6 rel
    rel = float(jnp.abs(y).max()) / (p / 0.2)
    assert rel < 1e-6, rel


def test_axisym_swirl_stable():
    """Rigid-rotation-like swirl runs stably for a few steps."""
    from tps_tpu.time.integrators import rk4

    mix, tab, ctx = _axi_setup()
    r = tab.xyz_dof[..., 0]
    neq = mix.num_equations
    Up = jnp.zeros(tab.xyz_dof.shape[:2] + (neq,))
    Up = Up.at[..., 0].set(1.2)
    Up = Up.at[..., 2].set(10.0)
    Up = Up.at[..., 3].set(5.0 * r)  # swirl
    Up = Up.at[..., mix.i_th].set(300.0)
    U = mix.conservatives(Up)
    step = jax.jit(
        lambda u, t, dt: rk4(lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u, t, dt)[0]
    )
    dt = 1e-6
    for i in range(5):
        U = step(U, i * dt, dt)
    assert np.isfinite(np.asarray(U)).all()
    Up2 = mix.primitives(U)
    assert 250 < float(jnp.mean(Up2[..., mix.i_th])) < 350
