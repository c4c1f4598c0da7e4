"""Euler DG residual tests: free-stream preservation, conservation, and
spatial convergence on the isentropic vortex (the role of the reference's
MMS RHS tests, test/mms.euler_2d.test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Roe, Rusanov
from tps_tpu.mesh.generators import box_2d, box_3d
from tps_tpu.physics.gas import DryAir
from tps_tpu.utils.cases import isentropic_vortex, uniform_state


def euler_ctx(mix, riemann="rusanov"):
    fl = Fluxes(mixture=mix, transport=None, eq_system="euler")
    rs = Rusanov(fl) if riemann == "rusanov" else Roe(fl)
    return RHSContext(fluxes=fl, riemann=rs, bcs=())


def jit_rhs(ctx):
    return jax.jit(lambda tab, U: compute_rhs(ctx, tab, U))


def test_freestream_preservation_2d():
    mix = DryAir(dim=2, nvel=2)
    mesh = box_2d(5, 4, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=3).to_jax(jnp.float64)
    Up = uniform_state(tab.xyz_dof, mix, 1.2, (30.0, -10.0), 300.0)
    U = mix.conservatives(Up)
    y, aux = jit_rhs(euler_ctx(mix))(tab, U)
    scale = float(jnp.abs(U).max())
    assert float(jnp.abs(y).max()) / scale < 1e-10
    assert aux["max_char_speed"] > 0


def test_freestream_preservation_3d():
    mix = DryAir(dim=3, nvel=3)
    mesh = box_3d(3, 3, 3, periodic=(True, True, True))
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    Up = uniform_state(tab.xyz_dof, mix, 1.0, (10.0, 5.0, -3.0), 280.0)
    U = mix.conservatives(Up)
    y, _ = jit_rhs(euler_ctx(mix))(tab, U)
    scale = float(jnp.abs(U).max())
    assert float(jnp.abs(y).max()) / scale < 1e-10


def test_conservation_periodic():
    """Integral of dU/dt must vanish on a periodic domain."""
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(8, 8, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    Up = isentropic_vortex(tab.xyz_dof, 0.0, mix)
    U = mix.conservatives(Up)
    y, _ = jit_rhs(euler_ctx(mix))(tab, U)
    # integrate y against 1: sum_e sum_q w_q detJ (B y)_q
    yq = jnp.einsum("qd,nde->nqe", tab.Bvol, y)
    total = jnp.einsum("q,nq,nqe->e", tab.wq, tab.detJ, yq)
    assert float(jnp.abs(total).max()) < 1e-10


@pytest.mark.parametrize("riemann", ["rusanov", "roe"])
def test_vortex_rhs_convergence(riemann):
    """RHS error vs exact advection derivative converges with resolution."""
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    errs = []
    for n in (8, 16, 32):
        mesh = box_2d(n, n, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
        tab = build_tables(mesh, order=2).to_jax(jnp.float64)
        xy = tab.xyz_dof
        Up = isentropic_vortex(xy, 0.0, mix)
        U = mix.conservatives(Up)
        y, _ = jit_rhs(euler_ctx(mix, riemann))(tab, U)
        # exact dU/dt = -(u_inf . grad) U: finite-difference in t of exact state
        eps = 1e-6
        Up_p = isentropic_vortex(xy, eps, mix)
        Up_m = isentropic_vortex(xy, -eps, mix)
        dUdt = (mix.conservatives(Up_p) - mix.conservatives(Up_m)) / (2 * eps)
        errs.append(float(jnp.sqrt(jnp.mean((y - dUdt) ** 2))))
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    # The pointwise RHS residual of nodal DG converges at order p (the
    # SOLUTION superconverges at p+1; see test_vortex_time_integration).
    assert r2 > 1.8, (errs, r1, r2)


def test_vortex_time_integration():
    """Advect the vortex one period-ish and compare against the exact state."""
    from tps_tpu.time.integrators import rk4

    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(16, 16, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    ctx = euler_ctx(mix)
    xy = tab.xyz_dof
    U = mix.conservatives(isentropic_vortex(xy, 0.0, mix))

    rhs_fn = lambda u, t: compute_rhs(ctx, tab, u, t)
    step = jax.jit(lambda u, t, dt: rk4(rhs_fn, u, t, dt)[0])

    t, dt, t_end = 0.0, 0.02, 1.0
    nsteps = int(round(t_end / dt))
    for _ in range(nsteps):
        U = step(U, t, dt)
        t += dt
    Uex = mix.conservatives(isentropic_vortex(xy, t, mix))
    err = float(jnp.sqrt(jnp.mean((U - Uex) ** 2)))
    assert err < 5e-3, err


def test_roll_topology_matches_gather():
    """Structured-mesh roll fast path is bitwise-equal to the general
    neighbor gather (3D NS on a periodic box)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.mesh.generators import box_3d
    from tps_tpu.physics.transport import DryAirTransport

    mix = DryAir(dim=3, nvel=3)
    mesh = box_3d(4, 3, 5, periodic=(True, True, False))
    tab = build_tables(mesh, order=1)
    assert tab.roll_info is not None
    tabj = tab.to_jax(jnp.float64)
    tab_nr = dataclasses.replace(tabj, roll_info=None)  # force gather path

    tr = DryAirTransport(mix.gas_constant, mix.specific_heat_ratio)
    fl = Fluxes(mixture=mix, transport=tr, eq_system="navier-stokes")
    from tps_tpu.dg.bc import WallBC
    from tps_tpu.dg.rhs import BCSlice, RHSContext, compute_rhs

    bcs = (BCSlice(WallBC(kind="viscous_adiabatic"), 0, tab.nfb),)
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl), bcs=bcs)

    rng = np.random.RandomState(5)
    Up = np.zeros((tab.ne, tab.ndof, mix.num_equations))
    Up[..., 0] = 1.2 + 0.05 * rng.rand(tab.ne, tab.ndof)
    Up[..., 1:4] = 5.0 * rng.randn(tab.ne, tab.ndof, 3)
    Up[..., 4] = 300.0 * (1 + 0.05 * rng.rand(tab.ne, tab.ndof))
    U = mix.conservatives(jnp.asarray(Up))

    y_roll, aux_r = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tabj, U)
    y_gath, aux_g = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab_nr, U)
    assert np.allclose(np.asarray(y_roll), np.asarray(y_gath), atol=1e-12)
    assert abs(float(aux_r["max_char_speed"]) - float(aux_g["max_char_speed"])) < 1e-12


def test_roe_3d_consistency_and_vortex():
    """3-D Roe flux: consistent (F(U,U,n) = F(U).n), conservative
    (F(a,b,n) = -F(b,a,-n)), and runs the 3-D NS step."""
    import jax
    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.riemann import Roe
    from tps_tpu.mesh.generators import box_3d
    from tps_tpu.physics.transport import DryAirTransport

    mix = DryAir(dim=3, nvel=3)
    fl = Fluxes(mixture=mix, eq_system="euler")
    roe = Roe(fl)
    rng = np.random.RandomState(7)
    n = 16
    Up = np.zeros((n, 5))
    Up[:, 0] = 1.0 + 0.3 * rng.rand(n)
    Up[:, 1:4] = 50.0 * rng.randn(n, 3)
    Up[:, 4] = 300.0 * (1 + 0.3 * rng.rand(n))
    U1 = np.asarray(mix.conservatives(jnp.asarray(Up)))
    Up[:, 1:4] += 20.0 * rng.randn(n, 3)
    U2 = np.asarray(mix.conservatives(jnp.asarray(Up)))
    nor = rng.randn(n, 3)

    U1j, U2j, nj = map(jnp.asarray, (U1, U2, nor))
    # consistency
    f_same = np.asarray(roe(U1j, U1j, nj))
    Fex = np.einsum("ned,nd->ne", np.asarray(fl.convective(U1j)), nor)
    assert np.abs(f_same - Fex).max() / np.abs(Fex).max() < 1e-10
    # conservativity
    fab = np.asarray(roe(U1j, U2j, nj))
    fba = np.asarray(roe(U2j, U1j, -nj))
    assert np.abs(fab + fba).max() / np.abs(fab).max() < 1e-10

    # one stable 3-D NS step with Roe
    mesh = box_3d(4, 4, 4, periodic=(True, True, True))
    tab = build_tables(mesh, order=1).to_jax(jnp.float64)
    tr = DryAirTransport(mix.gas_constant, mix.specific_heat_ratio)
    fl2 = Fluxes(mixture=mix, transport=tr, eq_system="navier-stokes")
    ctx = RHSContext(fluxes=fl2, riemann=Roe(fl2))
    U = mix.conservatives(uniform_state(tab.xyz_dof, mix, 1.2, (30.0, 5.0, -2.0), 300.0))
    y, aux = jax.jit(lambda t, u: compute_rhs(ctx, t, u))(tab, U)
    assert float(jnp.abs(y).max()) / float(jnp.abs(U).max()) < 1e-11


def test_roe_zero_normal_is_finite():
    """Roe with an exactly-zero scaled normal returns zero flux, not NaN
    (weight-folded normals are zero at padding slots and axisymmetric-axis
    faces; regression for the unguarded |n| division)."""
    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.riemann import Roe
    from tps_tpu.physics.gas import DryAir

    mix = DryAir(dim=2, nvel=2)
    fl = Fluxes(mixture=mix, eq_system="euler")
    roe = Roe(fl)
    U1 = jnp.asarray([[1.2, 40.0, 1.0, 2.6e5]])
    U2 = jnp.asarray([[1.1, 30.0, -1.0, 2.4e5]])
    nor = jnp.zeros((1, 2))
    f = np.asarray(roe(U1, U2, nor))
    assert np.isfinite(f).all() and np.abs(f).max() < 1e-200


def test_perface_traces_match_slot_traces():
    """The per-face fused trace buffers equal the stacked slot-trace
    formulation on meshes with and without roll topology (incl. a curved
    annulus whose periodic seam exercises the gather path)."""
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.operators import (
        perface_own_traces,
        perface_traces,
        slot_traces,
    )
    from tps_tpu.mesh.generators import annulus_2d, box_2d

    rng = np.random.RandomState(3)
    for mesh in (box_2d(5, 4), annulus_2d(3, 12, r0=0.5, r1=1.0)):
        tab = build_tables(mesh, order=2).to_jax(jnp.float64)
        X = jnp.asarray(rng.rand(tab.ne, tab.ndof, 7))
        own_s, nbr_s = slot_traces(tab, X)
        own_p, nbr_p = perface_traces(tab, X)
        own_o = perface_own_traces(tab, X)
        for lf in range(tab.nlf):
            o = own_p[lf].reshape(tab.ne, tab.nqf, 7)
            n = nbr_p[lf].reshape(tab.ne, tab.nqf, 7)
            assert np.allclose(o, own_s[:, lf], atol=1e-13)
            assert np.allclose(n, nbr_s[:, lf], atol=1e-13)
            assert np.allclose(own_o[lf], own_p[lf], atol=0)
