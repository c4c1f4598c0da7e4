"""Compressible Navier-Stokes manufactured-solution verification (the role
of the reference's CNS MASA handlers: src/masa_handler.cpp
InitCNS2DSutherlands / mms.cns2d tests).

Same autodiff-MMS pattern as test_mms_ternary: the discrete DG residual of
a smooth manufactured state must converge to the exact flux divergence at
the design order.  Exercises the viscous path on dry air: primitive
gradients, Sutherland mu(T), stress tensor, heat flux."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(__file__)
L = 1.0

CNS_INI = """
[solver]
type = flow
[flow]
order = {order}
integrationRule = 0
basisType = 0
maxIters = 1
fluid = dry_air
equation_system = navier-stokes
viscosityMultiplier = 45000.
[mesh]
generator = box2d
nx = {n}
ny = {n}
x1 = 1.0
y1 = 1.0
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk4
[initialConditions]
rho = 1.2
rhoU = 30.
rhoV = 0.
rhoW = 0.
pressure = 101300.
[io]
outdirBase = /tmp/tps_tpu_mms_cns
"""


def _build(order, n):
    from tps_tpu.harness import Tps

    ini = f"/tmp/mms_cns_{order}_{n}.ini"
    with open(ini, "w") as f:
        f.write(CNS_INI.format(order=order, n=n))
    tps = Tps()
    tps.input_file = ini
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    return tps.solver


def _manufactured():
    """Smooth periodic primitive field [rho, u, v, T] (the reference's
    CNS MMS is likewise a trigonometric state with Sutherland viscosity,
    src/masa_handler.cpp:113-136).  The large viscosityMultiplier makes
    the viscous terms a leading-order contribution so the test actually
    verifies them."""
    two_pi = 2 * np.pi / L

    def up_point(x):
        s = jnp.sin(two_pi * x[0])
        c = jnp.cos(two_pi * x[1])
        sc = s * c
        rho = 1.2 + 0.15 * sc
        u = 30.0 + 6.0 * s
        v = 4.0 * c
        T = 300.0 + 35.0 * sc
        return jnp.stack([rho, u, v, T])

    return up_point


@pytest.mark.parametrize("order,meshes,min_rate", [
    # strong-form DG residual converges at O(h^p); measured p1 ~ 1.0,
    # p2 ~ 2.0 asymptotic minimum over equations
    (1, (12, 24), 0.8),
    (2, (8, 16), 1.7),
])
def test_cns_rhs_convergence(order, meshes, min_rate):
    import dataclasses

    from tps_tpu.dg.rhs import compute_rhs

    errs = []
    for n in meshes:
        s = _build(order, n)
        mix = s.mixture
        tab = s.tables
        ctx = dataclasses.replace(s.ctx, forcings=())
        up_point = _manufactured()

        def u_point(x):
            return mix.conservatives(up_point(x)[None])[0]

        def flux_point(x):
            U = u_point(x)[None, None]
            Up = up_point(x)[None, None]
            g = jax.jacfwd(up_point)(x)[None, None]
            F = ctx.fluxes.total_at_dofs(
                U, Up, g, x[None, None], jnp.ones((1, 1)) * 1e9,
                distance=None,
            )
            return F[0, 0]

        def minus_div_flux(x):
            dF = jax.jacfwd(flux_point)(x)
            return -jnp.einsum("edd->e", dF)

        xyz = tab.xyz_dof.reshape(-1, tab.dim)
        Up_dof = jax.vmap(up_point)(xyz).reshape(tab.ne, tab.ndof, -1)
        U_dof = mix.conservatives(Up_dof)
        y_exact = jax.vmap(minus_div_flux)(xyz).reshape(U_dof.shape)
        y_disc, _ = compute_rhs(ctx, tab, U_dof, 0.0)

        w = np.einsum("q,nq->nq", np.asarray(tab.wq), np.asarray(tab.detJ))
        diff = np.asarray(y_disc - y_exact)
        ref = np.asarray(y_exact)
        num = np.sqrt(np.sum(w[..., None] * diff**2, axis=(0, 1)))
        den = np.sqrt(np.sum(w[..., None] * ref**2, axis=(0, 1)))
        errs.append(num / np.maximum(den, 1e-300))

    rates = np.log2(errs[0] / errs[1]) / np.log2(meshes[1] / meshes[0])
    assert np.all(errs[1] < errs[0]), errs
    assert rates.min() > min_rate, (errs, rates)
    assert errs[1].max() < 0.2, errs
