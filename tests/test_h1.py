"""H1 substrate tests: operator correctness and a Poisson solve (the
foundation of the low-Mach family's implicit solves)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d, box_3d


def test_global_numbering_shared_dofs():
    mesh = box_2d(3, 2)
    tab = h1.build_h1(mesh, order=2)
    # (2*3+1)*(2*2+1) global nodes for p=2 on 3x2 quads
    assert tab.ndofs == 7 * 5
    assert tab.elem_dofs.max() == tab.ndofs - 1


def test_mass_integral():
    mesh = box_2d(4, 4)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    u = jnp.ones(tab.ndofs)
    # integral of 1 over unit square
    assert abs(float(h1.integrate(tab, u)) - 1.0) < 1e-12
    # mass apply row sums equal lumped diag
    Mu = h1.mass_apply(tab, u)
    assert np.allclose(np.asarray(Mu), np.asarray(h1.mass_lumped_diag(tab)), atol=1e-14)


def test_diffusion_polynomial_exact():
    """(grad v, grad u) for u = x^2 + y: residual equals -∫v ∆u + bdr terms;
    check against quadrature of exact gradient inner products."""
    mesh = box_2d(3, 3)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    x, y = tab.xyz[:, 0], tab.xyz[:, 1]
    u = x**2 + y
    v = x * y  # another H1 function
    Ku = h1.diffusion_apply(tab, u)
    # v^T K u = int grad(v).grad(u) = int (y, x).(2x, 1) = int 2xy + x
    exact = 2 * 0.25 + 0.5
    assert abs(float(jnp.dot(v, Ku)) - exact) < 1e-12


def test_gradient_projection():
    mesh = box_2d(6, 6)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    x, y = tab.xyz[:, 0], tab.xyz[:, 1]
    g = h1.grad_at_dofs(tab, x**2 + 3 * y)
    assert np.allclose(np.asarray(g[:, 0]), np.asarray(2 * x), atol=1e-10)
    assert np.allclose(np.asarray(g[:, 1]), 3.0, atol=1e-10)


def test_divergence_projection():
    mesh = box_2d(5, 5)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    x, y = tab.xyz[:, 0], tab.xyz[:, 1]
    vel = jnp.stack([x * y, y * y], axis=-1)
    d = h1.divergence_at_dofs(tab, vel)
    assert np.allclose(np.asarray(d), np.asarray(y + 2 * y), atol=1e-9)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_poisson_dirichlet(order):
    """-Lap(u) = f, u = sin(pi x) sin(pi y), homogeneous Dirichlet."""
    n = {1: 16, 2: 8, 3: 6}[order]
    mesh = box_2d(n, n)
    tab = h1.build_h1(mesh, order=order).to_jax(jnp.float64)
    x, y = tab.xyz[:, 0], tab.xyz[:, 1]
    uex = jnp.sin(np.pi * x) * jnp.sin(np.pi * y)
    f = 2 * np.pi**2 * uex

    bdofs = h1.boundary_dofs(tab)
    mask = jnp.ones(tab.ndofs).at[jnp.asarray(bdofs)].set(0.0)

    b = h1.mass_apply(tab, f) * mask
    diag = h1.stiffness_diag(tab) * mask + (1.0 - mask)
    u = h1.cg_solve(
        lambda v: h1.diffusion_apply(tab, v),
        b, diag=diag, dirichlet_mask=mask, tol=1e-12, maxiter=2000,
    )
    err = float(jnp.sqrt(h1.integrate(tab, (u - uex) ** 2)))
    tol = {1: 4e-3, 2: 2e-4, 3: 5e-5}[order]
    assert err < tol, (order, err)


def test_poisson_3d():
    mesh = box_3d(4, 4, 4)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    x, y, z = tab.xyz[:, 0], tab.xyz[:, 1], tab.xyz[:, 2]
    uex = jnp.sin(np.pi * x) * jnp.sin(np.pi * y) * jnp.sin(np.pi * z)
    f = 3 * np.pi**2 * uex
    bdofs = h1.boundary_dofs(tab)
    mask = jnp.ones(tab.ndofs).at[jnp.asarray(bdofs)].set(0.0)
    b = h1.mass_apply(tab, f) * mask
    diag = h1.stiffness_diag(tab) * mask + (1.0 - mask)
    u = h1.cg_solve(lambda v: h1.diffusion_apply(tab, v), b, diag=diag,
                    dirichlet_mask=mask, tol=1e-11, maxiter=2000)
    err = float(jnp.sqrt(h1.integrate(tab, (u - uex) ** 2)))
    assert err < 5e-3, err
