"""Preconditioned implicit solves: Chebyshev and two-level p-multigrid.

VERDICT round-1 weak item 3: Jacobi-CG will not scale on stretched meshes;
the reference leans on BoomerAMG (src/tomboulides.cpp:1582-1596).  The
acceptance bar: >= 3x iteration reduction vs Jacobi on a stretched mesh,
plus iteration/residual reporting."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d


def _poisson(order=3, nx=6, ny=48):
    """High-aspect-ratio channel (stretched elements, AR ~ nx*y1/ny/x1)."""
    mesh = box_2d(nx, ny, x1=1.0, y1=1.0)
    tab = h1.build_h1(mesh, order=order).to_jax(jnp.float64)
    tab_np = h1.build_h1(mesh, order=order)

    # Dirichlet everywhere for a definite system
    bdofs = h1.boundary_dofs(tab_np)
    mask = np.ones(tab_np.ndofs)
    mask[bdofs] = 0.0
    mask = jnp.asarray(mask)

    def lap(v):
        return h1.diffusion_apply(tab, v)

    diag = h1.stiffness_diag(tab)
    x = jnp.asarray(tab_np.xyz[:, 0])
    y = jnp.asarray(tab_np.xyz[:, 1])
    b = h1.mass_apply(tab, jnp.sin(3 * x) * jnp.cos(2 * y)) * mask
    return mesh, tab, tab_np, lap, diag, mask, b


def _solve(lap, b, diag, mask, M=None):
    diag_c = diag * mask + (1.0 - mask)
    x, it, res = h1.cg_solve(lap, b, diag=diag_c, dirichlet_mask=mask,
                             tol=1e-10, maxiter=4000, M=M, return_info=True)
    return x, int(it), float(res)


def test_chebyshev_and_pmg_beat_jacobi():
    mesh, tab, tab_np, lap, diag, mask, b = _poisson()

    def lap_m(v):
        return lap(v * mask) * mask + v * (1.0 - mask)

    diag_c = diag * mask + (1.0 - mask)

    x_j, it_j, res_j = _solve(lap, b, diag, mask)
    assert res_j < 1e-9

    M_cheb = h1.chebyshev_precond(lap_m, diag_c, degree=3)
    x_c, it_c, res_c = _solve(lap, b, diag, mask, M=M_cheb)
    assert res_c < 1e-9
    np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_j),
                               atol=1e-7 * float(jnp.max(jnp.abs(x_j))))
    assert it_c < it_j  # Chebyshev accelerates over plain Jacobi

    # two-level p-multigrid
    tab_c_np = h1.build_h1(mesh, order=1)
    tab_c = tab_c_np.to_jax(jnp.float64)
    P_ids, P_wts, c2f = h1.build_p_interp(tab_np, tab_c_np, mesh)

    mask_c = np.ones(tab_c_np.ndofs)
    mask_c[h1.boundary_dofs(tab_c_np)] = 0.0
    mask_c = jnp.asarray(mask_c)
    diag_cc = h1.stiffness_diag(tab_c) * mask_c + (1.0 - mask_c)

    def lap_c(v):
        return h1.diffusion_apply(tab_c, v * mask_c) * mask_c + \
            v * (1.0 - mask_c)

    M_pmg = h1.pmg_precond(lap_m, diag_c, lap_c, diag_cc, P_ids, P_wts,
                           tab_c_np.ndofs)
    x_m, it_m, res_m = _solve(lap, b, diag, mask, M=M_pmg)
    assert res_m < 1e-9
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j),
                               atol=1e-7 * float(jnp.max(jnp.abs(x_j))))
    # the acceptance bar: >= 3x fewer iterations than Jacobi
    assert it_m * 3 <= it_j, (it_m, it_j)
    print(f"iters: jacobi={it_j} chebyshev={it_c} pmg={it_m}")


def test_cg_reports_nonconvergence():
    """A too-small iteration cap must surface a large residual, not a
    silent wrong answer."""
    _, tab, tab_np, lap, diag, mask, b = _poisson(order=2, nx=4, ny=16)
    x, it, res = h1.cg_solve(lap, b, diag=diag * mask + (1 - mask),
                             dirichlet_mask=mask, tol=1e-12, maxiter=3,
                             return_info=True)
    assert int(it) == 3
    assert float(res) > 1e-8
