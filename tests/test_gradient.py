"""DG gradient operator tests (analog of reference test/test_gradient.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.operators import dg_gradient as _dg_gradient
from tps_tpu.mesh.generators import box_2d, box_3d

dg_gradient = jax.jit(_dg_gradient)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_gradient_exact_polynomial_2d(order):
    mesh = box_2d(4, 3)
    tab = build_tables(mesh, order=order).to_jax(jnp.float64)
    xy = tab.xyz_dof
    x, y = xy[..., 0], xy[..., 1]
    if order == 1:
        Up = jnp.stack([x + 2 * y, x * 0 + 1.0], axis=-1)
        gex = jnp.stack(
            [jnp.stack([jnp.ones_like(x), jnp.zeros_like(x)], -1),
             jnp.stack([2 * jnp.ones_like(x), jnp.zeros_like(x)], -1)], axis=-1)
    else:
        Up = jnp.stack([1.0 + x**2 + y, x * y], axis=-1)
        gex = jnp.stack(
            [jnp.stack([2 * x, y], -1), jnp.stack([jnp.ones_like(x), x], -1)],
            axis=-1)
    g = dg_gradient(tab, Up)
    assert float(jnp.abs(g - gex).max()) < 1e-11


def test_gradient_exact_polynomial_3d():
    mesh = box_3d(3, 2, 2)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    xyz = tab.xyz_dof
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    Up = (x**2 + y * z)[..., None]
    gex = jnp.stack([2 * x, z, y], axis=-1)[..., None, :]
    g = dg_gradient(tab, Up)
    assert float(jnp.abs(g - gex).max()) < 1e-11


def test_gradient_converges_trig_periodic():
    """Smooth periodic field: gradient error converges at ~order p+1."""
    errs = []
    for n in (4, 8, 16):
        mesh = box_2d(n, n, periodic_x=True, periodic_y=True)
        tab = build_tables(mesh, order=2).to_jax(jnp.float64)
        xy = tab.xyz_dof
        x, y = xy[..., 0], xy[..., 1]
        two_pi = 2 * np.pi
        Up = jnp.sin(two_pi * x)[..., None] * jnp.cos(two_pi * y)[..., None]
        g = dg_gradient(tab, Up)
        gex = jnp.stack(
            [two_pi * jnp.cos(two_pi * x) * jnp.cos(two_pi * y),
             -two_pi * jnp.sin(two_pi * x) * jnp.sin(two_pi * y)], axis=-1)[..., None, :]
        errs.append(float(jnp.sqrt(jnp.mean((g - gex) ** 2))))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate2 > 2.4, (errs, rate1, rate2)


def test_gradient_exact_on_sheared_mesh():
    """dg_gradient of a linear field is exact on a sheared (non-symmetric
    Jacobian) mesh — regression for the transposed-adjJ contraction in the
    fused-minor gradient (axis-aligned meshes have symmetric adjJ and
    cannot catch it)."""
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.operators import dg_gradient
    from tps_tpu.mesh.generators import box_2d

    mesh = box_2d(6, 6)
    # shear: x' = x + 0.3 y  (constant, non-symmetric Jacobian)
    mesh.vertices = mesh.vertices @ np.array([[1.0, 0.0], [0.3, 1.0]])
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    xy = tab.xyz_dof
    up = (2.0 * xy[..., 0] + 5.0 * xy[..., 1])[..., None]
    g = np.asarray(dg_gradient(tab, up))
    assert np.abs(g[..., 0, 0] - 2.0).max() < 1e-10
    assert np.abs(g[..., 0, 1] - 5.0).max() < 1e-10


def test_gradient_exact_on_tri_mesh():
    """Same exactness check on a triangle mesh (non-symmetric adjJ)."""
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.operators import dg_gradient
    from tps_tpu.mesh.generators import box_2d_tri

    mesh = box_2d_tri(5, 5)
    tab = build_tables(mesh, order=2).to_jax(jnp.float64)
    xy = tab.xyz_dof
    up = (2.0 * xy[..., 0] + 5.0 * xy[..., 1])[..., None]
    g = np.asarray(dg_gradient(tab, up))
    assert np.abs(g[..., 0, 0] - 2.0).max() < 1e-9
    assert np.abs(g[..., 0, 1] - 5.0).max() < 1e-9
