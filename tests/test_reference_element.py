import numpy as np
import pytest

from tps_tpu.mesh.reference_element import (
    ReferenceElement,
    gauss_legendre_1d,
    gauss_lobatto_1d,
    lagrange_deriv,
    lagrange_eval,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_gauss_legendre_exactness(n):
    x, w = gauss_legendre_1d(n)
    for deg in range(2 * n):
        exact = 1.0 / (deg + 1)
        assert abs(np.sum(w * x**deg) - exact) < 1e-13


@pytest.mark.parametrize("n", [2, 3, 4, 6])
def test_gauss_lobatto_exactness(n):
    x, w = gauss_lobatto_1d(n)
    assert abs(x[0]) < 1e-14 and abs(x[-1] - 1.0) < 1e-14
    for deg in range(2 * n - 3):
        exact = 1.0 / (deg + 1)
        assert abs(np.sum(w * x**deg) - exact) < 1e-13


def test_lagrange_interpolation():
    nodes, _ = gauss_legendre_1d(4)
    x = np.linspace(0, 1, 17)
    B = lagrange_eval(nodes, x)
    # partition of unity
    assert np.allclose(B.sum(axis=1), 1.0, atol=1e-13)
    # exact for degree-3 polynomial
    f = lambda t: 2 * t**3 - t + 0.5
    assert np.allclose(B @ f(nodes), f(x), atol=1e-13)
    D = lagrange_deriv(nodes, x)
    df = lambda t: 6 * t**2 - 1
    assert np.allclose(D @ f(nodes), df(x), atol=1e-12)


@pytest.mark.parametrize("geom,order", [("quad", 1), ("quad", 3), ("hex", 2)])
def test_basis_interpolates_at_nodes(geom, order):
    ref = ReferenceElement(geom=geom, order=order, basis="gauss-legendre")
    B = ref.eval_basis(ref.nodes)
    assert np.allclose(B, np.eye(ref.ndof), atol=1e-12)


@pytest.mark.parametrize("geom,order", [("quad", 2), ("hex", 2)])
def test_basis_gradient_polynomial(geom, order):
    ref = ReferenceElement(geom=geom, order=order, basis="gauss-legendre")
    pts = np.random.RandomState(0).rand(11, ref.dim)
    vals = ref.eval_basis(pts)
    grads = ref.eval_basis_grad(pts)
    # f = x^2 + 2*y (+ 3*z)
    nodes = ref.nodes
    f = nodes[:, 0] ** 2 + 2 * nodes[:, 1]
    gx_exact = 2 * pts[:, 0]
    gy_exact = np.full(len(pts), 2.0)
    if ref.dim == 3:
        f = f + 3 * nodes[:, 2]
    assert np.allclose(vals @ f, pts[:, 0] ** 2 + 2 * pts[:, 1] + (3 * pts[:, 2] if ref.dim == 3 else 0), atol=1e-12)
    assert np.allclose(grads[:, :, 0] @ f, gx_exact, atol=1e-12)
    assert np.allclose(grads[:, :, 1] @ f, gy_exact, atol=1e-12)
    if ref.dim == 3:
        assert np.allclose(grads[:, :, 2] @ f, 3.0, atol=1e-12)


def test_geom_mapping_identity():
    ref = ReferenceElement(geom="quad", order=2, basis="gauss-legendre")
    pts = np.random.RandomState(1).rand(7, 2)
    N = ref.eval_geom_basis(pts)
    assert np.allclose(N @ ref.vertices, pts, atol=1e-13)
    ref3 = ReferenceElement(geom="hex", order=1, basis="gauss-legendre")
    pts3 = np.random.RandomState(2).rand(7, 3)
    N3 = ref3.eval_geom_basis(pts3)
    assert np.allclose(N3 @ ref3.vertices, pts3, atol=1e-13)
