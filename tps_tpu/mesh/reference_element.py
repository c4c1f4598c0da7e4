"""Reference elements: 1-D quadrature, nodal Lagrange bases, tensor products.

All setup-time code here is pure numpy (float64).  The resulting tables are
consumed by the DG discretization builder and shipped to the device once.

Reference semantics mirrored (not copied) from the MFEM-based reference:
- nodal L2 elements with Gauss-Legendre or Gauss-Lobatto node placement
  (reference: src/M2ulPhyS.cpp:564-571, DG_FECollection basis types),
- Gauss-Legendre volume/face quadrature (reference: src/M2ulPhyS.cpp:557-561).

Reference domain is the unit interval/square/cube [0,1]^d (MFEM convention).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------------
# 1-D point sets and quadrature
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def gauss_legendre_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre rule on [0,1]; exact for degree 2n-1."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (0.5 * (x + 1.0)), (0.5 * w)


@functools.lru_cache(maxsize=None)
def gauss_lobatto_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Lobatto-Legendre rule on [0,1]; exact for degree 2n-3."""
    if n < 2:
        raise ValueError("Gauss-Lobatto needs at least 2 points")
    # Interior nodes are roots of P'_{n-1}; get them as eigen-roots of the
    # derivative polynomial.
    c = np.zeros(n)
    c[-1] = 1.0
    dP = np.polynomial.legendre.Legendre(c).deriv()
    xi = dP.roots()
    x = np.concatenate([[-1.0], np.sort(xi), [1.0]])
    # weights w_i = 2 / (n (n-1) P_{n-1}(x_i)^2)
    Pn1 = np.polynomial.legendre.Legendre(c)(x)
    w = 2.0 / (n * (n - 1) * Pn1**2)
    return (0.5 * (x + 1.0)), (0.5 * w)


def quadrature_1d(order: int, rule: str = "gauss-legendre") -> tuple[np.ndarray, np.ndarray]:
    """Minimal 1-D rule integrating polynomials of degree `order` exactly."""
    if rule == "gauss-legendre":
        n = order // 2 + 1
        return gauss_legendre_1d(n)
    elif rule == "gauss-lobatto":
        n = max(2, int(np.ceil((order + 3) / 2.0)))  # 2n-3 >= order
        return gauss_lobatto_1d(n)
    raise ValueError(f"unknown quadrature rule: {rule}")


# --------------------------------------------------------------------------
# 1-D Lagrange basis
# --------------------------------------------------------------------------


def lagrange_eval(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Values of Lagrange basis (at `nodes`) evaluated at points `x`.

    Returns B[len(x), len(nodes)] with B[q, i] = l_i(x_q).
    """
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(nodes)
    B = np.ones((len(x), n))
    for i in range(n):
        for j in range(n):
            if i != j:
                B[:, i] *= (x - nodes[j]) / (nodes[i] - nodes[j])
    return B


def lagrange_deriv(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Derivatives of Lagrange basis at points `x`: D[q, i] = l_i'(x_q)."""
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(nodes)
    D = np.zeros((len(x), n))
    for i in range(n):
        for k in range(n):
            if k == i:
                continue
            term = np.ones(len(x)) / (nodes[i] - nodes[k])
            for j in range(n):
                if j != i and j != k:
                    term *= (x - nodes[j]) / (nodes[i] - nodes[j])
            D[:, i] += term
    return D


def _tensor_combine(factors: list[np.ndarray]) -> np.ndarray:
    """Combine per-axis basis tables B_k[nq, n] into tensor-product values.

    Returns T[nq, n^dim] where dof index i = ix + n*iy (+ n^2*iz), i.e. the
    first coordinate cycles fastest.
    """
    out = factors[0]
    for f in factors[1:]:
        nq = out.shape[0]
        # out[q, a] * f[q, b] -> [q, b, a] so that flattening C-style makes
        # the earlier (faster) axis `a` cycle fastest in the combined index.
        out = np.einsum("qa,qb->qba", out, f).reshape(nq, -1)
    return out


# --------------------------------------------------------------------------
# Tensor-product reference elements (segment / quad / hex)
# --------------------------------------------------------------------------

# Local-face topology. Vertices use the standard counter-clockwise (2D) /
# right-handed (3D) unit-square/cube numbering:
#   quad: v0=(0,0) v1=(1,0) v2=(1,1) v3=(0,1)
#   hex:  v0=(0,0,0) v1=(1,0,0) v2=(1,1,0) v3=(0,1,0)
#         v4=(0,0,1) v5=(1,0,1) v6=(1,1,1) v7=(0,1,1)

QUAD_VERTS = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
QUAD_FACES = [(0, 1), (1, 2), (2, 3), (3, 0)]  # edges

HEX_VERTS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.float64,
)
HEX_FACES = [
    (3, 2, 1, 0),  # z = 0 (bottom), outward -z
    (0, 1, 5, 4),  # y = 0, outward -y
    (1, 2, 6, 5),  # x = 1, outward +x
    (2, 3, 7, 6),  # y = 1, outward +y
    (3, 0, 4, 7),  # x = 0, outward -x
    (4, 5, 6, 7),  # z = 1 (top), outward +z
]


@dataclass(frozen=True)
class ReferenceElement:
    """Tensor-product nodal reference element of a given order."""

    geom: str  # "quad" | "hex"
    order: int
    basis: str  # "gauss-legendre" | "gauss-lobatto" node placement

    @property
    def dim(self) -> int:
        return 2 if self.geom == "quad" else 3

    @property
    def n1d(self) -> int:
        return self.order + 1

    @property
    def ndof(self) -> int:
        return self.n1d**self.dim

    @property
    def nverts(self) -> int:
        return 4 if self.geom == "quad" else 8

    @property
    def nfaces(self) -> int:
        return 4 if self.geom == "quad" else 6

    @property
    def vertices(self) -> np.ndarray:
        return QUAD_VERTS if self.geom == "quad" else HEX_VERTS

    @property
    def face_vertices(self) -> list[tuple[int, ...]]:
        return QUAD_FACES if self.geom == "quad" else HEX_FACES

    @functools.cached_property
    def nodes_1d(self) -> np.ndarray:
        if self.n1d == 1:
            return np.array([0.5])
        if self.basis == "gauss-legendre":
            x, _ = gauss_legendre_1d(self.n1d)
        elif self.basis == "gauss-lobatto":
            x, _ = gauss_lobatto_1d(self.n1d)
        else:
            raise ValueError(f"unknown basis: {self.basis}")
        return x

    @functools.cached_property
    def nodes(self) -> np.ndarray:
        """Reference coords of nodal dofs, shape [ndof, dim] (x fastest)."""
        return self._tensor_points(self.nodes_1d)

    def _tensor_points(self, pts1d: np.ndarray) -> np.ndarray:
        """Tensor grid of 1-D points, x-fastest lexicographic ordering."""
        d = self.dim
        grids = np.meshgrid(*([pts1d] * d), indexing="ij")
        # indexing='ij' gives axis0=x slowest; we want x fastest: stack then
        # transpose so the *first* coordinate cycles fastest.
        coords = np.stack([g.ravel(order="F") for g in grids], axis=-1)
        return coords

    # -- basis evaluation --------------------------------------------------

    def eval_basis(self, points: np.ndarray) -> np.ndarray:
        """B[nq, ndof]: nodal basis values at reference points [nq, dim]."""
        points = np.atleast_2d(points)
        B1 = [lagrange_eval(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        return _tensor_combine(B1)

    def eval_basis_grad(self, points: np.ndarray) -> np.ndarray:
        """G[nq, ndof, dim]: reference-space gradients at points."""
        points = np.atleast_2d(points)
        nq = points.shape[0]
        B = [lagrange_eval(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        D = [lagrange_deriv(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        G = np.zeros((nq, self.ndof, self.dim))
        for k in range(self.dim):
            factors = [D[j] if j == k else B[j] for j in range(self.dim)]
            G[:, :, k] = _tensor_combine(factors)
        return G

    # -- geometry mapping basis (bi/tri-linear from vertices) --------------

    def eval_geom_basis(self, points: np.ndarray) -> np.ndarray:
        """N[nq, nverts]: bi/tri-linear vertex shape functions at points."""
        points = np.atleast_2d(points)
        x = points[:, 0]
        y = points[:, 1]
        if self.dim == 2:
            return np.stack(
                [(1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y], axis=-1
            )
        z = points[:, 2]
        return np.stack(
            [
                (1 - x) * (1 - y) * (1 - z),
                x * (1 - y) * (1 - z),
                x * y * (1 - z),
                (1 - x) * y * (1 - z),
                (1 - x) * (1 - y) * z,
                x * (1 - y) * z,
                x * y * z,
                (1 - x) * y * z,
            ],
            axis=-1,
        )

    def eval_geom_basis_grad(self, points: np.ndarray) -> np.ndarray:
        """dN[nq, nverts, dim]: gradients of geometry shape functions."""
        points = np.atleast_2d(points)
        x = points[:, 0]
        y = points[:, 1]
        nq = points.shape[0]
        if self.dim == 2:
            dN = np.zeros((nq, 4, 2))
            dN[:, :, 0] = np.stack([-(1 - y), (1 - y), y, -y], axis=-1)
            dN[:, :, 1] = np.stack([-(1 - x), -x, x, (1 - x)], axis=-1)
            return dN
        z = points[:, 2]
        dN = np.zeros((nq, 8, 3))
        dN[:, :, 0] = np.stack(
            [-(1 - y) * (1 - z), (1 - y) * (1 - z), y * (1 - z), -y * (1 - z),
             -(1 - y) * z, (1 - y) * z, y * z, -y * z], axis=-1)
        dN[:, :, 1] = np.stack(
            [-(1 - x) * (1 - z), -x * (1 - z), x * (1 - z), (1 - x) * (1 - z),
             -(1 - x) * z, -x * z, x * z, (1 - x) * z], axis=-1)
        dN[:, :, 2] = np.stack(
            [-(1 - x) * (1 - y), -x * (1 - y), -x * y, -(1 - x) * y,
             (1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y], axis=-1)
        return dN

    # -- faces --------------------------------------------------------------

    def face_ref_coords(self, lf: int, tpoints: np.ndarray) -> np.ndarray:
        """Map face-local parameters t in [0,1]^(dim-1) to element ref coords.

        2D: t is [nq,1]; 3D: t is [nq,2].  The parametrization traverses the
        face's vertex loop bilinearly (t=(0,0) at the first face vertex).
        """
        tpoints = np.atleast_2d(tpoints)
        fv = self.face_vertices[lf]
        verts = self.vertices[list(fv)]
        if self.dim == 2:
            t = tpoints[:, 0]
            return (1 - t)[:, None] * verts[0] + t[:, None] * verts[1]
        u = tpoints[:, 0]
        v = tpoints[:, 1]
        N = np.stack([(1 - u) * (1 - v), u * (1 - v), u * v, (1 - u) * v], axis=-1)
        return N @ verts

    def face_ref_tangents(self, lf: int, tpoints: np.ndarray) -> np.ndarray:
        """d(ref coords)/dt for the face parametrization: [nq, dim, dim-1]."""
        tpoints = np.atleast_2d(tpoints)
        fv = self.face_vertices[lf]
        verts = self.vertices[list(fv)]
        nq = tpoints.shape[0]
        if self.dim == 2:
            tang = (verts[1] - verts[0])[None, :, None]
            return np.broadcast_to(tang, (nq, 2, 1)).copy()
        u = tpoints[:, 0]
        v = tpoints[:, 1]
        dNdu = np.stack([-(1 - v), (1 - v), v, -v], axis=-1)
        dNdv = np.stack([-(1 - u), -u, u, (1 - u)], axis=-1)
        du = dNdu @ verts  # [nq, 3]
        dv = dNdv @ verts
        return np.stack([du, dv], axis=-1)
