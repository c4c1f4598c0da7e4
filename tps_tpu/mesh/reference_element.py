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
    """1-D rule for the requested polynomial degree with MFEM-compatible
    point counts (mirrors IntegrationRules::Get for SEGMENT with the
    Quadrature1D::GaussLegendre / GaussLobatto families, which the
    reference selects via flow/integrationRule, src/M2ulPhyS.cpp:557-561):
    GL uses order//2+1 points (exact to 2n-1 >= order), GLL uses
    order//2+2 points (exact to 2n-3 >= order)."""
    if rule == "gauss-legendre":
        n = order // 2 + 1
        return gauss_legendre_1d(n)
    elif rule == "gauss-lobatto":
        n = max(2, order // 2 + 2)  # 2n-3 >= order, MFEM point count
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

    geom: str  # "quad" | "hex" | "tri" | "tet"
    order: int
    basis: str  # node placement (tensor elements); simplices: equispaced

    @property
    def is_simplex(self) -> bool:
        return self.geom in ("tri", "tet")

    @property
    def dim(self) -> int:
        return 2 if self.geom in ("quad", "tri") else 3

    @property
    def n1d(self) -> int:
        return self.order + 1

    @property
    def ndof(self) -> int:
        if self.geom == "tri":
            return (self.order + 1) * (self.order + 2) // 2
        if self.geom == "tet":
            return (self.order + 1) * (self.order + 2) * (self.order + 3) // 6
        return self.n1d**self.dim

    @property
    def nverts(self) -> int:
        return {"quad": 4, "hex": 8, "tri": 3, "tet": 4}[self.geom]

    @property
    def nfaces(self) -> int:
        return {"quad": 4, "hex": 6, "tri": 3, "tet": 4}[self.geom]

    @property
    def vertices(self) -> np.ndarray:
        return {"quad": QUAD_VERTS, "hex": HEX_VERTS,
                "tri": TRI_VERTS, "tet": TET_VERTS}[self.geom]

    @property
    def face_vertices(self) -> list[tuple[int, ...]]:
        return {"quad": QUAD_FACES, "hex": HEX_FACES,
                "tri": TRI_FACES, "tet": TET_FACES}[self.geom]

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
        if self.is_simplex:
            return simplex_nodes(self.order, self.dim)
        return self._tensor_points(self.nodes_1d)

    @functools.cached_property
    def _vinv(self) -> np.ndarray:
        """Inverse generalized Vandermonde (simplex nodal basis)."""
        V, _ = simplex_basis(self.nodes, self.order, self.dim)
        return np.linalg.inv(V)

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
        if self.is_simplex:
            V, _ = simplex_basis(points, self.order, self.dim)
            return V @ self._vinv
        B1 = [lagrange_eval(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        return _tensor_combine(B1)

    def eval_basis_grad(self, points: np.ndarray) -> np.ndarray:
        """G[nq, ndof, dim]: reference-space gradients at points."""
        points = np.atleast_2d(points)
        nq = points.shape[0]
        if self.is_simplex:
            _, dV = simplex_basis(points, self.order, self.dim)
            return np.einsum("qmk,mn->qnk", dV, self._vinv)
        B = [lagrange_eval(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        D = [lagrange_deriv(self.nodes_1d, points[:, k]) for k in range(self.dim)]
        G = np.zeros((nq, self.ndof, self.dim))
        for k in range(self.dim):
            factors = [D[j] if j == k else B[j] for j in range(self.dim)]
            G[:, :, k] = _tensor_combine(factors)
        return G

    # -- quadrature ----------------------------------------------------------

    def volume_quadrature(self, quad_order: int, rule: str = "gauss-legendre"):
        """(pts [nq, dim], wts [nq]) exact to the given polynomial degree.

        `rule` selects the tensor-product 1-D family (the reference's
        flow/integrationRule); simplex volume rules are family-independent
        (as in MFEM, where only SEGMENT/tensor geometries honor the
        Quadrature1D type)."""
        if self.is_simplex:
            n1d = quad_order // 2 + 1
            return duffy_quadrature(n1d, self.dim)
        x, w = quadrature_1d(quad_order, rule)
        grids = np.meshgrid(*([x] * self.dim), indexing="ij")
        pts = np.stack([g.ravel(order="F") for g in grids], axis=-1)
        wts = np.ones(pts.shape[0])
        for g in np.meshgrid(*([w] * self.dim), indexing="ij"):
            wts = wts * g.ravel(order="F")
        return pts, wts

    def face_quadrature(self, quad_order: int, rule: str = "gauss-legendre"):
        """(tpoints [nqf, dim-1], wts [nqf]) on the face parameter domain."""
        if self.geom == "tet":
            # symmetric rule: both sides of a shared triangular face must
            # produce the same physical point set for qperm matching
            return symmetric_tri_quadrature(quad_order)
        x, w = quadrature_1d(quad_order, rule)
        if self.dim == 2:
            return x[:, None], w
        X, Y = np.meshgrid(x, x, indexing="ij")
        W = np.outer(w, w)
        pts = np.stack([X.ravel(order="F"), Y.ravel(order="F")], axis=-1)
        return pts, W.ravel(order="F")

    # -- geometry mapping basis (bi/tri-linear from vertices) --------------

    def eval_geom_basis(self, points: np.ndarray) -> np.ndarray:
        """N[nq, nverts]: vertex shape functions at points (bi/tri-linear
        for tensor elements, barycentric for simplices)."""
        points = np.atleast_2d(points)
        x = points[:, 0]
        y = points[:, 1]
        if self.geom == "tri":
            return np.stack([1 - x - y, x, y], axis=-1)
        if self.geom == "tet":
            z = points[:, 2]
            return np.stack([1 - x - y - z, x, y, z], axis=-1)
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
        if self.geom == "tri":
            dN = np.broadcast_to(
                np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]),
                (nq, 3, 2),
            ).copy()
            return dN
        if self.geom == "tet":
            dN = np.broadcast_to(
                np.array([[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0],
                          [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
                (nq, 4, 3),
            ).copy()
            return dN
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
        if self.geom == "tet":  # triangular face, barycentric parameters
            return ((1 - u - v)[:, None] * verts[0]
                    + u[:, None] * verts[1] + v[:, None] * verts[2])
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
        if self.geom == "tet":
            nq2 = tpoints.shape[0]
            du = np.broadcast_to(verts[1] - verts[0], (nq2, 3)).copy()
            dv = np.broadcast_to(verts[2] - verts[0], (nq2, 3)).copy()
            return np.stack([du, dv], axis=-1)
        dNdu = np.stack([-(1 - v), (1 - v), v, -v], axis=-1)
        dNdv = np.stack([-(1 - u), -u, u, (1 - u)], axis=-1)
        du = dNdu @ verts  # [nq, 3]
        dv = dNdv @ verts
        return np.stack([du, dv], axis=-1)


# --------------------------------------------------------------------------
# Simplex reference elements (triangle / tetrahedron)
#
# Nodal basis built from the Koornwinder-Dubiner orthogonal basis through a
# generalized Vandermonde matrix (Hesthaven & Warburton, "Nodal DG Methods",
# ch. 3/6 formulas); quadrature from Duffy-collapsed Gauss-Legendre tensor
# rules.  Unit simplex convention: tri (0,0)-(1,0)-(0,1);
# tet (0,0,0)-(1,0,0)-(0,1,0)-(0,0,1).
# --------------------------------------------------------------------------

TRI_VERTS = np.array([[0, 0], [1, 0], [0, 1]], dtype=np.float64)
TRI_FACES = [(0, 1), (1, 2), (2, 0)]
TET_VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64
)
TET_FACES = [(0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2)]


def jacobi_p(x, alpha, beta, n):
    """Orthonormal Jacobi polynomial P_n^{a,b} on [-1,1] (H&W JacobiP)."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        x = x.astype(np.float64)
    PL = np.zeros((n + 1,) + x.shape, dtype=x.dtype)
    gamma0 = (2.0 ** (alpha + beta + 1) / (alpha + beta + 1.0)
              * _gamma(alpha + 1) * _gamma(beta + 1) / _gamma(alpha + beta + 1))
    PL[0] = 1.0 / np.sqrt(gamma0)
    if n == 0:
        return PL[0]
    gamma1 = (alpha + 1.0) * (beta + 1.0) / (alpha + beta + 3.0) * gamma0
    PL[1] = ((alpha + beta + 2.0) * x / 2.0 + (alpha - beta) / 2.0) / np.sqrt(gamma1)
    if n == 1:
        return PL[1]
    aold = (2.0 / (2.0 + alpha + beta)
            * np.sqrt((alpha + 1.0) * (beta + 1.0) / (alpha + beta + 3.0)))
    for i in range(1, n):
        h1v = 2.0 * i + alpha + beta
        anew = (2.0 / (h1v + 2.0)
                * np.sqrt((i + 1.0) * (i + 1.0 + alpha + beta)
                          * (i + 1.0 + alpha) * (i + 1.0 + beta)
                          / (h1v + 1.0) / (h1v + 3.0)))
        bnew = -(alpha**2 - beta**2) / h1v / (h1v + 2.0)
        PL[i + 1] = ((-aold * PL[i - 1] + (x - bnew) * PL[i]) / anew)
        aold = anew
    return PL[n]


def _gamma(z):
    from math import gamma

    return gamma(z)


def grad_jacobi_p(x, alpha, beta, n):
    """d/dx of the orthonormal Jacobi polynomial."""
    if n == 0:
        return np.zeros_like(np.asarray(x, dtype=np.float64))
    return np.sqrt(n * (n + alpha + beta + 1.0)) * jacobi_p(
        x, alpha + 1.0, beta + 1.0, n - 1
    )


def _tri_ab(r, s):
    """Collapsed coordinates on the (-1,1) triangle (H&W rstoab)."""
    denom = 1.0 - s
    safe = np.abs(denom) > 1e-12
    a = np.where(safe, 2.0 * (1.0 + r) / np.where(safe, denom, 1.0) - 1.0, -1.0)
    return a, s


def tri_basis_values(points, p):
    """KD orthonormal basis values on the UNIT triangle [nq, ndof]."""
    pts = np.atleast_2d(points)
    r = 2.0 * pts[:, 0] - 1.0
    s = 2.0 * pts[:, 1] - 1.0
    a, b = _tri_ab(r, s)
    nd = (p + 1) * (p + 2) // 2
    V = np.zeros((pts.shape[0], nd), dtype=pts.dtype)
    k = 0
    for i in range(p + 1):
        for j in range(p + 1 - i):
            fa = jacobi_p(a, 0.0, 0.0, i)
            gb = jacobi_p(b, 2.0 * i + 1.0, 0.0, j)
            V[:, k] = np.sqrt(2.0) * fa * gb * (0.5 * (1.0 - b)) ** i
            k += 1
    return V


def tet_basis_values(points, p):
    """KD orthonormal basis values on the UNIT tetrahedron [nq, ndof]."""
    pts = np.atleast_2d(points)
    r = 2.0 * pts[:, 0] - 1.0
    s = 2.0 * pts[:, 1] - 1.0
    t = 2.0 * pts[:, 2] - 1.0
    denom1 = -(s + t)
    safe1 = np.abs(denom1) > 1e-12
    a = np.where(safe1, 2.0 * (1.0 + r) / np.where(safe1, denom1, 1.0) - 1.0,
                 -1.0)
    denom2 = 1.0 - t
    safe2 = np.abs(denom2) > 1e-12
    b = np.where(safe2, 2.0 * (1.0 + s) / np.where(safe2, denom2, 1.0) - 1.0,
                 -1.0)
    c = t
    nd = (p + 1) * (p + 2) * (p + 3) // 6
    V = np.zeros((pts.shape[0], nd), dtype=pts.dtype)
    k = 0
    for i in range(p + 1):
        for j in range(p + 1 - i):
            for m in range(p + 1 - i - j):
                fa = jacobi_p(a, 0.0, 0.0, i)
                gb = jacobi_p(b, 2.0 * i + 1.0, 0.0, j)
                hc = jacobi_p(c, 2.0 * (i + j) + 2.0, 0.0, m)
                V[:, k] = (2.0 * np.sqrt(2.0) * fa * gb * hc
                           * (0.5 * (1.0 - b)) ** i
                           * (0.5 * (1.0 - c)) ** (i + j))
                k += 1
    return V


def simplex_basis(points, p, dim):
    """(V, dV) of the KD basis at interior points; exact gradients by
    complex-step differentiation (the basis is polynomial; evaluation
    points — quadrature nodes — never hit the collapsed-edge guards)."""
    fn = tri_basis_values if dim == 2 else tet_basis_values
    pts = np.atleast_2d(points).astype(np.complex128)
    V = np.real(fn(pts, p))
    h = 1e-30
    dV = []
    for d in range(dim):
        pc = pts.copy()
        pc[:, d] = pc[:, d] + 1j * h
        dV.append(np.imag(fn(pc, p)) / h)
    return V, np.stack(dV, axis=-1)


def simplex_nodes(p, dim):
    """Equispaced barycentric nodes on the unit simplex (vertex-inclusive)."""
    out = []
    if dim == 2:
        for j in range(p + 1):
            for i in range(p + 1 - j):
                out.append((i / max(p, 1), j / max(p, 1)))
    else:
        for k in range(p + 1):
            for j in range(p + 1 - k):
                for i in range(p + 1 - j - k):
                    out.append((i / max(p, 1), j / max(p, 1), k / max(p, 1)))
    return np.asarray(out, dtype=np.float64)


def duffy_quadrature(n1d, dim):
    """Collapsed Gauss-Legendre quadrature on the unit simplex."""
    x, w = gauss_legendre_1d(n1d)
    if dim == 1:
        return x[:, None], w
    if dim == 2:
        XI, ETA = np.meshgrid(x, x, indexing="ij")
        WI, WE = np.meshgrid(w, w, indexing="ij")
        pts = np.stack([(XI * (1 - ETA)).ravel(), ETA.ravel()], axis=-1)
        wts = (WI * WE * (1 - ETA)).ravel()
        return pts, wts
    XI, ETA, ZE = np.meshgrid(x, x, x, indexing="ij")
    WI, WE, WZ = np.meshgrid(w, w, w, indexing="ij")
    xx = XI * (1 - ETA) * (1 - ZE)
    yy = ETA * (1 - ZE)
    pts = np.stack([xx.ravel(), yy.ravel(), ZE.ravel()], axis=-1)
    wts = (WI * WE * WZ * (1 - ETA) * (1 - ZE) ** 2).ravel()
    return pts, wts


def symmetric_tri_quadrature(degree):
    """Symmetric (Dunavant) quadrature on the UNIT triangle, invariant under
    all vertex permutations — required for face-point matching between the
    two sides of a shared triangular face.  Weights sum to the area 1/2."""
    orbits = {
        1: [((1 / 3, 1 / 3, 1 / 3), 1.0)],
        2: [((2 / 3, 1 / 6, 1 / 6), 1 / 3)],
        4: [((0.108103018168070, 0.445948490915965, 0.445948490915965),
             0.223381589678011),
            ((0.816847572980459, 0.091576213509771, 0.091576213509771),
             0.109951743655322)],
        5: [((1 / 3, 1 / 3, 1 / 3), 0.225),
            ((0.059715871789770, 0.470142064105115, 0.470142064105115),
             0.132394152788506),
            ((0.797426985353087, 0.101286507323456, 0.101286507323456),
             0.125939180544827)],
        7: [((1 / 3, 1 / 3, 1 / 3), -0.149570044467670),
            ((0.479308067841923, 0.260345966079038, 0.260345966079038),
             0.175615257433204),
            ((0.869739794195568, 0.065130102902216, 0.065130102902216),
             0.053347235608839),
            ((0.638444188569809, 0.312865496004875, 0.048690315425316),
             0.077113760890257)],
    }
    for d in sorted(orbits):
        if d >= degree:
            rule = orbits[d]
            break
    else:
        raise NotImplementedError(f"triangle quadrature degree {degree}")
    pts, wts = [], []
    seen = set()
    for (bary, w) in rule:
        import itertools

        for perm in set(itertools.permutations(bary)):
            key = tuple(np.round(perm, 14))
            if key in seen:
                continue
            seen.add(key)
            pts.append((perm[1], perm[2]))  # barycentric -> (x, y)
            wts.append(w)
    pts = np.asarray(pts, dtype=np.float64)
    wts = np.asarray(wts, dtype=np.float64)
    return pts, wts * (0.5 / wts.sum())
