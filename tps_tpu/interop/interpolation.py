"""Cross-mesh field interpolation (the gslib FindPointsGSLIB analog).

The reference interpolates conductivity/Joule-heating between the flow and
EM meshes with gslib point location (reference:
src/cycle_avg_joule_coupling.cpp:143-375).  Here the meshes are static, so
point location + reference-coordinate inversion run once in numpy at setup,
producing a static (point -> element, basis-weights) table; runtime
interpolation is a single gather + small matmul under jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mesh.mesh import Mesh
from ..mesh.reference_element import ReferenceElement


def _invert_map(ref: ReferenceElement, verts: np.ndarray, x: np.ndarray,
                tol=1e-12, maxit=30):
    """Newton inversion of the bi/tri-linear element map for one point."""
    xi = np.full(ref.dim, 0.5)
    for _ in range(maxit):
        N = ref.eval_geom_basis(xi[None, :])[0]
        dN = ref.eval_geom_basis_grad(xi[None, :])[0]
        r = N @ verts - x
        if np.abs(r).max() < tol:
            break
        J = verts.T @ dN
        xi = xi - np.linalg.solve(J, r)
    return xi, np.abs(r).max()


@dataclass(eq=False)
class FieldInterpolator:
    """Interpolate nodal/dof fields from a source mesh onto target points."""

    elem_ids: np.ndarray  # [np] containing element (source mesh)
    weights: np.ndarray  # [np, ndof_el] basis values at the point
    found: np.ndarray  # [np] bool

    @classmethod
    def build(cls, src_mesh: Mesh, src_order: int, src_basis: str,
              points: np.ndarray, tol=1e-8):
        ref = ReferenceElement(geom=src_mesh.geom, order=src_order,
                               basis=src_basis)
        pts = np.atleast_2d(points)
        npt = pts.shape[0]
        dim = src_mesh.dim
        ev = src_mesh.vertices[src_mesh.elements]  # [ne, nverts, dim]

        from .. import native as _native

        nat = _native.locate_points(ev, pts, tol=tol)
        if nat is not None:
            elem_ids, ref_coords, found = nat
            weights = np.zeros((npt, ref.ndof))
            if found.any():
                weights[found] = ref.eval_basis(ref_coords[found])
            return cls(elem_ids=elem_ids.astype(np.int32), weights=weights,
                       found=found)

        lo = ev.min(axis=1) - tol
        hi = ev.max(axis=1) + tol

        elem_ids = np.zeros(npt, dtype=np.int32)
        weights = np.zeros((npt, ref.ndof))
        found = np.zeros(npt, dtype=bool)
        for p in range(npt):
            x = pts[p]
            cand = np.where(((lo <= x) & (x <= hi)).all(axis=1))[0]
            for e in cand:
                xi, res = _invert_map(ref, ev[e], x)
                if res < tol and (xi > -1e-9).all() and (xi < 1 + 1e-9).all():
                    elem_ids[p] = e
                    weights[p] = ref.eval_basis(np.clip(xi, 0, 1)[None, :])[0]
                    found[p] = True
                    break
        return cls(elem_ids=elem_ids, weights=weights, found=found)

    # -- runtime -----------------------------------------------------------
    # the apply cores are jitted ONCE per interpolator: the eager chains
    # re-uploaded the weight tables and dispatched 3-4 relay ops per call
    # (measured 35-55 ms per interpolation on the hosted TPU in the
    # coupled-torch EM boundary, round 5)
    def _jit_core(self):
        import jax
        import jax.numpy as jnp

        if getattr(self, "_core", None) is None:
            eid = jnp.asarray(self.elem_ids)
            wts = jnp.asarray(self.weights)
            fnd = jnp.asarray(self.found)

            def core(vals):  # [ne_or_np rows already selected]
                out = jnp.einsum("pd,pd...->p...", wts, vals)
                return out * fnd[(...,) + (None,) * (out.ndim - 1)]

            self._core = jax.jit(lambda src: core(src[eid]))
            self._core_h1 = jax.jit(lambda ed, u: core(u[ed][eid]))
        return self._core, self._core_h1

    def from_dg(self, U_el):
        """Source field in DG layout [ne, ndof_el(, k)] -> values at points."""
        core, _ = self._jit_core()
        return core(U_el)

    def from_h1(self, tab, u):
        """Source field in H1 global layout [ndofs(, k)] -> values at points."""
        _, core_h1 = self._jit_core()
        return core_h1(tab.elem_dofs, u)
