"""Wall-distance field computation.

The role of the reference's serial distance function
(reference: src/utils.hpp:152 evaluateDistanceSerial, used by
mixing-length transport and sheath BCs): distance from every solution node
to the nearest wall-boundary quadrature point.  Exact distance to sampled
wall points (refined by the wall-face quadrature density); vectorized
numpy with chunking at setup time.
"""

from __future__ import annotations

import numpy as np


def wall_distance(tab_np, wall_attrs, chunk=4096) -> np.ndarray:
    """distance[ne, ndof] to the nearest wall-face quadrature point.

    tab_np: numpy DGTables; wall_attrs: iterable of boundary attributes
    that are walls."""
    attrs = np.asarray(tab_np.f_bdr_attr)
    sel = np.isin(attrs, list(wall_attrs))
    if not sel.any():
        return np.full(tab_np.xyz_dof.shape[:2], np.inf)
    wall_pts = np.asarray(tab_np.f_xyz)[tab_np.nfi :][sel].reshape(-1, tab_np.dim)

    dofs = np.asarray(tab_np.xyz_dof).reshape(-1, tab_np.dim)
    out = np.empty(len(dofs))
    for s in range(0, len(dofs), chunk):
        d2 = np.sum(
            (dofs[s : s + chunk, None, :] - wall_pts[None, :, :]) ** 2, axis=-1
        )
        out[s : s + chunk] = np.sqrt(d2.min(axis=1))
    return out.reshape(tab_np.xyz_dof.shape[:2])
