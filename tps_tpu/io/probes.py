"""Plane-dump probes: interpolate fields onto a sampling plane and write CSV.

Mirrors the reference's gslib plane interpolation of instantaneous /
mean / RMS fields to ASCII (reference: src/M2ulPhyS.cpp:2052-2096,
src/gslib_interpolator.hpp:91-112), configured by the [planeDump] section
(norm / point / samples / conserved).
"""

from __future__ import annotations

import os

import numpy as np

from ..interop.interpolation import FieldInterpolator


class PlaneDump:
    def __init__(self, mesh, order, basis, normal, point, samples,
                 extent=1.0):
        """Sampling grid on the plane through `point` with normal `normal`."""
        normal = np.asarray(normal[: mesh.dim], dtype=float)
        normal /= np.linalg.norm(normal)
        point = np.asarray(point[: mesh.dim], dtype=float)
        # build two in-plane tangents
        dim = mesh.dim
        if dim == 2:
            t1 = np.array([-normal[1], normal[0]])
            s = np.linspace(-extent / 2, extent / 2, samples)
            pts = point[None, :] + s[:, None] * t1[None, :]
        else:
            a = np.array([1.0, 0.0, 0.0])
            if abs(normal @ a) > 0.9:
                a = np.array([0.0, 1.0, 0.0])
            t1 = np.cross(normal, a)
            t1 /= np.linalg.norm(t1)
            t2 = np.cross(normal, t1)
            s = np.linspace(-extent / 2, extent / 2, samples)
            S1, S2 = np.meshgrid(s, s, indexing="ij")
            pts = (point[None, :] + S1.reshape(-1, 1) * t1[None, :]
                   + S2.reshape(-1, 1) * t2[None, :])
        self.points = pts
        self.interp = FieldInterpolator.build(mesh, order, basis, pts)

    def sample(self, fields: dict) -> dict:
        """fields: name -> DG dof array [ne, ndof(, k)] -> sampled values."""
        out = {"x": self.points[:, 0], "y": self.points[:, 1]}
        if self.points.shape[1] > 2:
            out["z"] = self.points[:, 2]
        for name, arr in fields.items():
            v = np.asarray(self.interp.from_dg(arr))
            if v.ndim == 1:
                out[name] = v
            else:
                for k in range(v.shape[1]):
                    out[f"{name}_{k}"] = v[:, k]
        return out

    def write(self, path, fields: dict, header_extra=""):
        data = self.sample(fields)
        names = list(data)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            if header_extra:
                f.write(f"# {header_extra}\n")
            f.write(",".join(names) + "\n")
            cols = np.column_stack([data[n] for n in names])
            np.savetxt(f, cols, delimiter=",", fmt="%.10e")
        return path
