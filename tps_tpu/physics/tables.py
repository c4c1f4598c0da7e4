"""Table interpolators (1-D linear with log-scale options, 2-D bilinear).

Mirrors the reference table behavior (reference: src/table.cpp:79-109
LinearTable with x/f log scaling and clamped end-interval extrapolation;
TableInterpolator2D for LTE property tables) as vectorized jnp evaluations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True, eq=False)
class LinearTable:
    """Piecewise-linear 1-D table; optional log scaling of either axis.

    Evaluation outside the range uses the end intervals (linear
    extrapolation), matching the reference findInterval clamping.
    """

    x: np.ndarray
    f: np.ndarray
    x_log: bool = False
    f_log: bool = False

    def __post_init__(self):
        object.__setattr__(self, "x", np.asarray(self.x, dtype=np.float64))
        object.__setattr__(self, "f", np.asarray(self.f, dtype=np.float64))
        assert self.x.ndim == 1 and self.x.shape == self.f.shape
        assert (np.diff(self.x) > 0).all(), "table abscissae must increase"

    def _coeffs(self):
        xs = np.log(self.x) if self.x_log else self.x
        fs = np.log(self.f) if self.f_log else self.f
        b = np.diff(fs) / np.diff(xs)
        a = fs[:-1] - b * xs[:-1]
        return xs, a, b

    def __call__(self, xq):
        xs, a, b = self._coeffs()
        xq = jnp.asarray(xq)
        xt = jnp.log(xq) if self.x_log else xq
        idx = jnp.clip(jnp.searchsorted(jnp.asarray(xs), xt) - 1, 0, len(a) - 1)
        ft = jnp.asarray(a)[idx] + jnp.asarray(b)[idx] * xt
        return jnp.exp(ft) if self.f_log else ft

    def deriv(self, xq):
        """df/dx (reference eval_x)."""
        xs, a, b = self._coeffs()
        xq = jnp.asarray(xq)
        xt = jnp.log(xq) if self.x_log else xq
        idx = jnp.clip(jnp.searchsorted(jnp.asarray(xs), xt) - 1, 0, len(a) - 1)
        slope = jnp.asarray(b)[idx]
        out = slope * (1.0 / xq if self.x_log else 1.0)
        if self.f_log:
            out = out * jnp.exp(jnp.asarray(a)[idx] + slope * xt)
        return out


@dataclass(frozen=True, eq=False)
class Table2D:
    """Bilinear 2-D table f(x, y) with clamped evaluation (the role of the
    reference's GslTableInterpolator2D for LTE mixtures/transport)."""

    x: np.ndarray
    y: np.ndarray
    f: np.ndarray  # [nx, ny]

    def __post_init__(self):
        object.__setattr__(self, "x", np.asarray(self.x, dtype=np.float64))
        object.__setattr__(self, "y", np.asarray(self.y, dtype=np.float64))
        object.__setattr__(self, "f", np.asarray(self.f, dtype=np.float64))
        assert self.f.shape == (len(self.x), len(self.y))

    def __call__(self, xq, yq):
        x, y, f = jnp.asarray(self.x), jnp.asarray(self.y), jnp.asarray(self.f)
        xq = jnp.clip(jnp.asarray(xq), self.x[0], self.x[-1])
        yq = jnp.clip(jnp.asarray(yq), self.y[0], self.y[-1])
        i = jnp.clip(jnp.searchsorted(x, xq) - 1, 0, len(self.x) - 2)
        j = jnp.clip(jnp.searchsorted(y, yq) - 1, 0, len(self.y) - 2)
        tx = (xq - x[i]) / (x[i + 1] - x[i])
        ty = (yq - y[j]) / (y[j + 1] - y[j])
        return (
            f[i, j] * (1 - tx) * (1 - ty)
            + f[i + 1, j] * tx * (1 - ty)
            + f[i, j + 1] * (1 - tx) * ty
            + f[i + 1, j + 1] * tx * ty
        )
