"""Running statistics engine (mean / RMS / Reynolds stresses).

Mirrors the reference Averaging behavior (reference: src/averaging.cpp
addSampleInternal: device-kernel running update of mean fields and the
velocity second-moment (Reynolds-stress) entries; options [averaging]
src/averaging.hpp:54-65).  Means are over samples taken every
`sample_interval` steps after `start_iter`; all updates are jitted.
"""

from __future__ import annotations

import numpy as np


class Averaging:
    def __init__(self, start_iter=0, sample_interval=1, enabled=True):
        self.start_iter = start_iter
        self.sample_interval = max(1, sample_interval)
        self.enabled = enabled
        self.n_samples = 0
        self.mean_up = None  # [..., neq] mean primitives
        self.vel_m2 = None  # [..., 6] second moments of velocity
        self._update = None

    def _init_buffers(self, Up, nvel):
        import jax
        import jax.numpy as jnp

        self.mean_up = jnp.zeros_like(Up)
        ncov = nvel * (nvel + 1) // 2
        self.vel_m2 = jnp.zeros(Up.shape[:-1] + (ncov,))
        pairs = [(i, j) for i in range(nvel) for j in range(i, nvel)]

        @jax.jit
        def update(mean_up, vel_m2, Up_in, n):
            w = 1.0 / (n + 1.0)
            mean_new = mean_up + (Up_in - mean_up) * w
            vel = Up_in[..., 1 : 1 + nvel]
            prods = jnp.stack([vel[..., i] * vel[..., j] for i, j in pairs], -1)
            m2_new = vel_m2 + (prods - vel_m2) * w
            return mean_new, m2_new

        self._update = update
        self._pairs = pairs

    def add_sample(self, solver_iter, Up, nvel):
        if not self.enabled or solver_iter < self.start_iter:
            return
        if (solver_iter - self.start_iter) % self.sample_interval:
            return
        if self.mean_up is None:
            self._init_buffers(Up, nvel)
        self.mean_up, self.vel_m2 = self._update(
            self.mean_up, self.vel_m2, Up, float(self.n_samples)
        )
        self.n_samples += 1

    def mean(self):
        return self.mean_up

    def reynolds_stresses(self, nvel):
        """<u_i' u_j'> = <u_i u_j> - <u_i><u_j> in packed upper-tri order."""
        import jax.numpy as jnp

        if self.mean_up is None:
            return None
        vel = self.mean_up[..., 1 : 1 + nvel]
        prods = jnp.stack(
            [vel[..., i] * vel[..., j] for i, j in self._pairs], -1
        )
        return self.vel_m2 - prods

    # -- restartability (reference: mean/RMS are restart fields) -----------
    def state_dict(self):
        if self.mean_up is None:
            return {"n_samples": 0}
        return {
            "n_samples": self.n_samples,
            "mean_up": np.asarray(self.mean_up),
            "vel_m2": np.asarray(self.vel_m2),
        }

    def load_state_dict(self, d, nvel):
        import jax.numpy as jnp

        self.n_samples = int(d["n_samples"])
        if self.n_samples and "mean_up" in d:
            self._init_buffers(jnp.asarray(d["mean_up"]), nvel)
            self.mean_up = jnp.asarray(d["mean_up"])
            self.vel_m2 = jnp.asarray(d["vel_m2"])


class HistoryFile:
    """history.hist CSV: mean time derivatives of the conserved variables
    (reference: src/M2ulPhyS.cpp:799-812, computeMeanTimeDerivatives
    src/rhs_operator.cpp:463)."""

    def __init__(self, path):
        self.path = path
        self._file = None

    def write(self, it, t, dUdt_means):
        if self._file is None:
            self._file = open(self.path, "a")
            if self._file.tell() == 0:
                cols = ",".join(f"dU{k}/dt" for k in range(len(dUdt_means)))
                self._file.write(f"iter,time,{cols}\n")
        vals = ",".join(f"{v:.8e}" for v in dUdt_means)
        self._file.write(f"{it},{t:.8e},{vals}\n")
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
