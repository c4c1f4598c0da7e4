"""Named analytic flow cases for tests, ICs, and benchmarks.

The analog of the reference's named IC functions (reference: src/cases.cpp,
and the Euler-vortex IC at src/M2ulPhyS.cpp:2187).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def isentropic_vortex(xy, t, mixture, beta=5.0, center=(5.0, 5.0), u_inf=(1.0, 1.0),
                      rho_inf=1.0, T_inf=1.0, domain=(10.0, 10.0)):
    """2-D isentropic Euler vortex primitive state [.., 4] at time t.

    Nondimensional: intended for use with gas_constant=1.  The vortex center
    advects with u_inf; coordinates wrap periodically over `domain`.
    """
    gamma = mixture.specific_heat_ratio
    R = mixture.gas_constant
    Lx, Ly = domain
    x = xy[..., 0] - center[0] - u_inf[0] * t
    y = xy[..., 1] - center[1] - u_inf[1] * t
    # wrap into [-L/2, L/2)
    x = (x + Lx / 2.0) % Lx - Lx / 2.0
    y = (y + Ly / 2.0) % Ly - Ly / 2.0
    r2 = x * x + y * y
    ex = jnp.exp(0.5 * (1.0 - r2))
    du = beta / (2 * np.pi) * ex * (-y)
    dv = beta / (2 * np.pi) * ex * (x)
    dT = -(gamma - 1.0) * beta**2 / (8.0 * gamma * np.pi**2) * jnp.exp(1.0 - r2)
    T = T_inf + dT
    rho = rho_inf * (T / T_inf) ** (1.0 / (gamma - 1.0))
    u = u_inf[0] + du
    v = u_inf[1] + dv
    del R
    return jnp.stack([rho, u, v, T], axis=-1)


def uniform_state(xy, mixture, rho, vel, T):
    """Uniform primitive state matching mixture layout."""
    shape = xy.shape[:-1]
    comps = [jnp.full(shape, rho)]
    for d in range(mixture.nvel):
        comps.append(jnp.full(shape, vel[d] if d < len(vel) else 0.0))
    comps.append(jnp.full(shape, T))
    for _ in range(mixture.num_equations - mixture.nvel - 2):
        comps.append(jnp.zeros(shape))
    return jnp.stack(comps, axis=-1)


def taylor_green_2d(xy, mixture, rho0=1.0, V0=1.0, T0=300.0, L=1.0):
    """2-D Taylor-Green vortex primitives (reference: src/cases.cpp TGV2D)."""
    x, y = xy[..., 0], xy[..., 1]
    k = 2 * np.pi / L
    u = V0 * jnp.sin(k * x) * jnp.cos(k * y)
    v = -V0 * jnp.cos(k * x) * jnp.sin(k * y)
    rho = jnp.full_like(u, rho0)
    T = jnp.full_like(u, T0)
    return jnp.stack([rho, u, v, T], axis=-1)
