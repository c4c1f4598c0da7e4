"""Order-of-accuracy verification (the reference's MMS convergence sweeps,
src/test-mms/runP*.sh: p1-p3 orders x mesh refinements; here measured on
the isentropic Euler vortex, which has an exact solution)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tps_tpu.dg.discretization import build_tables
from tps_tpu.dg.fluxes import Fluxes
from tps_tpu.dg.rhs import RHSContext, compute_rhs
from tps_tpu.dg.riemann import Rusanov
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.gas import DryAir
from tps_tpu.time.integrators import rk4
from tps_tpu.utils.cases import isentropic_vortex


def _vortex_error(order, n, t_end=0.2, dt=2.0e-3):
    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)
    mesh = box_2d(n, n, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
    tab = build_tables(mesh, order=order).to_jax(jnp.float64)
    fl = Fluxes(mixture=mix, eq_system="euler")
    ctx = RHSContext(fluxes=fl, riemann=Rusanov(fl))
    U = mix.conservatives(isentropic_vortex(tab.xyz_dof, 0.0, mix))

    @jax.jit
    def step(u, t):
        return rk4(lambda uu, tt: compute_rhs(ctx, tab, uu, tt), u, t, dt)[0]

    t = 0.0
    nsteps = int(round(t_end / dt))
    for _ in range(nsteps):
        U = step(U, t)
        t += dt
    Uex = mix.conservatives(isentropic_vortex(tab.xyz_dof, t, mix))
    w = tab.wq[None, :, None] * tab.detJ[..., None]
    num = jnp.sum(w * jnp.einsum("qd,nde->nqe", tab.Bvol, (U - Uex) ** 2))
    den = jnp.sum(w * jnp.einsum("qd,nde->nqe", tab.Bvol, Uex**2))
    return float(jnp.sqrt(num / den))


@pytest.mark.parametrize("order,min_rate", [(1, 1.5), (2, 2.5), (3, 3.1)])
def test_vortex_order_of_accuracy(order, min_rate):
    """L2 error decays at >= order + 1/2 between successive refinements
    (DG optimal rate is order + 1; the bracket leaves preasymptotic slack,
    mirroring the reference's empirical-bracket strategy,
    test/mms.euler_2d.test:28-52)."""
    e_coarse = _vortex_error(order, 8)
    e_fine = _vortex_error(order, 16)
    rate = np.log2(e_coarse / e_fine)
    assert rate > min_rate, (order, e_coarse, e_fine, rate)
    # absolute accuracy bracket at the fine resolution
    caps = {1: 3e-2, 2: 4e-3, 3: 6e-4}
    assert e_fine < caps[order], (order, e_fine)
