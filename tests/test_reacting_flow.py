"""Reacting low-Mach thermo-chemistry tests (lomach-reacting analog)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.fem import h1
from tps_tpu.mesh.generators import box_2d
from tps_tpu.physics.chemistry import Arrhenius, Chemistry
from tps_tpu.solvers.lomach.base import TemporalCoefficients, ZeroFlow
from tps_tpu.solvers.lomach.reacting_flow import ReactingFlow


class _FakeMix:
    """Minimal mixture facade for Chemistry (indices only)."""

    def __init__(self, mw):
        self.mw = tuple(mw)
        self.i_electron = len(mw) - 2

    @property
    def num_species(self):
        return len(self.mw)


def two_species_setup(n_substeps=4, rate=50.0):
    """A -> B exothermic toy chemistry (equal molar masses)."""
    mesh = box_2d(4, 4, periodic_x=True, periodic_y=True)
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    mw = (0.03, 0.03)
    chem = Chemistry(
        mixture=_FakeMix(mw),
        reactant_stoich=np.array([[1, 0]]),
        product_stoich=np.array([[0, 1]]),
        models=(Arrhenius(A=rate, b=0.0, E=0.0),),
        reaction_energies=(0.0,),
        detailed_balance=(False,),
        equilibrium_params=((0.0, 0.0, 0.0),),
    )
    rf = ReactingFlow(
        tab, flow=ZeroFlow(tab), species_names=["A", "B"], mw=mw,
        molar_cv_over_R=(2.5, 2.5), formation_energy=(5.0e4, 0.0),
        chemistry=chem, n_substeps=n_substeps,
        Y_init=np.array([0.3, 0.7]),
    )
    return tab, rf


def test_species_consumed_and_heat_released():
    tab, rf = two_species_setup()
    Y0 = np.asarray(rf.Y).copy()
    T0 = np.asarray(rf.T).copy()
    dt = 1e-4
    for i in range(20):
        rf.step(TemporalCoefficients.bdf(min(i + 1, 2)), dt)
    Y1 = np.asarray(rf.Y)
    T1 = np.asarray(rf.T)
    # A consumed, B produced, mass fractions sum to one
    assert (Y1[:, 0] < Y0[:, 0]).all()
    assert (Y1[:, 1] > Y0[:, 1]).all()
    assert np.abs(Y1.sum(axis=1) - 1.0).max() < 1e-12
    # positive formation enthalpy of A => exothermic A->B
    assert (T1 > T0).all()
    rho = np.asarray(rf.density())
    assert np.isfinite(rho).all() and (rho > 0).all()
    assert np.isfinite(np.asarray(rf.thermal_divergence())).all()


def test_first_order_decay_rate():
    """With A -> B at rate k, n_A decays ~ exponentially: check the
    consumed fraction against the analytic ODE over the run."""
    tab, rf = two_species_setup(n_substeps=8, rate=20.0)
    dt = 1e-3
    nstep = 30
    for i in range(nstep):
        rf.step(TemporalCoefficients.bdf(1), dt)
    # dn_A/dt = -k n_A -> Y_A(t) ~ Y0 exp(-k t) (equal MW, fixed rho scale)
    t = dt * nstep
    Y_A = float(np.asarray(rf.Y)[:, 0].mean())
    expect = 0.3 * np.exp(-20.0 * t)
    assert abs(Y_A - expect) / expect < 0.05, (Y_A, expect)
