"""Argon plasma end-to-end through the harness (role of the reference
argon_minimal regression test)."""

import os

import numpy as np

from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)


def test_argon_minimal_lifecycle():
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "argon_minimal.ini")
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    solver = tps.solver

    mix = solver.mixture
    assert mix.num_species == 3
    assert mix.ambipolar and mix.two_temperature
    assert solver.plasma.species_names == ["Ar.+1", "E", "Ar"]
    # with ambipolar + 2T: neq = nvel + 2 + 1 active + 1 Te = 2+2+1+1 = 6
    assert mix.num_equations == 6

    U0 = np.asarray(solver.U)
    # initial state: p = 101300 everywhere
    p0 = np.asarray(mix.pressure(solver.U))
    assert np.allclose(p0, 101300.0, rtol=1e-10)

    tps.solve()
    assert solver.iter == 4
    assert solver.check_nan() == 0
    Up = np.asarray(solver.primitives())
    assert Up[..., 0].min() > 0
    # temperatures remain physical
    assert 200 < Up[..., mix.i_th].mean() < 5000
    assert 200 < Up[..., mix.i_te].mean() < 5000
    # uniform periodic state with uniform chemistry stays uniform
    U1 = np.asarray(solver.U)
    for eq in range(mix.num_equations):
        spread = U1[..., eq].max() - U1[..., eq].min()
        scale = max(abs(U1[..., eq]).max(), 1e-10 * abs(U1).max())
        assert spread < 1e-7 * scale, (eq, spread, scale)


def test_saha_lte_species_init():
    """restartFromLTE: Saha equilibrium ionization fraction has the right
    limits and magnitude (argon at 1 atm: ~1e-4 at 10 kK, >1% at 16 kK)."""
    import jax.numpy as jnp

    from tps_tpu.constants import AVOGADRO_NUMBER, ELECTRON_CHARGE
    from tps_tpu.physics.perfect_mixture import saha_ionization_fraction

    E_ion = 15.7596119 * ELECTRON_CHARGE * AVOGADRO_NUMBER  # J/mol
    n_atm = 101325.0 / (8.3144598 * jnp.asarray([300.0, 10000.0, 16000.0]))
    x = np.asarray(saha_ionization_fraction(
        n_atm, jnp.asarray([300.0, 10000.0, 16000.0]), E_ion))
    assert x[0] < 1e-30          # cold: neutral
    assert 1e-6 < x[1] < 5e-2    # 10 kK: ~1% ionized
    assert x[2] > 1e-2           # 16 kK: percent-level
    assert x[2] > x[1] > x[0]    # monotone in T


def test_argon_full_multilevel_plasma():
    """Multi-level argon (ground/metastable/resonance/4p + ion + e) with
    GasMixtureTransport and escape-factor radiative decay, end to end
    through the harness (reference: test/inputs/input.radDecay.ini role)."""
    import jax.numpy as jnp

    from tps_tpu.harness import Tps
    from tps_tpu.physics.gas_transport import GasMixtureTransport
    from tps_tpu.physics.radiative_decay import RadiativeDecay

    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "argon_full.ini")
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    assert isinstance(s.transport, GasMixtureTransport)
    # excited states map onto ground-state argon collision data
    assert s.plasma.chemistry.num_reactions == 4
    assert any(isinstance(m, RadiativeDecay)
               for m in s.plasma.chemistry.models)

    # resonance state decays: track its total mass over a few steps
    mix = s.mixture
    names = s.plasma.species_names
    i_r = names.index("Ar_r")
    n_r0 = float(jnp.sum(s.U[..., mix.nvel + 2 + i_r]))
    tps.solve()
    assert s.check_nan() == 0
    n_r1 = float(jnp.sum(s.U[..., mix.nvel + 2 + i_r]))
    assert n_r1 < n_r0  # radiative decay depletes Ar_r
    Up = np.asarray(s.primitives())
    assert (Up[..., mix.i_th] > 0).all() and np.isfinite(Up).all()


def test_argon_inflow_outflow():
    """Subsonic inlet with species mass fractions + pressure outlet on the
    argon ternary mixture (role of the reference's inflow_outflow.test,
    argonMinimal.inflow_outflow.ini; species parse at
    src/M2ulPhyS.cpp:3629-3641)."""
    tps = Tps()
    tps.input_file = os.path.join(HERE, "inputs", "argon_inflow_outflow.ini")
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    solver = tps.solver
    mix = solver.mixture

    # the inlet BC carries the active-species (Ar.+1) mass fraction
    from tps_tpu.dg.bc import InletBC

    inlets = [s.bc for s in solver.bc_slices if isinstance(s.bc, InletBC)]
    assert len(inlets) == 1
    assert inlets[0].input_state == (1.6, 10.0, 0.0, 1.0e-7)

    tps.solve()
    assert solver.iter == 4
    assert solver.check_nan() == 0
    Up = np.asarray(solver.primitives())
    assert Up[..., 0].min() > 0
    assert 200 < Up[..., mix.i_th].mean() < 5000
    # ion molar density stays near the seeded level (uniform state,
    # matched inlet): n_Ar+ = Y rho / M_Ar+ [mol/m^3]
    n_ion = Up[..., mix.nvel + 2]
    n_ref = 1.0e-7 * 1.6 / (39.948e-3 - 5.4858e-07)
    assert 0.5 * n_ref < n_ion.mean() < 2.0 * n_ref
