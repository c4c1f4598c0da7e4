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


# ---------------------------------------------------------------------------
# Full plasma tier (mixture + molecular transport, reference depth)
# ---------------------------------------------------------------------------

def _argon_reacting(nx=4, ny=4, T_init=8000.0):
    """ReactingFlow on the shared argon plasma stack (the reference's
    reactFlow-* configuration class: perfect mixture + argon-minimal
    transport + ionization chemistry)."""
    import os

    from tps_tpu.config.ini import IniInput
    from tps_tpu.solvers.lomach.solver import _build_reacting_flow

    here = os.path.dirname(__file__)
    argon = open(os.path.join(here, "inputs", "argon_minimal.ini")).read()
    extra = f"""
[loMach]
ambientPressure = 101325.0
openSystem = 1

[loMach/reacting]
sub-steps = 4

[initialConditions]
temperature = {T_init}
"""
    inp = IniInput.parse(argon + extra)
    mesh = box_2d(nx, ny, x1=0.01, y1=0.01, periodic_x=True, periodic_y=True)
    tab = h1.build_h1(mesh, order=1)
    rf = _build_reacting_flow(inp, tab, (), 1e-12, 400)
    return rf


def test_reacting_full_tier_construction():
    rf = _argon_reacting()
    assert rf.mixture is not None and rf.transport is not None
    assert rf.ambipolar and rf.n_active == 1
    # mixture-ordered species: [Ar+ (active), E, Ar (background)]
    assert rf.species_names[-2] == "E"


def test_reacting_per_species_diffusivities_differ():
    rf = _argon_reacting()
    # seed some ionization so charged-species transport is active
    Y = np.array(rf.Y)
    Y[:, 0] = 1e-4  # Ar+
    rf.Y = rf._close_species(jnp.asarray(Y))
    diff, mu, kappa = rf._transport_props(rf.T, rf.Y)
    d = np.asarray(diff)
    assert np.all(np.isfinite(d)) and np.all(d[:, :2] > 0)
    # electron diffusivity differs from the ion's (not a single-Sc closure)
    assert not np.allclose(d[:, 0], d[:, 1], rtol=1e-3)
    assert float(np.min(np.asarray(mu))) > 0
    assert float(np.min(np.asarray(kappa))) > 0


def test_reacting_plasma_conductivity():
    """The previously NotImplementedError hook now returns a real sigma
    (reference: evaluatePlasmaConductivityGF, src/reactingFlow.cpp:3192)."""
    rf = _argon_reacting(T_init=9000.0)
    Y = np.array(rf.Y)
    Y[:, 0] = 1e-4
    rf.Y = rf._close_species(jnp.asarray(Y))
    sig = np.asarray(rf.plasma_conductivity())
    assert sig.shape == (rf.tab.ndofs,)
    assert np.all(np.isfinite(sig)) and np.all(sig > 0)
    # more ionization -> higher conductivity
    Y[:, 0] = 1e-3
    rf.Y = rf._close_species(jnp.asarray(Y))
    sig2 = np.asarray(rf.plasma_conductivity())
    assert np.all(sig2 > sig)


def test_reacting_full_tier_step_conservation():
    """One operator-split step: mass fractions stay a partition of unity,
    quasi-neutrality holds, state stays finite; Joule heating raises T."""
    rf = _argon_reacting(T_init=9000.0)
    Y = np.array(rf.Y)
    Y[:, 0] = 1e-4
    rf.Y = rf._close_species(jnp.asarray(Y))
    rf.T_hist = [rf.T, rf.T]
    rf.Y_hist = [rf.Y, rf.Y]

    coeff = TemporalCoefficients.bdf(1)
    T0 = float(jnp.mean(rf.T))
    rf.set_joule_heating(jnp.full(rf.tab.ndofs, 1e8))  # W/m^3
    rf.step(coeff, 1e-7)

    Y = np.asarray(rf.Y)
    np.testing.assert_allclose(Y.sum(axis=-1), 1.0, atol=1e-12)
    assert np.all(Y >= 0)
    # quasi-neutrality: Y_e = (m_e/m_i) * Y_i
    me, mi = rf.mw[rf.i_electron], rf.mw[0]
    np.testing.assert_allclose(Y[:, rf.i_electron], Y[:, 0] * me / mi,
                               rtol=1e-10)
    assert np.all(np.isfinite(np.asarray(rf.T)))
    assert float(jnp.mean(rf.T)) > T0  # Joule heating raises temperature
    assert np.all(np.isfinite(np.asarray(rf.Qt)))


def test_reacting_ionization_equilibrium_consistency():
    """Production rates from the shared Chemistry: ionization at high T
    creates Ar+ (positive creation for species 0)."""
    rf = _argon_reacting(T_init=12000.0)
    Y = np.array(rf.Y)
    Y[:, 0] = 1e-6
    rf.Y = rf._close_species(jnp.asarray(Y))
    dY, dT = rf._reaction_source(rf.T, rf.Y)
    dY = np.asarray(dY)
    assert np.all(dY[:, 0] > 0)  # net ionization
    # ionization consumes energy: heat release negative
    assert np.all(np.asarray(dT) < 0)


def test_p_thermo_reaches_jitted_step():
    """Regression: the thermodynamic pressure must flow into the jitted
    step as an ARGUMENT.  A closed-over python float is baked at the first
    trace, so closed-system pressure updates would silently never affect
    the in-step density/chemistry."""
    import jax.numpy as jnp

    from tps_tpu.fem import h1
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.solvers.lomach.base import TemporalCoefficients
    from tps_tpu.solvers.lomach.reacting_flow import ReactingFlow

    tab = h1.build_h1(box_2d(4, 4), order=1).to_jax(jnp.float64)

    def make():
        rf = ReactingFlow(
            tab, flow=None, species_names=("A", "B"),
            mw=(0.028, 0.032), molar_cv_over_R=(2.5, 2.5),
            formation_energy=(0.0, 0.0), chemistry=None,
            p_thermo=101325.0, T_init=300.0,
            Y_init=np.asarray([0.5, 0.5]),
        )
        # non-uniform T so diffusion does something
        x = np.asarray(tab.xyz)[:, 0]
        rf.T = jnp.asarray(300.0 + 50.0 * x)
        rf.T_hist = [rf.T, rf.T]
        return rf

    coeff = TemporalCoefficients.bdf(1)
    # baseline: two steps at constant pressure
    a = make()
    a.step(coeff, 1e-4)
    a.step(coeff, 1e-4)
    T_ref = np.asarray(a.T)

    # same instance, pressure changed AFTER the jit traced: the second
    # step must see the new value (with the closure bug it would not)
    b = make()
    b.step(coeff, 1e-4)
    b.p_thermo = 2.0 * 101325.0
    b.step(coeff, 1e-4)
    assert not np.allclose(np.asarray(b.T), T_ref, rtol=1e-12, atol=0)


def test_species_dirichlet_inlet_and_wall():
    """Species Dirichlet BCs (reference: AddSpecDirichletBC at inlets and
    walls, src/reactingFlow.cpp:1279,1393): a fixed-composition inflow
    holds its composition at the inlet dofs, a wall holds zero active
    species, and mass fractions stay normalized everywhere."""
    mesh = box_2d(4, 6, x1=0.01, y1=0.02)  # non-periodic: patches 1..4
    tab = h1.build_h1(mesh, order=2).to_jax(jnp.float64)
    mw = (0.03, 0.03)
    chem = Chemistry(
        mixture=_FakeMix(mw),
        reactant_stoich=np.array([[1, 0]]),
        product_stoich=np.array([[0, 1]]),
        models=(Arrhenius(A=5.0, b=0.0, E=0.0),),
        reaction_energies=(0.0,),
        detailed_balance=(False,),
        equilibrium_params=((0.0, 0.0, 0.0),),
    )
    from tps_tpu.solvers.lomach.thermo_chem import TemperatureDirichlet

    rf = ReactingFlow(
        tab, flow=ZeroFlow(tab), species_names=["A", "B"], mw=mw,
        molar_cv_over_R=(2.5, 2.5), formation_energy=(1.0e4, 0.0),
        chemistry=chem, n_substeps=2,
        Y_init=np.array([0.3, 0.7]), T_init=900.0,
        temp_bcs=(TemperatureDirichlet((1,), 300.0),),
        qt_bcs=((2,),),
        spec_bcs=(((1,), [0.05, 0.95]), ((2,), None)),
    )
    wall_dofs = h1.boundary_dofs(tab, (2,))
    # corner dofs shared between patches take the LAST spec_bc entry (the
    # wall here); assert the pure-inlet dofs only
    inlet_dofs = np.setdiff1d(h1.boundary_dofs(tab, (1,)), wall_dofs)
    # IC imprint
    assert np.allclose(np.asarray(rf.Y)[inlet_dofs, 0], 0.05)
    assert np.allclose(np.asarray(rf.Y)[wall_dofs, 0], 0.0)
    for i in range(8):
        rf.step(TemporalCoefficients.bdf(min(i + 1, 2)), 1e-4)
    Y = np.asarray(rf.Y)
    assert np.isfinite(Y).all()
    # inflow composition holds exactly at the inlet; wall stays pure
    # background despite the A->B reaction running in the interior
    assert np.abs(Y[inlet_dofs, 0] - 0.05).max() < 1e-14
    assert np.abs(Y[wall_dofs, 0]).max() < 1e-14
    assert np.abs(Y.sum(axis=1) - 1.0).max() < 1e-12
    # interior A is being consumed toward B (reaction active); pointwise
    # values may overshoot slightly near the Dirichlet layers (FEM)
    interior = np.setdiff1d(np.arange(tab.ndofs),
                            np.concatenate([inlet_dofs, wall_dofs]))
    assert Y[interior, 0].mean() < 0.2999
    # Gibbs overshoot next to the Dirichlet composition jump is bounded
    assert (Y[interior, 0] < 0.33).all()


def test_species_dirichlet_ini_wired(tmp_path):
    """The [boundaryConditions] ini schema wires species Dirichlet BCs
    through the loMach solver factory (torch-like cold inflow of fixed
    composition; reference: loMach/reactingFlow/neumann-species-inlet)."""
    import os

    here = os.path.dirname(__file__)
    argon = open(os.path.join(here, "inputs", "argon_minimal.ini")).read()
    argon = argon.split("[plasma_models]", 1)[1]
    argon = "[plasma_models]" + argon.rsplit("[io]", 1)[0]

    ini = tmp_path / "torch_spec.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 4
ny = 5
x1 = 0.01
y1 = 0.02
[loMach]
order = 1
flow-solver = zero-flow
thermo-solver = reacting-flow
maxIters = 3
[loMach/reactingFlow]
neumann-species-inlet = 0
neumann-species-wall = 0
[initialConditions]
temperature = 8000.0
[time]
dt_fixed = 1e-7
[boundaryConditions/inlet1]
patch = 1
type = inlet
velocity = '0.0 1.0'
temperature = 300.0
[boundaryConditions/wall1]
patch = 2
type = viscous
temperature = 300.0
[io]
outdirBase = {tmp_path}/out
{argon}
""")
    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.solvers.base import create_solver
    import tps_tpu.harness  # noqa: F401 (registry)

    inp = IniInput.read(str(ini))
    rc = parse_run_configuration(inp)
    rc.max_iters = 3
    s = create_solver("loMach", rc)
    s.initialize()
    th = s.thermo
    inlet_dofs = h1.boundary_dofs(s.tab, (1,))
    wall_dofs = h1.boundary_dofs(s.tab, (2,))
    assert np.asarray(th.Y_mask)[inlet_dofs].max() == 0.0
    assert np.asarray(th.Y_mask)[wall_dofs].max() == 0.0
    for _ in range(3):
        s.solve_step()
    Y = np.asarray(th.Y)
    n_active = th.n_active
    # zero active species at inlet & wall: pure background (cold argon)
    assert np.abs(Y[inlet_dofs, :n_active]).max() < 1e-12
    assert np.abs(Y[wall_dofs, :n_active]).max() < 1e-12
    assert np.abs(Y.sum(axis=1) - 1.0).max() < 1e-10
    assert np.isfinite(np.asarray(th.T)).all()


def test_ramp_chem_blend(tmp_path):
    """Chemistry-model ramping after a restart (reference:
    loMach/reactingFlow/ramp-chem + [reactions_base],
    src/reactingFlow.cpp:652-682, 2697-2710): inside the window the
    reaction source blends linearly from the baseline chemistry to the
    active one; outside the window the active chemistry applies."""
    import os

    import jax.numpy as jnp

    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.harness import Tps

    here = os.path.dirname(__file__)
    argon = open(os.path.join(here, "inputs", "argon_minimal.ini")).read()
    argon = "[plasma_models]" + argon.split("[plasma_models]", 1)[1]
    argon = argon.rsplit("[io]", 1)[0]
    ini = tmp_path / "run.ini"
    ini.write_text(f"""
[solver]
type = loMach
[mesh]
generator = box2d
nx = 3
ny = 3
x1 = 0.01
y1 = 0.01
[loMach]
order = 1
flow-solver = zero-flow
thermo-solver = reacting-flow
maxIters = 2
outputFreq = 1000
[loMach/reactingFlow]
ramp-chem = 1
[loMach/reactingFlow/ramp-chem]
ramp_start = 1.0
ramp_time = 2.0
[initialConditions]
temperature = 9000.0
[time]
dt_fixed = 1e-8
[boundaryConditions/wall1]
patch = 1
type = viscous
temperature = 9000.0
[boundaryConditions/wall2]
patch = 2
type = viscous
temperature = 9000.0
[boundaryConditions/wall3]
patch = 3
type = viscous
temperature = 9000.0
[boundaryConditions/wall4]
patch = 4
type = viscous
temperature = 9000.0
[io]
outdirBase = {tmp_path}/out
{argon}
[reactions_base/reaction1]
model = arrhenius
reaction_energy = 1.7e6
[reactions_base/reaction1/arrhenius]
A = 1.0
b = 0.0
E = 0.0
""")
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    th = tps.solver.thermo
    assert th.chemistry_base is not None
    assert th.ramp_start == 1.0 and th.ramp_time == 2.0

    # seed a real ionization fraction so the electron-impact rates bite
    T = th.T
    Y = np.array(th.Y)
    names = list(th.species_names)
    iE = names.index("E")
    iI = next(i for i, n in enumerate(names) if "+" in n or "Ar.+1" in n)
    iBg = next(i for i in range(len(names)) if i not in (iE, iI))
    Y[:, iE] = 1e-8
    Y[:, iI] = 1e-3
    Y[:, iBg] = 1.0 - Y[:, iE] - Y[:, iI]
    Y = jnp.asarray(Y)
    dA, _ = th._reaction_source(T, Y, t=jnp.asarray(0.5))   # before: active
    dB, _ = th._reaction_source(T, Y, t=jnp.asarray(5.0))   # after: active
    dM, _ = th._reaction_source(T, Y, t=jnp.asarray(2.0))   # middle: blend
    # compute the pure-base source by temporarily disabling the ramp
    base = th.chemistry_base
    active = th.chemistry
    th.chemistry = base
    th.chemistry_base = None
    d_base, _ = th._reaction_source(T, Y)
    th.chemistry = active
    th.chemistry_base = base
    dA, dB, dM, d_base = (np.asarray(x) for x in (dA, dB, dM, d_base))
    assert np.allclose(dA, dB)
    # middle of the window: exactly halfway between base and active
    mid = 0.5 * (d_base + dA)
    assert np.allclose(dM, mid, rtol=1e-10, atol=1e-30)
    # the two chemistries genuinely differ (the blend is meaningful)
    assert not np.allclose(d_base, dA, rtol=1e-3, atol=1e-30)

    # the stepping paths run with the ramp active
    tps.solve()
    assert np.isfinite(np.asarray(th.T)).all()
