"""Ini wiring of the forcing terms the reference parses in
parseSolverOptions2: [flow]/enablePressureForcing (src/M2ulPhyS.cpp:2681),
[heatSource] sections (:2751-2785), and [spongezone] sections (:3682-3760)
— previously only constructible programmatically."""

import os

import numpy as np
import pytest

from tps_tpu.dg.forcing import (
    ConstantPressureGradient,
    HeatSource,
    SpongeZone,
    sponge_target_conserved,
)
from tps_tpu.harness import Tps

HERE = os.path.dirname(__file__)


def _run_deck(tmp_path, text, iters=2):
    ini = tmp_path / "deck.ini"
    ini.write_text(text)
    tps = Tps()
    tps.input_file = str(ini)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    for _ in range(iters):
        tps.solver.solve_step()
    return tps


DRYAIR_DECK = """
[solver]
type = flow
[flow]
order = 1
maxIters = 4
outputFreq = 1000
fluid = dry_air
equation_system = navier-stokes
enablePressureForcing = True
pressureGrad = '8.0 0.0 0.0'
[mesh]
generator = box2d
nx = 4
ny = 4
periodic_x = 1
periodic_y = 1
[time]
cfl = 0.1
integrator = rk4
[initialConditions]
rho = 1.2
rhoU = 12.0
rhoV = 0.0
rhoW = 0.0
pressure = 101300

[heatSource]
numHeatSources = 1
[heatSource1]
isEnabled = True
value = 1.0e5
distribution = cylinder
radius = 0.2
point1 = '0.5 0.5 -1.0'
point2 = '0.5 0.5 1.0'

[spongezone]
numSpongeZones = 1
[spongezone1]
isEnabled = True
type = planar
targetSolType = userDef
density = 1.2
uvw = '10.0 0.0 0.0'
pressure = 101300.0
normal = '-1 0 0'
p0 = '1.0 0.0 0.0'
pInit = '0.75 0.0 0.0'
multiplier = 0.5

[io]
outdirBase = {out}
"""


def test_dry_air_forcings_wired(tmp_path):
    tps = _run_deck(tmp_path, DRYAIR_DECK.format(out=tmp_path / "o"))
    kinds = [type(f).__name__ for f in tps.solver.ctx.forcings]
    assert "ConstantPressureGradient" in kinds
    assert "HeatSource" in kinds
    assert "SpongeZone" in kinds
    cpg = next(f for f in tps.solver.ctx.forcings
               if isinstance(f, ConstantPressureGradient))
    assert cpg.press_grad[0] == 8.0
    hs = next(f for f in tps.solver.ctx.forcings if isinstance(f, HeatSource))
    assert hs.value == 1.0e5 and hs.radius == 0.2
    sz = next(f for f in tps.solver.ctx.forcings if isinstance(f, SpongeZone))
    assert sz.sz_type == "planar" and sz.mult == 0.5
    # target energy set from pressure: rhoE = p/(gamma-1) + KE
    mix = tps.solver.mixture
    gamma = mix.specific_heat_ratio
    rhoE = 101300.0 / (gamma - 1.0) + 0.5 * 1.2 * 10.0**2
    np.testing.assert_allclose(sz.target_u[mix.i_th], rhoE, rtol=1e-12)
    assert np.isfinite(np.asarray(tps.solver.U)).all()


def test_sponge_disabled_zone_skipped(tmp_path):
    deck = DRYAIR_DECK.format(out=tmp_path / "o").replace(
        "[spongezone1]\nisEnabled = True", "[spongezone1]\nisEnabled = False"
    )
    tps = _run_deck(tmp_path, deck, iters=0)
    kinds = [type(f).__name__ for f in tps.solver.ctx.forcings]
    assert "SpongeZone" not in kinds


def test_argon_sponge_target_species(tmp_path):
    """Two-temperature multi-species sponge target mirrors the reference
    constructor (src/forcing_terms.cpp:486-518): species densities from
    input-ordered mass fractions, electron energy from the deck Te."""
    base = open(os.path.join(HERE, "inputs", "argon_minimal.ini")).read()
    deck = base + """
[spongezone]
numSpongeZones = 1
[spongezone1]
type = planar
targetSolType = userDef
density = 1.6
uvw = '10.0 0.0 0.0'
pressure = 101300.0
mass_fraction/species1 = 1.0e-8
mass_fraction/species2 = 0.9999999
mass_fraction/species3 = 1.0e-7
electron_temperature = 400.0
normal = '-1 0 0'
p0 = '0.01 0.0 0.0'
pInit = '0.0075 0.0 0.0'
multiplier = 0.5
"""
    tps = _run_deck(tmp_path, deck, iters=1)
    sz = next(f for f in tps.solver.ctx.forcings if isinstance(f, SpongeZone))
    mix = tps.solver.mixture
    # active species (mixture order: [Ar.+1, E]) densities = rho * Y_input
    nvel = mix.nvel
    np.testing.assert_allclose(sz.target_u[nvel + 2], 1.6 * 1.0e-7,
                               rtol=1e-12)  # Ar.+1
    # electron energy = n_e cv_e R Te with Te from the deck
    assert sz.target_u[mix.num_equations - 1] > 0.0
    assert np.isfinite(np.asarray(tps.solver.U)).all()


def test_annulus_sponge_swirl_target():
    """Annulus target velocity is cylindrical (V_r, V_theta, V_axial):
    a pure-swirl target produces azimuthal momentum forcing."""
    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.mesh.generators import box_3d
    from tps_tpu.physics.gas import DryAir

    mix = DryAir(dim=3, nvel=3)
    mesh = box_3d(4, 4, 2, bounds=((-1.0, 1.0), (-1.0, 1.0), (0.0, 1.0)),
                  periodic=(False, False, True))
    tab = build_tables(mesh, order=1).to_jax(jnp.float64)
    p_t = 1.0 * mix.gas_constant * 300.0
    target = sponge_target_conserved(mix, 1.0, (0.0, 2.0, 0.0), p_t)
    # reference convention (src/forcing_terms.cpp:583-600): inside needs
    # distInit = -n.(x - pInit) > 0 and distF = n.(x - p0) > 0, so for the
    # slab 0 < z < 1 the normal must point in -z
    sz = SpongeZone(
        mixture=mix, target_u=target, normal=(0.0, 0.0, -1.0),
        p0=(0.0, 0.0, 1.0), p_init=(0.0, 0.0, 0.0), mult=1.0,
        sz_type="annulus", r1=0.2, r2=1.0,
    )
    from tps_tpu.utils.cases import uniform_state

    Up = uniform_state(tab.xyz_dof, mix, 1.0, (0.0, 0.0, 0.0), 300.0)
    U = mix.conservatives(Up)
    out = np.asarray(sz(0.0, tab, U, Up, None))
    xyz = np.asarray(tab.xyz_dof)
    R = np.hypot(xyz[..., 0], xyz[..., 1])
    active = (R > 0.25) & (xyz[..., 2] > 0.05) & (xyz[..., 2] < 0.95)
    # forcing pushes momentum toward rho * V_t * uth with uth = n x ur
    # (src/forcing_terms.cpp:695-700); with n = -z that is clockwise in xy
    fx, fy = out[..., 1], out[..., 2]
    tangential = (-xyz[..., 1] * fx + xyz[..., 0] * fy) / np.maximum(R, 1e-12)
    assert (tangential[active] < 0.0).all()
    # and no forcing outside the annulus slab
    assert np.abs(out[R < 0.15]).max() == pytest.approx(0.0, abs=1e-14)


# ---------------------------------------------------------------------------
# mixedOut sponge target (reference: SpongeZone::computeMixedOutValues,
# src/forcing_terms.cpp:712-744 + computeConservedStateFromConvectiveFlux)
# ---------------------------------------------------------------------------

def test_mixed_out_roundtrip_dryair():
    """For a uniform subsonic state, inverting its own convective normal
    flux must reproduce the state (the reference's quadratic picks the
    subsonic root)."""
    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.physics.gas import DryAir

    mix = DryAir(dim=2, nvel=2)
    fl = Fluxes(mixture=mix)
    Up = jnp.asarray([1.2, 30.0, 10.0, 350.0], jnp.float64)
    U = mix.conservatives(Up)
    n = jnp.asarray([1.0, 0.0], jnp.float64)
    F = fl.convective(U)
    Fn = jnp.einsum("qd,d->q", F, n)
    U2 = mix.conserved_from_convective_flux(Fn, n)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U), rtol=1e-12)


@pytest.mark.parametrize("ambipolar", [False, True])
@pytest.mark.parametrize("two_t", [False, True])
def test_mixed_out_roundtrip_argon(ambipolar, two_t):
    import jax.numpy as jnp

    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.physics.perfect_mixture import PerfectMixture

    MW_AR, MW_E = 39.948e-3, 5.4858e-07
    mix = PerfectMixture(
        dim=2, nvel=2,
        mw=(MW_AR - MW_E, MW_E, MW_AR),
        charges=(1.0, -1.0, 0.0),
        formation_energy=(1520.57e3, 0.0, 0.0),
        molar_cv_over_R=(1.5, 1.5, 1.5),
        ambipolar=ambipolar, two_temperature=two_t,
    )
    na = mix.num_active_species
    # primitive: [rho, u, v, Th, n_active..., (Te)]; number densities are
    # MOLAR (mol/m^3) — rho=1.6 of argon is ~40 mol/m^3, a 1% ionization
    # fraction is ~0.4 mol/m^3
    up = [1.6, 40.0, -5.0, 9000.0]
    n_ion = 0.4
    up += [n_ion]  # Ar+
    if not ambipolar:
        up += [n_ion]  # electrons (quasineutral anyway)
    assert len(up) == mix.nvel + 2 + na
    if two_t:
        up += [11000.0]
    Up = jnp.asarray(up, jnp.float64)
    U = mix.conservatives(Up)
    fl = Fluxes(mixture=mix)
    n = jnp.asarray([1.0, 0.0], jnp.float64)
    Fn = jnp.einsum("qd,d->q", fl.convective(U), n)
    U2 = mix.conserved_from_convective_flux(Fn, n)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U), rtol=1e-10)


MIXEDOUT_DECK = DRYAIR_DECK.replace(
    """targetSolType = userDef
density = 1.2
uvw = '10.0 0.0 0.0'
pressure = 101300.0
normal = '-1 0 0'""",
    """targetSolType = mixedOut
tolerance = 0.2
normal = '-1 0 0'""",
)


def test_mixed_out_sponge_ini(tmp_path):
    """mixedOut deck runs; with a uniform IC the mixed-out target equals the
    state itself, so the sponge forcing starts at ~zero and stays finite."""
    from tps_tpu.dg.forcing import SpongeZone as _SZ

    tps = _run_deck(tmp_path, MIXEDOUT_DECK.format(out=tmp_path / "o"))
    sz = next(f for f in tps.solver.ctx.forcings if isinstance(f, _SZ))
    assert sz.sol_type == "mixedOut" and sz.target_u is None
    assert np.isfinite(np.asarray(tps.solver.U)).all()


def test_mixed_out_empty_plane_rejected(tmp_path):
    deck = MIXEDOUT_DECK.replace("tolerance = 0.2", "tolerance = 1e-12")
    # pin the GL nodal basis: with the (reference-default) GLL basis, dof
    # nodes sit exactly ON mesh planes and the plane is never empty
    deck = deck.replace("[flow]\norder = 1",
                        "[flow]\norder = 1\nbasisType = 0\n"
                        "integrationRule = 0")
    with pytest.raises(ValueError, match="no dof nodes within tolerance"):
        _run_deck(tmp_path, deck.format(out=tmp_path / "o"), iters=0)
