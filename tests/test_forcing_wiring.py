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
