"""Tps2Boltzmann bus test: the reference's Python-driven coupled loop
(src/tps-time-loop.py with its toy ArrheniusSolver) re-enacted through the
framework API."""

import os

import jax.numpy as jnp
import numpy as np

from tps_tpu.config.ini import IniInput
from tps_tpu.config.run_config import parse_run_configuration
from tps_tpu.constants import AVOGADRO_NUMBER, UNIVERSAL_GAS_CONSTANT
from tps_tpu.harness import Tps
from tps_tpu.interop.boltzmann import Tps2Boltzmann

HERE = os.path.dirname(__file__)


class ToyArrheniusSolver:
    """External 'Boltzmann' solver computing one ionization rate from the
    interface fields (the reference's ArrheniusSolver, tps-time-loop.py:8-47)."""

    A, b, E = 4.7, 1.2, 6.49e4

    def fetch(self, interface):
        self.Te = np.asarray(interface.Field(interface.ElectronTemperature))[..., 0]

    def solve(self):
        T = np.maximum(self.Te, 200.0)
        self.rate = self.A * T**self.b * np.exp(-self.E / (UNIVERSAL_GAS_CONSTANT * T))

    def push(self, interface):
        interface.setField(
            interface.ReactionRates, jnp.asarray(self.rate)[..., None]
        )


def test_python_time_loop_with_external_rates():
    inp = IniInput.read(os.path.join(HERE, "inputs", "argon_minimal.ini"))
    inp.values["reactions/reaction1/model"] = "bte"  # external rates
    inp.values["reactions/reaction1/detailed_balance"] = "False"
    inp.values["species/species3/initialMassFraction"] = "1.0e-5"
    inp.values["species/species2/initialMassFraction"] = "0.99999"
    rc = parse_run_configuration(inp)
    rc.max_iters = 3

    tps = Tps()
    tps.config = rc
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()

    interface = Tps2Boltzmann(tps)
    tps.init_interface(interface)
    assert interface.is_initialized()
    assert interface.Nspecies() == 3

    boltzmann = ToyArrheniusSolver()
    solver = tps.solver
    for _ in range(rc.max_iters):
        tps.solve_step()
        tps.push(interface)
        boltzmann.fetch(interface)
        boltzmann.solve()
        boltzmann.push(interface)
        tps.fetch(interface)

    # push populated physical fields
    n_sp = interface.host(interface.SpeciesDensities)
    assert n_sp.min() >= 0 and n_sp.max() > 1e20  # molecules/m^3 via Avogadro
    Th = interface.host(interface.HeavyTemperature)
    assert 250 < Th.mean() < 400
    assert interface.dt == solver.dt and interface.time == solver.time

    # fetch wired external rates into the solver's runtime fields
    assert "extern_rate" in solver.fields
    assert np.asarray(solver.fields["extern_rate"]).shape[-1] == 1
    assert solver.check_nan() == 0


def test_time_loop_example(tmp_path, monkeypatch, capsys):
    """The reference-style Python time-loop driver runs end to end with
    external Arrhenius rates (reference: src/tps-time-loop.py)."""
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "examples"))
    import importlib

    time_loop = importlib.import_module("time_loop")

    src = os.path.join(HERE, "inputs", "argon_minimal.ini")
    ini = tmp_path / "argon.ini"
    txt = open(src).read()
    # redirect output + shorten the run; external (bte) rates for reaction 1
    txt = txt.replace("maxIters = 10", "maxIters = 3")
    ini.write_text(txt + f"\n[io]\noutdirBase = {tmp_path}\n")
    status = time_loop.main(["time_loop.py", "-run", str(ini)])
    assert status == 0
    out = capsys.readouterr().out
    assert "Reaction 1" in out
    assert (tmp_path / "boltzmann_interface_000000.h5").exists()


def test_ini_driven_bte_loop():
    """[boltzmannSolver]-configured coupled loop (the reference's
    tps-bte_0d3v.py driver, config reader src/tps-bte_0d3v.py:250-280):
    the real two-term BTE solves every bte_solve_freq flow steps and its
    per-reaction rates land in the chemistry."""
    from tps_tpu.interop.bte_0d3v import BoltzmannSolver0D3V

    inp = IniInput.read(os.path.join(HERE, "inputs", "argon_minimal.ini"))
    inp.values["reactions/reaction1/model"] = "bte"
    inp.values["reactions/reaction1/detailed_balance"] = "False"
    inp.values["species/species3/initialMassFraction"] = "1.0e-5"
    inp.values["species/species2/initialMassFraction"] = "0.99999"
    inp.values["boltzmannSolver/solver_type"] = "steady-state"
    inp.values["boltzmannSolver/max_iter"] = "150"
    inp.values["boltzmannSolver/n_energy"] = "64"
    inp.values["boltzmannSolver/ee_collisions"] = "1"
    inp.values["boltzmannSolver/ion_deg"] = "1e-4"
    inp.values["boltzmannSolver/bte_solve_freq"] = "2"
    rc = parse_run_configuration(inp)
    rc.max_iters = 4

    tps = Tps()
    tps.config = rc
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()

    interface = Tps2Boltzmann(tps)
    tps.init_interface(interface)

    bte = BoltzmannSolver0D3V.from_ini(rc.raw)
    assert bte.ee_collisions and bte.bte_solve_freq == 2
    assert bte.n_steps == 150 and bte.n_energy == 64

    it = 0
    n_solves = 0
    while it < rc.max_iters:
        tps.solve_step()
        it += 1
        if it % bte.bte_solve_freq == 0:
            tps.push(interface)
            bte.fetch(interface)
            bte.solve()
            bte.push(interface)
            tps.fetch(interface)
            n_solves += 1
    assert n_solves == 2
    solver = tps.solver
    assert "extern_rate" in solver.fields
    rates = np.asarray(solver.fields["extern_rate"])
    assert np.isfinite(rates).all() and (rates >= 0).all()
    # the ionization reaction got a real (nonzero) BTE rate: the argon
    # deck's E-field heats electrons past the ionization threshold only
    # if an EM solve filled the bus field; with a zero field the rate is
    # legitimately ~0 -- assert finite + Te pushed instead
    Te = np.asarray(interface.host(interface.ElectronTemperature))
    assert np.isfinite(Te).all() and (Te > 0).all()
