#!/usr/bin/env python3
"""Python time-loop driver with external chemistry.

The analog of the reference's src/tps-time-loop.py: run the flow solver
step by step, pushing plasma state over the Tps2Boltzmann interface to an
external (here: Arrhenius) rate solver and fetching its reaction rates
back into the chemistry each iteration.

Usage:  python examples/time_loop.py -run <runfile.ini>
"""
import sys

import numpy as np

from tps_tpu.harness import Tps
from tps_tpu.interop.boltzmann import Tps2Boltzmann


class ArrheniusSolver:
    """External rate solver (reference: tps-time-loop.py ArrheniusSolver).
    Reaction 1: Ar + E => Ar.+1 + 2 E;  Reaction 2: Ar.+1 + 2 E => Ar + E."""

    UNIVERSALGASCONSTANT = 8.3144598

    def __init__(self):
        self.A = [74072.331348, 5.66683445516e-20]
        self.b = [1.511, 0.368]
        self.E = [1176329.772504, -377725.908714]  # [J/mol]
        self.heavy_temperature = None
        self.reaction_rates = None

    def fetch(self, interface):
        n_reactions = interface.nComponents(Tps2Boltzmann.ReactionRates)
        for r in range(n_reactions):
            print("Reaction", r + 1, ":", interface.getReactionEquation(r))
        self.heavy_temperature = interface.HostRead(
            Tps2Boltzmann.HeavyTemperature
        )
        print("E-field angular frequency:", interface.EfieldAngularFreq())

    def solve(self):
        T = self.heavy_temperature
        self.reaction_rates = [
            A * np.power(T, b) * np.exp(-E / (self.UNIVERSALGASCONSTANT * T))
            for A, b, E in zip(self.A, self.b, self.E)
        ]

    def push(self, interface):
        n_reactions = interface.nComponents(Tps2Boltzmann.ReactionRates)
        rates = interface.HostWrite(Tps2Boltzmann.ReactionRates)
        npts = self.heavy_temperature.shape[0]
        for r in range(min(n_reactions, len(self.reaction_rates))):
            rates[r * npts : (r + 1) * npts] = self.reaction_rates[r]
        interface.commit(Tps2Boltzmann.ReactionRates, rates)


def main(argv):
    tps = Tps()
    tps.parse_command_line_args(argv)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()

    boltzmann = ArrheniusSolver()
    interface = Tps2Boltzmann(tps)
    tps.init_interface(interface)

    it = 0
    max_iters = tps.config.max_iters
    print("Max Iters:", max_iters)
    while it < max_iters:
        tps.solve_step()
        tps.push(interface)
        boltzmann.fetch(interface)
        boltzmann.solve()
        boltzmann.push(interface)
        interface.saveDataCollection(cycle=it, time=tps.solver.time)
        tps.fetch(interface)
        it += 1
        print("it,", it)
    tps.solve_end()
    return tps.get_status()


if __name__ == "__main__":
    sys.exit(main(sys.argv))
