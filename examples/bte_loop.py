#!/usr/bin/env python3
"""Coupled flow + 0D3V Boltzmann time loop.

The analog of the reference's src/tps-bte_0d3v.py driver: run the flow
solver, push the plasma state (E-field, densities, temperatures) over the
Tps2Boltzmann bus, solve the batched two-term EEDF for every spatial
point, and fetch electron temperature/mobility/reaction rates back into
the chemistry.  The Boltzmann solver is configured from the SAME run file
via its [boltzmannSolver] section (reference:
src/tps-bte_0d3v.py:250-280), including `bte_solve_freq` (solve the BTE
every n flow steps) and `ee_collisions`.

Usage:  python examples/bte_loop.py -run <runfile.ini>
"""
import sys

from tps_tpu.harness import Tps
from tps_tpu.interop.boltzmann import Tps2Boltzmann
from tps_tpu.interop.bte_0d3v import BoltzmannSolver0D3V


def main(argv):
    tps = Tps()
    tps.parse_command_line_args(argv)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()

    interface = Tps2Boltzmann(tps)
    tps.init_interface(interface)

    boltzmann = BoltzmannSolver0D3V.from_ini(tps.config.raw)
    freq = max(boltzmann.bte_solve_freq, 1)

    it = 0
    while it < tps.solver.max_iters and tps.solver.status == 0:
        tps.solve_step()
        it += 1
        if it % freq == 0:
            tps.push(interface)
            boltzmann.fetch(interface)
            boltzmann.solve()
            boltzmann.push(interface)
            tps.fetch(interface)
    return tps.solver.status


if __name__ == "__main__":
    sys.exit(main(["tps"] + sys.argv[1:]))
