"""Top-level Tps harness: CLI args, input parsing, device setup, solver
factory, lifecycle.

Mirrors the reference TPS::Tps surface (reference: src/tps.hpp:72-216,
src/tps.cpp:128-278, pybind wrappers src/tps.cpp:502-549) so reference-style
drivers port directly:

    tps = Tps()
    tps.parse_command_line_args(argv)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    tps.solve()

camelCase aliases are provided for drop-in compatibility with the
reference's Python API (tps.py / tps-time-loop.py style drivers).
"""

from __future__ import annotations

import argparse
import sys

from .config.ini import IniInput
from .config.run_config import parse_run_configuration
from .solvers import base as solver_base

# Import every solver module for its registration side-effect so that
# choose_solver can dispatch all registered types, mirroring the single
# factory switch in Tps::chooseSolver (reference: src/tps.cpp:247-278
# dispatches flow/loMach/em/em-axi/cycle-avg-joule-coupled/
# independent-coupled from one place).
from .solvers.compressible import CompressibleSolver  # noqa: F401 (registry)
from .solvers.lomach.solver import LoMachSolver  # noqa: F401 (registry)
from .solvers.em import qms as _qms  # noqa: F401 (registry: em-axi)
from .solvers.em import qms3d as _qms3d  # noqa: F401 (registry: em)
from .solvers import coupling as _coupling  # noqa: F401 (registry)

# exit statuses (reference: src/tps.hpp Tps::getStatus -> main.cpp:57-66)
NORMAL = 0
EARLY_EXIT = 10
JOB_RESTART = 20
ERROR = 1


class Tps:
    def __init__(self, comm=None):
        self.comm = comm  # placeholder for multi-host process groups
        self.input_file = None
        self.iniput = None
        self.config = None
        self.solver = None
        self.status = NORMAL
        self._device_config = "tpu"

    # ------------------------------------------------------------------
    def parse_command_line_args(self, argv=None):
        ap = argparse.ArgumentParser(prog="tps-tpu", description="TPU-native TPS")
        ap.add_argument("--runFile", "-run", dest="run_file", help="ini input file")
        ap.add_argument("--version", action="store_true")
        ap.add_argument("--visualization", "-visual", action="store_true")
        ap.add_argument("--debug", action="store_true")
        ap.add_argument("--device", default=None, help="tpu|cpu override")
        # multi-host launch (reference: mpirun -np N tps ...; here: run the
        # same command on every host with its processId)
        ap.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (multi-host runs)")
        ap.add_argument("--numProcesses", type=int, default=0)
        ap.add_argument("--processId", type=int, default=0)
        args = ap.parse_args(argv[1:] if argv else sys.argv[1:])
        if args.version:
            from . import __version__

            print(f"tps-tpu version {__version__}")
            raise SystemExit(0)
        self.input_file = args.run_file
        self._visual = args.visualization
        if args.device:
            self._device_config = args.device
        self._multihost = None
        if args.coordinator:
            self._multihost = (args.coordinator, args.numProcesses,
                               args.processId)
        return args

    def parse_input(self, path=None):
        path = path or self.input_file
        if path is None:
            raise RuntimeError("no input file; pass --runFile")
        self.iniput = IniInput.read(path)
        self.config = parse_run_configuration(self.iniput)
        return self.config

    def choose_devices(self):
        """Configure the jax execution platform (reference chooseDevices
        selects the MFEM device backend, src/tps.cpp:196-239).

        Uses jax.config (NOT the JAX_PLATFORMS env var, which plugin
        backends may ignore).

        Multi-host runs (--coordinator host:port --numProcesses N
        --processId i on every host) initialize the jax multi-controller
        runtime here, the analog of the reference's MPI_Init
        (src/tps.cpp:72-74); jax.devices() then spans all hosts and the
        domain-decomposition device meshes follow."""
        import jax

        if self._device_config == "cpu":
            jax.config.update("jax_platforms", "cpu")
        if getattr(self, "_multihost", None):
            from .parallel.comm import init_multi_host

            coord, nproc, pid = self._multihost
            init_multi_host(coord, nproc, pid)

    def choose_solver(self):
        # split-communicator analog (reference: Tps accepts any MPI_Comm,
        # src/tps.cpp:72): a DeviceGroup restricts this instance's device
        # meshes to its device subset
        if self.comm is not None and hasattr(self.comm, "devices"):
            self.config.devices = tuple(self.comm.devices)
        self.solver = solver_base.create_solver(
            self.config.solver_type, self.config, tps=self
        )
        self.solver.parse_solver_options()
        return self.solver

    def initialize(self):
        self.solver.initialize()

    def solve(self):
        self.solver.solve()
        self.status = self.solver.status

    def solve_begin(self):
        self.solver.solve_begin()

    def solve_step(self):
        self.solver.solve_step()

    def solve_end(self):
        self.solver.solve_end()
        self.status = self.solver.status

    def get_status(self):
        return self.status

    # interop bus
    def init_interface(self, interface):
        self.solver.init_interface(interface)

    def push(self, interface):
        self.solver.push(interface)

    def fetch(self, interface):
        self.solver.fetch(interface)

    # -- camelCase aliases (reference pybind API names) --------------------
    parseCommandLineArgs = parse_command_line_args
    parseInput = parse_input
    chooseDevices = choose_devices
    chooseSolver = choose_solver
    solveBegin = solve_begin
    solveStep = solve_step
    solveEnd = solve_end
    getStatus = get_status
    initInterface = init_interface


def main(argv=None):
    tps = Tps()
    tps.parse_command_line_args(argv)
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    if tps._visual:
        # visualization mode: convert the existing checkpoint to VTK and
        # exit without solving (reference: tps --visual,
        # src/M2ulPhyS.cpp:4073)
        tps.solver.read_restart()
        tps.solver.visualization()
        return 0
    tps.solve()
    return tps.get_status()


if __name__ == "__main__":
    raise SystemExit(main())
