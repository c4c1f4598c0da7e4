"""Solver abstraction layer.

Mirrors the reference's contracts (reference: src/solver.hpp:46-144):
`Solver` owns the lifecycle (parse options -> initialize -> solve, with
begin/step/end granularity for Python-driven loops), `PlasmaSolver` adds the
plasma-conductivity/Joule-heating surface used by the EM coupling drivers.
"""

from __future__ import annotations


class Solver:
    """Abstract solver lifecycle."""

    def __init__(self, config, tps=None):
        from ..utils.timers import Timers

        self.config = config
        self.tps = tps
        self.iter = 0
        self.time = 0.0
        self.status = 0  # 0 NORMAL
        # hierarchical wall-clock timers (the reference's GRVY timers,
        # summarized at teardown: grvy_timer_summarize, M2ulPhyS dtor);
        # created here so EVERY solver subclass (incl. the mixed-mesh
        # path, which overrides initialize) carries one
        self.timers = Timers()

    # -- lifecycle ---------------------------------------------------------
    def parse_solver_options(self):
        pass

    def initialize(self):
        raise NotImplementedError

    def solve(self):
        self.solve_begin()
        while self.iter < self.max_iters:
            self.solve_step()
            if self.status != 0:
                break
        self.solve_end()

    def solve_begin(self):
        pass

    def solve_step(self):
        raise NotImplementedError

    def solve_end(self):
        pass

    def visualization(self):
        pass

    # -- interop (Tps2Boltzmann bus) --------------------------------------
    def init_interface(self, interface):
        raise NotImplementedError(f"{type(self).__name__} has no interface support")

    def push(self, interface):
        raise NotImplementedError

    def fetch(self, interface):
        raise NotImplementedError

    # -- mesh/space accessors ---------------------------------------------
    def get_mesh(self):
        return getattr(self, "mesh", None)

    def get_tables(self):
        return getattr(self, "tables", None)

    @property
    def max_iters(self):
        return self.config.max_iters


class PlasmaSolver(Solver):
    """Adds the EM-coupling contract (reference: src/solver.hpp:121-144)."""

    def get_plasma_conductivity(self):
        raise NotImplementedError

    def evaluate_plasma_conductivity(self):
        raise NotImplementedError

    def get_joule_heating(self):
        raise NotImplementedError

    def set_joule_heating(self, qj):
        raise NotImplementedError


SOLVER_REGISTRY: dict = {}


def register_solver(name: str):
    def deco(cls):
        SOLVER_REGISTRY[name] = cls
        return cls

    return deco


def create_solver(name: str, config, tps=None) -> Solver:
    """Factory mirroring Tps::chooseSolver (reference: src/tps.cpp:247-278)."""
    if name not in SOLVER_REGISTRY:
        raise ValueError(
            f"unknown solver type '{name}'; known: {sorted(SOLVER_REGISTRY)}"
        )
    return SOLVER_REGISTRY[name](config, tps=tps)
