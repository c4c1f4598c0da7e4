"""LoMachSolver: the low-Mach orchestrator (reference: src/loMach.cpp).

Owns the mesh + H1 space, builds the plug-in models from the ini input
([loMach] section; factory mirroring src/loMach.cpp:148-208), and sequences
each step extData -> thermoChem -> flow -> turbModel
(reference: solveStep :414-437) with BDF order ramping.
"""

from __future__ import annotations

import time as _time

import numpy as np

from ...fem import h1
from ...mesh import generators
from ..base import Solver, register_solver
from .base import (
    ConstantPropertyThermoChem,
    TemporalCoefficients,
    ZeroFlow,
    ZeroTurbModel,
)
from .thermo_chem import CaloricallyPerfectThermoChem, TemperatureDirichlet
from .tomboulides import Tomboulides, VelocityDirichlet
from .turb import AlgebraicSubgridModel


def _build_lomach_mesh(inp):
    """[mesh] generator extension or [loMach] mesh file + scale."""
    if inp.has("mesh/generator"):
        gen = inp.get("mesh/generator", "box2d")
        if gen == "box2d":
            return generators.box_2d(
                nx=inp.get("mesh/nx", 8), ny=inp.get("mesh/ny", 8),
                x1=inp.get("mesh/x1", 1.0), y1=inp.get("mesh/y1", 1.0),
                periodic_x=bool(inp.get("mesh/periodic_x", 0)),
                periodic_y=bool(inp.get("mesh/periodic_y", 0)),
            )
        if gen == "box3d":
            return generators.box_3d(
                nx=inp.get("mesh/nx", 8), ny=inp.get("mesh/ny", 8),
                nz=inp.get("mesh/nz", 8),
                bounds=((0.0, inp.get("mesh/x1", 1.0)),
                        (0.0, inp.get("mesh/y1", 1.0)),
                        (0.0, inp.get("mesh/z1", 1.0))),
                periodic=(bool(inp.get("mesh/periodic_x", 0)),
                          bool(inp.get("mesh/periodic_y", 0)),
                          bool(inp.get("mesh/periodic_z", 0))),
            )
        raise ValueError(f"unknown generator {gen}")
    path = inp.get_required("loMach/mesh")
    from ...mesh.mfem_reader import read_mesh

    mesh = read_mesh(path)
    scale = inp.get("loMach/scale-mesh", 1.0)
    if scale != 1.0:
        mesh = mesh.scaled(scale)
    return mesh


@register_solver("loMach")
class LoMachSolver(Solver):
    def initialize(self):
        import jax
        import jax.numpy as jnp

        inp = self.config.raw
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        self.mesh = _build_lomach_mesh(inp)
        order = inp.get("loMach/order", 1)
        self.tab = h1.build_h1(self.mesh, order=order).to_jax(self.dtype)

        self.dt = inp.get("time/dt_fixed", 1e-3)
        self.max_bdf_order = inp.get("time/bdfOrder", 3)
        self.max_iters_cfg = inp.get("loMach/maxIters", 10)
        self.output_freq = inp.get("loMach/outputFreq", 1000)
        cg_tol = inp.get("time/solverRelTolerance", 1e-12)
        cg_maxiter = inp.get("time/maxSolverIteration", 500)

        # boundary conditions
        vel_bcs, temp_bcs = [], []
        for sub in inp.sections_under("boundaryConditions"):
            base = f"boundaryConditions/{sub}"
            if not inp.has(f"{base}/patch"):
                continue
            patch = inp.get_required(f"{base}/patch", int)
            kind = inp.get(f"{base}/type", "viscous")
            if kind in ("viscous", "no-slip", "viscous_isothermal"):
                vel = inp.get_vec(f"{base}/velocity", default=[0.0] * self.mesh.dim)
                vel_bcs.append(VelocityDirichlet(attrs=(patch,), value=tuple(vel)))
                if inp.has(f"{base}/temperature"):
                    temp_bcs.append(
                        TemperatureDirichlet(
                            attrs=(patch,),
                            value=inp.get_required(f"{base}/temperature", float),
                        )
                    )
            elif kind == "inlet":
                vel = inp.get_vec(f"{base}/velocity", default=[0.0] * self.mesh.dim)
                vel_bcs.append(VelocityDirichlet(attrs=(patch,), value=tuple(vel)))
            # outlets: natural (do-nothing) boundary

        # thermo-chem model factory (reference: src/loMach.cpp:148-208)
        tc_model = inp.get("loMach/thermo-solver", "constant-property")
        if tc_model in ("calorically-perfect", "calorically_perfect"):
            self.thermo = CaloricallyPerfectThermoChem(
                self.tab,
                flow=None,  # wired below
                gas_constant=inp.get("loMach/calperfect/Rgas", 287.058),
                gamma=inp.get("loMach/calperfect/gamma", 1.4),
                p_thermo=inp.get("loMach/ambientPressure", 101325.0),
                closed_system=bool(inp.get("loMach/closedSystem", 0)),
                constant_mu=(
                    inp.get("loMach/calperfect/viscosity/mu", None, float)
                    if inp.get("loMach/calperfect/viscosity-model", "sutherland")
                    == "constant"
                    else None
                ),
                Pr=inp.get("loMach/calperfect/Prandtl", 0.71),
                temp_bcs=tuple(temp_bcs),
                T_init=inp.get("loMach/calperfect/ic/temperature", 300.0),
                cg_tol=cg_tol, cg_maxiter=cg_maxiter,
            )
        else:
            self.thermo = ConstantPropertyThermoChem(
                self.tab,
                rho=inp.get("loMach/constprop/rho", 1.0),
                mu=inp.get("loMach/constprop/mu", 1.0e-3),
            )

        # flow model factory
        flow_model = inp.get("loMach/flow-solver", "tomboulides")
        if flow_model == "tomboulides":
            self.flow = Tomboulides(
                self.tab, self.thermo, vel_bcs=tuple(vel_bcs),
                cg_tol=cg_tol, cg_maxiter=cg_maxiter,
            )
        elif flow_model == "zero-flow":
            self.flow = ZeroFlow(self.tab)
        else:
            raise ValueError(f"unknown flow solver '{flow_model}'")
        if hasattr(self.thermo, "flow"):
            self.thermo.flow = self.flow

        # turbulence model
        turb = inp.get("loMach/turb-model", "none")
        if turb in ("smagorinsky", "sigma"):
            self.turb = AlgebraicSubgridModel(self.tab, self.flow, model=turb)
            self.flow.turb = self.turb
        else:
            self.turb = ZeroTurbModel(self.tab)

        # initial condition
        ic = inp.get("loMach/tomboulides/ic", None)
        if ic == "tgv2d" and flow_model == "tomboulides":
            import jax.numpy as jnp

            x, y = self.tab.xyz[:, 0], self.tab.xyz[:, 1]
            u0 = jnp.stack([jnp.sin(x) * jnp.cos(y), -jnp.cos(x) * jnp.sin(y)], -1)
            self.flow.set_velocity(u0)

        self.time = 0.0
        self.iter = 0
        self._wall0 = _time.perf_counter()
        self._timers = {"thermoChem": 0.0, "flow": 0.0, "turb": 0.0}

    @property
    def max_iters(self):
        return self.max_iters_cfg

    def solve_step(self):
        """extData -> thermo -> flow -> turb (reference: loMach.cpp:414-437)."""
        coeff = TemporalCoefficients.bdf(min(self.iter + 1, self.max_bdf_order))
        t0 = _time.perf_counter()
        self.thermo.step(coeff, self.dt)
        t1 = _time.perf_counter()
        self.flow.step(coeff, self.dt)
        t2 = _time.perf_counter()
        self.turb.step(coeff, self.dt)
        t3 = _time.perf_counter()
        self._timers["thermoChem"] += t1 - t0
        self._timers["flow"] += t2 - t1
        self._timers["turb"] += t3 - t2
        self.time += self.dt
        self.iter += 1
        if self.iter % self.output_freq == 0:
            wall = _time.perf_counter() - self._wall0
            print(
                f"loMach step {self.iter} t={self.time:.6e} "
                f"wall/step={wall / self.output_freq:.4f}s "
                f"[thermo {self._timers['thermoChem']:.2f}s "
                f"flow {self._timers['flow']:.2f}s "
                f"turb {self._timers['turb']:.2f}s]",
                flush=True,
            )
            self._wall0 = _time.perf_counter()

    def print_timing(self):
        """Per-stage timing table (reference: loMach.cpp:442-480)."""
        total = sum(self._timers.values())
        print("loMach timing: " + ", ".join(
            f"{k}={v:.3f}s" for k, v in self._timers.items()
        ) + f", total={total:.3f}s")
