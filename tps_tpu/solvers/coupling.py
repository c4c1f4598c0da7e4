"""EM <-> flow coupling drivers.

CycleAvgJouleCoupling (reference: src/cycle_avg_joule_coupling.cpp:49-555):
two meshes (flow + EM); every `solve_em_every_n` flow steps, evaluate the
plasma conductivity on the flow mesh, interpolate to the EM mesh, solve the
quasimagnetostatic system, rescale Joule heating toward a target power
(power control), and interpolate the heating (and E-field) back to the flow
mesh where it enters the energy equations as a forcing.

IndependentCoupling (reference: src/independent_coupling.cpp): runs the two
solvers with no data exchange.
"""

from __future__ import annotations

import numpy as np

from ..interop.interpolation import FieldInterpolator
from .base import Solver, create_solver, register_solver
from .em.qms import QuasiMagnetostaticSolverAxiSym


@register_solver("cycle-avg-joule-coupled")
class CycleAvgJouleCoupling(Solver):
    def __init__(self, config, tps=None, flow_solver=None, em_solver=None):
        super().__init__(config, tps)
        self._flow_in = flow_solver
        self._em_in = em_solver

    def initialize(self):
        inp = self.config.raw
        self.solve_em_every_n = inp.get("cycle-avg-joule-coupled/solve-em-every-n", 100)
        self.input_power = inp.get("cycle-avg-joule-coupled/input-power", -1.0)
        self.initial_input_power = inp.get(
            "cycle-avg-joule-coupled/initial-input-power", -1.0
        )
        self.fixed_conductivity = bool(
            inp.get("cycle-avg-joule-coupled/fixed-conductivity", 0)
        )
        # oscillating target power (reference :66-71)
        self.oscillating_power = bool(
            inp.get("cycle-avg-joule-coupled/oscillating-power", 0)
        )
        self.power_amplitude = inp.get(
            "cycle-avg-joule-coupled/input-power-amplitude", 0.0
        )
        self.power_period = inp.get(
            "cycle-avg-joule-coupled/input-power-period", 1.0
        )

        # plasma (flow) solver: compressible DG or low-Mach
        # (reference: cycle-avg-joule-coupled/plasma-solver :58-85)
        self.plasma_kind = inp.get(
            "cycle-avg-joule-coupled/plasma-solver", "compressible"
        )
        if self._flow_in is not None:
            self.flow = self._flow_in
        elif self.plasma_kind == "lomach":
            self.flow = create_solver("loMach", self.config, tps=self.tps)
            self.flow.initialize()
        else:
            self.flow = create_solver("flow", self.config, tps=self.tps)
            self.flow.initialize()

        axisym = bool(inp.get("cycle-avg-joule-coupled/axisymmetric", 1))
        if self._em_in is not None:
            self.em = self._em_in
        elif axisym:
            self.em = QuasiMagnetostaticSolverAxiSym(self.config, tps=self.tps)
            self.em.initialize()
        else:
            from .em.qms3d import _Em3dFromConfig

            self.em = _Em3dFromConfig(self.config, tps=self.tps)
            self.em.initialize()

        # plasma R/L diagnostics (reference: em/eval_Rplasma +
        # cycle_avg_joule_coupling.cpp:434-478)
        self.eval_rplasma = bool(inp.get("em/eval_Rplasma", 0)) or bool(
            inp.get("cycle-avg-joule-coupled/eval-Rplasma", 0)
        )
        self.plasma_resistance = None
        self.plasma_inductance = None

        self._build_interpolators()
        self.iter = 0
        self.time = 0.0

    def _build_interpolators(self):
        """Static cross-mesh interpolation tables (gslib analog;
        reference interpConductivityFromFlowToEM :185 etc.)."""
        em_tab = getattr(self.em, "h1tab", None) or self.em.tab
        em_pts = np.asarray(em_tab.xyz)
        self._em_h1tab = em_tab
        if self.plasma_kind == "lomach":
            # loMach: H1 nodal fields on the flow mesh
            self.flow_to_em = FieldInterpolator.build(
                self.flow.mesh, self.flow.tab.order, "gauss-lobatto", em_pts,
            )
            flow_pts = np.asarray(self.flow.tab.xyz)
        else:
            # compressible: DG dof fields
            self.flow_to_em = FieldInterpolator.build(
                self.flow.mesh, self.flow.config.order,
                "gauss-legendre" if self.flow.config.basis_type == 0 else "gauss-lobatto",
                em_pts,
            )
            # global (unsharded) dof coordinates: viz_tables == tables_np
            # single-device, and the retained global tables when decomposed
            flow_pts = np.asarray(self.flow.viz_tables.xyz_dof).reshape(
                -1, self.flow.mesh.dim
            )
        if em_pts.shape[1] != flow_pts.shape[1]:
            # axisymmetric flow (r, z) against a 3-D EM mesh: interpolate on
            # the (r, z) half-plane at y=0 / phi=0
            flow_pts = np.concatenate(
                [flow_pts, np.zeros((len(flow_pts), em_pts.shape[1]
                                     - flow_pts.shape[1]))], axis=1
            )
        self.em_to_flow = FieldInterpolator.build(
            self.em.mesh, getattr(em_tab, "order", 1), "gauss-lobatto",
            flow_pts,
        )

    @property
    def max_iters(self):
        return self.flow.max_iters

    def solve_step(self):
        self._maybe_em_update()
        self.flow.solve_step()
        self.iter = self.flow.iter
        self.time = self.flow.time

    def solve(self):
        """Chunk-aware coupled loop: the flow steps between EM solves run
        through the flow solver's chunked scan when it supports one
        (reference loop shape: CycleAvgJouleCoupling::solve,
        src/cycle_avg_joule_coupling.cpp:384-520; the EM cadence is
        unchanged — joule heating is constant between EM solves in the
        per-step path too)."""
        ev = max(self.solve_em_every_n, 1)
        can_chunk = hasattr(self.flow, "solve_chunk") and hasattr(
            self.flow, "_chunk_size"
        )
        while self.iter < self.max_iters and self.status == 0:
            self._maybe_em_update()
            target = min(self.iter + ev - self.iter % ev, self.max_iters)
            while self.flow.iter < target and self.status == 0:
                m = 1
                if can_chunk:
                    n = self.flow._chunk_size()
                    while m * 2 <= min(n, target - self.flow.iter):
                        m *= 2
                if m > 1:
                    self.flow.solve_chunk(m)
                else:
                    self.flow.solve_step()
                self.status = getattr(self.flow, "status", 0)
            self.iter = self.flow.iter
            self.time = self.flow.time
        self.solve_end()

    def _maybe_em_update(self):
        import jax.numpy as jnp

        if self.iter % self.solve_em_every_n == 0:
            # 1) sigma on flow mesh -> EM mesh
            if not self.fixed_conductivity or self.iter == 0:
                if self.plasma_kind == "lomach":
                    sigma = self.flow.thermo.plasma_conductivity()  # nodal
                    sigma_em = self.flow_to_em.from_h1(self.flow.tab, sigma)
                else:
                    sigma = self.flow.evaluate_plasma_conductivity()
                    sigma_em = self.flow_to_em.from_dg(sigma)
                self.em.set_plasma_conductivity(sigma_em)
            # 2) EM solve
            self.em.solve_step()
            tot_jh_raw = self.em.total_joule_heating()
            # per-EM-solve cost (reference prints hypre iterations per
            # solve; the gate's coupled metric carries these so the EM
            # cost has a regression guard, VERDICT r3 #9)
            ms = getattr(self.em, "last_solve_ms", None)
            its = getattr(self.em, "last_solve_iters", None)
            if ms is not None:
                self.em_solve_count = getattr(self, "em_solve_count", 0) + 1
                self.em_solve_ms_total = getattr(
                    self, "em_solve_ms_total", 0.0) + ms
                self.em_solve_iters_last = its
                print(
                    f"(cycle-avg-joule-coupled) EM solve: {its} Krylov"
                    f" iters, relres"
                    f" {getattr(self.em, 'last_solve_relres', 0.0):.3e},"
                    f" {ms:.1f} ms", flush=True,
                )
            print(
                f"(cycle-avg-joule-coupled) total input Joule heating ="
                f" {tot_jh_raw:.6e}", flush=True,
            )
            # plasma resistance/inductance report (reference
            # cycle_avg_joule_coupling.cpp:434-478): R = <S_J>/<I^2>,
            # L = 2 E_mag / <I^2>, with <I^2> = 2 Re(I_hat)^2
            if self.eval_rplasma and hasattr(self.em, "coil_current"):
                tot_I = self.em.coil_current()
                if tot_I > 0:
                    I2 = 2.0 * tot_I * tot_I
                    self.plasma_resistance = tot_jh_raw / I2
                    e_mag = self.em.magnetic_energy()
                    self.plasma_inductance = 2.0 * e_mag / I2
                    print(
                        f"  coil current amplitude = {2 * tot_I:.6e}\n"
                        f"  effective plasma resistance ="
                        f" {self.plasma_resistance:.6e}\n"
                        f"  magnetic field energy = {e_mag:.6e}\n"
                        f"  effective plasma inductance ="
                        f" {self.plasma_inductance:.6e}", flush=True,
                    )
            # 3) power control (reference :434-516), with optional
            #    sinusoidal modulation (oscillating-power)
            target = self.input_power
            if self.initial_input_power > 0 and self.iter == 0:
                target = self.initial_input_power
            if target > 0 and self.oscillating_power:
                target = target * (1.0 + self.power_amplitude * np.sin(
                    2.0 * np.pi * self.time / self.power_period
                ))
            efield_scale = 1.0
            if target > 0 and tot_jh_raw > 0:
                ratio = target / tot_jh_raw
                self.em.scale_joule_heating(ratio)
                # q_J ~ sigma |E|^2: keep the reported E consistent
                efield_scale = float(np.sqrt(max(ratio, 0.0)))
            # 4) Joule heating back to the flow solver
            qj_flow = self.em_to_flow.from_h1(
                self._em_h1tab, self._em_joule_nodal()
            )
            if self.plasma_kind == "lomach":
                self.flow.thermo.set_joule_heating(qj_flow)
            else:
                ne, ndof = self.flow.ne_global, self.flow.viz_tables.ndof
                self.flow.set_joule_heating(qj_flow.reshape(ne, ndof))
            # 5) E-field amplitude back to the flow solver / Boltzmann bus
            # (reference: interpElectricFieldFromEMToFlow,
            # cycle_avg_joule_coupling.cpp:290-330)
            if hasattr(self.em, "electric_field"):
                E_re, E_im = self.em.electric_field()
                Eamp = jnp.sqrt(E_re**2 + E_im**2) * efield_scale
                e_flow = self.em_to_flow.from_h1(self._em_h1tab, Eamp)
                if self.plasma_kind == "lomach":
                    self.flow.efield = jnp.asarray(e_flow)
                else:
                    ne, ndof = self.flow.ne_global, self.flow.viz_tables.ndof
                    self.flow.set_efield(e_flow.reshape(ne, ndof))

    def _em_joule_nodal(self):
        """Joule heating as an H1 nodal field on the EM mesh."""
        if hasattr(self.em, "joule_heating"):
            return self.em.joule_heating  # axisym solver: already nodal
        # 3-D H(curl) solver: project the quad-point field onto H1 nodes
        import jax.numpy as jnp

        from ..fem import h1 as h1m

        ht = self.em.h1tab
        q = self.em.joule_heating_q()
        w = ht.wq[None, :] * ht.detJ
        re = jnp.einsum("qd,nq->nd", ht.Bvol, w * q)
        return h1m.scatter_add(ht, re) / h1m.mass_lumped_diag(ht)

    def solve_end(self):
        self.flow.solve_end()


@register_solver("independent-coupled")
class IndependentCoupling(Solver):
    """Run flow and EM with no coupling (reference independent_coupling.cpp)."""

    def initialize(self):
        self.flow = create_solver("flow", self.config, tps=self.tps)
        self.flow.initialize()
        self.em = QuasiMagnetostaticSolverAxiSym(self.config, tps=self.tps)
        self.em.initialize()
        self.iter = 0

    @property
    def max_iters(self):
        return self.flow.max_iters

    def solve_step(self):
        if self.iter == 0:
            self.em.solve_step()
        self.flow.solve_step()
        self.iter = self.flow.iter
        self.time = self.flow.time

    def solve_end(self):
        # delegates the flow solver's teardown (flushes the deferred
        # async NaN guards, writes the final restart)
        self.flow.solve_end()
