"""Compressible reacting Navier-Stokes DG solver (the M2ulPhyS analog).

Owns mesh + tables + physics models + BCs + the jit-compiled time loop.
Mirrors the reference solver's structure (reference: src/M2ulPhyS.cpp):
initialization builds static tables once; the step is a pure jitted
function; CFL timestep control uses dt = CFL * hmin / max_char_speed / dim
(reference: src/M2ulPhyS.cpp:2013-2016); NaN guards mirror Check_NAN
(reference: src/M2ulPhyS.cpp:2463-2525).
"""

from __future__ import annotations

import time as _time

import numpy as np

from ..config.run_config import RunConfiguration
from ..dg.bc import InletBC, OutletBC, WallBC
from ..dg.discretization import build_tables
from ..dg.fluxes import Fluxes
from ..dg.rhs import BCSlice, RHSContext, compute_rhs
from ..dg.riemann import Roe, Rusanov
from ..mesh import generators
from ..physics.gas import DryAir
from ..physics.transport import ConstantTransport, DryAirTransport
from ..time.integrators import get_integrator
from ..utils.cases import isentropic_vortex, taylor_green_2d, uniform_state
from .base import SOLVER_REGISTRY, PlasmaSolver, register_solver

STATUS_NORMAL = 0
STATUS_EARLY_EXIT = 10
STATUS_JOB_RESTART = 20


def _build_mesh(rc: RunConfiguration):
    """Mesh from the [mesh] generator section or a mesh file."""
    gen = rc.mesh_generator
    if gen:
        kind = gen.get("generator", "box2d")
        if kind == "box2d":
            return generators.box_2d(
                nx=int(gen.get("nx", 8)),
                ny=int(gen.get("ny", 8)),
                x0=float(gen.get("x0", 0.0)),
                x1=float(gen.get("x1", 1.0)),
                y0=float(gen.get("y0", 0.0)),
                y1=float(gen.get("y1", 1.0)),
                periodic_x=gen.get("periodic_x", "0") in ("1", "true", "True"),
                periodic_y=gen.get("periodic_y", "0") in ("1", "true", "True"),
            )
        if kind == "box2d_tri":
            # each quad split along its SW-NE diagonal, matching MFEM
            # Mesh::Make2D TRIANGLE (the beam_mesh -e 6 cell pattern)
            return generators.box_2d_tri(
                nx=int(gen.get("nx", 8)),
                ny=int(gen.get("ny", 8)),
                x0=float(gen.get("x0", 0.0)),
                x1=float(gen.get("x1", 1.0)),
                y0=float(gen.get("y0", 0.0)),
                y1=float(gen.get("y1", 1.0)),
                periodic_x=gen.get("periodic_x", "0") in ("1", "true", "True"),
                periodic_y=gen.get("periodic_y", "0") in ("1", "true", "True"),
            )
        if kind == "box3d":
            per = (
                gen.get("periodic_x", "0") in ("1", "true", "True"),
                gen.get("periodic_y", "0") in ("1", "true", "True"),
                gen.get("periodic_z", "0") in ("1", "true", "True"),
            )
            return generators.box_3d(
                nx=int(gen.get("nx", 8)),
                ny=int(gen.get("ny", 8)),
                nz=int(gen.get("nz", 8)),
                bounds=(
                    (float(gen.get("x0", 0.0)), float(gen.get("x1", 1.0))),
                    (float(gen.get("y0", 0.0)), float(gen.get("y1", 1.0))),
                    (float(gen.get("z0", 0.0)), float(gen.get("z1", 1.0))),
                ),
                periodic=per,
            )
        if kind in ("annulus2d", "annulus"):
            # curved O-grid around a cylinder (flow-past-cylinder cases;
            # inner circle attr 4, outer attr 2)
            return generators.annulus_2d(
                nr=int(gen.get("nr", 8)),
                ntheta=int(gen.get("ntheta", 32)),
                r0=float(gen.get("r0", 0.5)),
                r1=float(gen.get("r1", 10.0)),
                geom_order=int(gen.get("geom_order", 2)),
            )
        raise ValueError(f"unknown mesh generator '{kind}'")
    if rc.mesh:
        from ..mesh.mfem_reader import read_mfem_mesh

        mesh = read_mfem_mesh(rc.mesh)
        mesh = _apply_mesh_options(mesh, rc.raw)
        if rc.ref_length != 1.0:
            mesh = mesh.scaled(1.0 / rc.ref_length)
        return mesh
    raise ValueError("no mesh specified ([flow]/mesh or [mesh] generator)")


def _apply_mesh_options(mesh, raw):
    """Uniform refinement + ini-driven periodicity for file meshes
    (reference: [flow]/refinement_levels src/M2ulPhyS.cpp:350-357,2685 and
    [periodicity] src/M2ulPhyS.cpp:296-312,3806-3811).  Refinement is
    applied before gluing (equivalent for translation-periodic conforming
    meshes; the reference glues first because MFEM refines periodic meshes
    natively)."""
    if raw is None:
        return mesh
    ref_levels = int(raw.get("flow/refinement_levels", 0) or 0)
    if ref_levels > 0:
        from ..mesh.refine import refine_uniform

        mesh = refine_uniform(mesh, levels=ref_levels)
    if raw.get("periodicity/enablePeriodic", 0):
        import numpy as _np

        from ..mesh.mesh import make_periodic

        d = mesh.dim
        trans = []
        for ax, key in enumerate(("xTrans", "yTrans", "zTrans")[:d]):
            t = float(raw.get(f"periodicity/{key}", 1.0e12))
            vec = _np.zeros(d)
            vec[ax] = t
            trans.append(vec)
        mesh = make_periodic(mesh, trans)
    return mesh


class CompressibleSolver(PlasmaSolver):
    """Explicit DG compressible flow solver."""

    masa = None  # MasaHandler when [mms]/isEnabled
    # class-level defaults for services configured in
    # _initialize_state_and_loop, so subclasses that override initialize
    # (the mixed-mesh solver) degrade to "feature off" instead of
    # AttributeError in the shared solve loop
    _history = None
    _enable_paraview = False
    _plane = None
    _plane_spec = None

    def initialize(self):
        import jax
        import jax.numpy as jnp

        rc = self.config
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        self.mesh = getattr(self, "_premade_mesh", None)
        if self.mesh is None:
            self.mesh = _build_mesh(rc)
        basis = "gauss-legendre" if rc.basis_type == 0 else "gauss-lobatto"
        # flow/integrationRule selects the quadrature family (reference:
        # src/M2ulPhyS.cpp:557-561); framework extension keys
        # flow/faceQuadOrder / flow/volQuadOrder override the
        # reference-parity order formulas (documented TPU fast path)
        quad_rule = ("gauss-legendre" if rc.integration_rule == 0
                     else "gauss-lobatto")
        quad_kw = {"quad_rule": quad_rule}
        if rc.raw is not None:
            fqo = int(rc.raw.get("flow/faceQuadOrder", 0) or 0)
            vqo = int(rc.raw.get("flow/volQuadOrder", 0) or 0)
            if fqo > 0:
                quad_kw["face_quad_order"] = fqo
            if vqo > 0:
                quad_kw["vol_quad_order"] = vqo

        # domain decomposition: [mesh]/partitions N shards the element axis
        # over a jax device mesh (the reference's MPI mesh partitioning,
        # src/M2ulPhyS.cpp:329-365; here: stacked shard tables + shard_map)
        nparts = 1
        if rc.raw is not None:
            nparts = int(rc.raw.get("mesh/partitions", 1) or 1)
        self.nparts = max(nparts, 1)
        self._build = None
        if self.nparts > 1:
            from ..parallel.partition import (
                build_sharded_tables,
                coordinate_partition,
            )

            paxis = int(rc.raw.get("mesh/partition_axis", 0) or 0)
            part = coordinate_partition(self.mesh, self.nparts, axis=paxis)
            self._build = build_sharded_tables(
                self.mesh, order=rc.order, nparts=self.nparts,
                partition=part, basis=basis,
                axisymmetric=rc.axisymmetric, **quad_kw,
            )
            self.partition = self._build.partition
            self.tables_np = self._build.tables
            # unsharded tables retained for BC setup / IO / visualization
            self.viz_tables = self._build.global_tables
        else:
            self.tables_np = build_tables(
                self.mesh, order=rc.order, basis=basis,
                axisymmetric=rc.axisymmetric, **quad_kw,
            )
            self.viz_tables = self.tables_np

        # wall-distance tables ([flow]/computeDistance, reference:
        # src/M2ulPhyS.cpp:371-437 + 2686): distance to every wall patch
        # that is not inviscid, at solution dofs and face quadrature points
        if rc.raw is not None and rc.raw.get("flow/computeDistance", 0):
            from ..utils.wall_distance import (
                distance_to_points,
                wall_face_points,
            )

            wall_kinds = ("slip", "viscous_adiabatic", "viscous_isothermal",
                          "viscous_general")
            attrs = [b.patch for b in rc.bcs if b.kind in wall_kinds]
            wall_pts = wall_face_points(self.viz_tables, attrs)
            t = self.tables_np
            t.distance = distance_to_points(t.xyz_dof, wall_pts)
            t.f_dist = distance_to_points(t.f_xyz, wall_pts)
            if t.xyz_slot is not None:
                t.dist_slot = distance_to_points(t.xyz_slot, wall_pts)

        self.tables = self.tables_np.to_jax(self.dtype)

        dim = self.mesh.dim
        nvel = 3 if (rc.axisymmetric and dim == 2) else dim

        forcings = self._build_physics(dim, nvel)

        # boundary conditions: per-attr static slices over sorted bdr faces
        self.bc_slices = self._build_bcs()
        self._report_bc_patches()

        self.ctx = RHSContext(
            fluxes=self.fluxes,
            riemann=self.riemann,
            bcs=tuple(self.bc_slices),
            forcings=tuple(forcings),
            axis_name="dd" if self._build is not None else None,
        )
        self._initialize_state_and_loop()

    # ------------------------------------------------------------------
    def _build_physics(self, dim, nvel):
        """Mixture/transport/SGS/sponge/fluxes/Riemann + forcing list
        (shared by the single-type and mixed-mesh paths)."""
        import jax.numpy as jnp  # noqa: F401

        rc = self.config
        # physics models
        self.plasma = None
        forcings = []
        eq = rc.equation_system
        if rc.fluid == "dry_air":
            self.mixture = DryAir(dim=dim, nvel=nvel)
            if eq == "euler":
                transport = None
            elif rc.transport_model == "constant":
                raw = rc.raw
                transport = ConstantTransport(
                    visc=raw.get("plasma_models/transport_model/constant/viscosity", 0.0),
                    bulk_visc=raw.get("plasma_models/transport_model/constant/bulkViscosity", 0.0),
                    kappa=raw.get("plasma_models/transport_model/constant/thermalConductivity", 0.0),
                )
            else:
                transport = DryAirTransport(
                    gas_constant=self.mixture.gas_constant,
                    specific_heat_ratio=self.mixture.specific_heat_ratio,
                    visc_mult=rc.visc_mult,
                    bulk_visc_mult=rc.bulk_visc_mult,
                )
        elif rc.fluid == "user_defined":
            from ..dg.source_term import SourceTerm
            from ..physics.plasma_config import build_plasma

            self.plasma = build_plasma(rc.raw, dim, nvel)
            self.mixture = self.plasma.mixture
            transport = self.plasma.transport
            self._source_term = SourceTerm(
                mixture=self.mixture,
                transport=transport,
                chemistry=self.plasma.chemistry,
                radiation=self.plasma.radiation,
            )
            forcings.append(self._source_term)
            from ..dg.forcing import JouleHeating as _JouleHeatingForcing

            forcings.append(_JouleHeatingForcing(mixture=self.mixture))
        elif rc.fluid == "lte_table":
            # equilibrium table fluid ([flow]/lte/* tables, reference:
            # src/M2ulPhyS.cpp:164-260): single-species mixture with
            # table thermodynamics; source term = radiation sink, and the
            # sigma table supplies the EM-coupling plasma conductivity
            from ..dg.source_term import SourceTerm
            from ..physics.lte import load_lte_setup

            self.mixture, transport = load_lte_setup(rc.raw, dim, nvel)
            rmodel = rc.raw.get("plasma_models/radiation_model", "none")
            radiation = None
            if rmodel == "net_emission":
                from ..physics.plasma_config import read_table_input
                from ..physics.radiation import NetEmission

                radiation = NetEmission(
                    read_table_input(
                        rc.raw,
                        "plasma_models/radiation_model/net_emission/tabulated",
                    )
                )
            self._source_term = SourceTerm(
                mixture=self.mixture, transport=transport,
                chemistry=None, radiation=radiation,
            )
            forcings.append(self._source_term)
            from ..dg.forcing import JouleHeating as _JouleHeatingForcing

            forcings.append(_JouleHeatingForcing(mixture=self.mixture))
        else:
            raise NotImplementedError(f"fluid '{rc.fluid}' not yet available")

        # algebraic mixing-length RANS closure wrapping the molecular
        # transport ([flow]/useMixingLength, reference:
        # src/M2ulPhyS.cpp:2701-2707, src/mixing_length_transport.cpp)
        if transport is not None and rc.raw is not None and rc.raw.get(
            "flow/useMixingLength", 0
        ):
            from ..physics.transport import MixingLengthTransport

            transport = MixingLengthTransport(
                molecular=transport,
                max_mixing_length=rc.raw.get(
                    "flow/mixing-length/max-mixing-length", 0.0
                ),
                Prt=rc.raw.get("flow/mixing-length/Pr_ratio", 1.0),
                bulk_mult=rc.raw.get("flow/mixing-length/bulk-multiplier", 0.0),
            )
            if hasattr(self, "_source_term") and self._source_term is not None:
                from dataclasses import replace as _dc_replace

                self._source_term = _dc_replace(
                    self._source_term, transport=transport
                )
        self.transport = transport

        sgs = None
        if rc.sgs_model == "smagorinsky":
            from ..dg.sgs import Smagorinsky

            sgs = Smagorinsky(mixture=self.mixture,
                              const=rc.sgs_const or 0.12)
        elif rc.sgs_model == "sigma":
            from ..dg.sgs import Sigma

            sgs = Sigma(mixture=self.mixture, const=rc.sgs_const or 0.135)

        visc_sponge = None
        if rc.raw is not None and rc.raw.get(
            "viscosityMultiplierFunction/isEnabled", 0
        ):
            # planar viscous sponge (reference: src/M2ulPhyS.cpp:2789-2807)
            from ..dg.fluxes import PlanarViscousSponge

            visc_sponge = PlanarViscousSponge(
                point=tuple(rc.raw.get_vec("viscosityMultiplierFunction/point")),
                normal=tuple(rc.raw.get_vec("viscosityMultiplierFunction/normal")),
                width=rc.raw.get_required(
                    "viscosityMultiplierFunction/width", float
                ),
                ratio=rc.raw.get_required(
                    "viscosityMultiplierFunction/viscosityRatio", float
                ),
            )

        self.fluxes = Fluxes(
            mixture=self.mixture,
            transport=transport,
            eq_system=eq,
            axisymmetric=rc.axisymmetric,
            sgs_model=sgs,
            visc_sponge=visc_sponge,
        )
        if rc.use_roe and rc.axisymmetric:
            # the reference refuses this combination too (annulus.test:
            # "[ERROR]: Roe flux not supported for axisymmetric simulations")
            raise ValueError(
                "Roe flux not supported for axisymmetric simulations. "
                "Please use flow/useRoe = 0."
            )
        self.riemann = Roe(self.fluxes) if rc.use_roe else Rusanov(self.fluxes)

        if rc.axisymmetric:
            from ..dg.forcing import AxisymmetricSource

            forcings.append(
                AxisymmetricSource(mixture=self.mixture, fluxes=self.fluxes)
            )
        raw = rc.raw
        # imposed pressure gradient ([flow]/enablePressureForcing,
        # reference: src/M2ulPhyS.cpp:2681-2684)
        if raw is not None and raw.get("flow/enablePressureForcing", 0):
            from ..dg.forcing import ConstantPressureGradient as _CPG

            forcings.append(
                _CPG(mixture=self.mixture,
                     press_grad=tuple(raw.get_vec("flow/pressureGrad")))
            )
        # cylindrical volumetric heat sources ([heatSource] sections,
        # reference: src/M2ulPhyS.cpp:2751-2785)
        n_hs = raw.get("heatSource/numHeatSources", 0) if raw is not None else 0
        for s in range(1, n_hs + 1):
            base = f"heatSource{s}"
            if not raw.get(f"{base}/isEnabled", 0):
                continue
            dist = raw.get_required(f"{base}/distribution")
            if dist != "cylinder":
                raise ValueError(f"unknown heat source distribution '{dist}'")
            from ..dg.forcing import HeatSource as _HS

            forcings.append(
                _HS(
                    mixture=self.mixture,
                    value=raw.get_required(f"{base}/value", float),
                    point1=tuple(raw.get_vec(f"{base}/point1")),
                    point2=tuple(raw.get_vec(f"{base}/point2")),
                    radius=raw.get_required(f"{base}/radius", float),
                )
            )
        # sponge zones ([spongezone] sections,
        # reference: src/M2ulPhyS.cpp:3682-3760, src/forcing_terms.cpp:480-710)
        n_sz = (
            raw.get("spongezone/numSpongeZones", 0) if raw is not None else 0
        )
        for sz_i in range(1, n_sz + 1):
            base = f"spongezone{sz_i}"
            if raw.has(f"{base}/isEnabled") and not raw.get(
                f"{base}/isEnabled", 1
            ):
                continue
            forcings.append(self._build_sponge_zone(raw, base))
        # passive-scalar injection points ([passiveScalars] sections)
        if rc.raw is not None and rc.raw.get("passiveScalars/numScalars", 0):
            from ..dg.forcing import PassiveScalar as _PS

            n_ps = rc.raw.get("passiveScalars/numScalars", 0)
            for k in range(1, n_ps + 1):
                forcings.append(
                    _PS(
                        mixture=self.mixture,
                        xyz=tuple(rc.raw.get_vec(f"passiveScalar{k}/xyz")),
                        radius=rc.raw.get(f"passiveScalar{k}/radius", 0.1),
                        value=rc.raw.get(f"passiveScalar{k}/value", 1.0),
                    )
                )
        # manufactured-solution forcing ([mms], reference MASA handler:
        # src/masa_handler.cpp + MASA_forcings, src/forcing_terms.cpp:956-1012)
        self.masa = None
        if rc.use_mms:
            from ..utils.masa import MasaHandler

            overrides = {}
            if raw is not None:
                known = ("isEnabled", "name", "compare_rhs", "save_details")
                for k in raw.keys_under("mms"):
                    p = k.split("/", 1)[1]
                    if p not in known:
                        overrides[p] = raw.get(k, 0.0)
            self.masa = MasaHandler(
                rc.mms_name, self.mixture, self.fluxes, rc=rc,
                overrides=overrides,
            )
            if not rc.mms_compare_rhs:
                # with compare_rhs the forcing is excluded from the RHS
                # (reference: rhs_operator.cpp:454)
                forcings.append(self.masa.make_forcing())
        return forcings

    # ------------------------------------------------------------------
    def _build_sponge_zone(self, raw, base):
        """One [spongezoneN] section -> SpongeZone forcing (reference:
        src/M2ulPhyS.cpp:3682-3760)."""
        import numpy as np

        from ..dg.forcing import SpongeZone, sponge_target_conserved

        sz_type = raw.get(f"{base}/type", "none")
        if sz_type not in ("planar", "annulus"):
            raise ValueError(f"unknown sponge zone type '{sz_type}'")
        sol_type = raw.get_required(f"{base}/targetSolType")
        if sol_type not in ("userDef", "mixedOut"):
            raise ValueError(f"unknown sponge targetSolType '{sol_type}'")
        mix = self.mixture
        common = dict(
            mixture=mix,
            normal=tuple(raw.get_vec(f"{base}/normal", 3)),
            p0=tuple(raw.get_vec(f"{base}/p0", 3)),
            p_init=tuple(raw.get_vec(f"{base}/pInit", 3)),
            mult=raw.get(f"{base}/multiplier", 1.0),
            sz_type=sz_type,
            r1=raw.get(f"{base}/r1", 0.0),
            r2=raw.get(f"{base}/r2", 0.0),
        )
        if sol_type == "mixedOut":
            # dynamic plane-averaged target (reference: computeMixedOutValues,
            # src/forcing_terms.cpp:712-744)
            tol = raw.get(f"{base}/tolerance", 1e-5)
            tabs = getattr(self, "viz_tables", None)
            if tabs is not None:
                # the reference finds plane nodes once at construction
                # (src/forcing_terms.cpp:565-603); validate non-empty here
                # since a zero count silently yields a 0/0 target
                dim = mix.dim
                nrm = np.asarray(common["normal"][:dim], float)
                nrm = nrm / np.linalg.norm(nrm)
                xyz = np.asarray(tabs.xyz_dof).reshape(-1, dim)
                d_init = -np.einsum("nd,d->n", xyz - common["p_init"][:dim], nrm)
                if sz_type == "planar":
                    cnt = int(np.sum(np.abs(d_init) < tol))
                else:
                    rad = (xyz - common["p_init"][:dim]
                           + d_init[:, None] * nrm)
                    cnt = int(np.sum(
                        np.abs(np.linalg.norm(rad, axis=-1)
                               - common["r1"]) < tol))
                if cnt == 0:
                    raise ValueError(
                        f"[{base}] mixedOut: no dof nodes within tolerance "
                        f"{tol} of the sampling plane; raise "
                        f"{base}/tolerance (dof nodes are interior Gauss "
                        "points)"
                    )
            return SpongeZone(
                target_u=None,
                sol_type="mixedOut",
                tol=tol,
                fluxes=self.fluxes,
                axis_name="dd" if self._build is not None else None,
                **common,
            )
        rho = raw.get_required(f"{base}/density", float)
        vel = tuple(raw.get_vec(f"{base}/uvw", 3))
        pressure = raw.get_required(f"{base}/pressure", float)
        mass_fracs = []
        if mix.num_active_species > 0:
            i2m = self.plasma.input_to_mixture
            for sp in range(mix.num_active_species):
                inp_idx = int(np.where(i2m == sp)[0][0])
                mass_fracs.append(raw.get_required(
                    f"{base}/mass_fraction/species{inp_idx + 1}", float))
        single_t = False
        te = None
        if mix.two_temperature:
            single_t = bool(raw.get(f"{base}/single_temperature", 0))
            if not single_t:
                te = raw.get_required(f"{base}/electron_temperature", float)
        target = sponge_target_conserved(
            mix, rho, vel, pressure, tuple(mass_fracs), te, single_t
        )
        return SpongeZone(target_u=target, **common)

    # ------------------------------------------------------------------
    def _initialize_state_and_loop(self):
        """IC, jitted step, CFL/dt, IO, statistics (single-type path)."""
        import jax
        import jax.numpy as jnp

        rc = self.config
        dim = self.mesh.dim

        # initial condition
        self.U = self._initial_condition()
        self.time = 0.0
        self.iter = 0

        # CFL machinery
        self.hmin = float(np.min(self.tables_np.delta) * max(rc.order, 1))
        self._integrator = get_integrator(rc.integrator)

        # runtime fields injected into the jitted RHS (EM coupling etc.)
        self.fields = {}

        nact = self.mixture.num_active_species
        mix_ = self.mixture

        from ..dg.fused import maybe_build_fused
        from ..dg.rhs import advance_bc_states, init_bc_states

        # fused-minor-dim fast path on structured periodic meshes
        # (dg/fused.py); None when BCs/forcings/sharding/axisym are present.
        # On TPU the two-kernel Pallas megakernel (dg/pallas_fused.py,
        # all intermediates in VMEM) replaces it when its stricter
        # preconditions hold: measured 0.30 vs 1.44 ms/RHS on the 16^3
        # p=2 NS box (4.8x, PERF.md round 4).  TPS_PALLAS=0 opts out.
        self._fused = None
        self._fused_pallas = False
        if self._build is None:
            import os

            if (os.environ.get("TPS_PALLAS", "1") != "0"
                    and jax.default_backend() == "tpu"):
                from ..dg.pallas_fused import maybe_build_pallas_fused

                self._fused = maybe_build_pallas_fused(
                    self.tables_np, self.ctx, self.dtype
                )
                self._fused_pallas = self._fused is not None
            if self._fused is None:
                self._fused = maybe_build_fused(
                    self.tables_np, self.ctx, self.dtype
                )
        else:
            # element-sharded fused roll path (VERDICT r4 item 3c): when
            # the partition is contiguous grid slabs along roll axis 0,
            # each shard runs the fused path locally with ppermute seam
            # exchanges instead of falling back to the slot path
            from ..dg.fused import maybe_build_fused_sharded

            self._fused = maybe_build_fused_sharded(
                self._build.global_tables, self.ctx,
                self.partition, self.nparts, axis_name="dd",
                dtype=self.dtype,
            )

        def _substep2(tab_loc, U2, t, dt, fields, bc_states, shape3):
            """Fused-layout step body: U2 is [ne, ndof*neq] throughout
            (or the Pallas channel-major [nz, neq*ndof, ny*nx] carry).
            The RK axpy chain, the RHS head/tail, the species clip and the
            scan carry all stay on fused-minor buffers (PERF.md round 3)."""
            if self._fused_pallas:
                # pallas_fusable() guarantees no BCs/forcings and DryAir
                # (nact == 0): the step is purely integrator + kernels
                U2b, aux = self._integrator(self._fused, U2, t, dt)
                return U2b, bc_states, aux["max_char_speed"]
            if self._fused is not None:
                fr = self._fused
                rhs_f = (lambda u2, tt: fr(u2, tt, fields=fields)) \
                    if self.ctx.forcings else fr
                if getattr(fr, "axis_name", None) is not None:
                    # sharded fused roll path: advance the OWNED slab
                    # only (local rows are own-then-halo-then-padding;
                    # neighbors come from the other shards' owned rows
                    # via ppermute, so local halo rows are never read).
                    # Per-element field arrays (joule_heating, efield,
                    # extern rates) carry the full local row set — slice
                    # them to the owned slab so pointwise forcings see
                    # shapes matching the state
                    ne_own = fr.ne
                    if fields:
                        fo = {
                            k: (v[:ne_own]
                                if hasattr(v, "shape") and v.ndim >= 2
                                and v.shape[0] == U2.shape[0] else v)
                            for k, v in fields.items()
                        }
                        rhs_f = lambda u2, tt: fr(u2, tt, fields=fo)
                    U2o, aux = self._integrator(rhs_f, U2[:ne_own], t, dt)
                    U2b = U2.at[:ne_own].set(U2o)
                else:
                    U2b, aux = self._integrator(rhs_f, U2, t, dt)
            else:
                rhs = lambda u2, tt: compute_rhs(self.ctx, tab_loc, u2, tt,
                                                 fields=fields,
                                                 bc_states=bc_states,
                                                 fused_io=True)
                U2b, aux = self._integrator(rhs, U2, t, dt)
            if nact > 0:
                # clip species-density undershoots on the stored state
                # (reference: M2ulPhyS::Check_Undershoot, called each step)
                U3 = U2b.reshape(shape3)
                sp = U3[..., mix_.nvel + 2 : mix_.nvel + 2 + nact]
                U3 = U3.at[..., mix_.nvel + 2 : mix_.nvel + 2 + nact].set(
                    jnp.maximum(sp, 0.0)
                )
                U2b = U3.reshape(U2b.shape)
            bc2 = advance_bc_states(
                self.ctx, tab_loc, U2b.reshape(shape3), bc_states, dt
            )
            return U2b, bc2, aux["max_char_speed"]

        # carry <-> [ne, ndof, neq] conversion: the Pallas carry is the
        # megakernel's channel-major layout; everything else rides the
        # fused-minor [ne, ndof*neq]
        if self._fused_pallas:
            _to_carry = self._fused.to_fused
            _from_carry = lambda U2, shape3: self._fused.from_fused(U2)
        else:
            _to_carry = lambda U: U.reshape(U.shape[0], -1)
            _from_carry = lambda U2, shape3: U2.reshape(shape3)

        def _substep(tab_loc, U, t, dt, fields, bc_states):
            """Shared single-device / per-shard step body."""
            U2b, bc2, mcs = _substep2(
                tab_loc, _to_carry(U), t, dt, fields, bc_states,
                U.shape,
            )
            return _from_carry(U2b, U.shape), bc2, mcs

        # chunked stepping: scan nsub steps inside one jit so the per-step
        # python dispatch (~0.3-0.6 ms through the hosted-TPU tunnel) and
        # the jit entry/exit relayouts amortize.  dt updates INSIDE the
        # scan from each step's own wave speed (identical semantics to the
        # per-step loop: the next step uses the previous step's mcs).
        cfl_mode_ = not (rc.constant_dt or rc.dt_fixed > 0)
        cfl_hmin_ = rc.cfl * self.hmin
        dim_ = self.mesh.dim

        def _substep_n(tab_loc, U, t, dt, fields, bc_states, nsub):
            shape3 = U.shape

            def body(carry, _):
                U2c, bcc, tc, dtc = carry
                U2b, bc2, mcs = _substep2(tab_loc, U2c, tc, dtc, fields, bcc,
                                          shape3)
                t2 = tc + dtc
                # bitwise-identical to the per-step update in
                # _post_step_services: dt = cfl*hmin/mcs/dim
                dt2 = (cfl_hmin_ / mcs / dim_) if cfl_mode_ else dtc
                return (U2b, bc2, t2, dt2), mcs
            (U2f, bcf, tf, dtf), mcs_seq = jax.lax.scan(
                body, (_to_carry(U), bc_states, t, dt), None,
                length=nsub,
            )
            return _from_carry(U2f, shape3), bcf, tf, dtf, mcs_seq

        if self._build is None:
            self._init_bc_fn = jax.jit(
                lambda tab, U: init_bc_states(self.ctx, tab, U)
            )
            self._step = jax.jit(_substep)
            self._step_n = jax.jit(_substep_n, static_argnums=6)
        else:
            # SPMD: one shard_map program over the "dd" device-mesh axis
            # (reference: everything-under-MPI, src/tps.cpp:200-239)
            from functools import partial

            from jax.sharding import PartitionSpec as PS

            from ..parallel.sharding import (
                device_mesh,
                localize_tables,
                shard_map,
                tab_spec_tree,
            )

            self._jmesh = device_mesh(self.nparts, devices=rc.devices)
            specs = tab_spec_tree(self.tables, "dd")

            def _init_sm(tab_s, U_s):
                sts = init_bc_states(self.ctx, localize_tables(tab_s), U_s[0])
                return jax.tree.map(lambda a: a[None], sts)

            self._init_bc_fn = jax.jit(
                partial(
                    shard_map, mesh=self._jmesh,
                    in_specs=(specs, PS("dd")), out_specs=PS("dd"),
                )(_init_sm)
            )

            step_cache = {}

            def _make_step(field_keys):
                fspec = {k: PS("dd") for k in field_keys}

                @partial(
                    shard_map, mesh=self._jmesh,
                    in_specs=(specs, PS("dd"), PS(), PS(), fspec, PS("dd")),
                    out_specs=(PS("dd"), PS("dd"), PS()),
                )
                def _step_sm(tab_s, U_s, t, dt, fields, bc_states):
                    tl = localize_tables(tab_s)
                    fl = {k: v[0] for k, v in fields.items()}
                    bl = jax.tree.map(lambda a: a[0], bc_states)
                    U2, bc2, mcs = _substep(tl, U_s[0], t, dt, fl, bl)
                    return (U2[None], jax.tree.map(lambda a: a[None], bc2),
                            mcs)

                return jax.jit(_step_sm)

            def _step(tab, U, t, dt, fields, bc_states):
                key = tuple(sorted(fields))
                if key not in step_cache:
                    step_cache[key] = _make_step(key)
                return step_cache[key](tab, U, t, dt, fields, bc_states)

            self._step = _step

            def _make_step_n(field_keys, nsub):
                fspec = {k: PS("dd") for k in field_keys}

                @partial(
                    shard_map, mesh=self._jmesh,
                    in_specs=(specs, PS("dd"), PS(), PS(), fspec, PS("dd")),
                    out_specs=(PS("dd"), PS("dd"), PS(), PS(), PS()),
                )
                def _step_sm_n(tab_s, U_s, t, dt, fields, bc_states):
                    tl = localize_tables(tab_s)
                    fl = {k: v[0] for k, v in fields.items()}
                    bl = jax.tree.map(lambda a: a[0], bc_states)
                    Uf, bcf, tf, dtf, mcs = _substep_n(
                        tl, U_s[0], t, dt, fl, bl, nsub
                    )
                    return (Uf[None], jax.tree.map(lambda a: a[None], bcf),
                            tf, dtf, mcs)

                return jax.jit(_step_sm_n)

            def _step_n(tab, U, t, dt, fields, bc_states, nsub):
                key = (tuple(sorted(fields)), nsub)
                if key not in step_cache:
                    step_cache[key] = _make_step_n(key[0], nsub)
                return step_cache[key](tab, U, t, dt, fields, bc_states)

            self._step_n = _step_n

        self.bc_states = self._init_bc_fn(self.tables, self.U)

        own = (
            jnp.asarray(np.asarray(self.tables_np.own_mask), self.dtype)
            if self._build is not None else None
        )

        @jax.jit
        def _mcs(tab, U):
            m = self.mixture.max_char_speed(U)
            if own is not None:
                m = jnp.where(own[..., None] > 0.5, m, 0.0)
            return jnp.max(m)

        self._mcs_fn = _mcs
        self._own_mask = own

        # initial dt (reference: M2ulPhyS::initialTimeStep)
        if rc.dt_fixed > 0:
            self.dt = rc.dt_fixed
        else:
            mcs0 = float(self._mcs_fn(self.tables, self.U))
            self.dt = rc.cfl * self.hmin / mcs0 / dim

        self._wall0 = _time.perf_counter()
        # restart files are written every outputFreq unconditionally, as in
        # the reference (src/M2ulPhyS.cpp:1988,2041); enableRestart /
        # restartCycle only gate *reading* at startup (:1930-1946)
        self._io = None
        self._init_io()
        # the statistics engine must exist BEFORE read_restart so a
        # checkpoint's /meanSolution + /rmsData restore into it
        # (reference: restart read installs the averaged fields,
        # src/io.cpp:122-132)
        from ..io.averaging import Averaging

        self.averaging = Averaging(
            start_iter=rc.avg_start_iter,
            sample_interval=max(rc.avg_sample_interval, 1),
            enabled=rc.avg_enabled,
        )
        restart_from_lte = (
            rc.raw is not None and rc.raw.get("io/restartFromLTE", 0)
        )
        if restart_from_lte:
            # species + electron-energy datasets are not in an LTE
            # checkpoint: register them optional (reference:
            # registerIOVar(..., required=false), src/M2ulPhyS.cpp:1842-1853)
            from ..io.restart import _solver_field_names

            names = _solver_field_names(self)
            n_bulk = 1 + self.mixture.nvel + 1
            self._restart_optional_fields = frozenset(names[n_bulk:])
        if rc.enable_restart or rc.restart_cycle:
            self.read_restart()
        if restart_from_lte:
            self._init_species_from_lte()
            # write the converted non-equilibrium restart immediately
            # (reference: src/M2ulPhyS.cpp:1985-1991 "Writing
            # non-equilibrium restart files!")
            self.write_restart()

        # history file (reference: history.hist)
        from ..io.averaging import HistoryFile

        self._history = None
        if rc.raw is not None and rc.raw.get("io/enableHistory", 0):
            import os as _os

            _os.makedirs(rc.outdir, exist_ok=True)
            self._history = HistoryFile(_os.path.join(rc.outdir, "history.hist"))
        self._enable_paraview = bool(
            rc.raw.get("io/enableParaview", 0) if rc.raw is not None else 0
        )

        # [planeDump] plane-sampled field dumps every outputFreq
        # (reference: parsePlaneDump src/M2ulPhyS.cpp:2811-2832, dump at
        # :2052-2096 — gslib plane interpolation of the selected field to
        # ASCII; here the native Newton point-location interpolator)
        self._plane = None
        self._plane_spec = None
        if rc.raw is not None and rc.raw.get("planeDump/isEnabled", False):
            raw = rc.raw
            kinds = [k for k in ("conserved", "primitive", "mean", "reynolds")
                     if raw.get(f"planeDump/{k}", False)]
            if len(kinds) != 1:
                raise ValueError(
                    "planeDump: select exactly one of "
                    "conserved/primitive/mean/reynolds")
            self._plane_spec = {
                "normal": raw.get_vec("planeDump/norm", 3),
                "point": raw.get_vec("planeDump/point", 3),
                "samples": raw.get_required("planeDump/samples", int),
                "kind": kinds[0],
            }

    # ------------------------------------------------------------------
    def _build_bcs(self):
        rc = self.config
        if self._build is not None:
            # sharded: the attr blocks are padded to uniform per-shard
            # shapes, identical across shards (ShardedBuild.bc_attr_blocks)
            blocks = {a: (s, e) for (a, s, e) in self._build.bc_attr_blocks}
            slices = []
            covered = set()
            for spec in rc.bcs:
                if spec.patch not in blocks:
                    continue
                start, stop = blocks[spec.patch]
                slices.append(
                    BCSlice(bc=self._make_bc(spec), start=start, stop=stop)
                )
                covered.add(spec.patch)
            missing = sorted(set(blocks) - covered)
            if missing:
                raise ValueError(
                    f"no boundary condition for patch(es) {missing}"
                )
            slices.sort(key=lambda s: s.start)
            return slices
        attrs = np.asarray(self.tables_np.f_bdr_attr)
        slices = []
        covered = np.zeros(len(attrs), dtype=bool)
        for spec in rc.bcs:
            rows = np.where(attrs == spec.patch)[0]
            if len(rows) == 0:
                continue
            start, stop = int(rows.min()), int(rows.max()) + 1
            bc = self._make_bc(spec)
            slices.append(BCSlice(bc=bc, start=start, stop=stop))
            covered[start:stop] = True
        if len(attrs) and not covered.all():
            missing = sorted(set(int(a) for a in attrs[~covered]))
            raise ValueError(f"no boundary condition for patch(es) {missing}")
        slices.sort(key=lambda s: s.start)
        return slices

    def _make_bc(self, spec):
        kind = spec.kind
        p = spec.params

        def fget(key, default=None):
            if key in p:
                return float(str(p[key]).strip("'\""))
            return default

        if kind in ("inviscid", "slip", "viscous_adiabatic", "viscous_isothermal"):
            multi = (self.mixture.num_active_species > 0
                     or getattr(self.mixture, "two_temperature", False))
            if multi and kind == "viscous_isothermal":
                # multi-species VISC_ISOTH == VISC_GNRL with both thermal
                # conditions isothermal at Tw (Th == Te) and zero species
                # diffusion flux (reference: src/wallBC.cpp:96-112 — the
                # bcState/bcFlux it builds are exactly the general wall's)
                from ..dg.bc import GeneralWallBC

                Tw = fget("temperature", 300.0)
                return GeneralWallBC(heavy="isothermal",
                                     electron="isothermal",
                                     wall_temp=Tw, wall_temp_e=Tw)
            if multi and kind == "viscous_adiabatic":
                # VISC_ADIAB == general wall with zero heat fluxes (heavy
                # AND electron) + zero species flux (src/wallBC.cpp:86-95)
                from ..dg.bc import GeneralWallBC

                return GeneralWallBC(heavy="adiabatic",
                                     electron="adiabatic")
            return WallBC(kind=kind, wall_temp=fget("temperature", 300.0))
        if kind == "viscous_general":
            # reference: src/M2ulPhyS.cpp:3516-3585
            from ..dg.bc import GeneralWallBC

            Th = fget("temperature", 300.0)
            return GeneralWallBC(
                heavy=str(p.get("heavy_thermal_condition", "isothermal")),
                electron=str(p.get("electron_thermal_condition", "isothermal")),
                wall_temp=Th,
                wall_temp_e=fget("electron_temperature", Th),
            )
        if kind == "subsonic":
            rho = fget("density")
            uvw = [float(x) for x in str(p.get("uvw", "0 0 0")).strip().strip("'\"").split()]
            nvel = self.mixture.nvel
            state = (rho, *uvw[:nvel], *self._bc_mass_fractions(p))
            return InletBC(input_state=state)
        if kind in ("subsonicFaceBasedX", "subsonicFaceBasedY",
                    "subsonicFaceBasedZ"):
            from ..dg.bc import FaceInletBC

            uvw = [float(x) for x in str(p.get("uvw", "0 0 0")).strip().strip("'\"").split()]
            return FaceInletBC(
                input_state=(fget("density", 1.0), *uvw[:2]),
                tangent_axis={"X": 0, "Y": 1, "Z": 2}[kind[-1]],
            )
        if kind == "interpolate":
            # external-data inlet (reference: InletType INTERPOLATE +
            # GaussianInterpExtData); CSV plane interpolated onto the
            # patch's face quadrature points. Sharded runs interpolate in
            # every shard's own padded face order (stacked [P, nf, nqf],
            # selected by axis index at trace time) — the reference's
            # interpolated inlets are MPI-clean the same way
            # (src/inletBC.cpp interpInlet under domain decomposition).
            import jax.numpy as jnp

            from ..dg.bc import InterpolatedInletBC
            from ..interop.ext_data import gaussian_interp, read_inlet_plane

            src_xyz, T, vel, _ = read_inlet_plane(
                str(p.get("name", "inletPlane.csv")).strip("'\"")
            )

            def interp_at(xyz_f):
                nf, nqf, dimm = xyz_f.shape
                pts = xyz_f.reshape(-1, dimm)
                if dimm < 3:
                    pts = np.concatenate(
                        [pts, np.zeros((len(pts), 3 - dimm))], axis=1
                    )
                vals = gaussian_interp(
                    src_xyz, np.column_stack([vel, T]), pts)
                return (vals[:, 3].reshape(nf, nqf),
                        vals[:, :dimm].reshape(nf, nqf, dimm))

            if self._build is not None:
                # per-shard padded attr block rows (identical block coords
                # across shards; padding faces have zero weights)
                blocks = {a: (s, e)
                          for (a, s, e) in self._build.bc_attr_blocks}
                bstart, bstop = blocks[spec.patch]
                ts = self.tables_np  # stacked numpy tables
                nfi_pad = ts.nfi
                temps, vels = [], []
                for pp in range(self.nparts):
                    xyz_f = np.asarray(
                        ts.f_xyz[pp, nfi_pad + bstart: nfi_pad + bstop])
                    tv, vv = interp_at(xyz_f)
                    temps.append(tv)
                    vels.append(vv)
                temp_arr = jnp.asarray(np.stack(temps))
                vel_arr = jnp.asarray(np.stack(vels))
            else:
                tab = self.viz_tables
                sel = np.asarray(tab.f_bdr_attr) == spec.patch
                xyz_f = np.asarray(tab.f_xyz[tab.nfi:])[sel]
                tv, vv = interp_at(xyz_f)
                temp_arr = jnp.asarray(tv)
                vel_arr = jnp.asarray(vv)
            return InterpolatedInletBC(
                temperature=temp_arr,
                velocity=vel_arr,
                gas_constant=self.mixture.gas_constant,
                ramp_time=fget("rampTime", 0.0),
            )
        if kind in ("nonreflecting", "nonreflectingConstEntropy"):
            # time-integrated characteristic inlet (reference:
            # SUB_DENS_VEL_NR / SUB_VEL_CONST_ENT, src/inletBC.cpp:756+)
            from ..dg.bc import CharacteristicInletBC

            rho = fget("density", 1.0)
            uvw = [float(x) for x in str(p.get("uvw", "0 0 0")).strip().strip("'\"").split()]
            return CharacteristicInletBC(
                input_state=(rho, *uvw[: self.mixture.nvel]),
                ref_length=self.config.ref_length,
                const_entropy=(kind == "nonreflectingConstEntropy"),
            )
        if kind == "farfield":
            # characteristic far-field (O-grid outer boundary)
            from ..dg.bc import FarFieldBC

            rho = fget("density", 1.0)
            uvw = [float(x) for x in
                   str(p.get("uvw", "0 0 0")).strip().strip("'\"").split()]
            return FarFieldBC(
                input_state=(rho, *uvw[: self.mixture.nvel],
                             fget("pressure", 101325.0)))
        if kind == "subsonicPressure":
            return OutletBC(pressure=fget("pressure"))
        if kind in ("nonReflectingPressure", "nonreflectingPressure"):
            from ..dg.bc import CharacteristicOutletBC

            return CharacteristicOutletBC(kind="nonReflectingPressure",
                                          pressure=fget("pressure"),
                                          ref_length=self.config.ref_length)
        if kind in ("nonReflectingMassFlow", "nonReflectingPointBasedMassFlow"):
            from ..dg.bc import CharacteristicOutletBC

            return CharacteristicOutletBC(
                kind=kind, mass_flow=fget("massFlow"),
                area=fget("area", self._patch_area(spec)),
                ref_length=self.config.ref_length)
        raise NotImplementedError(f"boundary condition type '{kind}'")

    def _bc_mass_fractions(self, params):
        """Inlet species mass fractions (active species, mixture order)
        from boundaryConditions/<sec>/mass_fraction/speciesN keys — the
        reference requires these for multi-species inlets and uses only
        the active ones (src/M2ulPhyS.cpp:3629-3641)."""
        mix = self.mixture
        nact = getattr(mix, "num_active_species", 0)
        if nact == 0:
            return ()
        i2m = self.plasma.input_to_mixture
        ys = []
        for sp in range(nact):
            inp_idx = int(np.where(i2m == sp)[0][0])
            key = f"mass_fraction/species{inp_idx + 1}"
            if key not in params:
                raise ValueError(
                    f"multi-species inlet needs {key} (mass fraction of "
                    f"'{self.plasma.species_names[sp]}')"
                )
            ys.append(float(str(params[key]).strip("'\"")))
        return tuple(ys)

    _INLET_KINDS = ("subsonic", "subsonicFaceBasedX", "subsonicFaceBasedY",
                    "subsonicFaceBasedZ", "interpolate", "nonreflecting",
                    "nonreflectingConstEntropy")
    _OUTLET_KINDS = ("subsonicPressure", "nonReflectingPressure",
                     "nonreflectingPressure", "nonReflectingMassFlow",
                     "nonReflectingPointBasedMassFlow", "farfield")

    def _report_bc_patches(self):
        """Per-patch surface area / face-count report at BC init, matching
        the reference's inlet/outlet constructor logs (src/inletBC.cpp:311-312,
        src/outletBC.cpp:339-340 — checked verbatim by test/wedge.test)."""
        tab = self.viz_tables
        attrs = np.asarray(tab.f_bdr_attr)
        for spec in self.config.bcs:
            nfaces = int(np.count_nonzero(attrs == spec.patch))
            if spec.kind in self._INLET_KINDS:
                area = self._patch_area(spec)
                print(f"[INLET]: Total Surface Area                = "
                      f"{area:.5e}", flush=True)
                print(f"[INLET]: # of boundary faces               = "
                      f"{nfaces}", flush=True)
            elif spec.kind in self._OUTLET_KINDS:
                area = self._patch_area(spec)
                print(f"[OUTLET]: Total Surface Area                = "
                      f"{area:.5f}", flush=True)
                print(f"[OUTLET]: # of boundary faces               = "
                      f"{nfaces}", flush=True)

    def _patch_area(self, spec):
        """Quadrature area of a boundary patch (for mass-flow outlets)."""
        tab = self.viz_tables
        attrs = np.asarray(tab.f_bdr_attr)
        sel = attrs == spec.patch
        nrm = np.linalg.norm(np.asarray(tab.f_nor[tab.nfi :])[sel], axis=-1)
        return float(np.sum(np.asarray(tab.f_wts[tab.nfi :])[sel] * nrm))

    def _initial_condition(self):
        import jax.numpy as jnp

        rc = self.config
        mix = self.mixture
        xyz = self.tables.xyz_dof
        if self.masa is not None:
            # project the exact manufactured state (reference:
            # M2ulPhyS::projectExactSolution, src/M2ulPhyS.cpp:1925-1943;
            # nodal interpolation = MFEM ProjectCoefficient on L2 nodal)
            return self.masa.exact_U(xyz, 0.0)
        if rc.ic.case == "isentropic_vortex":
            return mix.conservatives(isentropic_vortex(xyz, 0.0, mix))
        if rc.ic.case == "taylor_green_2d":
            return mix.conservatives(taylor_green_2d(xyz, mix))
        rho = rc.ic.rho
        vel = [rc.ic.rhoU / rho, rc.ic.rhoV / rho, rc.ic.rhoW / rho]
        T = rc.ic.pressure / (mix.gas_constant * rho)
        Up = uniform_state(xyz, mix, rho, vel, T)
        if self.plasma is not None and self.plasma.initial_mass_fractions is not None:
            # species initial mass fractions -> number densities (mixture order)
            Y = self.plasma.initial_mass_fractions
            mw = np.asarray(mix.mw)
            na = mix.num_active_species
            for s in range(na):
                Up = Up.at[..., mix.nvel + 2 + s].set(Y[s] * rho / mw[s])
            # temperature consistent with total pressure: p = sum n_s R T
            import jax.numpy as jnp_

            n_sp = mix._n_sp_from_primitives(Up)
            from ..constants import UNIVERSAL_GAS_CONSTANT as _R

            T_adj = rc.ic.pressure / (_R * jnp_.sum(n_sp, axis=-1))
            Up = Up.at[..., mix.i_th].set(T_adj)
            if mix.two_temperature:
                Up = Up.at[..., mix.i_te].set(T_adj)
        return mix.conservatives(Up).astype(self.dtype)

    # ------------------------------------------------------------------
    def solve_step(self):
        """One time step + dt update + guards (reference: solveStep :2004)."""
        import jax.numpy as jnp

        rc = self.config
        U2, self.bc_states, mcs = self._step(
            self.tables, self.U, jnp.asarray(self.time, self.dtype),
            jnp.asarray(self.dt, self.dtype), self.fields, self.bc_states,
        )
        U_prev = self.U
        self.U = U2
        self.time += self.dt
        self.iter += 1

        if self._history is not None:
            dU = jnp.abs(U2 - U_prev)
            if self._own_mask is not None:
                m = self._own_mask[..., None, None]
                dUdt = np.asarray(
                    jnp.sum(dU * m, axis=tuple(range(dU.ndim - 1)))
                    / (jnp.sum(m) * dU.shape[-2]) / self.dt
                )
            else:
                dUdt = np.asarray(jnp.mean(dU, axis=(0, 1)) / self.dt)
            self._history.write(self.iter, self.time, dUdt)
        if self.averaging.enabled:
            self.averaging.add_sample(
                self.iter, self.mixture.primitives(self.U), self.mixture.nvel
            )

        self._post_step_services(mcs)

    def _restart_io_ready(self):
        return self._io is not None

    def _drain_mcs_queue(self, lag, force=None):
        """Read max-char-speed values whose async host copies are at least
        `lag` steps old; NaN-guard each and keep the newest for CFL.
        Entries are (iter_of_last_covered_step, scalar_or_[n]-vector) —
        chunked steps enqueue one vector per chunk.

        A blocking device->host read costs a full relay round trip
        (~24 ms on the hosted-TPU tunnel, PERF.md round 4), so entries
        past the lag are only materialized once their async copy has
        completed (`is_ready`) — the NaN guard trails by the copy
        latency instead of stalling the step pipeline.  `force=True`
        (checkpoint/teardown boundaries; implied by lag == 0) drains
        everything, blocking if needed."""
        q = getattr(self, "_mcs_queue", None)
        if not q:
            return
        if force is None:
            force = lag == 0
        while q and (self.iter - q[0][0] >= lag):
            ready = getattr(q[0][1], "is_ready", lambda: True)()
            if not (force or ready):
                break
            it0, m = q.pop(0)
            arr = np.asarray(m).ravel()
            if not np.all(np.isfinite(arr)):
                self.check_nan(verbose=True)
                bad = int(np.argmax(~np.isfinite(arr)))
                raise FloatingPointError(
                    f"NaN/Inf detected at iteration {it0 - len(arr) + 1 + bad} "
                    f"(reported at {self.iter}, t={float(self.time):.6e})"
                )
            self._last_mcs = float(arr[-1])

    def _chunk_size(self):
        """Steps safe to run inside one jitted scan before the next
        python-side service boundary (timing print, restart write, exit
        check, averaging sample).  Power-of-two sized to bound the number
        of compiled chunk variants."""
        rc = self.config
        if getattr(self, "_step_n", None) is None:
            return 1  # subclass without a chunked step (mixed-mesh solver)
        if getattr(self, "_chunk_disabled", False):
            return 1  # a chunk compile failed earlier; per-step fallback
        if self._history is not None:
            return 1  # per-step dU/dt diagnostics
        rem = self.max_iters - self.iter
        bounds = [rem]
        for freq in (rc.timing_freq, max(rc.exit_check_freq, 1)):
            bounds.append(freq - self.iter % freq)
        if self._restart_io_ready():
            bounds.append(rc.output_freq - self.iter % rc.output_freq)
        av = getattr(self, "averaging", None)
        if av is not None and av.enabled:
            if self.iter >= av.start_iter:
                return 1  # per-step running statistics
            bounds.append(av.start_iter - self.iter)
        n = min(bounds)
        chunk = 1
        while chunk * 2 <= min(n, 64):
            chunk *= 2
        return chunk

    def solve_chunk(self, n):
        """Run n time steps inside one jitted scan (dispatch-amortized
        production path; per-step semantics identical to solve_step with
        history/averaging off)."""
        import jax.numpy as jnp

        U, bc, t2, dt2, mcs_seq = self._step_n(
            self.tables, self.U, jnp.asarray(self.time, self.dtype),
            jnp.asarray(self.dt, self.dtype), self.fields, self.bc_states, n,
        )
        self.U = U
        self.bc_states = bc
        self.time = t2  # device scalars; materialized only at service cadence
        self.dt = dt2
        self.iter += n
        try:
            mcs_seq.copy_to_host_async()
        except AttributeError:
            pass
        if not hasattr(self, "_mcs_queue"):
            self._mcs_queue = []
        self._mcs_queue.append((self.iter, mcs_seq))
        self._post_chunk_services()

    def _post_chunk_services(self):
        """Service tail after a chunk: NaN guard drain, timing print,
        restart cadence, job management.  CFL dt was already updated
        inside the chunk scan."""
        rc = self.config
        lag = int(getattr(rc, "mcs_lag", 8))
        self._drain_mcs_queue(lag)
        if self.iter % rc.timing_freq == 0:
            wall = _time.perf_counter() - self._wall0
            print(
                f"time step: {self.iter}, physical time {float(self.time):.6e} s"
                f", wall {wall / rc.timing_freq:.4f} s/iter",
                flush=True,
            )
            self._wall0 = _time.perf_counter()
        if self._restart_io_ready() and self.iter % rc.output_freq == 0:
            self._drain_mcs_queue(0)
            with self.timers.section("io/restart"):
                self.write_restart()
        if self.iter % rc.output_freq == 0:
            with self.timers.section("io/planeDump"):
                self._plane_dump()
        if self.iter % max(rc.exit_check_freq, 1) == 0:
            self._job_management()

    def solve(self):
        """Chunk-aware solve loop (reference: M2ulPhyS::solve, the while
        loop at src/M2ulPhyS.cpp:2137-2177)."""
        self.solve_begin()
        while self.iter < self.max_iters and self.status == 0:
            n = self._chunk_size()
            if n > 1:
                it0 = self.iter
                try:
                    with self.timers.section("solve/chunk"):
                        self.solve_chunk(n)
                except FloatingPointError:
                    # NaN/divergence guard (or any numerical guard raised by
                    # the post-chunk services): a genuine runtime failure of
                    # the run, never a compile problem — propagate with its
                    # original diagnostic intact
                    raise
                except Exception as e:
                    if self.iter != it0:
                        # State was already advanced, so the jitted chunk
                        # compiled and ran: this is a runtime error from the
                        # service tail (restart write, job management, ...),
                        # not a compile failure.  Falling back to per-step
                        # would silently continue from a half-serviced state.
                        raise
                    # XLA compile failure on the scanned program (raises at
                    # the jitted call, before any state update): fall back
                    # permanently to per-step stepping
                    self._chunk_disabled = True
                    print(
                        "flow: chunked stepping unavailable "
                        f"({type(e).__name__}); falling back to per-step",
                        flush=True,
                    )
            else:
                with self.timers.section("solve/step"):
                    self.solve_step()
        self.solve_end()

    def _post_step_services(self, mcs):
        """Shared post-step tail: NaN guard, CFL dt, timing print, restart
        cadence, DIE-file / walltime job management (reference:
        src/M2ulPhyS.cpp:2004-2177).  Used by both the single-type and
        mixed-mesh solvers so the logic cannot drift.

        The max-char-speed scalar is fetched ASYNCHRONOUSLY with a small
        step lag: a synchronous per-step device round-trip costs ~26 ms
        through the hosted TPU tunnel while the async copy pipelines at
        ~1.5 ms (PERF.md).  The NaN guard still sees every step's value
        (a few steps late); CFL uses the newest arrived value — the
        reference's own dt also trails the state by one RK stage."""
        rc = self.config
        cfl_mode = not (rc.constant_dt or rc.dt_fixed > 0)
        lag = int(getattr(rc, "mcs_lag", 8))
        try:
            mcs.copy_to_host_async()
        except AttributeError:
            pass  # python float / numpy scalar (already host-side)
        if not hasattr(self, "_mcs_queue"):
            self._mcs_queue = []
        self._mcs_queue.append((self.iter, mcs))
        # NaN guard reads the async copies a few steps late (one
        # synchronous host round-trip costs ~26 ms through the hosted TPU
        # tunnel, PERF.md); checkpoints drain first so they never store NaN
        self._drain_mcs_queue(lag)

        if cfl_mode:
            # dt from THIS step's wave speed, computed as a DEVICE scalar:
            # deterministic across restarts (no async-queue dependence)
            # and no per-step host sync — the scalar is only materialized
            # on host at the timing print / checkpoint cadence
            self.dt = rc.cfl * self.hmin / mcs / self.mesh.dim

        if self.iter % rc.timing_freq == 0:
            wall = _time.perf_counter() - self._wall0
            print(
                f"time step: {self.iter}, physical time {self.time:.6e} s"
                f", wall {wall / rc.timing_freq:.4f} s/iter",
                flush=True,
            )
            self._wall0 = _time.perf_counter()
        if self._restart_io_ready() and self.iter % rc.output_freq == 0:
            # flush pending NaN guards first so a checkpoint can never
            # overwrite the last good state with NaN fields
            self._drain_mcs_queue(0)
            with self.timers.section("io/restart"):
                self.write_restart()
        if self.iter % rc.output_freq == 0:
            with self.timers.section("io/planeDump"):
                self._plane_dump()

        # job management (reference: Check_JobResubmit / DIE-file hooks,
        # src/M2ulPhyS.cpp:2160-2177)
        if self.iter % max(rc.exit_check_freq, 1) == 0:
            self._job_management()

    def _job_management(self):
        rc = self.config
        from ..utils.job_management import (
            STATUS_EARLY_EXIT,
            STATUS_JOB_RESTART,
            check_die_file,
            job_almost_done,
        )

        if check_die_file(rc.outdir):
            print("DIE file detected: exiting early", flush=True)
            self._drain_mcs_queue(0)
            if self._restart_io_ready():
                self.write_restart()
            self.status = STATUS_EARLY_EXIT
        elif rc.enable_auto_restart and job_almost_done(rc.rm_threshold):
            print("walltime threshold reached: checkpoint + resubmit",
                  flush=True)
            self._drain_mcs_queue(0)
            if not self._restart_io_ready():
                self._init_io()
            self.write_restart()
            self.status = STATUS_JOB_RESTART

    def solve_end(self):
        self._drain_mcs_queue(0)  # flush pending NaN guards
        if self._io is not None:
            self.write_restart()
        if self._enable_paraview:
            self.visualization()
        if self._history is not None:
            self._history.close()
        # per-function timing summary (reference: grvy_timer_summarize at
        # M2ulPhyS teardown, src/M2ulPhyS.cpp:1623,2146-2178)
        if getattr(self, "timers", None) is not None and self.timers._acc:
            self.timers.summarize()

    def _plane_dump(self):
        """Interpolate the configured field onto the sampling plane and
        write <outdir>/planeData/plane<iter>.txt (reference:
        src/M2ulPhyS.cpp:2052-2096)."""
        spec = self._plane_spec
        if spec is None:
            return
        import os as _os

        import jax.numpy as jnp

        rc = self.config
        if self._plane is None:
            from ..io.probes import PlaneDump

            lo = self.mesh.vertices.min(axis=0)
            hi = self.mesh.vertices.max(axis=0)
            basis = ("gauss-legendre" if rc.basis_type == 0
                     else "gauss-lobatto")
            self._plane = PlaneDump(
                self.mesh, rc.order, basis,
                spec["normal"], spec["point"], spec["samples"],
                extent=float(np.linalg.norm(np.asarray(hi) - np.asarray(lo))),
            )
        kind = spec["kind"]
        mix = self.mixture
        if kind == "conserved":
            field = np.asarray(self.state_global())
        elif kind == "primitive":
            field = np.asarray(
                mix.primitives(jnp.asarray(self.state_global())))
        elif kind == "mean":
            m = self.averaging.mean()
            if m is None:
                return
            field = self.field_global(np.asarray(m))
        else:  # reynolds
            r = self.averaging.reynolds_stresses(mix.nvel)
            if r is None:
                return
            field = self.field_global(np.asarray(r))
        path = _os.path.join(rc.outdir, "planeData",
                             f"plane{self.iter}.txt")
        self._plane.write(
            path, {kind: field},
            header_extra=f"iter {self.iter} t {float(self.time):.8e}")

    def visualization(self):
        """ParaView VTK dump of primitive fields (+ statistics if sampled);
        the reference's paraviewColl->Save() and `tps --visual` analog.

        With a [post-process/visualization] section configured, --visual
        instead postprocesses the archived snapshot SERIES (reference:
        M2ulPhyS::visualization, src/M2ulPhyS.cpp:4073-4154)."""
        pp = getattr(self.config, "postprocess", None)
        if pp is not None:
            return self.visualization_series(pp)
        return self._visualization_snapshot()

    def visualization_series(self, pp):
        """Re-read restart snapshots {prefix}-{iter:08d}.h5 for
        start_iter..end_iter step freq; per snapshot recompute the derived
        fields (primitives, pressure, velocity-gradient vorticity), NaN-
        check, report the MMS solution error when [mms] is enabled, emit a
        VTK file, and feed the running statistics (reference loop:
        src/M2ulPhyS.cpp:4083-4154 — restart_files_hdf5("read", fname),
        updateGradients, UpdatePressureGridFunction, Check_NAN,
        checkSolutionError, paraview save, average->addSample)."""
        import jax.numpy as jnp

        from ..io.restart import RestartIO

        io = self._io if self._restart_io_ready() else RestartIO(
            self.config, self)
        paths = []
        it = pp["start_iter"]
        while it <= pp["end_iter"]:
            fname = f"{pp['prefix']}-{it:08d}.h5"
            io.read(self, path=fname)
            if self.check_nan(verbose=True):
                raise FloatingPointError(
                    f"non-finite state in snapshot {fname}")
            if self.masa is not None:
                from ..utils.mms import l2_norm

                tabg = self.viz_tables
                Uex = self.masa.exact_U(
                    jnp.asarray(tabg.xyz_dof), self.time)
                err = float(l2_norm(
                    tabg, jnp.asarray(self.state_global()) - Uex))
                print(f"[visual] snapshot {it}: t={self.time:.6e} "
                      f"L2 solution error = {err:.8e}", flush=True)
            else:
                print(f"[visual] snapshot {it}: time step {self.iter}, "
                      f"physical time {self.time:.6e}s", flush=True)
            paths.append(self._visualization_snapshot(derived=True))
            if self.averaging.enabled:
                self.averaging.add_sample(
                    self.iter, self.mixture.primitives(self.U),
                    self.mixture.nvel)
            it += pp["freq"]
        return paths

    def _vorticity_global(self):
        """Velocity-gradient-derived vorticity magnitude at dofs (the
        gradient recompute of the reference's postprocess loop,
        src/M2ulPhyS.cpp:4107)."""
        import jax.numpy as jnp

        from ..dg.operators import dg_gradient

        mix = self.mixture
        tab = self.viz_tables
        Ug = jnp.asarray(self.state_global())
        Up = mix.primitives(Ug)
        gUp = dg_gradient(tab, Up)  # [ne, ndof, neq, dim]
        gu = gUp[..., 1:1 + mix.nvel, :]
        dim = tab.dim
        if dim == 2:
            w = gu[..., 1, 0] - gu[..., 0, 1]
            return np.asarray(jnp.abs(w))
        wx = gu[..., 2, 1] - gu[..., 1, 2]
        wy = gu[..., 0, 2] - gu[..., 2, 0]
        wz = gu[..., 1, 0] - gu[..., 0, 1]
        return np.asarray(jnp.sqrt(wx**2 + wy**2 + wz**2))

    def _visualization_snapshot(self, derived=False):
        """Single-state VTK conversion (shared by the plain --visual mode
        and each series snapshot)."""
        import os as _os

        from ..io.visualization import write_vtk_dg

        import jax.numpy as jnp

        mix = self.mixture
        Ug = jnp.asarray(self.state_global())
        Up = self.mixture.primitives(Ug)
        fields = {
            "density": np.asarray(Up[..., 0]),
            "velocity": np.asarray(Up[..., 1 : 1 + mix.nvel]),
            "temperature": np.asarray(Up[..., mix.i_th]),
            "pressure": np.asarray(mix.pressure(Ug)),
        }
        for s in range(mix.num_active_species):
            fields[f"species_{s}"] = np.asarray(Up[..., mix.nvel + 2 + s])
        if mix.two_temperature:
            fields["electron_temperature"] = np.asarray(Up[..., mix.i_te])
        if derived:
            fields["vorticity"] = self._vorticity_global()
        if self.averaging.n_samples:
            mean = self.averaging.mean()
            rey = self.averaging.reynolds_stresses(mix.nvel)
            if self._build is not None:
                from ..parallel.partition import gather_state

                mean = gather_state(self._build, mean)
                rey = gather_state(self._build, rey)
            fields["mean_velocity"] = np.asarray(mean)[..., 1 : 1 + mix.nvel]
            fields["reynolds_stress"] = np.asarray(rey)
        _os.makedirs(self.config.outdir, exist_ok=True)
        path = _os.path.join(
            self.config.outdir, f"solution_{self.iter:08d}.vtk"
        )
        write_vtk_dg(path, self.viz_tables, fields, mesh=self.mesh)
        return path

    def check_nan(self, verbose=False) -> int:
        """Count NaN entries (reference: Check_NaN_GPU :2509)."""
        bad = int(np.sum(~np.isfinite(np.asarray(self.U))))
        if verbose and bad:
            arr = np.asarray(self.U)
            el = np.argwhere(~np.isfinite(arr))[:10]
            print(f"found {bad} non-finite state entries; first: {el.tolist()}")
        return bad

    # ------------------------------------------------------------------
    def primitives(self):
        return self.mixture.primitives(self.U)

    def _init_species_from_lte(self):
        """Overwrite the state with the multi-level Saha/Boltzmann LTE
        equilibrium consistent with the checkpoint's bulk (rho, mom, rhoE)
        fields (reference: io/restartFromLTE +
        M2ulPhyS::initilizeSpeciesFromLTE, src/M2ulPhyS.cpp:2388-2470 +
        Check_Undershoot)."""
        import jax.numpy as jnp

        from ..physics.perfect_mixture import state_from_lte

        mix = self.mixture
        if getattr(mix, "num_active_species", 0) == 0:
            return
        # Newton in f64 where enabled (falls back to f32 on accelerators
        # without x64); the result is cast back to the solver dtype
        U = state_from_lte(mix, self.U.astype(jnp.float64))
        na = mix.num_active_species
        sp = U[..., mix.nvel + 2 : mix.nvel + 2 + na]
        U = U.at[..., mix.nvel + 2 : mix.nvel + 2 + na].set(
            jnp.maximum(sp, 0.0)
        )
        self.U = U.astype(self.dtype)

    def _init_io(self):
        from ..io.restart import RestartIO

        self._io = RestartIO(self.config, self)

    def write_restart(self):
        self._init_io() if self._io is None else None
        self._io.write(self)

    def read_restart(self):
        self._init_io() if self._io is None else None
        self._io.read(self)
        if getattr(self, "bc_states", None) and any(
            s is not None for s in self.bc_states
        ):
            # re-seed characteristic ghosts from the restored interior state
            # (the reference re-derives boundaryU the same way on restart)
            self.bc_states = self._init_bc_fn(self.tables, self.U)

    # -- global <-> sharded state views (used by restart / viz / interop) ---
    @property
    def ne_global(self):
        return self._build.ne_global if self._build is not None \
            else self.tables_np.ne

    def state_global(self):
        """Conserved state on the global element ordering [ne_g, ndof, neq]."""
        if self._build is None:
            return np.asarray(self.U)
        from ..parallel.partition import gather_state

        return gather_state(self._build, self.U)

    def set_state_global(self, Ug):
        import jax.numpy as jnp

        if self._build is None:
            self.U = jnp.asarray(Ug, self.dtype)
        else:
            from ..parallel.partition import scatter_state

            self.U = jnp.asarray(
                scatter_state(self._build, np.asarray(Ug)), self.dtype
            )

    def field_global(self, arr):
        """Any per-element field [ne(, shards), ndof, k] -> global ordering
        (same reassembly as state_global; used for restartable statistics)."""
        if self._build is None:
            return np.asarray(arr)
        from ..parallel.partition import gather_state

        return gather_state(self._build, arr)

    def field_to_shards(self, arr_g):
        """Global per-element field -> this run's shard layout."""
        if self._build is None:
            return np.asarray(arr_g)
        from ..parallel.partition import scatter_state

        return scatter_state(self._build, np.asarray(arr_g))

    # -- Boltzmann interface bus (reference: src/M2ulPhyS2Boltzmann.cpp) ----
    def init_interface(self, interface):
        from ..interop.boltzmann import compressible_init_interface

        compressible_init_interface(self, interface)

    def push(self, interface):
        from ..interop.boltzmann import compressible_push

        compressible_push(self, interface)

    def fetch(self, interface):
        from ..interop.boltzmann import compressible_fetch

        compressible_fetch(self, interface)

    # -- plasma-coupling contract (reference: src/solver.hpp:121-144) -------
    def evaluate_plasma_conductivity(self):
        """sigma at solution dofs [ne_global, ndof] (reference:
        M2ulPhyS::evaluatePlasmaConductivityGF, src/M2ulPhyS.cpp:4265).
        Reassembled to the global element ordering when sharded, so the
        coupling driver's cross-mesh interpolation is layout-agnostic."""
        import jax.numpy as jnp

        # the source term owns the conductivity evaluation for both the
        # multi-species (user_defined) and equilibrium-table (lte_table)
        # fluids; dry air has no conductivity
        if getattr(self, "_source_term", None) is None:
            return jnp.zeros((self.ne_global,) + self.U.shape[-2:-1],
                             dtype=self.dtype)
        Up = self.mixture.primitives(self.U)
        sig = self._source_term.plasma_conductivity(self.U, Up)
        if self._build is not None:
            from ..parallel.partition import gather_state

            sig = jnp.asarray(gather_state(self._build, sig[..., None])[..., 0])
        return sig

    def get_plasma_conductivity(self):
        return self.evaluate_plasma_conductivity()

    def get_joule_heating(self):
        import jax.numpy as jnp

        return self.fields.get(
            "joule_heating", jnp.zeros(self.U.shape[:-1], dtype=self.dtype)
        )

    def set_joule_heating(self, qj):
        """Joule heating at global solution dofs [ne_global, ndof];
        scattered to the shard layout when running decomposed."""
        import jax.numpy as jnp

        qj = np.asarray(qj)
        if self._build is not None and qj.shape[0] == self.ne_global:
            from ..parallel.partition import scatter_state

            qj = scatter_state(self._build, qj[..., None])[..., 0]
        self.fields["joule_heating"] = jnp.asarray(qj, self.dtype)

    def set_efield(self, e):
        """EM-solve E-field amplitude at global solution dofs [ne, ndof]
        (reference: interpElectricFieldFromEMToFlow feeding the efield
        GridFunction / Boltzmann bus,
        src/cycle_avg_joule_coupling.cpp:290-330).  Scattered to the shard
        layout when decomposed, matching every other per-dof field."""
        import jax.numpy as jnp

        e = np.asarray(e)
        if self._build is not None and e.shape[0] == self.ne_global:
            from ..parallel.partition import scatter_state

            e = scatter_state(self._build, e[..., None])[..., 0]
        self.efield = jnp.asarray(e, self.dtype)

    def get_efield(self):
        import jax.numpy as jnp

        return getattr(
            self, "efield",
            jnp.zeros(self.U.shape[:-1], dtype=self.dtype),
        )


def _flow_solver_factory(config, tps=None):
    """Solver factory for [solver]/type = flow: dispatches to the
    mixed-element solver when the mesh file holds tri+quad elements
    (reference: MFEM handles this transparently; here the mixed path is a
    separate bucketed implementation, dg/mixed.py)."""
    mesh = _build_mesh(config)
    from ..mesh.mixed import MixedMesh

    if isinstance(mesh, MixedMesh):
        from .compressible_mixed import MixedCompressibleSolver

        s = MixedCompressibleSolver(config, tps=tps)
    else:
        s = CompressibleSolver(config, tps=tps)
    s._premade_mesh = mesh
    return s


SOLVER_REGISTRY["flow"] = _flow_solver_factory
