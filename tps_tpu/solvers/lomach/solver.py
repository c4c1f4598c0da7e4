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


def _build_lte_thermo(inp, tab, temp_bcs, cg_tol, cg_maxiter, weight_q=None,
                      qt_bcs=()):
    """LTE table thermo-chem from loMach/ltethermo/table-file
    (reference: src/lte_thermo_chem.cpp:83-145, dataset T_mu_kap_sig_R_Cp)."""
    import h5py

    from ...physics.plasma_config import read_table_input
    from ...physics.radiation import NetEmission
    from ...physics.tables import LinearTable
    from .lte_thermo import LteThermoChem

    table_file = inp.get_required("loMach/ltethermo/table-file")
    with h5py.File(table_file, "r") as f:
        data = np.asarray(f["T_mu_kap_sig_R_Cp"])
    T, mu, kap, sig, Rg, Cp = (data[:, i] for i in range(6))
    p0 = inp.get("loMach/ambientPressure", 101325.0)

    radiation = None
    if inp.get("plasma_models/radiation_model", "none") == "net_emission":
        radiation = NetEmission(
            read_table_input(
                inp, "plasma_models/radiation_model/net_emission/tabulated"
            )
        )

    return LteThermoChem(
        tab,
        flow=None,
        rho_table=LinearTable(x=T, f=p0 / (Rg * T)),
        cp_table=LinearTable(x=T, f=Cp),
        mu_table=LinearTable(x=T, f=mu),
        kappa_table=LinearTable(x=T, f=kap),
        sigma_table=LinearTable(x=T, f=sig),
        radiation=radiation,
        temp_bcs=tuple(temp_bcs),
        qt_bcs=qt_bcs,
        weight_q=weight_q,
        T_init=inp.get("initialConditions/temperature", 300.0),
        cg_tol=inp.get("loMach/ltethermo/linear-solver-rtol", cg_tol),
        cg_maxiter=inp.get("loMach/ltethermo/linear-solver-max-iter",
                           cg_maxiter),
    )


def _build_reacting_flow(inp, tab, temp_bcs, cg_tol, cg_maxiter, qt_bcs=(),
                         spec_bcs=()):
    """Finite-rate reacting thermo-chem from the [species]/[reactions] ini
    schema (reference: src/reactingFlow.cpp input parsing; same schema as
    the compressible plasma path, kept in input species order)."""
    from ...physics.chemistry import Arrhenius, Chemistry, HoffertLien, TabulatedRate
    from ...physics.plasma_config import _parse_composition, read_table_input
    from .reacting_flow import ReactingFlow

    # full plasma tier: when a molecular transport model is configured and
    # the species set contains an electron, reuse the shared plasma stack
    # (mixture/transport/chemistry/radiation) the compressible path uses
    # (reference: ReactingFlow's own parsing mirrors M2ulPhyS's,
    # src/reactingFlow.cpp:180-300)
    has_electron = any(
        inp.get(f"species/species{s}/name", "") == "E"
        for s in range(1, inp.get("species/numSpecies", 0) + 1)
    )
    transport_model = inp.get("plasma_models/transport_model", "")
    if has_electron and transport_model:
        from ...physics.plasma_config import build_plasma

        pl = build_plasma(inp, tab.dim, tab.dim)
        return ReactingFlow(
            tab,
            flow=None,
            species_names=pl.species_names,
            mixture=pl.mixture,
            transport=pl.transport,
            chemistry=pl.chemistry,
            radiation=pl.radiation,
            p_thermo=inp.get("loMach/ambientPressure", 101325.0),
            closed_system=not bool(inp.get("loMach/openSystem", 0)),
            n_substeps=inp.get("loMach/reacting/sub-steps", 4),
            operator_split=bool(inp.get("loMach/reacting/operator-split", 1)),
            temp_bcs=tuple(temp_bcs),
            qt_bcs=qt_bcs,
            spec_bcs=spec_bcs,
            T_init=inp.get("initialConditions/temperature", 300.0),
            Y_init=pl.initial_mass_fractions,
            const_plasma_conductivity=inp.get(
                "plasma_models/const_plasma_conductivity", 0.0
            ),
            cg_tol=cg_tol,
            cg_maxiter=cg_maxiter,
            chemistry_base=pl.chemistry_base,
            ramp_start=inp.get("loMach/reactingFlow/ramp-chem/ramp_start",
                               -1.0),
            ramp_time=inp.get("loMach/reactingFlow/ramp-chem/ramp_time",
                              -1.0),
        )

    atoms = {}
    for a in range(1, inp.get("atoms/numAtoms", 0) + 1):
        atoms[inp.get_required(f"atoms/atom{a}/name")] = inp.get_required(
            f"atoms/atom{a}/mass", float
        )
    nsp = inp.get_required("species/numSpecies", int)
    names, mws, hf, cv, imf = [], [], [], [], []
    for s in range(1, nsp + 1):
        base = f"species/species{s}"
        names.append(inp.get_required(f"{base}/name"))
        comp = _parse_composition(inp.get(f"{base}/composition", "{}"))
        mws.append(sum(atoms[a] * c for a, c in comp.items()))
        hf.append(inp.get(f"{base}/formation_energy", 0.0))
        cv.append(inp.get(f"{base}/perfect_mixture/constant_molar_cv", 2.5))
        imf.append(inp.get(f"{base}/initialMassFraction", 0.0))

    class _Facade:
        mw = tuple(mws)
        num_species = nsp
        i_electron = names.index("E") if "E" in names else -1

    chemistry = None
    n_react = inp.get("reactions/numberOfReactions", 0)
    if n_react > 0:
        r_st = np.zeros((n_react, nsp))
        p_st = np.zeros((n_react, nsp))
        models, energies, balances, eq_params = [], [], [], []
        for r in range(1, n_react + 1):
            base = f"reactions/reaction{r}"
            r_st[r - 1] = inp.get_vec(f"{base}/reactant_stoichiometry", nsp)
            p_st[r - 1] = inp.get_vec(f"{base}/product_stoichiometry", nsp)
            energies.append(inp.get(f"{base}/reaction_energy", 0.0))
            model = inp.get(f"{base}/model", "arrhenius")
            if model == "arrhenius":
                models.append(Arrhenius(
                    A=inp.get_required(f"{base}/arrhenius/A", float),
                    b=inp.get_required(f"{base}/arrhenius/b", float),
                    E=inp.get_required(f"{base}/arrhenius/E", float),
                ))
            elif model == "hoffert_lien":
                models.append(HoffertLien(
                    A=inp.get_required(f"{base}/hoffert_lien/A", float),
                    b=inp.get_required(f"{base}/hoffert_lien/b", float),
                    E=inp.get_required(f"{base}/hoffert_lien/E", float),
                ))
            elif model == "tabulated":
                models.append(TabulatedRate(read_table_input(inp, f"{base}/tabulated")))
            else:
                raise NotImplementedError(f"reaction model '{model}'")
            db = bool(inp.get(f"{base}/detailed_balance", 0))
            balances.append(db)
            eq_params.append(
                (
                    inp.get_required(f"{base}/equilibrium_constant/A", float),
                    inp.get_required(f"{base}/equilibrium_constant/b", float),
                    inp.get_required(f"{base}/equilibrium_constant/E", float),
                ) if db else (0.0, 0.0, 0.0)
            )
        chemistry = Chemistry(
            mixture=_Facade(),
            reactant_stoich=r_st,
            product_stoich=p_st,
            models=tuple(models),
            reaction_energies=tuple(energies),
            detailed_balance=tuple(balances),
            equilibrium_params=tuple(eq_params),
            min_temperature=inp.get("reactions/minimumTemperature", 0.0),
        )

    return ReactingFlow(
        tab,
        flow=None,
        species_names=names,
        mw=tuple(mws),
        molar_cv_over_R=tuple(cv),
        formation_energy=tuple(hf),
        chemistry=chemistry,
        p_thermo=inp.get("loMach/ambientPressure", 101325.0),
        closed_system=not bool(inp.get("loMach/openSystem", 0)),
        n_substeps=inp.get("loMach/reacting/sub-steps", 4),
        temp_bcs=tuple(temp_bcs),
        qt_bcs=qt_bcs,
        spec_bcs=spec_bcs,
        T_init=inp.get("initialConditions/temperature", 300.0),
        Y_init=np.asarray(imf),
        cg_tol=cg_tol,
        cg_maxiter=cg_maxiter,
    )


@register_solver("loMach")
class LoMachSolver(Solver):
    def initialize(self):
        import jax
        import jax.numpy as jnp

        inp = self.config.raw
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        self.mesh = _build_lomach_mesh(inp)
        order = inp.get("loMach/order", 1)
        # [mesh]/partitions N: element-sharded H1 assembly over a device
        # mesh (replicated dof vectors, psum-assembled operators — the
        # loMach analog of the reference's everything-under-MPI model,
        # src/loMach.cpp:447)
        self.nparts = max(int(inp.get("mesh/partitions", 1) or 1), 1)
        tab_np = h1.build_h1(self.mesh, order=order)
        if self.nparts > 1:
            # axisymmetric runs shard like planar ones: the radius weight is
            # per-element quad data, stacked per shard (h1.as_coef) exactly
            # like any other coefficient (reference: axisym tomboulides runs
            # under MPI like everything else, src/loMach.cpp:447)
            self.tab = h1.ShardedH1(tab_np, self.nparts, self.dtype,
                                    devices=self.config.devices)
        else:
            self.tab = tab_np.to_jax(self.dtype)

        self.dt = inp.get("time/dt_fixed", 1e-3)
        self.max_bdf_order = inp.get("time/bdfOrder", 3)
        self.max_iters_cfg = inp.get("loMach/maxIters", 10)
        self.output_freq = inp.get("loMach/outputFreq", 1000)
        cg_tol = inp.get("time/solverRelTolerance", 1e-12)
        cg_maxiter = inp.get("time/maxSolverIteration", 500)
        # flow (Tomboulides) solves have their own tolerance ladder with a
        # looser default (reference: tomboulides.hpp:149 default_rtol_
        # 1e-10, overridable via loMach/tomboulides/psolve-rtol; the
        # [time]/solverRelTolerance key governs the thermo-side solves)
        flow_tol = inp.get(
            "loMach/tomboulides/psolve-rtol",
            inp.get("loMach/rtol", 1e-10),
        )

        # boundary conditions
        vel_bcs, temp_bcs, ext_specs, pres_bcs = [], [], [], []
        inlet_info = []  # (patch, kind, base) for turbulence-model BCs
        qt_attrs = []  # isothermal-wall patches: Qt = 0 Dirichlet there
        for sub in inp.sections_under("boundaryConditions"):
            base = f"boundaryConditions/{sub}"
            if not inp.has(f"{base}/patch"):
                continue
            patch = inp.get_required(f"{base}/patch", int)
            kind = inp.get(f"{base}/type", "viscous")
            # temperature Dirichlet applies to walls AND inlets (reference:
            # thermoChem AddTempDirichletBC for both wall and inlet patches,
            # src/calorifically-perfect + reactingFlow BC registration)
            if kind != "outlet" and inp.has(f"{base}/temperature"):
                temp_bcs.append(
                    TemperatureDirichlet(
                        attrs=(patch,),
                        value=inp.get_required(f"{base}/temperature", float),
                    )
                )
            if kind in ("viscous", "no-slip", "viscous_isothermal"):
                vel = inp.get_vec(f"{base}/velocity", default=[0.0] * self.mesh.dim)
                vel_bcs.append(VelocityDirichlet(attrs=(patch,), value=tuple(vel)))
                if inp.has(f"{base}/temperature"):
                    # Qt = 0 at isothermal walls (reference:
                    # AddQtDirichletBC, src/calorically_perfect.cpp:422)
                    qt_attrs.append(patch)
            elif kind == "inlet":
                vel = inp.get_vec(f"{base}/velocity", default=[0.0] * self.mesh.dim)
                vel_bcs.append(VelocityDirichlet(
                    attrs=(patch,), value=tuple(vel),
                    ramp_time=inp.get(f"{base}/rampTime", 0.0),
                ))
                inlet_info.append((patch, "uniform", base))
            elif kind in ("outlet", "pressure"):
                # pressure Dirichlet outlet (reference: pres_dbcs_,
                # src/tomboulides.cpp:1865-1870)
                from .tomboulides import PressureDirichlet

                pres_bcs.append(PressureDirichlet(
                    attrs=(patch,),
                    value=inp.get(f"{base}/pressure", 0.0),
                ))
            elif kind == "interpolate":
                # external-data inlet (reference: GaussianInterpExtData)
                vel_bcs.append(
                    VelocityDirichlet(attrs=(patch,),
                                      value=(0.0,) * self.mesh.dim)
                )
                ext_specs.append((
                    patch,
                    inp.get(f"{base}/name", "inletPlane.csv"),
                    inp.get(f"{base}/rampSteps", 1),
                ))
                inlet_info.append((patch, "interpolate", base))
            # outlets: natural (do-nothing) boundary

        # geometric sponge (reference: src/geometricSponge.cpp ini keys
        # spongeMultiplier/*)
        self.sponge = None
        if any(
            inp.get(f"spongeMultiplier/{k}", 0)
            for k in ("uniform", "plane", "cylinder", "annulus")
        ):
            from .sponge import (
                AnnulusSponge,
                CylinderSponge,
                GeometricSponge,
                PlaneSponge,
            )

            plane = cylinder = annulus = None
            uniform_mult = (
                inp.get("spongeMultiplier/uniformMult", 1.0)
                if inp.get("spongeMultiplier/uniform", 0) else None
            )
            if inp.get("spongeMultiplier/plane", 0):
                plane = PlaneSponge(
                    point=tuple(inp.get_vec("spongeMultiplier/planePoint")),
                    normal=tuple(inp.get_vec("spongeMultiplier/planeNormal")),
                    width=inp.get("spongeMultiplier/planeWidth", 1e-8),
                    mult=inp.get("spongeMultiplier/planeMult", 1.0),
                )
            if inp.get("spongeMultiplier/cylinder", 0):
                cylinder = CylinderSponge(
                    radius_x=inp.get("spongeMultiplier/cylinderRadiusX", -1.0),
                    radius_y=inp.get("spongeMultiplier/cylinderRadiusY", -1.0),
                    radius_z=inp.get("spongeMultiplier/cylinderRadiusZ", -1.0),
                    width=inp.get("spongeMultiplier/cylinderWidth", 1e-8),
                    mult=inp.get("spongeMultiplier/cylinderMult", 1.0),
                )
            if inp.get("spongeMultiplier/annulus", 0):
                annulus = AnnulusSponge(
                    point=tuple(
                        inp.get_vec("spongeMultiplier/annulusPoint",
                                    default=[0.0, 0.0, 0.0])
                    ),
                    radius_y=inp.get("spongeMultiplier/annulusRadiusY", -1.0),
                    width=inp.get("spongeMultiplier/annulusWidth", 1e-8),
                    mult=inp.get("spongeMultiplier/annulusMult", 1.0),
                )
            self.sponge = GeometricSponge(
                self.tab, uniform_mult=uniform_mult, plane=plane,
                cylinder=cylinder, annulus=annulus,
            )

        # thermo-chem model factory (reference: src/loMach.cpp:148-208)
        axisym = bool(inp.get("loMach/axisymmetric", 0))
        weight_q = self.tab.xyz_q[..., 0] if axisym else None
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
                qt_bcs=(tuple(qt_attrs),) if qt_attrs else (),
                T_init=inp.get("loMach/calperfect/ic/temperature", 300.0),
                sponge=self.sponge, weight_q=weight_q,
                sw_stab=bool(
                    inp.get("loMach/calperfect/streamwise-stabilization", 0)
                ),
                reh_factor=inp.get("loMach/calperfect/Reh_factor", 0.5),
                reh_offset=inp.get("loMach/calperfect/Reh_offset", 1.0),
                cg_tol=cg_tol, cg_maxiter=cg_maxiter,
            )
        elif tc_model == "lte-thermo-chem":
            self.thermo = _build_lte_thermo(
                inp, self.tab, temp_bcs, cg_tol, cg_maxiter,
                weight_q=weight_q,
                qt_bcs=(tuple(qt_attrs),) if qt_attrs else (),
            )
        elif tc_model == "reacting-flow":
            # species Dirichlet BCs (reference defaults: zero-Neumann at
            # both inlets and walls, Dirichlet opt-in via
            # loMach/reactingFlow/neumann-species-* = 0,
            # src/reactingFlow.cpp:790-792). Inlet composition comes from
            # the inlet block's speciesMassFractions (zero active species
            # — pure background — when absent, matching the reference's
            # AddSpecDirichletBC(0.0, inlet_attr)).
            spec_bcs = []
            if not bool(inp.get(
                    "loMach/reactingFlow/neumann-species-inlet", 1)):
                for (patch, _ikind, base) in inlet_info:
                    vals = (inp.get_vec(f"{base}/speciesMassFractions")
                            if inp.has(f"{base}/speciesMassFractions")
                            else None)
                    spec_bcs.append(((patch,), vals))
            if not bool(inp.get(
                    "loMach/reactingFlow/neumann-species-wall", 1)):
                for patch in qt_attrs:
                    spec_bcs.append(((patch,), None))
            self.thermo = _build_reacting_flow(
                inp, self.tab, temp_bcs, cg_tol, cg_maxiter,
                qt_bcs=(tuple(qt_attrs),) if qt_attrs else (),
                spec_bcs=tuple(spec_bcs),
            )
            # external species field initialization (reference:
            # setFieldInitSpec, src/gaussianInterpExtData.cpp:559-748,
            # enabled by plasma_models/initialize_species)
            if inp.get("plasma_models/initialize_species", 0):
                import jax.numpy as jnp

                from ...interop.ext_data import volume_field_from_file

                Yfile = inp.get_required("plasma_models/initialize_file")
                Y0 = np.atleast_2d(
                    np.asarray(volume_field_from_file(self.tab, Yfile)))
                if Y0.shape[0] != self.tab.ndofs:
                    Y0 = Y0.T
                nsp = self.thermo.Y.shape[1]
                if Y0.shape[1] != nsp:
                    raise ValueError(
                        f"{Yfile}: {Y0.shape[1]} species columns, "
                        f"model has {nsp}")
                # renormalize and install as the full BDF history
                Y0 = np.clip(Y0, 0.0, None)
                Y0 = Y0 / np.maximum(Y0.sum(axis=1, keepdims=True), 1e-300)
                self.thermo.Y = jnp.asarray(Y0)
                self.thermo.Y_hist = [self.thermo.Y, self.thermo.Y]
        else:
            self.thermo = ConstantPropertyThermoChem(
                self.tab,
                rho=inp.get("loMach/constprop/rho", 1.0),
                mu=inp.get("loMach/constprop/mu", 1.0e-3),
            )

        # optional smooth hot-kernel temperature IC (torch ignition seed;
        # the reference's torch decks start from restart files carrying an
        # ignition kernel — this is the ini-driven equivalent):
        #   [initialConditions]
        #   profile = gaussian   temperature = peak, backgroundTemperature,
        #   center = 'x y [z]'   width = 'wx wy [wz]' (1e30 = uniform dim)
        if inp.get("initialConditions/profile", "uniform") == "gaussian" \
                and hasattr(self.thermo, "set_temperature"):
            import jax.numpy as jnp

            Tpeak = inp.get("initialConditions/temperature", 300.0)
            Tback = inp.get("initialConditions/backgroundTemperature", 300.0)
            dim = self.mesh.dim
            cen = np.asarray(inp.get_vec("initialConditions/center",
                                         default=[0.0] * dim))
            wid = np.asarray(inp.get_vec("initialConditions/width",
                                         default=[1.0] * dim))
            xyz = np.asarray(self.tab.xyz)
            arg = sum(((xyz[:, d] - cen[d]) / wid[d]) ** 2
                      for d in range(dim))
            self.thermo.set_temperature(
                jnp.asarray(Tback + (Tpeak - Tback) * np.exp(-arg)))

        # flow model factory
        flow_model = inp.get("loMach/flow-solver", "tomboulides")
        # constant gravity vector (reference: loMach/gravity,
        # src/tomboulides.cpp:424; buoyancy-driven cases like the
        # Le Quere differentially heated cavity)
        gvec = inp.get_vec("loMach/gravity", self.tab.dim) \
            if inp.has("loMach/gravity") else None
        if flow_model == "tomboulides" and inp.get("loMach/axisymmetric", 0):
            from .axisym import TomboulidesAxisym

            self.flow = TomboulidesAxisym(
                self.tab, self.thermo, vel_bcs=tuple(vel_bcs),
                swirl=bool(inp.get("loMach/swirl", 0)),
                sponge=self.sponge,
                cg_tol=flow_tol, cg_maxiter=cg_maxiter,
                gravity=gvec,
            )
        elif flow_model == "tomboulides":
            self.flow = Tomboulides(
                self.tab, self.thermo, vel_bcs=tuple(vel_bcs),
                pres_bcs=tuple(pres_bcs),
                sponge=self.sponge,
                cg_tol=flow_tol, cg_maxiter=cg_maxiter,
                mesh=self.mesh,  # enables p-multigrid pressure precond
                gravity=gvec,
            )
        elif flow_model == "zero-flow":
            self.flow = ZeroFlow(self.tab)
        else:
            raise ValueError(f"unknown flow solver '{flow_model}'")
        if hasattr(self.thermo, "flow"):
            self.thermo.flow = self.flow

        # external inlet data (stepped first each iteration; reference
        # loMach.cpp:414 extData -> thermo -> flow -> turb)
        self.ext_data = []
        for patch, fname, ramp in ext_specs:
            from ...interop.ext_data import GaussianInterpExtData

            self.ext_data.append(
                GaussianInterpExtData(self.tab, fname, (patch,),
                                      ramp_steps=ramp)
            )
        if self.ext_data:
            import jax.numpy as jnp

            for ed in self.ext_data:
                ed.dofs_dev = jnp.asarray(ed.dofs)
            # interpolated-inlet temperature patches become Dirichlet ONCE
            # (the mask never changes; values update per step)
            if getattr(self.thermo, "T_mask", None) is not None \
                    and getattr(self.thermo, "T_bc", None) is not None:
                tmask = self.thermo.T_mask
                for ed in self.ext_data:
                    tmask = tmask.at[ed.dofs_dev].set(0.0)
                self.thermo.T_mask = tmask

        # turbulence model (reference: src/loMach.cpp:153-177 +
        # loMach_options turb_model_map_)
        turb = inp.get("loMach/turb-model", inp.get("loMach/sgsModel", "none"))
        turb_const = inp.get("loMach/sgsModelConstant", 0.0) or None
        if turb in ("smagorinsky", "sigma", "wale"):
            self.turb = AlgebraicSubgridModel(
                self.tab, self.flow, model=turb, const=turb_const
            )
            self.flow.turb = self.turb
        elif turb == "algebraic-rans":
            from .rans import AlgebraicRans

            wall_attrs = tuple(
                int(a) for a in inp.get_vec("loMach/algebraic-rans/walls",
                                            default=[])
            ) or tuple(int(a) for a in np.unique(self.mesh.bdr_attrs))
            dist = self._h1_wall_distance(wall_attrs)
            self.turb = AlgebraicRans(
                self.tab, self.flow, self.thermo, wall_distance=dist,
                max_mixing_length=inp.get(
                    "loMach/algebraic-rans/max-mixing-length", 1.0e30
                ),
            )
            self.flow.turb = self.turb
        elif turb == "zeta-f":
            from .zeta_model import ZetaModel

            wall_attrs = tuple(
                int(a) for a in inp.get_vec("ransModel/walls", default=[])
            ) or tuple(int(a) for a in np.unique(self.mesh.bdr_attrs))
            # inlet tke/v2 Dirichlet values: uniform from {inlet}/tke
            # (v2 = 2/3 tke), or interpolated from ransModel/zeta-f-file
            # scaled by ransModel/bc-fac (reference: zetaModel.cpp:481-540
            # + setInletTurbScalars)
            tdr_ic = inp.get("ransModel/tdr-ic", 1.0e-8)
            inlet_bcs = []
            tke_file = inp.get("ransModel/zeta-f-file", None)
            bc_fac = inp.get("ransModel/bc-fac", 1.0)
            for (patch, ikind, base) in inlet_info:
                if ikind == "uniform" and inp.has(f"{base}/tke"):
                    tke = inp.get(f"{base}/tke", 0.0)
                    inlet_bcs.append(
                        ((patch,), tke, tdr_ic, (2.0 / 3.0) * tke))
                elif ikind == "interpolate" and tke_file:
                    import jax.numpy as jnp

                    from ...interop.ext_data import inlet_scalars_from_file

                    _dofs, vals = inlet_scalars_from_file(
                        self.tab, tke_file, (patch,), fac=bc_fac)
                    inlet_bcs.append(
                        ((patch,), jnp.asarray(vals[:, 0]), tdr_ic,
                         jnp.asarray(vals[:, 1]) if vals.shape[1] > 1
                         else None))
            self.turb = ZetaModel(
                self.tab, self.flow, self.thermo, wall_attrs=wall_attrs,
                inlet_bcs=tuple(inlet_bcs),
                tke_ic=inp.get("ransModel/tke-ic", 1.0e-4),
                tdr_ic=tdr_ic,
                cg_tol=inp.get("ransModel/hsolve-rtol", 1e-10),
                cg_maxiter=inp.get("ransModel/hsolve-maxIters", 500),
            )
            self.flow.turb = self.turb
        elif turb == "static-rans":
            from .rans import StaticRans

            nut = inp.get("loMach/static-rans/eddy-viscosity", 0.0)
            visc_file = inp.get("loMach/static-rans/visc-file", None)
            if visc_file:
                from ...interop.ext_data import volume_field_from_file

                nut = volume_field_from_file(
                    self.tab, visc_file,
                    fac=inp.get("loMach/static-rans/visc-fac", 1.0))
            self.turb = StaticRans(self.tab, nut)
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

        # statistics (reference: loMach.cpp:216,482-484 Averaging engine)
        from ...io.averaging import Averaging

        self.averaging = Averaging(
            start_iter=inp.get("averaging/startIter", 0),
            sample_interval=max(inp.get("averaging/sampleFreq", 0), 1),
            enabled=bool(inp.get("averaging/sampleFreq", 0))
            or inp.has("averaging/startIter"),
        )

        # restart IO (reference: src/loMachIO.cpp; written every outputFreq,
        # enableRestart gates the startup read, like the compressible path)
        self.outdir = inp.get("io/outdirBase", "output")
        if inp.get("io/enableRestart", 0):
            self.read_restart()

    def _h1_wall_distance(self, wall_attrs):
        """Distance from every H1 dof to the nearest wall-boundary dof
        (serial wall distance; reference: src/mesh_base.cpp)."""
        xyz = np.asarray(self.tab.xyz)
        wd = np.asarray(h1.boundary_dofs(self.tab, tuple(wall_attrs)))
        wxyz = xyz[wd]
        out = np.empty(len(xyz))
        for i in range(0, len(xyz), 4096):
            d = np.linalg.norm(
                xyz[i : i + 4096, None, :] - wxyz[None, :, :], axis=-1
            )
            out[i : i + 4096] = d.min(axis=1)
        return out

    @property
    def max_iters(self):
        return self.max_iters_cfg

    # -- chunked stepping (scan nsub steps inside one jit; the loMach
    # analog of the compressible solver's solve_chunk: amortizes the
    # per-step jit dispatches and eager glue, which dominate small cases
    # on the hosted-TPU tunnel) --------------------------------------------
    def _chunkable(self):
        return (
            not getattr(self, "_chunk_disabled", False)
            and not self.ext_data
            and not self.averaging.enabled
            # zero/LES/algebraic/static carry a bare nut (chunk_nut);
            # transported models (zeta-f) carry full state (chunk_step)
            and (hasattr(self.turb, "chunk_nut")
                 or hasattr(self.turb, "chunk_step"))
            and hasattr(self.thermo, "chunk_step")
            and hasattr(self.flow, "chunk_step")
            and self.iter + 1 >= self.max_bdf_order  # constant BDF order
        )

    def _chunk_size(self):
        if not self._chunkable():
            return 1
        rem = self.max_iters - self.iter
        bound = min(rem, self.output_freq - self.iter % self.output_freq)
        chunk = 1
        while chunk * 2 <= min(bound, 32):
            chunk *= 2
        return chunk

    def _make_chunk(self, nsub, order, unroll=False):
        import jax
        import jax.numpy as jnp

        thermo, flow, turb = self.thermo, self.flow, self.turb
        sponge = getattr(flow, "sponge", None)
        # transported turbulence (zeta-f): the carry is the model's full
        # state pytree and the step needs (u, rho, mu, dt, order)
        rich_turb = hasattr(turb, "chunk_step")
        th_pc = hasattr(thermo, "chunk_precond")
        fl_pc = hasattr(flow, "chunk_precond")

        def run(ts, fs, tst, dt, pth, pfl):
            def body(carry, _):
                ts, fs, tst = carry
                vel = flow.chunk_velocity(fs)
                ts2 = (thermo.chunk_step(ts, vel, dt, order, precond=pth)
                       if th_pc else thermo.chunk_step(ts, vel, dt, order))
                rho, mu = thermo.chunk_props(ts2)
                mu_eff = mu
                if tst is not None:
                    # per-step semantics: flow uses the PREVIOUS step's
                    # eddy viscosity (turb steps after the flow)
                    nut = turb.chunk_nut_from(tst, rho) if rich_turb else tst
                    mu_eff = mu + rho * nut
                if sponge is not None:
                    mu_eff = mu_eff * sponge.multiplier()
                qt = thermo.chunk_qt(ts2)
                fs2, info = (
                    flow.chunk_step(fs, rho, mu_eff, qt, dt, order,
                                    precond=pfl)
                    if fl_pc else
                    flow.chunk_step(fs, rho, mu_eff, qt, dt, order)
                )
                vel2 = flow.chunk_velocity(fs2)
                tst2 = (turb.chunk_step(tst, vel2, rho, mu, dt, order)
                        if rich_turb else turb.chunk_nut(vel2))
                return (ts2, fs2, tst2), info

            (ts, fs, tst), infos = jax.lax.scan(body, (ts, fs, tst), None,
                                                length=nsub, unroll=unroll)
            return ts, fs, tst, infos

        return jax.jit(run)

    def _refresh_preconds(self, order):
        """Refresh the models' lagged dense-direct factors (host-driven;
        see fem/h1.py dense-direct section)."""
        for model in (self.thermo, self.flow):
            if hasattr(model, "precond_refresh"):
                model.precond_refresh(self.dt, order)

    def solve_chunk(self, n):
        import jax.numpy as jnp

        order = min(self.iter + 1, self.max_bdf_order)
        self._refresh_preconds(order)
        for model in (self.thermo, self.flow):
            if getattr(model, "_direct_age", None) is not None:
                model._direct_age += n
        if not hasattr(self, "_chunk_cache"):
            self._chunk_cache = {}
        key = (n, order)
        if key not in self._chunk_cache:
            self._chunk_cache[key] = self._make_chunk(
                n, order, unroll=getattr(self, "_chunk_unroll", False))
        pth = (self.thermo.chunk_precond()
               if hasattr(self.thermo, "chunk_precond") else None)
        pfl = (self.flow.chunk_precond()
               if hasattr(self.flow, "chunk_precond") else None)
        ts, fs, nut, infos = self._chunk_cache[key](
            self.thermo.chunk_pack(), self.flow.chunk_pack(),
            self.turb.chunk_pack(), jnp.asarray(self.dt), pth, pfl,
        )
        self.thermo.chunk_unpack(ts)
        self.flow.chunk_unpack(fs)
        self.turb.chunk_unpack(nut)
        self.iter += n
        self.time += n * self.dt
        if hasattr(self.flow, "chunk_check"):
            # async convergence guard: a blocking device->host read costs
            # a full relay round trip (~24 ms on the hosted-TPU tunnel,
            # PERF.md round 4), so the chunk's info rides an async copy
            # and is checked once its host buffer is ready (forced at
            # service boundaries / teardown)
            import jax

            for leaf in jax.tree.leaves(infos):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:
                    pass
            if not hasattr(self, "_info_queue"):
                self._info_queue = []
            self._info_queue.append((self.iter, infos))
            self._drain_info_queue()
        if self.iter % self.output_freq == 0:
            self._drain_info_queue(force=True)
            wall = _time.perf_counter() - self._wall0
            print(
                f"loMach step {self.iter} t={self.time:.6e} "
                f"wall/step={wall / self.output_freq:.4f}s (chunked)",
                flush=True,
            )
            self._wall0 = _time.perf_counter()
            self.write_restart()

    def _drain_info_queue(self, force=False):
        """Run the deferred per-chunk convergence guards whose async host
        copies have completed (all of them when force=True)."""
        q = getattr(self, "_info_queue", None)
        if not q:
            return
        import jax

        while q:
            it0, infos = q[0]
            ready = all(
                getattr(leaf, "is_ready", lambda: True)()
                for leaf in jax.tree.leaves(infos)
            )
            if not (force or ready):
                break
            q.pop(0)
            self.flow.chunk_check(infos)

    def solve(self):
        """Chunk-aware solve loop (reference: LoMachSolver::solve,
        src/loMach.cpp:543)."""
        self.solve_begin()
        while self.iter < self.max_iters and self.status == 0:
            n = self._chunk_size()
            if n > 1:
                it0 = self.iter
                try:
                    t0 = _time.perf_counter()
                    self.solve_chunk(n)
                    # miscompiled-scan guard (round 5): the hosted-TPU
                    # compiler sometimes compiles the scanned chunk into
                    # a ~200x-slower loop (observed 8398 ms/step vs 43
                    # per-step in the reacting gate).  The BDF startup
                    # steps give a warm per-step wall reference; if the
                    # first chunk runs far slower per step, switch to the
                    # UNROLLED chunk (straight-line code is compiled
                    # correctly) for the rest of the run.
                    ref = getattr(self, "_last_step_wall", None)
                    # probe the SECOND chunk call, not the first: the
                    # first includes jit trace + XLA compile, which would
                    # misclassify a healthy scan as miscompiled
                    self._chunk_calls = getattr(self, "_chunk_calls", 0) + 1
                    if (ref and self._chunk_calls == 2
                            and not getattr(self, "_chunk_unroll", False)
                            and not getattr(self, "_chunk_probed", False)):
                        self._chunk_probed = True
                        wall = (_time.perf_counter() - t0) / n
                        if wall > 5.0 * ref:
                            self._chunk_unroll = True
                            self._chunk_cache = {}
                            print(
                                "loMach: scanned chunk runs "
                                f"{wall / ref:.0f}x slower than per-step "
                                "(miscompiled loop); switching to the "
                                "unrolled chunk", flush=True,
                            )
                except FloatingPointError:
                    # divergence guard (chunk_check): a numerical failure of
                    # the run, not a compile problem — keep its diagnostic
                    raise
                except Exception as e:
                    if self.iter != it0:
                        # chunk compiled and ran (state advanced): a service
                        # failure (restart write, ...) must propagate, not
                        # masquerade as a compile fallback
                        raise
                    # XLA compile failure on the scanned program (observed:
                    # hosted-TPU compiler SIGILL on the reacting chunk's
                    # fusion-pass cost model): retry once with a FULLY
                    # UNROLLED chunk (straight-line code, no while op —
                    # the same per-step program the compiler handles fine,
                    # repeated nsub times), then fall back to per-step.
                    # State is untouched: the chunk raises before unpack.
                    if not getattr(self, "_chunk_unroll", False):
                        self._chunk_unroll = True
                        self._chunk_cache = {}
                        print(
                            "loMach: scanned chunk failed to compile "
                            f"({type(e).__name__}); retrying unrolled",
                            flush=True,
                        )
                    else:
                        self._chunk_disabled = True
                        print(
                            "loMach: chunked stepping unavailable "
                            f"({type(e).__name__}); falling back to per-step",
                            flush=True,
                        )
            else:
                self.solve_step()
        self.solve_end()

    def solve_step(self):
        """extData -> thermo -> flow -> turb (reference: loMach.cpp:414-437)."""
        _t0 = _time.perf_counter()
        coeff = TemporalCoefficients.bdf(min(self.iter + 1, self.max_bdf_order))
        if self.ext_data:
            import jax.numpy as jnp

            vals = self.flow.vel_bc_values
            swirl = getattr(self.flow, "swirl_bc_values", None)
            tvals = getattr(self.thermo, "T_bc", None)
            for ed in self.ext_data:
                ed.step()
                dofs = ed.dofs_dev
                vals = vals.at[dofs].set(ed.velocity_values())
                sv = ed.swirl_values()
                if swirl is not None and sv is not None:
                    swirl = swirl.at[dofs].set(sv)
                if tvals is not None:
                    # interpolated inlet temperature (reference:
                    # temperature_gf_, src/gaussianInterpExtData.cpp);
                    # the mask was set once at initialization
                    tvals = tvals.at[dofs].set(ed.temperature_values())
            self.flow.vel_bc_values = vals
            if swirl is not None:
                self.flow.swirl_bc_values = swirl
            if tvals is not None:
                self.thermo.T_bc = tvals
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
        # warm per-step wall reference for the miscompiled-scan guard in
        # solve() (the async pipeline makes this approximate; only the
        # LAST startup step is kept, which is warm)
        self._last_step_wall = _time.perf_counter() - _t0
        self.time += self.dt
        self.iter += 1
        if self.averaging.enabled:
            import jax.numpy as jnp

            u = self.flow.velocity()
            T = (self.thermo.T if hasattr(self.thermo, "T")
                 else jnp.zeros(self.tab.ndofs))
            cols = [self.thermo.density()[:, None], u, T[:, None]]
            if hasattr(self.flow, "dissipation_field"):
                # time-averaged dissipation of the fluctuating velocity
                # (reference: Tomboulides::computeDissipation feeding the
                # 'dissipation' Averaging field, src/tomboulides.cpp:1416)
                dim = self.tab.dim
                um = (self.averaging.mean_up[:, 1:1 + dim]
                      if self.averaging.mean_up is not None
                      else jnp.zeros_like(u))
                cols.append(self.flow.dissipation_field(um)[:, None])
            pseudo_up = jnp.concatenate(cols, axis=-1)
            self.averaging.add_sample(self.iter, pseudo_up, self.tab.dim)
        if self.iter % self.output_freq == 0:
            wall = _time.perf_counter() - self._wall0
            si = getattr(self.flow, "solve_info", {})
            solver_txt = (
                f" [p: {si['p_iters']:.0f} it {si['p_res']:.1e}"
                f" | v: {si['v_iters']:.0f} it {si['v_res']:.1e}]"
                if si else ""
            )
            print(
                f"loMach step {self.iter} t={self.time:.6e} "
                f"wall/step={wall / self.output_freq:.4f}s "
                f"[thermo {self._timers['thermoChem']:.2f}s "
                f"flow {self._timers['flow']:.2f}s "
                f"turb {self._timers['turb']:.2f}s]" + solver_txt,
                flush=True,
            )
            self._wall0 = _time.perf_counter()
            if hasattr(self.flow, "finalize"):
                # flush the deferred convergence check so a checkpoint can
                # never capture a diverged solve
                self.flow.finalize()
            self.write_restart()

    # -- restart (reference: src/loMachIO.cpp restart_files_hdf5) ----------
    @property
    def _restart_path(self):
        import os as _os

        return _os.path.join(self.outdir, "restart_lomach.sol.h5")

    def _restart_fields(self):
        """Model state registered for checkpointing."""
        import jax.numpy as jnp

        fields = {"velocity": self.flow.velocity()}
        if hasattr(self.flow, "p"):
            fields["pressure"] = self.flow.p
        if hasattr(self.thermo, "T"):
            fields["temperature"] = self.thermo.T
        if hasattr(self.thermo, "Y"):
            fields["species"] = self.thermo.Y
        nut = self.turb.eddy_viscosity()
        if nut is not None:
            fields["eddy_viscosity"] = jnp.asarray(nut)
        return fields

    def write_restart(self):
        import os as _os

        import h5py

        _os.makedirs(self.outdir, exist_ok=True)
        with h5py.File(self._restart_path, "w") as f:
            f.attrs["iteration"] = self.iter
            f.attrs["time"] = self.time
            f.attrs["order"] = int(self.tab.order)
            f.attrs["dofs_global"] = int(self.tab.ndofs)
            g = f.create_group("solution")
            for name, arr in self._restart_fields().items():
                g[name] = np.asarray(arr)
            # running statistics are restartable fields too (reference:
            # loMach mean/RMS IO families, src/loMach.cpp:482-484)
            if self.averaging.enabled and self.averaging.n_samples:
                ga = f.create_group("averaging")
                for k, v in self.averaging.state_dict().items():
                    ga[k] = v

    def read_restart(self):
        import os as _os

        import h5py
        import jax.numpy as jnp

        path = self._restart_path
        if not _os.path.exists(path):
            raise FileNotFoundError(f"restart file not found: {path}")
        with h5py.File(path, "r") as f:
            self.iter = int(f.attrs["iteration"])
            self.time = float(f.attrs["time"])
            g = f["solution"]
            if hasattr(self.flow, "set_velocity"):
                self.flow.set_velocity(jnp.asarray(np.asarray(g["velocity"])))
            if "pressure" in g and hasattr(self.flow, "p"):
                self.flow.p = jnp.asarray(np.asarray(g["pressure"]))
            if "temperature" in g and hasattr(self.thermo, "set_temperature"):
                self.thermo.set_temperature(
                    jnp.asarray(np.asarray(g["temperature"]))
                )
            elif "temperature" in g and hasattr(self.thermo, "T"):
                self.thermo.T = jnp.asarray(np.asarray(g["temperature"]))
                self.thermo.T_hist = [self.thermo.T, self.thermo.T]
            if "species" in g and hasattr(self.thermo, "Y"):
                self.thermo.Y = jnp.asarray(np.asarray(g["species"]))
            if "averaging" in f:
                ga = f["averaging"]
                self.averaging.load_state_dict(
                    {k: np.asarray(v) for k, v in ga.items()},
                    self.tab.dim,
                )
        if hasattr(self.thermo, "time"):
            # seed the thermo clock (ramp-chem windows are absolute time)
            self.thermo.time = self.time

    def visualization(self):
        """ParaView VTK dump of the model fields (reference: loMach pvdc)."""
        import os as _os

        from ...io.visualization import write_vtk_h1

        _os.makedirs(self.outdir, exist_ok=True)
        fields = {"velocity": np.asarray(self.flow.velocity())}
        if hasattr(self.flow, "p"):
            fields["pressure"] = np.asarray(self.flow.p)
        if hasattr(self.thermo, "T"):
            fields["temperature"] = np.asarray(self.thermo.T)
        nut = self.turb.eddy_viscosity()
        if nut is not None:
            fields["eddy_viscosity"] = np.asarray(nut)
        # time-averaged statistics (reference: meanVel/meanPres/meanEpsi +
        # rmsData IO families, src/tomboulides.cpp:1412-1450)
        if self.averaging.enabled and self.averaging.n_samples:
            dim = self.tab.dim
            mu = np.asarray(self.averaging.mean_up)
            fields["mean_velocity"] = mu[:, 1:1 + dim]
            fields["mean_temperature"] = mu[:, 1 + dim]
            if mu.shape[-1] > 2 + dim:
                fields["mean_dissipation"] = mu[:, 2 + dim]
            fields["reynolds_stress"] = np.asarray(
                self.averaging.reynolds_stresses(dim))
        path = _os.path.join(self.outdir, f"lomach_{self.iter:08d}.vtk")
        write_vtk_h1(path, self.tab, self.mesh, fields)
        return path

    def solve_end(self):
        self._drain_info_queue(force=True)
        if hasattr(self.flow, "finalize"):
            self.flow.finalize()  # drain the deferred convergence check
        self.write_restart()

    def print_timing(self):
        """Per-stage timing table (reference: loMach.cpp:442-480)."""
        total = sum(self._timers.values())
        print("loMach timing: " + ", ".join(
            f"{k}={v:.3f}s" for k, v in self._timers.items()
        ) + f", total={total:.3f}s")
