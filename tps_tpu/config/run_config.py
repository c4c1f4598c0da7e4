"""RunConfiguration: typed view of the ini input for the flow solvers.

Mirrors the *schema* consumed by the reference's parsers
(reference: src/run_configuration.hpp:54-410, src/M2ulPhyS.cpp:2577-3811)
without porting their code: each section is read into plain dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .ini import IniInput


@dataclass
class BCSpec:
    patch: int
    kind: str  # inlet/outlet/wall type string from the input file
    params: dict


@dataclass
class ICSpec:
    rho: float = 1.2
    rhoU: float = 0.0
    rhoV: float = 0.0
    rhoW: float = 0.0
    pressure: float = 101300.0
    # optional named case override (framework extension)
    case: str | None = None


@dataclass
class RunConfiguration:
    # [solver]
    solver_type: str = "flow"

    # device subset for this instance (split-communicator analog; set by
    # the harness from a parallel.comm.DeviceGroup)
    devices: tuple | None = None

    # [flow]
    mesh: str = ""
    order: int = 1
    integration_rule: int = 0  # 0 gauss-legendre, 1 gauss-lobatto
    basis_type: int = 0
    max_iters: int = 10
    output_freq: int = 100
    timing_freq: int = 100
    # async max-char-speed fetch lag (steps); 0 = synchronous every step
    mcs_lag: int = 8
    use_roe: bool = False
    fluid: str = "dry_air"
    equation_system: str = "navier-stokes"
    ref_length: float = 1.0
    visc_mult: float = 1.0
    bulk_visc_mult: float = 0.0
    axisymmetric: bool = False
    two_temperature: bool = False
    ambipolar: bool = False
    gas_model: str = "perfect_mixture"
    transport_model: str = ""
    chemistry_model: str = ""
    sgs_model: str = "none"
    sgs_const: float = 0.0

    # [mesh] framework extension: generated meshes for file-free runs
    mesh_generator: dict = field(default_factory=dict)

    # [time]
    cfl: float = 0.12
    integrator: str = "rk4"
    dt_fixed: float = -1.0
    constant_dt: bool = False

    # [io]
    outdir: str = "output"
    restart_cycle: int = 0
    restart_mode: str = "standard"
    enable_restart: bool = False

    # [initialConditions]
    ic: ICSpec = field(default_factory=ICSpec)

    # [boundaryConditions]
    bcs: list = field(default_factory=list)

    # [averaging]
    avg_enabled: bool = False
    avg_start_iter: int = 0
    avg_sample_interval: int = 0
    avg_save_mean_history: bool = False
    avg_enable_mean_continuation: bool = False

    # [mms] (reference: src/M2ulPhyS.cpp:2836-2842)
    use_mms: bool = False
    mms_name: str = ""
    mms_compare_rhs: bool = False
    mms_save_details: bool = False

    # [jobManagement]
    enable_auto_restart: bool = False
    rm_threshold: int = 15 * 60
    exit_check_freq: int = 500

    # [post-process/visualization]: snapshot-series postprocessing under
    # --visual (reference: parsePostProcessVisualizationInputs,
    # src/M2ulPhyS.cpp:3759-3766; loop :4083-4154).  dict with
    # prefix/start_iter/end_iter/freq or None.
    postprocess: dict | None = None

    # [spongezone] / passive scalars / plasma sections parsed on demand by
    # the physics factories; keep the raw input around.
    raw: IniInput | None = None


_TIME_INTEGRATORS = {
    "forwardEuler": "forward-euler",
    "rk2": "rk2",
    "rk3": "rk3-ssp",
    "rk4": "rk4",
    "rk6": "rk6",
}


def parse_run_configuration(inp: IniInput) -> RunConfiguration:
    rc = RunConfiguration(raw=inp)
    rc.solver_type = inp.get("solver/type", "flow")

    rc.mesh = inp.get("flow/mesh", "")
    rc.order = inp.get("flow/order", 1)
    # reference defaults are Gauss-Lobatto for BOTH the quadrature family
    # and the nodal basis (src/M2ulPhyS.cpp:2671-2672)
    rc.integration_rule = inp.get("flow/integrationRule", 1)
    rc.basis_type = inp.get("flow/basisType", 1)
    rc.max_iters = inp.get("flow/maxIters", 10)
    rc.output_freq = inp.get("flow/outputFreq", 100)
    rc.timing_freq = inp.get("flow/timingFreq", 100)
    rc.mcs_lag = inp.get("time/mcsLagSteps", 8)
    rc.use_roe = bool(inp.get("flow/useRoe", 0))
    rc.fluid = inp.get("flow/fluid", "dry_air")
    rc.equation_system = inp.get("flow/equation_system", "navier-stokes")
    rc.ref_length = inp.get("flow/refLength", 1.0)
    rc.visc_mult = inp.get("flow/viscosityMultiplier", 1.0)
    rc.bulk_visc_mult = inp.get("flow/bulkViscosityMultiplier", 0.0)
    rc.axisymmetric = bool(inp.get("flow/axisymmetric", 0))
    if rc.axisymmetric:
        # Gauss-Lobatto rules place quadrature/dof nodes ON the axis
        # (r = 0), where the radius-weighted DG mass matrix is singular.
        # Every reference axisymmetric deck pins GL
        # (e.g. test/inputs/annulus.axisym.viscous.ini:7-8); default to GL
        # here and refuse an explicit GLL request instead of NaN-ing.
        if inp.has("flow/integrationRule") and rc.integration_rule != 0:
            raise ValueError(
                "axisymmetric runs require integrationRule = 0 "
                "(Gauss-Legendre): Gauss-Lobatto puts quadrature points "
                "at r = 0 where the radius-weighted mass is singular")
        if inp.has("flow/basisType") and rc.basis_type != 0:
            raise ValueError(
                "axisymmetric runs require basisType = 0 (Gauss-Legendre "
                "nodal basis): Gauss-Lobatto puts dof nodes at r = 0")
        rc.integration_rule = 0
        rc.basis_type = 0
    # the reference parses sgsModel by NAME (src/M2ulPhyS.cpp:2666-2690);
    # legacy numeric indices are also accepted
    _sgs = str(inp.get("flow/sgsModel", "none", typ=str)).strip().lower()
    rc.sgs_model = {"0": "none", "1": "smagorinsky", "2": "sigma"}.get(_sgs, _sgs)
    if rc.sgs_model not in ("none", "smagorinsky", "sigma"):
        raise ValueError(f"flow/sgsModel: unknown model '{_sgs}'")
    # per-model default constants (reference: src/M2ulPhyS.cpp:2693-2699)
    _sgs_default = {"smagorinsky": 0.12, "sigma": 0.135}.get(rc.sgs_model, 0.0)
    rc.sgs_const = inp.get("flow/sgsModelConstant", _sgs_default)

    # framework extension: generated meshes ([mesh] generator = box2d ...)
    if inp.has("mesh/generator"):
        gen = {"generator": inp.get("mesh/generator", "box2d")}
        for k in inp.keys_under("mesh"):
            name = k.split("/", 1)[1]
            if name != "generator":
                gen[name] = inp.get(k, "")
        rc.mesh_generator = gen

    integ = inp.get("time/integrator", "rk4")
    rc.integrator = _TIME_INTEGRATORS.get(integ, integ)
    rc.cfl = inp.get("time/cfl", 0.12)
    rc.dt_fixed = inp.get("time/dt_fixed", -1.0)
    rc.constant_dt = bool(inp.get("time/enableConstantTimestep", 0))

    rc.outdir = inp.get("io/outdirBase", "output")
    rc.restart_cycle = inp.get("io/restartCycle", 0)
    rc.restart_mode = inp.get("io/restartMode", "standard")
    rc.enable_restart = bool(inp.get("io/enableRestart", 0))

    rc.ic = ICSpec(
        rho=inp.get("initialConditions/rho", 1.2),
        rhoU=inp.get("initialConditions/rhoU", 0.0),
        rhoV=inp.get("initialConditions/rhoV", 0.0),
        rhoW=inp.get("initialConditions/rhoW", 0.0),
        pressure=inp.get("initialConditions/pressure", 101300.0),
        case=inp.get("initialConditions/case", None),
    )

    # boundary conditions: every subsection with a patch + type
    for sub in inp.sections_under("boundaryConditions"):
        base = f"boundaryConditions/{sub}"
        if not inp.has(f"{base}/patch"):
            continue
        patch = inp.get_required(f"{base}/patch", int)
        kind = inp.get_required(f"{base}/type", str)
        params = {}
        for k in inp.keys_under(base):
            # keep nested key paths (e.g. mass_fraction/species1,
            # reference src/M2ulPhyS.cpp:3637) relative to the section
            name = k[len(base) + 1:]
            if name in ("patch", "type"):
                continue
            params[name] = inp.values[k]
        rc.bcs.append(BCSpec(patch=patch, kind=kind, params=params))

    rc.avg_enabled = bool(inp.get("averaging/enableContinuation", 0)) or inp.has(
        "averaging/startIter"
    )
    rc.avg_start_iter = inp.get("averaging/startIter", 0)
    rc.avg_sample_interval = inp.get("averaging/sampleFreq", 0)
    rc.avg_save_mean_history = bool(inp.get("averaging/saveMeanHist", 0))
    rc.avg_enable_mean_continuation = bool(inp.get("averaging/enableContinuation", 0))

    # [mms] (reference: src/M2ulPhyS.cpp:2836-2842)
    rc.use_mms = inp.get("mms/isEnabled", False)
    if rc.use_mms:
        rc.mms_name = inp.get("mms/name", "")
        if not rc.mms_name:
            raise ValueError("mms/name is required when mms/isEnabled")
        rc.mms_compare_rhs = inp.get("mms/compare_rhs", False)
        rc.mms_save_details = inp.get("mms/save_details", False)

    rc.enable_auto_restart = bool(inp.get("jobManagement/enableAutoRestart", 0))
    rc.rm_threshold = inp.get("jobManagement/timeThreshold", 15 * 60)
    rc.exit_check_freq = inp.get("jobManagement/checkFreq", 500)

    # [post-process/visualization] — the snapshot-series postprocess mode
    # behind `tps --visual` (reference: M2ulPhyS.cpp:3759-3766)
    if inp.has("post-process/visualization/prefix"):
        rc.postprocess = {
            "prefix": inp.get_required(
                "post-process/visualization/prefix", str),
            "start_iter": inp.get_required(
                "post-process/visualization/start-iter", int),
            "end_iter": inp.get_required(
                "post-process/visualization/end-iter", int),
            "freq": inp.get_required(
                "post-process/visualization/frequency", int),
        }
    return rc
