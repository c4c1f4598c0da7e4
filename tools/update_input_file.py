#!/usr/bin/env python3
"""Migrate legacy flat `KEYWORD value` TPS input files to the ini schema
(the role of reference utils/update_input_file.py; same keyword mapping so
old decks produce the same ini sections).

Usage: python tools/update_input_file.py --infile old.run [-o new.ini]
"""

from __future__ import annotations

import argparse
import sys

# legacy keyword -> (section, ini key); multi-valued keywords handled below
KEYMAP = {
    # [flow]
    "MESH": ("flow", "mesh"),
    "POL_ORDER": ("flow", "order"),
    "INT_RULE": ("flow", "integrationRule"),
    "BASIS_TYPE": ("flow", "basisType"),
    "EQ_SYSTEM": ("flow", "equation_system"),
    "REF_LENGTH": ("flow", "refLength"),
    "USE_ROE": ("flow", "useRoe"),
    "ITERS_OUT": ("flow", "outputFreq"),
    "NMAX": ("flow", "maxIters"),
    "IS_SBP": ("flow", "enableSummationByParts"),
    "FLUID": ("flow", "fluid"),
    "BULK_VISC_MULT": ("flow", "bulkViscosityMultiplier"),
    "VISC_MULT": ("flow", "viscosityMultiplier"),
    "GRAD_PRESSURE": ("flow", "additionalGradPressure"),
    "REF_LEVELS": ("flow", "refinement_levels"),
    # [time]
    "CFL": ("time", "cfl"),
    "TIME_INTEGRATOR": ("time", "integrator"),
    "DT_CONSTANT": ("time", "enableConstantTimestep"),
    "DT_FIXED": ("time", "dt_fixed"),
    # [initialConditions]
    "INIT_RHO": ("initialConditions", "rho"),
    "INIT_RHOVX": ("initialConditions", "rhoU"),
    "INIT_RHOVY": ("initialConditions", "rhoV"),
    "INIT_RHOVZ": ("initialConditions", "rhoW"),
    "INIT_P": ("initialConditions", "pressure"),
    # [io]
    "OUTPUT_NAME": ("io", "outdirBase"),
    "RESTART_CYCLE": ("io", "enableRestart"),
    "RESTART_FROM_AUX": ("io", "restartMode"),
    "RESTART_SERIAL": ("io", "restartMode"),
    # [averaging]
    "CALC_MEAN_RMS": ("averaging", "enableAveraging"),
    "CONTINUE_MEAN_CALC": ("averaging", "enableContinuation"),
    "SAVE_MEAN_HIST": ("averaging", "saveMeanHist"),
    # [jobManagement]
    "ENABLE_AUTORESTART": ("jobManagement", "enableAutoRestart"),
    "RM_THRESHOLD": ("jobManagement", "timeThreshold"),
    "RM_CHECK_FREQUENCY": ("jobManagement", "checkFreq"),
    # [viscosityMultiplierFunction]
    "LV_PLANE_NORM": ("viscosityMultiplierFunction", "norm"),
    "LV_PLANE_P0": ("viscosityMultiplierFunction", "p0"),
    "LV_PLANE_PINIT": ("viscosityMultiplierFunction", "pInit"),
    "LV_VISC_RATIO": ("viscosityMultiplierFunction", "viscosityRatio"),
    # [spongezone]
    "SZ_TYPE": ("spongezone", "type"),
    "SZ_MULT": ("spongezone", "multiplier"),
    "SZ_PLANE_NORM": ("spongezone", "normal"),
    "SZ_PLANE_P0": ("spongezone", "p0"),
    "SZ_PLANE_PINIT": ("spongezone", "pInit"),
}

INLET_TYPES = {"0": "subsonic", "1": "nonReflecting",
               "2": "nonReflectingConstEntropy"}
OUTLET_TYPES = {"0": "subsonicPressure", "1": "nonReflectingPressure",
                "2": "nonReflectingMassFlow",
                "3": "nonReflectingPointBasedMassFlow"}
WALL_TYPES = {"0": "inviscid", "1": "viscous_adiabatic",
              "2": "viscous_isothermal"}


def migrate(text: str) -> str:
    sections: dict[str, dict[str, str]] = {"solver": {"type": "flow"}}
    counts = {"wall": 0, "inlet": 0, "outlet": 0, "scalar": 0}

    def put(section, key, value):
        sections.setdefault(section, {})[key] = value

    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        parts = line.split()
        kw, vals = parts[0], parts[1:]

        if kw == "WALL":
            counts["wall"] += 1
            sec = f"boundaryConditions/wall{counts['wall']}"
            put(sec, "patch", vals[0])
            put(sec, "type", WALL_TYPES[vals[1]])
            if WALL_TYPES[vals[1]] == "viscous_isothermal":
                put(sec, "temperature", vals[2])
        elif kw == "INLET":
            counts["inlet"] += 1
            sec = f"boundaryConditions/inlet{counts['inlet']}"
            put(sec, "patch", vals[0])
            put(sec, "type", INLET_TYPES[vals[1]])
            put(sec, "density", vals[2])
            put(sec, "uvw", "'" + " ".join(vals[3:6]) + "'")
        elif kw == "OUTLET":
            counts["outlet"] += 1
            sec = f"boundaryConditions/outlet{counts['outlet']}"
            put(sec, "patch", vals[0])
            put(sec, "type", OUTLET_TYPES[vals[1]])
            key = ("pressure"
                   if OUTLET_TYPES[vals[1]] in ("subsonicPressure",
                                                "nonReflectingPressure")
                   else "massFlow")
            put(sec, key, vals[2])
        elif kw in ("PASSIVE_SCALAR", "PASIVE_SCALAR"):
            counts["scalar"] += 1
            sec = f"passiveScalar{counts['scalar']}"
            put(sec, "xyz", "'" + " ".join(vals[0:3]) + "'")
            put(sec, "radius", vals[3])
            put(sec, "value", vals[4])
        elif kw in KEYMAP:
            section, key = KEYMAP[kw]
            if not key:
                continue
            value = " ".join(vals)
            if kw == "RESTART_SERIAL":
                value = {"read": "singleFileRead",
                         "write": "singleFileWrite",
                         "readwrite": "singleFileReadWrite"}.get(
                    value, value)
            if len(vals) > 1:
                value = "'" + value + "'"
            put(section, key, value)
        else:
            print(f"warning: unknown legacy keyword '{kw}' skipped",
                  file=sys.stderr)

    if any(counts[k] for k in ("wall", "inlet", "outlet")):
        bc = sections.setdefault("boundaryConditions", {})
        bc["numWalls"] = str(counts["wall"])
        bc["numInlets"] = str(counts["inlet"])
        bc["numOutlets"] = str(counts["outlet"])
    if counts["scalar"]:
        sections.setdefault("passiveScalars", {})["numScalars"] = str(
            counts["scalar"]
        )

    out = []
    for sec, kv in sections.items():
        out.append(f"[{sec}]")
        for k, v in kv.items():
            out.append(f"{k} = {v}")
        out.append("")
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--infile", required=True)
    ap.add_argument("-o", "--outfile", default=None)
    args = ap.parse_args(argv)
    text = migrate(open(args.infile).read())
    out = args.outfile or (args.infile + ".ini")
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
