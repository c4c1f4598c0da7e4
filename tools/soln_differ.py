#!/usr/bin/env python
"""Golden-solution comparator: per-field tolerance diff of two restart
checkpoints (the role of the reference's h5diff wrapper test/soln_differ:
abs tol on density and momenta, rel tol on rho-E and species rho-Y,
optional mean/RMS statistics check).

Exit status 0 when every checked dataset agrees within tolerance, 1
otherwise (per-dataset report with -r).  Accepts both this framework's
momentum names (x-mom/y-mom/z-mom) and the reference's (rho-u/rho-v/rho-w).

Usage: python tools/soln_differ.py [-d DIM] [-t RHO] [-u RHOU] [-e RHOE]
                                   [-r] [-a] [-s] file1.h5 file2.h5
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# alternate spellings per logical field (ours first, reference second)
ALIASES = {
    "density": ["density"],
    "mom0": ["x-mom", "rho-u"],
    "mom1": ["y-mom", "rho-v"],
    "mom2": ["z-mom", "rho-w"],
    "rho-E": ["rho-E"],
}


def _get(group, names):
    for n in names:
        if n in group:
            return np.asarray(group[n])
    raise KeyError(f"none of {names} in {group.name}")


def _check(f1, f2, group, names, tol, relative, report, label=None):
    label = label or names[0]
    try:
        a = _get(f1[group], names)
        b = _get(f2[group], names)
    except KeyError as e:
        print(f"FAIL {group}/{label}: {e}")
        return False
    if a.shape != b.shape:
        print(f"FAIL {group}/{label}: shape {a.shape} vs {b.shape}")
        return False
    d = np.abs(a - b)
    if relative:
        # h5diff --relative: |a-b| / |a| > tol counts as a difference
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.where(np.abs(a) > 0, d / np.abs(a), d)
    bad = int(np.sum(d > tol))
    if report or bad:
        kind = "rel" if relative else "abs"
        print(f"{'FAIL' if bad else 'ok  '} {group}/{label}: "
              f"{bad} diffs > {tol:g} ({kind}), max {float(d.max()):.3e}")
    return bad == 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-d", type=int, default=3, dest="dim")
    ap.add_argument("-t", type=float, default=2e-13, dest="abs_rho",
                    help="absolute tolerance on density (default 2e-13)")
    ap.add_argument("-u", type=float, default=2e-11, dest="abs_rhovel",
                    help="absolute tolerance on momentum (default 2e-11)")
    ap.add_argument("-e", type=float, default=1e-14, dest="rel_rhoE",
                    help="relative tolerance on rho-E (default 1e-14)")
    ap.add_argument("-y", type=float, default=1e-14, dest="rel_rhoY",
                    help="relative tolerance on species rho-Y (default 1e-14)")
    ap.add_argument("-r", action="store_true", dest="report")
    ap.add_argument("-a", action="store_true", dest="averages")
    ap.add_argument("-s", action="store_true", dest="species")
    ap.add_argument("files", nargs=2)
    args = ap.parse_args(argv)

    import h5py

    ok = True
    with h5py.File(args.files[0], "r") as f1, \
            h5py.File(args.files[1], "r") as f2:
        ok &= _check(f1, f2, "solution", ALIASES["density"], args.abs_rho,
                     False, args.report)
        for d in range(args.dim):
            ok &= _check(f1, f2, "solution", ALIASES[f"mom{d}"],
                         args.abs_rhovel, False, args.report)
        ok &= _check(f1, f2, "solution", ALIASES["rho-E"], args.rel_rhoE,
                     True, args.report)
        if args.species:
            sp = [k for k in f1["solution"] if k.startswith("rho-Y")]
            if not sp:
                print(f"Error: species check requested but no rho-Y* "
                      f"datasets in {args.files[0]}")
                return 1
            for name in sp:
                ok &= _check(f1, f2, "solution", [name], args.rel_rhoY, True,
                             args.report)
        if args.averages:
            if "meanSolution" not in f1 or "meanSolution" not in f2:
                print("Error: averages check requested but /meanSolution "
                      "missing")
                return 1
            ok &= _check(f1, f2, "meanSolution", ["meanDens"],
                         args.abs_rhovel, False, args.report)
            for c in "uvw"[: args.dim]:
                ok &= _check(f1, f2, "meanSolution", [f"mean-{c}"],
                             args.abs_rhovel, False, args.report)
            for name in f1["rmsData"]:
                ok &= _check(f1, f2, "rmsData", [name], args.abs_rhovel,
                             False, args.report)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
