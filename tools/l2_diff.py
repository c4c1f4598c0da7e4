#!/usr/bin/env python3
"""L2 difference of two restart solution files.

The role of the reference utils/L2_diff.cpp: compare each dataset under
/solution of two HDF5 checkpoints and print the L2 norm of the difference.
Exit status 1 if any field differs by more than --tol.

Usage: python tools/l2_diff.py a.sol.h5 b.sol.h5 [--tol 1e-12]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file_a")
    ap.add_argument("file_b")
    ap.add_argument("--tol", type=float, default=1e-12)
    args = ap.parse_args(argv)

    status = 0
    with h5py.File(args.file_a) as fa, h5py.File(args.file_b) as fb:
        keys = sorted(set(fa["solution"].keys()) | set(fb["solution"].keys()))
        for k in keys:
            if k not in fa["solution"] or k not in fb["solution"]:
                print(f"{k}: MISSING in one file")
                status = 1
                continue
            a = np.asarray(fa["solution"][k])
            b = np.asarray(fb["solution"][k])
            if a.shape != b.shape:
                print(f"{k}: shape mismatch {a.shape} vs {b.shape}")
                status = 1
                continue
            d = float(np.sqrt(np.mean((a - b) ** 2)))
            print(f"{k}: L2 diff = {d:.6e}")
            if d > args.tol:
                status = 1
    return status


if __name__ == "__main__":
    sys.exit(main())
