#!/usr/bin/env python3
"""Profiling harness: trace N solver steps with the jax profiler.

The role of the reference src/tps-ntvx-profile.py (NVTX ranges around the
solve loop): writes a TensorBoard-compatible trace of `--steps` steps.

Usage: python tools/profile_run.py -run case.ini [--steps 10 --out /tmp/trace]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runFile", "-run", required=True)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/tps_tpu_trace")
    args = ap.parse_args(argv)

    import jax

    from tps_tpu.harness import Tps

    tps = Tps()
    tps.input_file = args.runFile
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()

    tps.solve_step()  # compile outside the trace
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            tps.solve_step()
    print(f"trace written to {args.out} "
          f"(inspect with tensorboard --logdir {args.out})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
