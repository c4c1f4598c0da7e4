#!/usr/bin/env python3
"""Interpolate a checkpoint's solution onto another mesh's dof points.

The role of the reference utils/pfield_interpolate.cpp (gslib transfer):
read a source run (ini + its checkpoint), build the target mesh from a
second ini, interpolate every solution field, and write the target
checkpoint.

Usage: python tools/pfield_interpolate.py src.ini dst.ini
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(ini, device=None):
    from tps_tpu.harness import Tps

    tps = Tps()
    tps.input_file = ini
    tps._device_config = device
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    return tps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src_ini")
    ap.add_argument("dst_ini")
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tps_tpu.interop.interpolation import FieldInterpolator

    src = _load(args.src_ini, args.device)
    src.solver.read_restart()
    dst = _load(args.dst_ini, args.device)

    pts = np.asarray(dst.solver.tables_np.xyz_dof).reshape(
        -1, src.solver.mesh.dim
    )
    interp = FieldInterpolator.build(
        src.solver.mesh, src.config.order, "gauss-legendre", pts
    )
    U_src = np.asarray(src.solver.U)
    neq = U_src.shape[-1]
    vals = np.asarray(interp.from_dg(U_src))
    dst.solver.U = jnp.asarray(
        vals.reshape(dst.solver.U.shape[0], dst.solver.U.shape[1], neq)
    )
    dst.solver.time = src.solver.time
    dst.solver.iter = src.solver.iter
    dst.solver.write_restart()
    print(f"interpolated {neq} fields onto {dst.solver.tables_np.ne} elements; "
          f"wrote {dst.config.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
