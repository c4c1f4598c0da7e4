#!/usr/bin/env python3
"""Standalone RHS-evaluation driver for MMS spatial convergence.

The role of the reference utils/compute_rhs.cpp (used by
test/mms.euler_2d.test:28-52): evaluate the DG residual of the isentropic
vortex on a sequence of refined generator meshes and write the L2 RHS
errors to <prefix>.rhs_error.txt (columns: n, h, error) plus observed
convergence orders.

Usage: python tools/compute_rhs.py --order 2 --levels 3 [--prefix mms]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=2)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--n0", type=int, default=4)
    ap.add_argument("--prefix", default="mms.euler_2d")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from tps_tpu.dg.discretization import build_tables
    from tps_tpu.dg.fluxes import Fluxes
    from tps_tpu.dg.rhs import RHSContext
    from tps_tpu.dg.riemann import Rusanov
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.physics.gas import DryAir
    from tps_tpu.utils.cases import isentropic_vortex
    from tps_tpu.utils.mms import convergence_study

    mix = DryAir(dim=2, nvel=2, gas_constant=1.0)

    def make_ctx_tab(n):
        mesh = box_2d(n, n, x1=10.0, y1=10.0, periodic_x=True, periodic_y=True)
        tab = build_tables(mesh, order=args.order).to_jax(jnp.float64)
        fl = Fluxes(mixture=mix, eq_system="euler")
        return RHSContext(fluxes=fl, riemann=Rusanov(fl)), tab

    exact = lambda xyz, t: isentropic_vortex(xyz, t, mix)
    ns = [args.n0 * 2**l for l in range(args.levels)]
    results, orders = convergence_study(make_ctx_tab, exact, ns)

    out = f"{args.prefix}.rhs_error.txt"
    with open(out, "w") as f:
        f.write("# n  h  L2_rhs_error\n")
        for n, e in results:
            f.write(f"{n} {10.0 / n:.8e} {e:.8e}\n")
        f.write("# observed orders: " + " ".join(f"{o:.3f}" for o in orders) + "\n")
    print(f"wrote {out}; observed orders {[f'{o:.2f}' for o in orders]}")
    return 0 if orders[-1] > args.order + 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
