#!/usr/bin/env python3
"""Standalone RHS-evaluation driver for MMS spatial verification.

Two modes, both playing the role of the reference utils/compute_rhs.cpp:

1. `--runFile <ini>` (reference-parity mode, used by
   test/mms.euler_2d.test:28-52 and test/mms.cns_2d.test): build the
   solver from the ini (which must enable [mms]), project the exact
   MASA-compatible state, evaluate the full discrete RHS (including the
   manufactured forcing), and append the per-variable-group relative L2
   errors  ||RHS_var|| / ||S_var||  to [utils/compute_rhs]/filename as a
   TSV line  "numElems\te0\te1\te2\t"  — exactly the file the reference
   test brackets (utils/compute_rhs.cpp:129-185).  Variable groups are
   rho / momentum-vector / energy, matching MFEM ComputeLpError on the
   scalar+vector visualization fields.

2. Legacy convergence mode (`--order/--levels/...`): isentropic-vortex
   autodiff MMS sweep over generator meshes.

Usage:
  python tools/compute_rhs.py --runFile inputs/mms.euler.2d.quad.ini
  python tools/compute_rhs.py --order 2 --levels 3 [--prefix mms]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_file_mode(run_file):
    import numpy as np

    from tps_tpu.harness import Tps

    tps = Tps()
    tps.input_file = run_file
    tps.parse_input()
    tps.choose_devices()
    tps.choose_solver()
    tps.initialize()
    s = tps.solver
    if s.masa is None:
        raise SystemExit("compute_rhs --runFile requires [mms]/isEnabled")
    filename = s.config.raw.get("utils/compute_rhs/filename", "")
    if not filename:
        raise SystemExit("utils/compute_rhs/filename is required")

    errs, ne = rhs_rel_errors(s)
    line = f"{ne}\t" + "".join(f"{e:.6g}\t" for e in errs)
    print(f"{ne},\t" + ",\t".join(f"{e:.6g}" for e in errs))
    with open(filename, "a") as f:
        f.write(line + "\n")
    return 0


def rhs_rel_errors(s):
    """Relative RHS errors per variable group (rho, momentum, energy) on
    the solver's current exact-projected state.  Returns (errs, numElems).
    """
    import numpy as np

    from tps_tpu.dg.rhs import compute_rhs

    tab = s.tables
    U = s.U
    y, _ = compute_rhs(s.ctx, tab, U, 0.0)
    S = s.masa.source_at(tab.xyz_dof)

    # quadrature L2 norms of dof fields (exact: the fields are
    # polynomials of degree p, the volume rule integrates degree 2p)
    import jax.numpy as jnp

    def l2sq(field):  # [ne, ndof, k] -> per-eq integrals
        fq = jnp.einsum("qd,ndk->nqk", tab.Bvol, field)
        w = tab.wq[None, :] * tab.detJ
        return np.asarray(jnp.sum(w[..., None] * fq * fq, axis=(0, 1)))

    num = l2sq(y)
    den = l2sq(S)
    dim = s.mesh.dim
    groups = [(0,), tuple(range(1, 1 + dim)), (1 + dim,)]
    # species / extra equations reported individually, as the reference
    # visualization fields do
    neq = y.shape[-1]
    for k in range(2 + dim, neq):
        groups.append((k,))
    errs = []
    for g in groups:
        n_ = float(np.sqrt(sum(num[k] for k in g)))
        d_ = float(np.sqrt(sum(den[k] for k in g)))
        errs.append(n_ / d_ if d_ > 0 else n_)
    return errs, s.mesh.num_elements


def legacy_mode(args):
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runFile", default=None)
    ap.add_argument("--order", type=int, default=2)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--n0", type=int, default=4)
    ap.add_argument("--prefix", default="mms.euler_2d")
    args = ap.parse_args(argv)
    if args.runFile:
        return run_file_mode(args.runFile)
    return legacy_mode(args)


if __name__ == "__main__":
    sys.exit(main())
