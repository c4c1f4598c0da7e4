#!/usr/bin/env python3
"""Blend-profile initial-condition writer (role of the reference's
utils/sine_ic.cpp, utils/tanh_ic.cpp, utils/binary_mixture_ic.cpp): build
the solver from an ini, imprint a two-state blend profile on the
conserved state, and write the restart file the run then starts from.

    python tools/make_ic.py <run.ini> --profile sine|tanh

Ini schema (reference: utils/{sine,tanh}_initial_condition sections):

    [utils/sine_initial_condition]      (or tanh_initial_condition)
    offset = 0.5          profile position along x
    scale = 0.2           profile width
    constant_pressure = 0 (optional; 1 re-imposes `pressure` after blend)
    pressure = 101325
    solution1/Q1 ... Qn   left conserved state
    solution2/Q1 ... Qn   right conserved state

sine: factor = 0 / 0.5+0.5*sin(pi (x-offset)/scale) / 1 clamped outside
[-scale/2, scale/2] (reference sine_ic.cpp:88-106); tanh: factor =
0.5+0.5*tanh((x-offset)/scale) (tanh_ic.cpp:89). A binary-mixture IC is
the same blend with the species entries of Q1/Q2 set accordingly
(binary_mixture_ic.cpp uses the identical machinery).

Periodic box meshes come from the in-library [mesh] generator path
(mesh/generators.py), superseding utils/simple_periodic_mesh.cpp.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_file")
    ap.add_argument("--profile", choices=("sine", "tanh"), default="sine")
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tps_tpu.config.ini import IniInput
    from tps_tpu.config.run_config import parse_run_configuration
    from tps_tpu.solvers.base import create_solver
    import tps_tpu.harness  # noqa: F401 (solver registry)

    inp = IniInput.read(args.run_file)
    rc = parse_run_configuration(inp)
    s = create_solver(rc.solver_type, rc)
    s.initialize()

    neq = s.mixture.num_equations
    base = f"utils/{args.profile}_initial_condition"
    sol1 = np.array([inp.get_required(f"{base}/solution1/Q{e + 1}", float)
                     for e in range(neq)])
    sol2 = np.array([inp.get_required(f"{base}/solution2/Q{e + 1}", float)
                     for e in range(neq)])
    offset = inp.get_required(f"{base}/offset", float)
    scale = inp.get_required(f"{base}/scale", float)

    xyz = np.asarray(s.viz_tables.xyz_dof)  # [ne, ndof, dim]
    x = xyz[..., 0]
    if args.profile == "sine":
        phase = np.pi * (x - offset) / scale
        fac = np.where(phase > 0.5 * np.pi, 1.0,
                       np.where(phase < -0.5 * np.pi, 0.0,
                                0.5 + 0.5 * np.sin(phase)))
    else:
        fac = 0.5 + 0.5 * np.tanh((x - offset) / scale)
    U = (sol1[None, None, :] * (1.0 - fac[..., None])
         + sol2[None, None, :] * fac[..., None])

    if inp.get(f"{base}/constant_pressure", 0):
        p0 = inp.get_required(f"{base}/pressure", float)
        U = np.asarray(
            s.mixture.modify_energy_for_pressure(jnp.asarray(U), p0))

    if s.nparts > 1:
        from tps_tpu.parallel.partition import scatter_state

        s.U = jnp.asarray(scatter_state(s._build, U), s.dtype)
    else:
        s.U = jnp.asarray(U, s.dtype)
    s.write_restart()
    print(f"wrote {args.profile} IC restart for {rc.outdir}")


if __name__ == "__main__":
    main()
