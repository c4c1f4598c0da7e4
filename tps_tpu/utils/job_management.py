"""Job management: cooperative kill + walltime-aware auto-restart.

Mirrors the reference behavior (reference: src/utils.cpp:56-157,
src/M2ulPhyS.cpp:2160-2177): a `DIE` file in the run directory triggers a
clean EARLY_EXIT; when the scheduler walltime is nearly exhausted the run
checkpoints and exits with JOB_RESTART so the job script can resubmit.
Instead of linking the SLURM C API, remaining walltime is read from the
environment (SLURM_JOB_END_TIME when present, or TPS_JOB_END_TIME)."""

from __future__ import annotations

import os
import time

STATUS_NORMAL = 0
STATUS_EARLY_EXIT = 10
STATUS_JOB_RESTART = 20


def check_die_file(outdir: str) -> bool:
    """True if a DIE file exists (checked every exit_check_freq iters)."""
    return os.path.exists(os.path.join(outdir, "DIE")) or os.path.exists("DIE")


def seconds_remaining() -> float | None:
    """Walltime remaining from scheduler environment, None if unknown."""
    for var in ("SLURM_JOB_END_TIME", "TPS_JOB_END_TIME"):
        v = os.environ.get(var)
        if v:
            try:
                return float(v) - time.time()
            except ValueError:
                pass
    return None


def job_almost_done(threshold_s: float) -> bool:
    rem = seconds_remaining()
    return rem is not None and rem < threshold_s
