"""Multi-host (DCN) backend: 2-process x 4-virtual-device dryrun
(reference: multi-node MPI scaling, src/tps.cpp:72-74,200-239; here the
jax multi-controller runtime with a process-spanning device mesh,
SURVEY.md 2.6)."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)


@pytest.mark.timeout(600)
def test_two_process_dryrun():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each process forces its own 4 devices
    script = os.path.join(HERE, "..", "tools", "multihost_dryrun.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, coord, "2", str(i), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        assert rc == 0, out[-2000:]
        assert "MULTIHOST_OK" in out, out[-2000:]
    # both processes agree on the (replicated) wave speed
    vals = [line.split("mcs=")[1] for rc, out in outs
            for line in out.splitlines() if "MULTIHOST_OK" in line]
    assert len(vals) == 2 and vals[0] == vals[1]
