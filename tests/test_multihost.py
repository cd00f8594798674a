"""Execution evidence for parallel/multihost.py: a REAL 2-process
jax.distributed run on CPU (each process with 2 virtual devices), jitting a
global reduction over a cross-process mesh. SURVEY.md §5.8 / §2.5 —
the multi-slice path cannot be exercised on one chip, but the process-group
init + global-array + GSPMD collective machinery is identical."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_smoke():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(here)] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err}"
    assert "proc0 SUM 6.0" in outs[0][1]
    assert "proc1 SUM 6.0" in outs[1][1]
