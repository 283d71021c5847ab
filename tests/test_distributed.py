"""Multi-host runtime test: TWO real jax.distributed processes on the
CPU backend (gloo collectives), pattern-sharded logL psum across hosts +
deterministic cross-host MC3 swap (VERDICT r1 item 4; SURVEY.md §5.8 —
the reference has NO multi-node test; ref analog BeastMPI.java:50-70)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pattern_sharded_loglik():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker {i} failed:\n{out}\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = parts[2:]
    assert set(results) == {0, 1}
    # both processes computed the identical psum'd logL == local reference
    assert results[0][0] == results[1][0]
    assert abs(float(results[0][0]) - float(results[0][1])) < 1e-6
    # and the identical MC3 swap permutation
    assert results[0][2:] == results[1][2:]
