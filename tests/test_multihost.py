"""Multi-host integration: 2 processes x 2 virtual CPU devices stitched by
jax.distributed into one 4-device mesh; sharded training steps must produce
identical losses on every process (SURVEY §4 multi-node plan)."""

import os
import socket
import subprocess
import sys

import pytest


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_agrees():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(free_port())
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [subprocess.Popen([sys.executable, worker, "2", str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    lines = {i: next(l for l in out.splitlines() if l.startswith(f"WORKER {i}"))
             for i, out in enumerate(outs)}
    losses0 = lines[0].split("losses")[1].split()
    losses1 = lines[1].split("losses")[1].split()
    assert losses0 == losses1, f"process losses diverged: {losses0} vs {losses1}"
    assert len(losses0) == 3 and all(float(x) > 0 for x in losses0)
