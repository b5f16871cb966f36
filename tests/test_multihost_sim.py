"""Multi-process jax.distributed simulation over local TCP (VERDICT r2 #6):
2 processes x 2 virtual CPU devices form a 4-device global runtime; both
run one data-parallel step on disjoint local batches via host_local_batch
and must agree bit-for-bit on the psum'd loss."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "fixtures", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the worker pins jax_platforms itself (sitecustomize overrides env)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(i), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    lines = [
        [l for l in out.splitlines() if l.startswith("MHOK")][0]
        for out in outs
    ]
    assert "process=0/2 devices=2/4" in lines[0]
    assert "process=1/2 devices=2/4" in lines[1]
    # replicated params + psum grads: identical loss on every process
    losses = [l.rsplit("loss=", 1)[1] for l in lines]
    assert losses[0] == losses[1], lines
