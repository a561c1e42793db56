"""Real 2-process jax.distributed test of the multihost wrappers.

The reference never tests its distributed path (SURVEY §4); here we spawn two
actual processes on localhost, wire them with jax.distributed.initialize via
dfot_tpu.parallel.multihost.initialize, and exercise gather_for_metrics /
broadcast_from_zero / barrier — the collectives the validation loop relies on
(reference simple_video_generation.py:313,422-467).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
import numpy as np

from dfot_tpu.parallel import multihost

rank = int(sys.argv[1])
coord = sys.argv[2]

# env-var detection path: JAX_COORDINATOR_ADDRESS set by the parent
multihost.initialize(num_processes=2, process_id=rank)

import jax
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank

# gather: each process contributes a distinct row
local = np.full((1, 3), float(rank), np.float32)
gathered = multihost.gather_for_metrics({"x": local})["x"]
assert gathered.shape == (2, 3), gathered.shape
assert (gathered[0] == 0).all() and (gathered[1] == 1).all(), gathered

# broadcast: non-zero ranks receive rank 0's value
val = multihost.broadcast_from_zero(np.array([42.0 + rank], np.float32))
assert float(np.asarray(val)[0]) == 42.0, val

multihost.barrier("test")
assert multihost.is_rank_zero() == (rank == 0)
print(f"child {rank}: ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gather_broadcast_barrier(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS", "PJRT_DEVICE")
    }
    env_base.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        JAX_COORDINATOR_ADDRESS=coord,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), coord],
            cwd=REPO,
            env=env_base,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    assert "child 0: ok" in outs[0]
    assert "child 1: ok" in outs[1]


def test_detect_multiprocess_env(monkeypatch):
    from dfot_tpu.parallel import multihost

    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "SLURM_NTASKS",
        "TPU_WORKER_ID",
        "TPU_WORKER_HOSTNAMES",
        "TPU_NUM_WORKERS",
    ):
        monkeypatch.delenv(var, raising=False)
    assert not multihost.detect_multiprocess_env()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert not multihost.detect_multiprocess_env()
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert multihost.detect_multiprocess_env()
    monkeypatch.delenv("SLURM_NTASKS")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert multihost.detect_multiprocess_env()
