"""Real 2-process jax.distributed test over localhost CPU.

Covers the multi-host wrappers the 8-device single-process dryrun cannot
(parallel/multihost.py): initialize() env detection + ordering,
gather_for_metrics' cross-process concatenation, broadcast_from_zero, and
the barrier. Two subprocesses rendezvous at a localhost coordinator; each
runs the worker script below and the parent asserts both sides saw the
global data.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
# initialize() must run before any backend query — the module under test
# detects the launch from env vars alone
sys.path.insert(0, os.environ["DFOT_REPO"])
from dfot_tpu.parallel.multihost import (
    initialize, detect_multiprocess_env, gather_for_metrics,
    broadcast_from_zero, barrier, is_rank_zero,
)

assert detect_multiprocess_env(), "JAX_COORDINATOR_ADDRESS should be detected"
initialize(
    num_processes=int(os.environ["DFOT_NPROC"]),
    process_id=int(os.environ["DFOT_RANK"]),
)

import jax
import numpy as np

assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

# per-process payload: rank r contributes rows full of r
local = {"x": np.full((2, 3), rank, np.float32)}
gathered = gather_for_metrics(local)
assert gathered["x"].shape == (4, 3), gathered["x"].shape
np.testing.assert_array_equal(gathered["x"][:2], 0.0)
np.testing.assert_array_equal(gathered["x"][2:], 1.0)

b = broadcast_from_zero(np.asarray([7.0, 8.0]) if rank == 0 else np.zeros(2))
np.testing.assert_array_equal(np.asarray(b), [7.0, 8.0])

barrier("test")
print(json.dumps({"rank": rank, "ok": True, "rank_zero": bool(is_rank_zero())}))
"""


def test_two_process_gather_broadcast(tmp_path):
    port = _free_port()
    workers = []
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    for rank in range(2):
        env = {
            # scrubbed environment: no axon sitecustomize, CPU backend
            "PATH": os.environ.get("PATH", ""),
            "HOME": os.environ.get("HOME", "/root"),
            "PYTHONPATH": "",
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "DFOT_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "DFOT_NPROC": "2",
            "DFOT_RANK": str(rank),
        }
        workers.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=300)
        assert w.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    assert '"ok": true' in outs[0] and '"ok": true' in outs[1]
    assert '"rank_zero": true' in "".join(outs)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
