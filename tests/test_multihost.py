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


_DATA_WORKER = r"""
import os, sys, json
sys.path.insert(0, os.environ["DFOT_REPO"])
from dfot_tpu.parallel.multihost import initialize, gather_for_metrics

initialize(
    num_processes=int(os.environ["DFOT_NPROC"]),
    process_id=int(os.environ["DFOT_RANK"]),
)

import jax
import numpy as np

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local CPU devices per process
rank = jax.process_index()

from dfot_tpu.data.loader import DataLoader
from dfot_tpu.parallel.mesh import make_mesh, shard_batch


class DS:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32)}


# per-process loader: same seed -> identical global order, strided disjoint
# shards; global batch 4 = local batch 2 per process
loader = DataLoader(DS(), batch_size=2, shuffle=True, seed=5,
                    process_shard=(rank, 2))
assert len(loader) == 2
batches = list(loader)
assert len(batches) == 2 and batches[0]["x"].shape == (2, 3)

ids = np.asarray(
    sorted(int(b["x"][j, 0]) for b in batches for j in range(2)),
    np.float32,
).reshape(1, -1)
all_ids = gather_for_metrics({"ids": ids})["ids"]
assert all_ids.shape == (2, 4)
assert sorted(all_ids.ravel().tolist()) == list(range(8)), all_ids

# reassemble the global device batch from the per-host local rows
mesh = make_mesh((4, 1))
with mesh:
    g = shard_batch({"x": batches[0]["x"]}, mesh)["x"]
assert g.shape == (4, 3), g.shape

from jax.experimental import multihost_utils

host_g = np.asarray(multihost_utils.process_allgather(g, tiled=True))
got = sorted(host_g.reshape(-1, 3)[:, 0].tolist())
# the union of both ranks' FIRST local batches = the first 4 entries of the
# shared shuffled order (positions 0..3, interleaved rank 0/1)
order = np.arange(8)
np.random.RandomState(5 + 0).shuffle(order)
expect = sorted(float(v) for v in order[:4])
assert got == expect, (got, expect)
print(json.dumps({"rank": rank, "ok": True}))
"""


def _run_two_process(tmp_path, worker_src):
    port = _free_port()
    workers = []
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    for rank in range(2):
        env = {
            # scrubbed environment: no axon sitecustomize, CPU backend
            "PATH": os.environ.get("PATH", ""),
            "HOME": os.environ.get("HOME", "/root"),
            "PYTHONPATH": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
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
    return outs


def test_two_process_gather_broadcast(tmp_path):
    outs = _run_two_process(tmp_path, _WORKER)
    assert '"ok": true' in outs[0] and '"ok": true' in outs[1]
    assert '"rank_zero": true' in "".join(outs)


def test_two_process_sharded_data_loading(tmp_path):
    """Per-process loader shards partition the epoch with no duplication and
    shard_batch reassembles the global device batch from local rows."""
    outs = _run_two_process(tmp_path, _DATA_WORKER)
    assert '"ok": true' in outs[0] and '"ok": true' in outs[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
