"""Test harness: run everything on a virtual 8-device CPU mesh.

This image's sitecustomize (PYTHONPATH) pre-imports jax and pins
``jax_platforms`` to the axon TPU plugin at interpreter start, so environment
variables are too late — we must override via ``jax.config.update`` before
any backend initializes (backends init lazily at first device use).
"""

import os

# must precede backend initialization (safe even though jax is pre-imported)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: each new op/shape costs ~0.8s to compile on
# this single-core host; caching across pytest runs is a large speedup
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# this host's CPU backend runs f32 matmuls in reduced precision by default;
# tests compare against exact numpy math, so force full precision
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devices = jax.devices()
    assert len(devices) >= 8, "expected 8 virtual CPU devices"
    return devices
