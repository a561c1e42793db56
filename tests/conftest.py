"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere, so this lives at the very
top of conftest (pytest imports it before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# persistent compilation cache: each new op/shape costs ~0.8s to compile on
# this single-core host; caching across pytest runs is a large speedup
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# this host's CPU backend runs f32 matmuls in reduced precision by default;
# tests compare against exact numpy math, so force full precision
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, "expected 8 virtual CPU devices"
    return devices
