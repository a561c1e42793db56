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


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, "expected 8 virtual CPU devices"
    return devices
