"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware. Must run before any jax
import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_index_base(tmp_path):
    return str(tmp_path / "indexes" / "test" / "documents.leann")
