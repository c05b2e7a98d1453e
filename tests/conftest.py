"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware. Must run before any jax
import."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Drop the axon TPU plugin from the import path: its registration performs
# a TPU-pool handshake at jax import time which can stall for minutes when
# the tunnel is congested — tests are CPU-only and must stay hermetic.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)

# The axon sitecustomize imports jax at interpreter start, so jax.config
# already captured JAX_PLATFORMS=axon from the ambient env — setting the
# env var above is too late. Force the platform through the config API
# (must run before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_index_base(tmp_path):
    return str(tmp_path / "indexes" / "test" / "documents.leann")
