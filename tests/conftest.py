"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices (so multi-chip sharding
is exercised without a pod) and with x64 enabled (the parity bar is against
the reference's float64 Numba semantics).  Environment variables must be set
before JAX initializes its backends, hence this conftest.

TPU-only tests (real Pallas compilation, on-chip benchmarks) opt out via the
``requires_tpu`` marker and are skipped here.
"""

import os
import sys

# Force CPU: the harness environment pins JAX_PLATFORMS to the remote TPU
# relay, which would silently route every test compile through the tunnel.
# OCO_TESTS_TPU=1 opts into the real device (for `-m requires_tpu` runs).
_USE_TPU = os.environ.get("OCO_TESTS_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env write above can come too late: pytest plugins (jaxtyping) import
# jax before conftest runs, freezing JAX_PLATFORMS=axon (the remote TPU
# relay) into the config.  The config update below is authoritative.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "requires_tpu: needs a real TPU device (skipped on CPU harness)")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip = pytest.mark.skip(reason="no TPU in test harness (JAX_PLATFORMS=cpu)")
    for item in items:
        if "requires_tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
