"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All tests run on CPU so they are hermetic and exercise the same sharding
code paths the driver validates via `__graft_entry__.dryrun_multichip`.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env exports axon/TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# The image's axon (TPU) plugin force-appends itself to jax_platforms;
# override via config (must run before the first backend initialization).
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch-CPU fp32; XLA's default conv/matmul
# precision emulates TPU bf16 passes. Pin full precision for testing.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs
