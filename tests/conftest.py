"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding tests run anywhere (the real-TPU path is exercised by bench.py and
the driver's compile checks)."""

import os

# Must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The ambient axon TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")
# Tests compare against the fp32 PyTorch reference.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute training rehearsals / gradient sweeps — "
        "excluded from the fast tier (pytest -m 'not slow'); the full "
        "suite runs them nightly in CI.")
