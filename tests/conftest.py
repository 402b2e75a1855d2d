"""Test configuration: force an 8-virtual-device CPU platform.

Some environments pre-import jax from sitecustomize with a TPU backend
already registered (JAX_PLATFORMS may be overridden there), so setting env
vars alone is not enough — we also force the platform through jax.config,
which works as long as no backend has been *initialized* yet.  XLA_FLAGS is
still read lazily at CPU-client creation, so setting it here is in time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
