"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled, so sharding logic and
fp64 numerics are validated without TPU hardware (the driver separately
dry-run-compiles the multi-chip path and benches on a real chip).
"""

import os

# Force-overwrite — the environment may pre-set JAX_PLATFORMS (e.g. to a TPU
# plugin); tests always run on host CPU.  Env vars alone are not enough: pytest
# plugins (jaxtyping) import jax before this conftest runs, freezing config
# defaults from the original env — so also update jax.config directly below
# (safe as long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices())
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_toy_data(rng, n=64, d=3, out=1, dtype=np.float64):
    """Draw inputs and GP-ish targets for small dense-oracle tests."""
    X = rng.normal(size=(n, d)).astype(dtype)
    w = rng.normal(size=(d, out)).astype(dtype)
    Y = np.tanh(X @ w) + 0.1 * rng.normal(size=(n, out)).astype(dtype)
    return X, Y


@pytest.fixture
def toy_data(rng):
    return make_toy_data(rng)
