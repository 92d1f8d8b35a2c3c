"""Test configuration: CPU backend with 8 virtual devices, float64.

The reference runs float64 (pdgp.py:172 AutoFlow signatures); tests validate
the math in f64 on CPU and the sharding logic on a virtual 8-device mesh
(SURVEY.md section 4).  TPU runs use f32 + jitter (config.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may have been imported by a pytest plugin before this file ran, in which
# case the env var was captured too late — force the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
