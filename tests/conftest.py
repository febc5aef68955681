"""Test config: run JAX on a virtual 8-device CPU mesh.

jax is pre-imported at interpreter startup in this environment (with
platform "axon" = one remote TPU chip), so setting JAX_PLATFORMS here
would be ignored; use jax.config.update before any backend init.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
