"""Test environment: CPU backend with 8 virtual devices.

SURVEY.md SS4: Pallas interpret mode on CPU is our `sw_emu` tier; the 8-device
virtual CPU mesh is the standard fake backend for sharding tests. Real-TPU
validation happens in tools/tpu_smoke.py and bench.py (the `hw` tier).

Note: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon, so env-var overrides are too late — we must switch the
backend through jax.config before any backend initialization.
"""

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
