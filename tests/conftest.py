"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU for speed/determinism; the driver separately compile-checks
the TPU path.  The 8 virtual devices back the multi-chip sharding tests
(SURVEY.md §4 item 5).

Note: ``JAX_PLATFORMS=cpu`` alone is NOT honored in this environment (the
experimental ``axon`` TPU plugin still claims the backend, and every op then
crosses the TPU tunnel), so the platform is pinned via ``jax.config`` before
any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
