"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize pre-registers the TPU plugin before conftest runs,
# so env vars alone are not enough — force the CPU platform via jax.config
# (must happen before any backend is initialized by test code).
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite re-jits large models across many
# test processes; caching cuts repeat runs from minutes to seconds.
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
