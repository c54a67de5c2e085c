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
# The cache key includes the host CPU identity: XLA:CPU AOT results
# compiled on a different machine load with mismatched ISA features and can
# produce garbage numerics (observed as NaNs) or kill server threads.
# Hashing the cpuinfo `flags` line alone is NOT enough: LLVM derives
# microarchitecture-specific features (e.g. +prefer-no-scatter) from the
# CPUID family/model, so two VMs with identical flags but different CPU
# models (observed: a cache built elsewhere failed here with "Target
# machine feature +prefer-no-scatter is not supported on the host
# machine") poison each other — include family/model/stepping in the key.
import hashlib  # noqa: E402

try:
    with open('/proc/cpuinfo') as f:
        _cpu_sig = hashlib.md5(
            ''.join(line for line in f if line.startswith(
                ('flags', 'vendor_id', 'cpu family', 'model', 'stepping')))
            .encode()).hexdigest()[:8]
except OSError:
    _cpu_sig = 'unknown'
jax.config.update('jax_compilation_cache_dir',
                  '/root/.cache/jax_test_cache_' + _cpu_sig)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
