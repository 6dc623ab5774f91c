"""Test environment: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code paths are exercised without TPU hardware."""
import os

# BOXINSTSEG_TEST_TPU=1 keeps the session's real backend — used to run
# backend-sensitive tests (tests/test_tree_backend_invariants.py) on
# hardware, where gather/scatter semantics differ from CPU
_ON_HW = os.environ.get('BOXINSTSEG_TEST_TPU') == '1'
if not _ON_HW:
    os.environ['JAX_PLATFORMS'] = 'cpu'   # force: the image presets 'axon'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: the suite is compile-bound (cold ~16 min);
# warm reruns hit the cache and finish in minutes. Env vars (not
# jax.config) so subprocess-based tests (test_multihost.py) inherit it.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_test_cache')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _cache_dir)
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

import jax  # noqa: E402
# the axon PJRT plugin can win over the env var; pin via jax config too
if not _ON_HW:
    jax.config.update('jax_platforms', 'cpu')
# jax may already be imported (pytest plugins) before this conftest runs,
# in which case the env vars above were read too late — set via config too
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
