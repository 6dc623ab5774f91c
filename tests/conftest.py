"""Test environment: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code paths are exercised without TPU hardware."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # force: the image presets 'axon'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
# the axon PJRT plugin can win over the env var; pin via jax config too
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
