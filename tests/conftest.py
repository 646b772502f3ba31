"""Test configuration.

All tests run on CPU with 8 virtual devices (to exercise mesh-sharded
code without TPU hardware) and with x64 enabled (parity mode: matches the
reference library's jax_enable_x64 requirement so tolerances transfer).
Pallas kernels run with interpret=True on CPU (set in the ops module).
"""

import os

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in
# this environment; jax.config.update('jax_platforms', ...) is respected.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# persistent compile cache: repeat test runs skip XLA compilation
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update('jax_compilation_cache_dir', _cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Deterministic per-test numpy RNG seeded from the test node id."""
    seed = np.frombuffer(request.node.nodeid.encode(), dtype=np.uint8)
    return np.random.default_rng(np.concatenate([[2026], seed]))


@pytest.fixture
def key(request):
    """Deterministic per-test JAX PRNG key."""
    seed = abs(hash(request.node.nodeid)) % (2**31)
    return jax.random.PRNGKey(seed)
