"""Test configuration.

All tests run on CPU with 8 virtual devices (to exercise mesh-sharded
code without TPU hardware).  Two lanes:

- default: x64 enabled (parity mode: matches the reference library's
  jax_enable_x64 requirement so tolerances transfer);
- ``LSQFITGP_TPU_F32=1``: float32, the dtype the framework actually
  ships on TPU.  Tests annotate fp32-appropriate tolerances through the
  ``tol``/``f32`` fixtures; tests that are meaningless in fp32 mark
  themselves with ``@pytest.mark.x64only``.

Pallas kernels run with interpret=True on CPU (set in the ops module).
"""

import os

F32_LANE = os.environ.get('LSQFITGP_TPU_F32', '') not in ('', '0')

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in
# this environment; jax.config.update('jax_platforms', ...) is respected.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', not F32_LANE)

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


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'x64only: test requires float64 (skipped in the LSQFITGP_TPU_F32 '
        'lane)',
    )


def pytest_collection_modifyitems(config, items):
    if not F32_LANE:
        return
    skip = pytest.mark.skip(reason='requires x64; LSQFITGP_TPU_F32 lane')
    for item in items:
        if 'x64only' in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def f32():
    """True when running the fp32 (TPU-regime) lane."""
    return F32_LANE


@pytest.fixture
def tol():
    """eps-scaled default tolerances for the active lane: a dict with
    'rtol'/'atol' usable as ``np.testing.assert_allclose(..., **tol)``."""
    if F32_LANE:
        return dict(rtol=2e-4, atol=1e-5)
    return dict(rtol=1e-9, atol=1e-12)


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
