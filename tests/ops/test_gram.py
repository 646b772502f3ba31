"""Pallas Gram evaluator vs XLA broadcast reference (interpret mode on
CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.ops import gram, gram_xla


PROFILES = [
    ('expquad', lambda r2: jnp.exp(-0.5 * r2)),
    ('cauchy', lambda r2: 1 / (1 + r2 / 2)),
    ('matern12ish', lambda r2: jnp.exp(-jnp.sqrt(r2 + 1e-30))),
]


@pytest.mark.parametrize('name,profile', PROFILES, ids=[p[0] for p in PROFILES])
@pytest.mark.parametrize('shape', [(10, 7, 1), (300, 260, 3), (256, 128, 8)])
def test_matches_xla(name, profile, shape, rng):
    n, m, p = shape
    x = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, p)), jnp.float32)
    K1 = np.asarray(gram(profile, x, y, tile=128))
    K2 = np.asarray(gram_xla(profile, x, y))
    np.testing.assert_allclose(K1, K2, atol=2e-6)


def test_noise_fused(rng):
    profile = lambda r2: jnp.exp(-0.5 * r2)
    x = jnp.asarray(rng.standard_normal((100, 2)), jnp.float32)
    K1 = np.asarray(gram(profile, x, noise=0.25, tile=128))
    K2 = np.asarray(gram_xla(profile, x, x, noise=0.25))
    np.testing.assert_allclose(K1, K2, atol=2e-6)


def test_1d_input(rng):
    profile = lambda r2: jnp.exp(-r2)
    x = jnp.asarray(rng.standard_normal(50), jnp.float32)
    K1 = np.asarray(gram(profile, x, tile=128))
    K2 = np.asarray(gram_xla(profile, x[:, None], x[:, None]))
    np.testing.assert_allclose(K1, K2, atol=2e-6)


def test_inside_jit(rng):
    profile = lambda r2: jnp.exp(-0.5 * r2)
    x = jnp.asarray(rng.standard_normal((64, 2)), jnp.float32)

    @jax.jit
    def f(x):
        return gram(profile, x, tile=128)

    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(gram_xla(profile, x, x)), atol=2e-6
    )


def test_gram_sym_matches(rng):
    from lsqfitgp_tpu.ops import gram_sym
    profile = lambda r2: jnp.exp(-0.5 * r2)
    x = jnp.asarray(rng.standard_normal((300, 3)), jnp.float32)
    K1 = np.asarray(gram_sym(profile, x, noise=0.1, tile=128))
    K2 = np.asarray(gram_xla(profile, x, x, noise=0.1))
    np.testing.assert_allclose(K1, K2, atol=2e-6)
    np.testing.assert_allclose(K1, K1.T, atol=0)
