"""Generic triu halfmatrix (any kernel core, not just isotropic
fast-path — reference ``_elements.py:567-573``) and
``addcov(decomps=...)`` (reference ``_elements.py:409``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP
from lsqfitgp_tpu.linalg import Chol

from util import tol


def test_halfmatrix_generic_parity(rng):
    """halfmatrix=True matches the broadcast assembly for a
    NON-isotropic kernel (no fast-gram spec), including through a
    posterior."""
    n = 60
    x = jnp.asarray(np.sort(rng.uniform(0.1, 3, n)))
    k = lgp.Gibbs(scalefun=lambda x: 0.5 + 0.1 * x)  # nonstationary
    K_full = np.asarray(GP(k).addx(x, 'a').prior('a', raw=True))
    K_half = np.asarray(
        GP(k, halfmatrix=True).addx(x, 'a').prior('a', raw=True))
    np.testing.assert_allclose(K_half, K_full,
                               **tol(1e-14, 1e-14, rtol32=1e-6,
                                     atol32=1e-6))
    assert np.allclose(K_half, K_half.T)


def test_halfmatrix_halves_evaluations(rng):
    """The core really is evaluated on the packed triu pair list (one
    1-D batch of n(n+1)/2 pairs), not the (n, n) broadcast."""
    n = 16
    shapes = []

    def spying_core(x, y):
        shapes.append(np.shape(x))
        return jnp.exp(-0.5 * (x - y) ** 2)

    from lsqfitgp_tpu.kernelalg import Kernel
    k = Kernel(spying_core)
    x = jnp.asarray(rng.standard_normal(n))
    GP(k, halfmatrix=True, checkpos=False, checksym=False) \
        .addx(x, 'a').prior('a', raw=True)
    assert (n * (n + 1) // 2,) in shapes
    assert (n, n) not in shapes


def test_halfmatrix_structured_bart(rng):
    """halfmatrix works on structured input with an expensive core
    (BART, the motivating kernel)."""
    from lsqfitgp_tpu import asarray
    n, p = 24, 3
    X = rng.standard_normal((n, p))
    xs = asarray({f'f{i}': X[:, i] for i in range(p)})
    splits = lgp.BART.splits_from_coord(xs)
    k = lgp.BART(splits=splits, maxd=2)
    K_full = np.asarray(GP(k).addx(xs, 'a').prior('a', raw=True))
    K_half = np.asarray(
        GP(k, halfmatrix=True).addx(xs, 'a').prior('a', raw=True))
    np.testing.assert_allclose(K_half, K_full,
                               **tol(1e-12, 1e-12, rtol32=1e-5,
                                     atol32=1e-5))


def test_addcov_decomps_used(rng):
    """A pre-factored noise block: the stored decomposition is the one
    the solver returns (no refactorization)."""
    n = 40
    S = rng.standard_normal((n, n))
    N = jnp.asarray(S @ S.T / n + np.eye(n))
    dec = Chol(N, blocked=False)
    gp = GP(lgp.ExpQuad()).addcov(N, 'noise', decomps=dec)
    got = gp._solver_for(['noise'])
    assert got is dec
    # and inference through it is consistent
    y = jnp.asarray(rng.standard_normal(n))
    ml = float(gp.marginal_likelihood({'noise': y}))
    direct = float(-dec.minus_log_normal_density(y))
    np.testing.assert_allclose(ml, direct, rtol=1e-12)


def test_addcov_decomps_dict_and_errors(rng):
    n = 10
    N = jnp.eye(n)
    dec = Chol(N, blocked=False)
    # dict form
    gp = GP(lgp.ExpQuad()).addcov({('a', 'a'): N}, decomps={'a': dec})
    assert gp._solver_for(['a']) is dec
    # wrong key
    with pytest.raises(KeyError):
        GP(lgp.ExpQuad()).addcov({('a', 'a'): N}, decomps={'b': dec})
    # wrong type
    with pytest.raises(TypeError):
        GP(lgp.ExpQuad()).addcov(N, 'a', decomps=np.eye(n))
    # wrong size
    with pytest.raises(ValueError):
        GP(lgp.ExpQuad()).addcov(N, 'a', decomps=Chol(jnp.eye(5),
                                                      blocked=False))
    # a multi-key solve does NOT use the single-block decomposition
    gp2 = GP(lgp.ExpQuad()).addx(jnp.linspace(0, 1, 8), 'x') \
        .addcov(N, 'n', decomps=dec)
    got = gp2._solver_for(['x', 'n'])
    assert got is not dec
