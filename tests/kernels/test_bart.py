"""BART kernel vs a brute-force recursion oracle (model: reference
tests/kernels/test_bart.py which checks the vectorized implementation
against a no-shortcut recursion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.kernels._bart import BART
from lsqfitgp_tpu import asarray

from util import tol


def brute_corr(nminus, n0, nplus, pnt, gamma, w):
    """Direct implementation of the BART recursion (pure python)."""
    nminus = np.asarray(nminus)
    n0 = np.asarray(n0)
    nplus = np.asarray(nplus)
    w = np.asarray(w, float)
    n = nminus + n0 + nplus
    active = (w > 0) & (n > 0)
    if not np.any((n0 > 0) & active):
        return 1.0
    if len(pnt) == 1:
        return 1 - (1 - gamma) * pnt[0]
    W = w[active].sum()
    total = 0.0
    for i in range(len(n)):
        if not active[i]:
            continue
        acc = 0.0
        for k in range(nminus[i]):
            nm = nminus.copy()
            nm[i] = k
            acc += brute_corr(nm, n0, nplus, pnt[1:], gamma, w)
        for k in range(nplus[i]):
            npl = nplus.copy()
            npl[i] = k
            acc += brute_corr(nminus, n0, npl, pnt[1:], gamma, w)
        total += w[i] * acc / n[i]
    return 1 - pnt[0] * (1 - total / W)


def pnt_of(alpha, beta, maxd):
    return [alpha / (1 + d) ** beta for d in range(maxd + 1)]


CASES = [
    # (nminus, n0, nplus, weights)
    ([3], [2], [4], None),
    ([0], [5], [0], None),
    ([2, 0], [1, 3], [0, 2], None),
    ([1, 2, 3], [0, 1, 2], [3, 2, 1], None),
    ([2, 5], [3, 0], [1, 2], [1.0, 2.0]),
    ([4, 4], [0, 0], [4, 4], None),        # identical points
    ([0, 0], [1, 1], [0, 0], None),
    ([3, 2], [2, 2], [3, 1], [1.0, 0.0]),  # zero-weight axis
]


@pytest.mark.parametrize('maxd', [0, 1, 2, 3])
@pytest.mark.parametrize('case', CASES, ids=[str(i) for i in range(len(CASES))])
def test_vs_bruteforce(case, maxd):
    nminus, n0, nplus, w = case
    p = len(nminus)
    wj = None if w is None else jnp.asarray(w)
    pnt = pnt_of(0.95, 2.0, maxd)
    gamma = 0.7
    want = brute_corr(nminus, n0, nplus, pnt,
                      gamma, np.ones(p) if w is None else w)
    got = float(BART.correlation(
        jnp.asarray(nminus), jnp.asarray(n0), jnp.asarray(nplus),
        alpha=0.95, beta=2.0, gamma=gamma, maxd=maxd, weights=wj,
    ))
    np.testing.assert_allclose(got, want, **tol(1e-10, rtol32=2e-5, atol32=2e-6),
                               err_msg=f'{case} maxd={maxd}')


@pytest.mark.parametrize('maxd', [1, 2])
def test_debug_matches_shortcut(maxd):
    nminus = jnp.asarray([2, 3])
    n0 = jnp.asarray([1, 0])
    nplus = jnp.asarray([0, 4])
    kw = dict(alpha=0.9, beta=1.5, gamma=0.4, maxd=maxd)
    a = float(BART.correlation(nminus, n0, nplus, **kw))
    b = float(BART.correlation(nminus, n0, nplus, debug=True, **kw))
    np.testing.assert_allclose(a, b, **tol(1e-10, rtol32=2e-5, atol32=2e-6))


def test_reset():
    # maxd=4 with reset=2: bracket (0,2) on top of bracket (2,4),
    # both evaluated on the original counts
    nminus = jnp.asarray([3, 1])
    n0 = jnp.asarray([1, 2])
    nplus = jnp.asarray([2, 2])
    pnt = jnp.asarray(pnt_of(0.95, 2.0, 4))
    inner = float(BART.correlation(
        nminus, n0, nplus, pnt=pnt[2:].at[0].set(1), gamma=1.0,
    ))
    want = float(BART.correlation(
        nminus, n0, nplus, pnt=pnt[:3], gamma=inner,
    ))
    got = float(BART.correlation(
        nminus, n0, nplus, alpha=0.95, beta=2.0, maxd=4, reset=2, gamma=1.0,
    ))
    np.testing.assert_allclose(got, want, **tol(1e-10, rtol32=2e-5, atol32=2e-6))


def test_altinput_equivalence(rng):
    n = jnp.asarray([5, 8])
    ix = jnp.asarray([2, 3])
    iy = jnp.asarray([4, 3])
    a = float(BART.correlation(n, ix, iy, altinput=True, maxd=2))
    nminus = jnp.minimum(ix, iy)
    n0 = jnp.abs(ix - iy)
    nplus = n - jnp.maximum(ix, iy)
    b = float(BART.correlation(nminus, n0, nplus, maxd=2))
    np.testing.assert_allclose(a, b, **tol(1e-10, rtol32=2e-5, atol32=2e-6))


def test_kernel_psd(rng):
    x = np.sort(rng.uniform(0, 10, 25))
    splits = BART.splits_from_coord(x)
    k = BART(splits=splits, maxd=2)
    K = np.asarray(k(x[:, None], x[None, :]))
    np.testing.assert_allclose(np.diag(K), 1, **tol(1e-10, rtol32=2e-5, atol32=2e-6))
    np.testing.assert_allclose(K, K.T, **tol(1e-10, rtol32=2e-5, atol32=2e-6))
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-9


def test_kernel_structured(rng):
    x = asarray({'a': rng.uniform(0, 1, 20), 'b': rng.uniform(0, 1, 20)})
    splits = BART.splits_from_coord(x)
    assert splits[0].shape == (2,)
    k = BART(splits=splits, maxd=2, reset=None)
    K = np.asarray(k(x[:, None], x[None, :]))
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-9
    np.testing.assert_allclose(np.diag(K), 1, **tol(1e-10, rtol32=2e-5, atol32=2e-6))


def test_monotonicity(rng):
    # correlation decreases as points get farther apart (more splits
    # between), increases with alpha smaller trees
    base = dict(alpha=0.95, beta=2.0, maxd=2)
    cs = [
        float(BART.correlation(
            jnp.asarray([3]), jnp.asarray([k]), jnp.asarray([3]), **base
        ))
        for k in range(0, 5)
    ]
    assert all(a >= b - 1e-12 for a, b in zip(cs, cs[1:]))


def test_indices_from_coord(rng):
    x = np.array([0.0, 1.0, 2.0, 3.0])
    splits = BART.splits_from_coord(x)
    length, spl = splits
    assert int(length[0]) == 3
    ix = np.asarray(BART.indices_from_coord(np.array([-1.0, 0.6, 2.7, 9.0]),
                                            splits))
    np.testing.assert_array_equal(ix[..., 0], [0, 1, 3, 3])


def test_jit(rng):
    x = np.sort(rng.uniform(0, 1, 10))
    splits = BART.splits_from_coord(x)
    k = BART(splits=splits, maxd=2)

    @jax.jit
    def f(x, y):
        return k(x, y)

    K1 = np.asarray(f(x[:, None], x[None, :]))
    K2 = np.asarray(k(x[:, None], x[None, :]))
    np.testing.assert_allclose(K1, K2, **tol(1e-10, rtol32=2e-5, atol32=2e-6))
