"""Regression tests: sibling GP clones must not share mutable caches.

Round-1 verdict reproduced a silent wrong-covariance bug: two clones of a
common ancestor defining the same element key got each other's Gram blocks
through the shared ``_covblock_cache``/``_kernel_cache``/``_decomp_cache``.
Reference behavior to match: each GP instance gives independent results
(reference ``_GP/_base.py:86-104`` immutable-builder semantics).
"""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def test_sibling_addx_same_key():
    base = lgp.GP(lgp.ExpQuad())
    x1 = jnp.array([0.0, 1.0])
    x2 = jnp.array([0.0, 10.0])
    g1 = base.addx(x1, 'a')
    g2 = base.addx(x2, 'a')
    K1 = g1.prior('a', raw=True)
    K2 = g2.prior('a', raw=True)
    np.testing.assert_allclose(np.asarray(K1[0, 1]), np.exp(-0.5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(K2[0, 1]), np.exp(-50.0), atol=1e-12)


def test_sibling_addx_order_independent():
    # compute on the first sibling BEFORE creating the second; then the
    # reverse order; results must agree with fresh GPs
    base = lgp.GP(lgp.ExpQuad())
    x1 = jnp.array([0.0, 1.0])
    x2 = jnp.array([0.0, 2.0])
    g1 = base.addx(x1, 'a')
    K1 = g1.prior('a', raw=True)
    g2 = base.addx(x2, 'a')
    K2 = g2.prior('a', raw=True)
    fresh1 = lgp.GP(lgp.ExpQuad()).addx(x1, 'a').prior('a', raw=True)
    fresh2 = lgp.GP(lgp.ExpQuad()).addx(x2, 'a').prior('a', raw=True)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(fresh1))
    np.testing.assert_allclose(np.asarray(K2), np.asarray(fresh2))


def test_sibling_addcov_same_key():
    base = lgp.GP()
    g1 = base.addcov(1.0 * jnp.eye(2), 'c')
    g2 = base.addcov(3.0 * jnp.eye(2), 'c')
    K1 = g1.prior('c', raw=True)
    K2 = g2.prior('c', raw=True)
    np.testing.assert_allclose(np.asarray(K1), np.eye(2))
    np.testing.assert_allclose(np.asarray(K2), 3 * np.eye(2))


def test_addcov_does_not_leak_into_ancestor():
    base = lgp.GP(lgp.ExpQuad()).addx(jnp.array([0.0, 1.0]), 'a')
    child = base.addcov(5.0 * jnp.eye(2), 'c')
    # the ancestor must not know about 'c' at all
    try:
        base.prior('c', raw=True)
    except KeyError:
        pass
    else:  # pragma: no cover
        raise AssertionError('ancestor saw the child element')
    K = child.prior('c', raw=True)
    np.testing.assert_allclose(np.asarray(K), 5 * np.eye(2))


def test_sibling_defproc_same_key():
    base = lgp.GP()
    x = jnp.array([0.0, 1.0])
    g1 = base.defproc('p', lgp.ExpQuad()).addx(x, 'a', proc='p')
    g2 = base.defproc('p', lgp.Maternp(p=1)).addx(x, 'a', proc='p')
    K1 = g1.prior('a', raw=True)
    K2 = g2.prior('a', raw=True)
    ref1 = lgp.ExpQuad()(x[:, None], x[None, :])
    ref2 = lgp.Maternp(p=1)(x[:, None], x[None, :])
    np.testing.assert_allclose(np.asarray(K1), np.asarray(ref1))
    np.testing.assert_allclose(np.asarray(K2), np.asarray(ref2))


def test_sibling_decomp_cache():
    x = jnp.linspace(0, 1, 8)
    y = jnp.sin(x)
    base = lgp.GP(lgp.ExpQuad())
    g1 = base.addx(x, 'a')
    g2 = base.addx(10 * x, 'a')
    ml1 = float(g1.marginal_likelihood({'a': y}))
    # compute on g1 first so its decomp is cached, then on g2
    ml2 = float(g2.marginal_likelihood({'a': y}))
    fresh2 = float(
        lgp.GP(lgp.ExpQuad()).addx(10 * x, 'a').marginal_likelihood({'a': y})
    )
    assert ml1 != ml2
    np.testing.assert_allclose(ml2, fresh2, rtol=1e-10)


def test_parent_cache_reuse_still_valid():
    # caches copied at clone time must still give correct (inherited) blocks
    x = jnp.array([0.0, 1.0, 2.0])
    base = lgp.GP(lgp.ExpQuad()).addx(x, 'a')
    Kbase = base.prior('a', raw=True)  # populate parent cache
    child = base.addx(x + 10, 'b')
    Kchild = child.prior('a', raw=True)
    np.testing.assert_allclose(np.asarray(Kchild), np.asarray(Kbase))
    # and the new cross block is right
    Kab = child.prior(['a', 'b'], raw=True)[('a', 'b')]
    ref = lgp.ExpQuad()(x[:, None], (x + 10)[None, :])
    np.testing.assert_allclose(np.asarray(Kab), np.asarray(ref), atol=1e-12)
