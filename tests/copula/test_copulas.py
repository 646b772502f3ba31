"""Copula distributions vs scipy.stats ppf oracles (model: reference
tests/copula/test_copulas.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from util import tol
import scipy.stats as st

from lsqfitgp_tpu import copula, uncert


CASES = [
    (lambda: copula.beta(2.0, 3.0), st.beta(2.0, 3.0)),
    (lambda: copula.uniform(-1.0, 2.0), st.uniform(-1.0, 3.0)),
    (lambda: copula.halfnorm(1.5), st.halfnorm(scale=1.5)),
    (lambda: copula.halfcauchy(0.7), st.halfcauchy(scale=0.7)),
    (lambda: copula.gamma(2.5, 1.3), st.gamma(2.5, scale=1 / 1.3)),
    (lambda: copula.invgamma(2.5, 1.3), st.invgamma(2.5, scale=1.3)),
    (lambda: copula.loggamma(1.7), st.loggamma(1.7)),
    (lambda: copula.lognorm(0.3, 0.8), st.lognorm(0.8, scale=np.exp(0.3))),
]


@pytest.mark.parametrize(
    'make,ref', CASES, ids=[c[1].dist.name for c in CASES]
)
def test_matches_scipy_ppf(make, ref):
    d = make()
    x = np.linspace(-6, 6, 41)
    got = np.asarray(d.partial_invfcn(jnp.asarray(x)[:, None]))
    want = ref.ppf(st.norm.cdf(x))
    np.testing.assert_allclose(got, want, **tol(1e-6, 1e-12, rtol32=1e-3, atol32=1e-4))


def test_extreme_tails():
    d = copula.gamma(2.0, 1.0)
    for x in [-8.0, 8.0]:
        v = float(d.partial_invfcn(jnp.asarray([x])))
        want = st.gamma(2.0).ppf(st.norm.cdf(x)) if x < 0 else \
            st.gamma(2.0).isf(st.norm.sf(x))
        np.testing.assert_allclose(v, want, **tol(1e-5, rtol32=1e-3, atol32=1e-4))


def test_dirichlet():
    alpha = [2.0, 3.0, 4.0]
    d = copula.dirichlet(alpha)
    assert d.in_size == 3
    out = np.asarray(d.partial_invfcn(jnp.zeros(3)))
    assert out.shape == (3,)
    np.testing.assert_allclose(out.sum(), 1.0, **tol(1e-12, rtol32=1e-5, atol32=1e-6))
    assert np.all(out > 0)


def test_nested_params():
    # gamma whose rate is itself a random variable
    rate = copula.gamma(3.0, 1.0)
    d = copula.gamma(2.0, rate)
    assert d.in_size == 2
    out = float(d.partial_invfcn(jnp.asarray([0.5, -0.3])))
    r = float(rate.partial_invfcn(jnp.asarray([0.5])))
    want = float(copula.gamma(2.0, r).partial_invfcn(jnp.asarray([-0.3])))
    np.testing.assert_allclose(out, want, **tol(1e-12, rtol32=1e-5, atol32=1e-6))


def test_shared_node_counted_once():
    shared = copula.gamma(2.0, 1.0)
    a = copula.gamma(1.0, shared)
    b = copula.gamma(3.0, shared)
    c = copula.Copula({'a': a, 'b': b})
    # shared consumes 1, a and b consume 1 each
    assert c.in_size == 3
    out, _ = c._invfcn_memo(jnp.asarray([0.1, 0.2, 0.3]), 0, {})
    assert set(out) == {'a', 'b'}


def test_arithmetic_transform():
    d = 2.0 * copula.halfnorm(1.0) + 1.0
    out = float(d.partial_invfcn(jnp.asarray([0.7])))
    base = float(copula.halfnorm(1.0).partial_invfcn(jnp.asarray([0.7])))
    np.testing.assert_allclose(out, 2 * base + 1)
    e = np.exp(copula.uniform(0.0, 1.0))
    v = float(e.partial_invfcn(jnp.asarray([0.0])))
    np.testing.assert_allclose(v, np.exp(0.5), **tol(1e-12, rtol32=1e-5, atol32=1e-6))


def test_makedict_roundtrip():
    bd = copula.makedict({
        'alpha': copula.beta(2.0, 1.0),
        'sigma2': copula.invgamma(1.0, 1.0),
        'plain': uncert.normal(0.0, 1.0),
    })
    keys = bd.keys()
    assert any('(alpha)' in k for k in keys)
    a = bd['alpha']
    assert isinstance(a, uncert.UArray)
    # at the prior mean (0), alpha = beta(2,1).ppf(0.5)
    np.testing.assert_allclose(
        float(a.mean), st.beta(2, 1).ppf(0.5), **tol(1e-8, rtol32=1e-4, atol32=1e-5)
    )
    assert float(a.sdev) > 0


def test_makedict_cross_key_sharing_raises():
    shared = copula.gamma(2.0, 1.0)
    with pytest.raises(ValueError):
        copula.makedict({
            'a': copula.gamma(1.0, shared),
            'b': copula.gamma(3.0, shared),
        })


def test_fit_with_copula_hyperprior(rng):
    # end-to-end: copula hyperprior drives empbayes_fit
    import lsqfitgp_tpu as lgp
    from lsqfitgp_tpu.kernels import ExpQuad

    n = 25
    x = np.sort(rng.uniform(-3, 3, n))
    K = np.asarray(ExpQuad(scale=1.5)(x[:, None], x[None, :]))
    y = np.linalg.cholesky(np.asarray(K, 'f8') + 1e-6 * np.eye(n)) @ rng.standard_normal(n) \
        + 0.05 * rng.standard_normal(n)

    hyp = copula.makedict({'scale': copula.lognorm(0.0, 1.0)})

    def gpfactory(hp):
        gp = lgp.GP(ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f').addcov(0.05**2 * jnp.eye(n), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    # scipy's strict line-search criteria routinely report 'precision
    # loss' at float32 gradient accuracy; the iterate is still good
    fit = lgp.empbayes_fit(hyp, gpfactory, {'y': y}, raises=False)
    s = float(fit.p['scale'].mean)
    assert 0.3 < s < 8.0
