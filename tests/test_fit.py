"""empbayes_fit statistical-correctness tests (model: reference
tests/test_fit.py — synthetic data from known hyperparameters, check the
estimate covers the truth)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP, empbayes_fit, uncert
from lsqfitgp_tpu.kernels import ExpQuad


def make_data(rng, n=40, scale=2.0, sigma=0.1):
    x = np.sort(rng.uniform(-5, 5, n))
    k = ExpQuad(scale=scale)
    K = np.asarray(k(x[:, None], x[None, :]))
    L = np.linalg.cholesky(np.asarray(K, 'f8') + 1e-6 * np.eye(n))
    f = L @ rng.standard_normal(n)
    y = f + sigma * rng.standard_normal(n)
    return x, y


def gpfactory_maker(x, sigma=0.1):
    n = len(x)

    def gpfactory(hp):
        gp = GP(ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f').addcov(sigma**2 * jnp.eye(n), 'e')
        gp = gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                             checklin=False)
        return gp

    return gpfactory


def test_fit_recovers_scale(rng):
    x, y = make_data(rng, scale=2.0)
    fit = empbayes_fit(
        {'log(scale)': (np.log(1.0), 1.0)},
        gpfactory_maker(x),
        {'y': y},
    )
    post = fit.p['scale']
    est = float(post.mean)
    err = float(post.sdev)
    assert abs(est - 2.0) < 4 * max(err, 0.3), (est, err)
    assert err > 0


def test_fit_jax_optimizer_agrees(rng):
    x, y = make_data(rng, scale=1.5)
    hp = {'log(scale)': (0.0, 1.0)}
    gpf = gpfactory_maker(x)
    fit1 = empbayes_fit(hp, gpf, {'y': y}, optimizer='scipy')
    fit2 = empbayes_fit(hp, gpf, {'y': y}, optimizer='jax', raises=False)
    np.testing.assert_allclose(
        float(fit1.p['scale'].mean), float(fit2.p['scale'].mean), rtol=1e-3
    )


def test_fit_fisher_covariance(rng):
    x, y = make_data(rng, scale=1.5)
    fit = empbayes_fit(
        {'log(scale)': (0.0, 1.0)},
        gpfactory_maker(x),
        {'y': y},
        covariance='fisher',
    )
    assert float(fit.p['scale'].sdev) > 0


def test_fit_fix(rng):
    x, y = make_data(rng, scale=1.5)
    fit = empbayes_fit(
        {'log(scale)': (np.log(1.7), 1.0), 'log(amp)': (0.0, 1.0)},
        lambda hp: (
            GP(hp['amp'] ** 2 * ExpQuad(scale=hp['scale']))
            .addx(x, 'f').addcov(0.01 * jnp.eye(len(x)), 'e')
            .addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                          checklin=False)
        ),
        {'y': y},
        fix={'log(scale)': True},
    )
    np.testing.assert_allclose(float(fit.p['scale'].mean), 1.7,
                               rtol=1e-7)
    np.testing.assert_allclose(float(fit.p['scale'].sdev), 0.0, atol=1e-6)


def test_fit_nograd(rng):
    x, y = make_data(rng, n=20, scale=1.5)
    fit = empbayes_fit(
        {'log(scale)': (0.0, 1.0)},
        gpfactory_maker(x),
        {'y': y},
        method='nograd',
    )
    assert 0.3 < float(fit.p['scale'].mean) < 10


def test_fit_additional_loss(rng):
    x, y = make_data(rng, n=25, scale=1.5)
    # huge quadratic pull toward log(scale)=log(3) dominates
    fit = empbayes_fit(
        {'log(scale)': (0.0, 5.0)},
        gpfactory_maker(x),
        {'y': y},
        additional_loss=lambda hp: 1e6 * (hp['log(scale)'] - np.log(3.0))**2,
    )
    np.testing.assert_allclose(float(fit.p['scale'].mean), 3.0, rtol=1e-2)


def test_fit_then_pred(rng):
    x, y = make_data(rng, scale=2.0)
    xs = np.linspace(-4, 4, 10)
    fit = empbayes_fit(
        {'log(scale)': (0.0, 1.0)}, gpfactory_maker(x), {'y': y}
    )
    gp = fit.gp().addx(xs, 'pred')
    u = gp.predfromdata({'y': y}, 'pred')
    assert u.shape == (10,)
    assert np.all(np.isfinite(np.asarray(u.mean)))
    assert np.all(np.asarray(u.sdev) >= -1e-12)


def test_raniter(rng, key):
    from lsqfitgp_tpu import raniter, sample
    mean = {'a': np.zeros(3), 'b': np.ones((2,))}
    cov = {
        ('a', 'a'): np.eye(3), ('b', 'b'): 0.25 * np.eye(2),
        ('a', 'b'): np.zeros((3, 2)),
    }
    it = raniter(mean, cov, key=key)
    s = next(it)
    assert s['a'].shape == (3,) and s['b'].shape == (2,)
    batch = sample(mean, cov, key=key, shape=500)
    assert batch['a'].shape == (500, 3)
    np.testing.assert_allclose(np.asarray(batch['b']).std(0), 0.5, atol=0.1)


def test_fit_optax_optimizer(rng):
    x, y = make_data(rng, n=30, scale=1.5)
    hp = {'log(scale)': (0.0, 1.0)}
    gpf = gpfactory_maker(x)
    f1 = empbayes_fit(hp, gpf, {'y': y}, raises=False)
    f2 = empbayes_fit(hp, gpf, {'y': y}, optimizer='optax', raises=False)
    from util import tol
    np.testing.assert_allclose(
        float(f1.p['scale'].mean), float(f2.p['scale'].mean),
        **tol(1e-4, rtol32=3e-3)
    )


def test_fit_expected_fisher(rng):
    x, y = make_data(rng, n=25, scale=1.5)
    gpf = gpfactory_maker(x)
    hp = {'log(scale)': (0.0, 1.0)}
    f_h = empbayes_fit(hp, gpf, {'y': y}, covariance='hess')
    f_f = empbayes_fit(hp, gpf, {'y': y}, covariance='fisher')
    sh = float(f_h.p['scale'].sdev)
    sf = float(f_f.p['scale'].sdev)
    assert sf > 0 and sh > 0
    # same order of magnitude (they estimate the same curvature)
    assert 0.3 < sf / sh < 3.0


def _many_param_setup(rng, n=24):
    """A model with P = n+1 > 20 hyperparameters (per-point noise levels
    plus the kernel scale), to exercise the Fisher-vector-product paths."""
    x = np.sort(rng.uniform(-5, 5, n))
    k = ExpQuad(scale=2.0)
    K = np.asarray(k(x[:, None], x[None, :]))
    L = np.linalg.cholesky(np.asarray(K, 'f8') + 1e-6 * np.eye(n))
    y = L @ rng.standard_normal(n) + 0.1 * rng.standard_normal(n)

    def gpfactory(hp):
        gp = GP(ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f')
        gp = gp.addcov(jnp.diag(hp['sigma'] ** 2), 'e')
        gp = gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                             checklin=False)
        return gp

    hp = {
        'log(scale)': (0.0, 1.0),
        'log(sigma)': (np.full(n, np.log(0.1)), np.full(n, 0.5)),
    }
    return hp, gpfactory, y


def test_fishvec_matches_dense_fisher(rng):
    # _make_fishvec agrees with the materialized jacfwd Fisher
    hp, gpf, y = _many_param_setup(rng, n=10)
    # the fit itself is incidental — we only need the assembled closures
    fit = empbayes_fit(hp, gpf, {'y': y}, raises=False,
                       minkw=dict(options=dict(maxiter=2)))
    w = jnp.asarray(rng.standard_normal(fit.w.size) * 0.1)
    v = jnp.asarray(rng.standard_normal(fit.w.size))
    fvec = fit._make_fishvec(fit._make_Kr, fit.fix)
    got = np.asarray(fvec(w, v))

    K0, r0 = fit._make_Kr(w)
    from lsqfitgp_tpu.linalg import Chol
    dK, dr = jax.jacfwd(fit._make_Kr)(w)
    F = Chol(K0).fisher(jnp.moveaxis(dK, -1, 0), dr.T) \
        + jnp.eye(v.size)
    want = np.asarray(F @ v)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_fit_fisher_method_large_P(rng):
    # method='fisher' at P > 20 runs through the hessp fishvec path and
    # covariance='fisher' through the lax.map column assembly
    hp, gpf, y = _many_param_setup(rng)
    fit = empbayes_fit(
        hp, gpf, {'y': y},
        method='fisher', covariance='fisher', raises=False,
        minkw=dict(options=dict(maxiter=15)),
    )
    assert fit.pcov.shape == (25, 25)
    assert np.all(np.isfinite(np.asarray(fit.pmean.buf)))
    # covariance must be PSD (fisher guarantees it)
    eigs = np.linalg.eigvalsh(np.asarray(fit.pcov, 'f8'))
    assert eigs.min() > -1e-6 * max(1, eigs.max())


def test_raniter_int_seeds():
    """rng= int seeds are honored and deterministic (0 was silently
    ignored, nonzero crashed)."""
    m, C = np.zeros(3), np.eye(3)
    a = next(lgp.raniter(m, C, rng=1))
    b = next(lgp.raniter(m, C, rng=1))
    c = next(lgp.raniter(m, C, rng=2))
    z = next(lgp.raniter(m, C, rng=0))
    z2 = next(lgp.raniter(m, C, rng=0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2))


def test_raniter_dict_of_uarrays(rng):
    """raniter on a dict of correlated UArrays (the output of GP.pred)
    must sample from the JOINT distribution: cross-key correlations
    preserved, and no elementwise coercion blow-up (the old dict branch
    iterated jnp.asarray over each UArray and ignored correlations)."""
    xd = np.linspace(0, 1, 4)
    xg = np.linspace(0, 1, 7)
    gp = (
        lgp.GP(lgp.ExpQuad(scale=0.5))
        .addx(xd, 'd').addx(xg, 'a').addx(xg + 0.005, 'b')
    )
    y = np.sin(3 * xd)
    post = gp.predfromdata(
        {'d': y}, ['a', 'b'], {('d', 'd'): 0.04 * np.eye(xd.size)})
    assert isinstance(post, dict)
    samples = [next(lgp.raniter(post, rng=int(s))) for s in range(60)]
    A = np.stack([np.asarray(s['a']) for s in samples])
    B = np.stack([np.asarray(s['b']) for s in samples])
    # 'b' points sit 0.005 away from 'a' points: joint samples must be
    # almost perfectly correlated pointwise (would be ~uncorrelated if
    # the cross-covariance were dropped), and the posterior has real
    # spread because the data are noisy
    assert np.all(np.std(A, axis=0) > 0.02)
    assert np.all(np.std(A - B, axis=0) < 0.1 * np.std(A, axis=0))
