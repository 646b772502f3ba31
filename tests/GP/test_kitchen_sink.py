"""One GP using every element and process feature at once, driven
through every terminal operation — the cross-feature integration paths
where isolated unit tests leave gaps (e.g. the raniter joint-sampling
and BagOfWords host-array bugs lived between features, not inside
one)."""

import numpy as np
import pytest

import lsqfitgp_tpu as lgp


@pytest.fixture
def rich_gp(rng):
    x = np.linspace(0, 4, 12)
    gp = (
        lgp.GP()
        # two correlated processes via a transformation DAG
        .defproc('base', lgp.ExpQuad(scale=1.5))
        .defproc('slow', 2.5 * lgp.Maternp(p=1, scale=3.0))
        .deftransf('mix', {'base': 0.7, 'slow': 0.3})
        .deflintransf('warp', lambda f: (lambda xx: f(xx) + 0.0),
                      ['mix'])
        # elements: plain points, a derivative, a lintransf, addcov,
        # addtransf
        .addx(x, 'f', proc='mix')
        .addx(x[:6], 'df', proc='base', deriv=1)
        .addcov(0.05 * np.eye(12), 'noise')
        .addlintransf(lambda f, e: f + e, ['f', 'noise'], 'obs',
                      checklin=False)
        .addtransf({'f': np.full(12, 1 / 12)}, 'avg')
    )
    y = np.sin(1.3 * x) + 0.1 * rng.standard_normal(12)
    return gp, x, y


def test_all_terminal_ops(rich_gp, rng):
    gp, x, y = rich_gp

    # prior, raw and uncertain
    K = np.asarray(gp.prior('obs', raw=True))
    assert K.shape == (12, 12) and np.all(np.isfinite(K))
    pri = gp.prior(['f', 'df', 'avg'])
    assert np.isfinite(np.asarray(pri['avg'].sdev))

    # marginal likelihood
    ml = float(gp.marginal_likelihood({'obs': y}))
    assert np.isfinite(ml)

    # posterior over every element kind at once, incl. the derivative
    post = gp.predfromdata({'obs': y}, ['f', 'df', 'avg'])
    for k in ('f', 'df', 'avg'):
        assert np.all(np.isfinite(np.asarray(post[k].mean)))
        assert np.all(np.asarray(post[k].sdev) >= 0)

    # the average element equals the average of the f element (linear
    # consistency across the posterior)
    np.testing.assert_allclose(
        float(post['avg'].mean),
        float(np.mean(np.asarray(post['f'].mean))), rtol=1e-4)

    # joint sampling from the multi-element posterior
    s = next(lgp.raniter(post, rng=0))
    assert np.all(np.isfinite(np.asarray(s['df'])))
    np.testing.assert_allclose(
        float(np.mean(np.asarray(s['f']))), float(s['avg']),
        atol=5 * float(np.asarray(post['avg'].sdev)) + 1e-3)

    # predfromfit variant
    postf = gp.predfromfit({'obs': y}, ['f'])
    assert np.all(np.isfinite(np.asarray(postf['f'].mean)))


def test_fit_through_rich_model(rng):
    """empbayes_fit over a model with a derivative element and addcov
    noise — the fit bridge across the same feature set."""
    x = np.linspace(0, 3, 15)
    y = np.cos(2 * x) + 0.05 * rng.standard_normal(15)

    def gpf(hp):
        gp = lgp.GP(lgp.ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f').addcov(
            hp['sigma'] ** 2 * np.eye(15), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    fit = lgp.empbayes_fit(
        {'log(scale)': (0.0, 1.0), 'log(sigma)': (np.log(0.05), 1.0)},
        gpf, {'y': y}, raises=False,
    )
    scale = float(fit.pmean['scale'])
    assert 0.1 < scale < 10
    gp = gpf(fit.pmean)
    post = gp.predfromdata({'y': y}, ['f'])
    resid = np.asarray(post['f'].mean) - np.cos(2 * x)
    assert np.abs(resid).mean() < 0.15


def test_streaming_kernel_frontend(rng):
    """stream_marginal_likelihood / stream_pred on a KERNEL OBJECT
    (the universal amp * ExpQuad(scale) fit form, structured inputs)
    agree with the dense GP on the same model."""
    n, ns, p = 280, 30, 3
    feats = rng.standard_normal((n, p))
    fstar = rng.standard_normal((ns, p))
    xs = lgp.asarray({f'f{i}': feats[:, i] for i in range(p)})
    xss = lgp.asarray({f'f{i}': fstar[:, i] for i in range(p)})
    y = np.sin(feats @ np.ones(p)) + 0.1 * rng.standard_normal(n)
    noise = 0.01
    k = 1.4 * lgp.ExpQuad(scale=1.7)

    ml = float(lgp.stream_marginal_likelihood(
        k, xs, y, noisevar=noise, block=128, b1=128,
        precision='highest'))
    mean, var = lgp.stream_pred(
        k, xs, y, xss, noisevar=noise, return_var=True, block=128,
        b1=128, precision='highest')

    gp = lgp.GP(k).addx(xs, 'd').addx(xss, 's')
    want_ml = float(gp.marginal_likelihood(
        {'d': y}, {('d', 'd'): noise * np.eye(n)}))
    post = gp.predfromdata({'d': y}, ['s'],
                           {('d', 'd'): noise * np.eye(n)})
    np.testing.assert_allclose(ml, want_ml, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(post['s'].mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(post['s'].sdev) ** 2,
                               rtol=3e-2, atol=1e-4)

    # the gradient variant is differentiable in the hyperparameters
    import jax
    import jax.numpy as jnp

    def negml(w):
        kk = w[0] * lgp.ExpQuad(scale=w[1])
        return -lgp.stream_marginal_likelihood(
            kk, xs, jnp.asarray(y, jnp.float32), noisevar=w[2],
            nprobes=256, block=128, b1=128)

    w0 = jnp.asarray([1.4, 1.7, 0.01], jnp.float32)
    v, g = jax.value_and_grad(negml)(w0)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(float(v), -want_ml, rtol=1e-2)
