"""GP(solver='chol-stream'): the streaming pipeline as a first-class
GP solver — marginal_likelihood / predfromdata / empbayes_fit through
the standard public surface only (round-3 VERDICT item: streaming must
not be a side API)."""

import numpy as np
import pytest
import jax
from jax import numpy as jnp

import lsqfitgp_tpu as lgp


@pytest.fixture
def model(rng):
    n, ns = 280, 25
    x = np.sort(rng.uniform(-5, 5, n)).astype(np.float32)
    xs = np.linspace(-4.5, 4.5, ns).astype(np.float32)
    y = (np.sin(1.5 * x) + 0.1 * rng.standard_normal(n)) \
        .astype(np.float32)
    return x, xs, y


STREAMKW = dict(solver='chol-stream', block=128, b1=128)


def test_white_kernel_model_matches_dense(model):
    """amp*ExpQuad(scale) + noise*White() — noise folded in the kernel;
    streaming ML and posterior match the dense solver."""
    x, xs, y = model
    noise = 0.01
    k = 1.4 * lgp.ExpQuad(scale=1.7) + noise * lgp.White()
    assert k._fastgram is not None and k._fastgram.noise is not None

    gps = lgp.GP(k, **STREAMKW).addx(x, 'd').addx(xs, 's')
    gpd = lgp.GP(k).addx(x, 'd').addx(xs, 's')

    ml_s = float(gps.marginal_likelihood({'d': y}))
    ml_d = float(gpd.marginal_likelihood({'d': y}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)

    post_s = gps.predfromdata({'d': y}, 's')
    post_d = gpd.predfromdata({'d': y}, 's')
    np.testing.assert_allclose(np.asarray(post_s.mean),
                               np.asarray(post_d.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(post_s.sdev),
                               np.asarray(post_d.sdev),
                               rtol=3e-2, atol=1e-3)


def test_scalar_givencov_matches_dense(model):
    """Noise outside the kernel: a SCALAR givencov is the streaming
    form of the iid noise matrix."""
    x, xs, y = model
    noise = np.float32(0.01)
    k = 1.4 * lgp.ExpQuad(scale=1.7)
    n = x.size

    gps = lgp.GP(k, **STREAMKW).addx(x, 'd').addx(xs, 's')
    gpd = lgp.GP(k).addx(x, 'd').addx(xs, 's')

    ml_s = float(gps.marginal_likelihood({'d': y}, noise))
    ml_d = float(gpd.marginal_likelihood(
        {'d': y}, {('d', 'd'): float(noise) * np.eye(n)}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)

    post_s = gps.predfromdata({'d': y}, 's', noise)
    post_d = gpd.predfromdata(
        {'d': y}, 's', {('d', 'd'): float(noise) * np.eye(n)})
    np.testing.assert_allclose(np.asarray(post_s.mean),
                               np.asarray(post_d.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(post_s.sdev),
                               np.asarray(post_d.sdev),
                               rtol=3e-2, atol=1e-3)


def test_raw_and_multi_key_outputs(model):
    x, xs, y = model
    k = 1.2 * lgp.ExpQuad(scale=1.5) + 0.02 * lgp.White()
    gps = lgp.GP(k, **STREAMKW).addx(x, 'd') \
        .addx(xs[:10], 'a').addx(xs[10:], 'b')
    mean, cov = gps.predfromdata({'d': y}, 'a', raw=True)
    assert mean.shape == (10,) and cov.shape == (10, 10)
    means, covs = gps.predfromdata({'d': y}, ['a', 'b'], raw=True)
    assert means['a'].shape == (10,) and means['b'].shape == (15,)
    assert covs['a', 'b'].shape == (10, 15)
    # joint dict output consistent with single-key calls
    post = gps.predfromdata({'d': y}, ['a', 'b'])
    np.testing.assert_allclose(np.asarray(post['a'].mean), means['a'],
                               rtol=1e-5)


def test_marginal_likelihood_is_differentiable(model):
    """The streaming ML through the GP object carries the exact
    gradient: jax.grad of a traced-hyperparameter model matches the
    dense chol_nll gradient."""
    x, _, y = model
    n = x.size

    def ml_stream(w):
        k = w[0] * lgp.ExpQuad(scale=w[1]) + w[2] * lgp.White()
        gp = lgp.GP(k, checkpos=False, checksym=False, **STREAMKW) \
            .addx(x, 'd')
        return gp.marginal_likelihood({'d': y})

    def ml_dense(w):
        xf = jnp.asarray(x)
        d2 = (xf[:, None] - xf[None, :]) ** 2
        K = w[0] * jnp.exp(-0.5 * d2 / w[1] ** 2) \
            + w[2] * jnp.eye(n, dtype=jnp.float32)
        from lsqfitgp_tpu.linalg import chol_nll
        return -chol_nll(K, jnp.asarray(y), epsrel=0, epsabs=0)

    w0 = jnp.asarray([1.4, 1.7, 0.02], jnp.float32)
    v_s, g_s = jax.value_and_grad(ml_stream)(w0)
    v_d, g_d = jax.value_and_grad(ml_dense)(w0)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=0.02, atol=2e-4 * abs(float(v_d)))


def test_empbayes_fit_through_public_api(rng):
    """The round-3 'done' criterion: a streaming fit goes through
    gpfactory/data only, no custom_nll."""
    n = 300
    x = np.sort(rng.uniform(-5, 5, n)).astype(np.float32)
    y = (np.sin(1.2 * x) + 0.1 * rng.standard_normal(n)) \
        .astype(np.float32)

    def gpfactory(hp):
        k = hp['amp'] * lgp.ExpQuad(scale=hp['scale']) \
            + hp['noise'] * lgp.White()
        return lgp.GP(k, **STREAMKW).addx(x, 'd')

    fit = lgp.empbayes_fit(
        {'log(amp)': (0.0, 1.0), 'log(scale)': (0.0, 1.0),
         'log(noise)': (np.log(0.01), 1.0)},
        gpfactory, {'d': y}, raises=False)
    noise = float(fit.pmean['noise'])
    scale = float(fit.pmean['scale'])
    assert 0.004 < noise < 0.03, noise
    assert 0.5 < scale < 5.0, scale


def test_diagnostic_messages(model):
    x, _, y = model
    n = x.size
    # two data elements
    gp0 = lgp.GP(lgp.ExpQuad(), **STREAMKW) \
        .addx(x, 'a').addx(x + 1.0, 'b')
    with pytest.raises(ValueError, match='need exactly 1'):
        gp0.marginal_likelihood({'a': y, 'b': y})
    # transformed kernel drops the spec
    k = lgp.ExpQuad().linop('rescale', lambda t: 1 + t ** 2)
    gp = lgp.GP(k, **STREAMKW).addx(x, 'd')
    with pytest.raises(ValueError, match='fast-Gram spec'):
        gp.marginal_likelihood({'d': y})
    # matrix givencov (scalar and per-point vectors are the only
    # diagonal forms the streaming solver accepts)
    gp2 = lgp.GP(lgp.ExpQuad(), **STREAMKW).addx(x, 'd')
    with pytest.raises(ValueError, match='vector'):
        gp2.marginal_likelihood({'d': y}, 0.01 * np.eye(n))
    # derivative element
    gp3 = lgp.GP(lgp.ExpQuad(), **STREAMKW).addx(x, 'd', deriv=1)
    with pytest.raises(ValueError, match='[Dd]erivative'):
        gp3.marginal_likelihood({'d': y})
    # predfromfit unsupported
    gp4 = lgp.GP(lgp.ExpQuad(), **STREAMKW).addx(x, 'd') \
        .addx(x[:5] + 0.5, 's')
    with pytest.raises(ValueError, match='predfromdata only'):
        gp4.predfromfit({'d': y}, 's', np.float32(0.01))


def test_dense_solver_unaffected_by_white_spec(model):
    """The White-noise spec must not change the DENSE path's values
    (the tiled engine bails out to the broadcast core on noise
    specs)."""
    x, _, y = model
    n = x.size
    k = 1.4 * lgp.ExpQuad(scale=1.7) + 0.01 * lgp.White()
    got = np.asarray(lgp.GP(k).addx(x, 'd').prior('d', raw=True))
    d2 = (x[:, None] - x[None, :]) ** 2
    want = 1.4 * np.exp(-0.5 * d2 / 1.7 ** 2) + 0.01 * np.eye(n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_streaming_fit_posterior_covariance(rng):
    """Laplace covariance on a streaming fit (round-3 VERDICT weak
    item: 'nothing pins what covariance= does on a streaming fit'):
    the custom-VJP likelihood has no second-order AD, so 'auto' must
    resolve to the BFGS inverse-hessian estimate, 'hess' must raise a
    clear error, the EXACT streamed 'fisher' must match the dense
    solver's fisher covariance, and the resulting posterior sdev must
    be finite, positive, and smaller than the prior's (the data are
    informative)."""
    n = 300
    x = np.sort(rng.uniform(-5, 5, n)).astype(np.float32)
    y = (np.sin(1.2 * x) + 0.1 * rng.standard_normal(n)) \
        .astype(np.float32)

    def gpfactory(hp):
        k = hp['amp'] * lgp.ExpQuad(scale=hp['scale']) \
            + hp['noise'] * lgp.White()
        return lgp.GP(k, **STREAMKW).addx(x, 'd')

    hyperprior = {'log(amp)': (0.0, 1.0), 'log(scale)': (0.0, 1.0),
                  'log(noise)': (np.log(0.01), 1.0)}

    fit = lgp.empbayes_fit(hyperprior, gpfactory, {'d': y},
                           raises=False)
    pcov = np.asarray(fit.pcov)
    assert np.all(np.isfinite(pcov))
    sd = np.sqrt(np.diag(pcov))
    assert np.all(sd > 0)
    # the noise hyperparameter is strongly identified by n=300 points:
    # its posterior sdev must shrink well below the prior sdev 1.0
    # (in log space)
    assert sd[list(fit.p.keys()).index('log(noise)')] < 0.5

    with pytest.raises(ValueError, match='custom-VJP'):
        lgp.empbayes_fit(hyperprior, gpfactory, {'d': y},
                         covariance='hess', raises=False)

    # the EXACT streamed Fisher covariance (linalg.chol_stream_fisher
    # through the fit) matches the dense solver's 'fisher' covariance
    def gpfactory_dense(hp):
        k = hp['amp'] * lgp.ExpQuad(scale=hp['scale']) \
            + hp['noise'] * lgp.White()
        return lgp.GP(k).addx(x, 'd')

    fit_s = lgp.empbayes_fit(hyperprior, gpfactory, {'d': y},
                             covariance='fisher', raises=False)
    fit_d = lgp.empbayes_fit(hyperprior, gpfactory_dense, {'d': y},
                             covariance='fisher', raises=False)
    # the two fits minimize independently at f32 gradient noise, so
    # their MAPs differ by the optimizer's stopping tolerance; the
    # covariance comparison inherits that offset on top of the Fisher
    # parity itself (pinned tightly at the linalg level in
    # tests/ops/test_syrk.py::test_chol_stream_fisher_matches_dense)
    np.testing.assert_allclose(np.asarray(fit_s.pmean.buf),
                               np.asarray(fit_d.pmean.buf),
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(fit_s.pcov),
                               np.asarray(fit_d.pcov),
                               rtol=1e-1, atol=1e-3)

    # frozen hyperparameters carry no posterior uncertainty and do not
    # enter the streamed Fisher contraction
    fit_f = lgp.empbayes_fit(hyperprior, gpfactory, {'d': y},
                             covariance='fisher', raises=False,
                             fix={'log(scale)': True})
    pcov_f = np.asarray(fit_f.pcov)
    i = list(fit_f.p.keys()).index('log(scale)')
    assert pcov_f[i, i] == 0
    assert np.all(np.isfinite(pcov_f))

    # jax optimizer provides no hessian estimate: 'auto' falls back to
    # the prior covariance with a warning
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        fit2 = lgp.empbayes_fit(hyperprior, gpfactory, {'d': y},
                                optimizer='jax', raises=False,
                                minkw={'maxiter': 5})
    assert any('custom-VJP' in str(r.message) for r in rec)
    pcov2 = np.asarray(fit2.pcov)
    # prior fallback: diagonal equals the hyperprior variances
    np.testing.assert_allclose(np.diag(pcov2), 1.0, rtol=1e-5)


def test_vector_givencov_matches_dense(model):
    """Heteroskedastic noise through the public surface: a per-point
    variance VECTOR as givencov rides the streaming diagonal and
    matches the dense solver's diagonal-matrix covariance."""
    x, xs, y = model
    n = x.size
    rng = np.random.default_rng(7)
    noise = rng.uniform(0.005, 0.05, n).astype(np.float32)
    k = 1.4 * lgp.ExpQuad(scale=1.7)

    gps = lgp.GP(k, **STREAMKW).addx(x, 'd').addx(xs, 's')
    gpd = lgp.GP(k).addx(x, 'd').addx(xs, 's')

    ml_s = float(gps.marginal_likelihood({'d': y}, noise))
    ml_d = float(gpd.marginal_likelihood(
        {'d': y}, {('d', 'd'): np.diag(noise.astype(float))}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)

    post_s = gps.predfromdata({'d': y}, 's', noise)
    post_d = gpd.predfromdata(
        {'d': y}, 's', {('d', 'd'): np.diag(noise.astype(float))})
    np.testing.assert_allclose(np.asarray(post_s.mean),
                               np.asarray(post_d.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(post_s.sdev),
                               np.asarray(post_d.sdev),
                               rtol=3e-2, atol=1e-3)

    # exact per-element noise gradient through the public ML
    def ml(nv):
        gp = lgp.GP(k, **STREAMKW).addx(x, 'd')
        return gp.marginal_likelihood({'d': y}, nv)

    g = jax.grad(ml)(jnp.asarray(noise))
    assert g.shape == (n,)

    def ml_dense(nv):
        gp = lgp.GP(k).addx(x, 'd')
        return gp.marginal_likelihood({'d': y}, jnp.diag(nv))

    gd = jax.grad(ml_dense)(jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=0.05, atol=0.05)


def test_vector_givencov_validation(model):
    x, _, y = model
    gps = lgp.GP(lgp.ExpQuad(), **STREAMKW).addx(x, 'd')
    with pytest.raises(ValueError, match='length'):
        gps.marginal_likelihood({'d': y}, np.ones(x.size + 3))
    with pytest.raises(ValueError, match='vector'):
        gps.marginal_likelihood({'d': y}, np.eye(x.size))


def test_sum_of_isotropic_kernels_streams(model):
    """Multi-lengthscale mixtures — ``a1*k1(s1) + a2*k2(s2) + White``
    — stream: the terms spec folds each scale into the summed profile,
    and ML/gradients/posterior match the dense solver."""
    x, xs, y = model
    k = 1.3 * lgp.ExpQuad(scale=0.6) + 0.8 * lgp.ExpQuad(scale=3.0) \
        + 0.02 * lgp.White()
    spec = k._fastgram
    assert spec is not None and spec.terms is not None \
        and spec.noise is not None

    gps = lgp.GP(k, **STREAMKW).addx(x, 'd').addx(xs, 's')
    gpd = lgp.GP(k).addx(x, 'd').addx(xs, 's')
    ml_s = float(gps.marginal_likelihood({'d': y}))
    ml_d = float(gpd.marginal_likelihood({'d': y}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)

    post_s = gps.predfromdata({'d': y}, 's')
    post_d = gpd.predfromdata({'d': y}, 's')
    np.testing.assert_allclose(np.asarray(post_s.mean),
                               np.asarray(post_d.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(post_s.sdev),
                               np.asarray(post_d.sdev),
                               rtol=3e-2, atol=1e-3)

    # exact gradient through BOTH scales (the multi-scale fit driver)
    def ml(w):
        kk = w[0] * lgp.ExpQuad(scale=w[1]) \
            + w[2] * lgp.ExpQuad(scale=w[3]) + w[4] * lgp.White()
        return lgp.GP(kk, **STREAMKW).addx(x, 'd') \
            .marginal_likelihood({'d': y})

    def ml_dense(w):
        kk = w[0] * lgp.ExpQuad(scale=w[1]) \
            + w[2] * lgp.ExpQuad(scale=w[3]) + w[4] * lgp.White()
        return lgp.GP(kk).addx(x, 'd').marginal_likelihood({'d': y})

    w0 = jnp.asarray([1.3, 0.6, 0.8, 3.0, 0.02], jnp.float32)
    gs = jax.grad(ml)(w0)
    gd = jax.grad(ml_dense)(w0)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=0.05, atol=0.05 * float(
                                   jnp.max(jnp.abs(gd))))


# -- 1-D stationary kernels on the streaming solver (round-4) ------------------

def test_stationary_kernel_streams(model):
    """Celerite (the classic time-series kernel) through
    GP(solver='chol-stream'): NLL, gradient, and posterior match the
    dense solver — 1-D stationary kernels are isotropic in |Δ|, so
    they ride the same never-materialized-Gram pipeline."""
    x, xs, y = model
    noise = 0.05

    def build(solver_kw):
        k = 1.3 * lgp.Celerite(gamma=0.5, B=0.2, scale=2.0)
        return lgp.GP(k, **solver_kw).addx(x, 'd').addx(xs, 's')

    gps = build(STREAMKW)
    gpd = build(dict(epsabs=noise, epsrel=0))

    ml_s = float(gps.marginal_likelihood({'d': y}, givencov=noise))
    ml_d = float(gpd.marginal_likelihood({'d': y}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)

    post_s = gps.predfromdata({'d': y}, 's', givencov=noise,
                              keepcorr=False)
    post_d = gpd.predfromdata({'d': y}, 's', keepcorr=False)
    np.testing.assert_allclose(np.asarray(post_s.mean),
                               np.asarray(post_d.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(post_s.sdev),
                               np.asarray(post_d.sdev),
                               rtol=3e-2, atol=1e-3)


def test_stationary_kernel_stream_gradient(model):
    """Exact streaming gradient through a stationary kernel's traced
    hyperparameter (the √r² chain rule on the profile) matches the
    dense path."""
    x, xs, y = model
    noise = 0.05

    def nll(g, stream):
        k = 1.3 * lgp.Celerite(gamma=g, B=0.2, scale=2.0)
        if stream:
            gp = lgp.GP(k, **STREAMKW).addx(x, 'd')
            return gp.marginal_likelihood({'d': y}, givencov=noise)
        gp = lgp.GP(k, epsabs=noise, epsrel=0).addx(x, 'd')
        return gp.marginal_likelihood({'d': y})

    v_s, g_s = jax.value_and_grad(nll)(jnp.float32(0.6), True)
    v_d, g_d = jax.value_and_grad(nll)(jnp.float32(0.6), False)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-3)
    np.testing.assert_allclose(float(g_s), float(g_d), rtol=0.02,
                               atol=2e-4 * abs(float(v_d)))


def test_periodic_signed_core_streams(model):
    """A symmetric 'signed'-input kernel (Periodic) streams via the
    evenness argument: k(x,y) = k(y,x) forces the core even in Δ, so
    evaluating it at √r² is exact."""
    x, xs, y = model
    noise = 0.05
    k = lgp.Periodic(outerscale=1.2)
    assert k._fastgram is not None and k._fastgram.mode == 'abs'

    gps = lgp.GP(k, **STREAMKW).addx(x, 'd')
    gpd = lgp.GP(k, epsabs=noise, epsrel=0).addx(x, 'd')
    ml_s = float(gps.marginal_likelihood({'d': y}, givencov=noise))
    ml_d = float(gpd.marginal_likelihood({'d': y}))
    np.testing.assert_allclose(ml_s, ml_d, rtol=2e-3)
