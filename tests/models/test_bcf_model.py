"""bcf model smoke + sanity tests (model: reference
tests/bayestree/test_bcf.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.models import bcf


@pytest.fixture
def causal_data(rng):
    n = 35
    x = rng.uniform(0, 1, (n, 2))
    true_mu = np.sin(2 * np.pi * x[:, 0])
    true_tau = 1.0 + 0.5 * x[:, 1]
    propensity = 1 / (1 + np.exp(-2 * (x[:, 0] - 0.5)))
    z = (rng.uniform(size=n) < propensity).astype(float)
    y = true_mu + true_tau * z + 0.1 * rng.standard_normal(n)
    return x, y, z, propensity, true_tau


FITKW = dict(
    minkw=dict(method='L-BFGS-B', options=dict(maxiter=12, maxls=4)),
)
KKW = dict(maxd=2, reset=None)


def test_bcf_fit(causal_data):
    x, y, z, pihat, true_tau = causal_data
    m = bcf(y=y, z=z, x_mu=x, pihat=pihat, fitkw=FITKW,
            kernelkw_mu=KKW, kernelkw_tau=KKW)
    assert 0 < float(m.z_0.mean) < 1
    assert float(m.sigma.mean) > 0
    assert float(m.lambda_tau.mean) > 0
    u = m.pred()
    assert u.shape == y.shape


def test_bcf_treatment_effect(causal_data, rng):
    x, y, z, pihat, true_tau = causal_data
    m = bcf(y=y, z=z, x_mu=x, pihat=pihat, fitkw=FITKW,
            kernelkw_mu=KKW, kernelkw_tau=KKW)
    # counterfactual difference at training covariates = tau in eta space
    u1 = m.pred(z=np.ones_like(z), x_mu=x, pihat=pihat)
    u0 = m.pred(z=np.zeros_like(z), x_mu=x, pihat=pihat)
    tau_eta = np.asarray(u1.mean) - np.asarray(u0.mean)
    # transform back to y scale: standardize is linear with scale std(y)
    tau_y = tau_eta * y.std()
    # average treatment effect should be positive and roughly right
    ate = tau_y.mean()
    assert 0.2 < ate < 3.0, ate


def test_bcf_yeojohnson(causal_data):
    x, y, z, pihat, true_tau = causal_data
    m = bcf(y=y - y.min() + 0.1, z=z, x_mu=x, pihat=pihat,
            transf=['standardize', 'yeojohnson'],
            fitkw=FITKW, kernelkw_mu=KKW, kernelkw_tau=KKW)
    assert 'transf1_lambda_yj' in m.fit.p
    eta = m.from_data(y - y.min() + 0.1)
    back = np.asarray(m.to_data(eta))
    np.testing.assert_allclose(back, y - y.min() + 0.1, rtol=1e-6)


def test_bcf_include_pi_tau(causal_data):
    x, y, z, pihat, true_tau = causal_data
    m = bcf(y=y, z=z, x_mu=x, x_tau=x, pihat=pihat, include_pi='both',
            fitkw=FITKW, kernelkw_mu=KKW, kernelkw_tau=KKW)
    assert np.isfinite(float(m.sigma.mean))


def test_bcf_quantilenorm(causal_data):
    # quantile-Normal y transform: eta must look standard-Normal-ish
    # and the round trip must reproduce y
    x, y, z, pihat, true_tau = causal_data
    m = bcf(y=y, z=z, x_mu=x, pihat=pihat, fitkw=FITKW,
            kernelkw_mu=KKW, kernelkw_tau=KKW, transf='quantilenorm')
    eta = np.asarray(m.from_data(y))
    assert abs(np.mean(eta)) < 0.3
    assert 0.5 < np.std(eta) < 1.5
    yy = np.asarray(m.to_data(eta))
    np.testing.assert_allclose(yy, np.asarray(y), rtol=1e-4, atol=1e-4)
    # monotone
    order = np.argsort(np.asarray(y))
    assert np.all(np.diff(eta[order]) >= 0)
    u = m.pred()
    assert u.shape == y.shape


def test_quantilenorm_helpers(rng):
    from lsqfitgp_tpu.models.bcf import _quantilenorm_knots, _pwl
    y = np.concatenate([rng.standard_normal(50) * 2 + 1,
                        np.full(10, 0.5)])  # with ties
    knots, etas = _quantilenorm_knots(jnp.asarray(y))
    k = np.asarray(knots)
    assert np.all(np.diff(k) > 0)  # strictly monotone despite ties
    # extrapolation beyond the knots is linear, not clamped
    e = _pwl(jnp.asarray([k[0] - 1.0, k[-1] + 1.0]), knots, etas)
    assert float(e[0]) < float(etas[0])
    assert float(e[1]) > float(etas[-1])
    # weighted variant
    w = rng.uniform(0.5, 2.0, y.size)
    knots_w, _ = _quantilenorm_knots(jnp.asarray(y), jnp.asarray(w))
    assert np.all(np.diff(np.asarray(knots_w)) > 0)


def test_yeojohnson_gradient_finite():
    """d/dλ of the branchy Yeo-Johnson must stay finite for data
    outside each branch's domain (x < -1 makes the x>=0 branch's
    (x+1)^λ log(x+1) NaN; where's 0*NaN cotangent used to poison the
    whole fit gradient at the prior mean — caught live by
    test_bcf_yeojohnson once non-finite first evaluations raise)."""
    import jax
    from lsqfitgp_tpu.models.bcf import yeojohnson, yeojohnson_inverse

    x = jnp.asarray([-3.0, -1.5, -0.5, 0.0, 0.7, 2.5])

    def fwd(lam):
        return jnp.sum(yeojohnson(x, lam))

    def inv(lam):
        return jnp.sum(yeojohnson_inverse(x, lam))

    for lam in (0.3, 1.0, 1.7):
        g = jax.grad(fwd)(jnp.asarray(lam))
        assert np.isfinite(float(g)), (lam, g)
        gi = jax.grad(inv)(jnp.asarray(lam))
        assert np.isfinite(float(gi)), (lam, gi)
    # round trip still exact after the domain clamps
    lam = jnp.asarray(0.8)
    np.testing.assert_allclose(
        np.asarray(yeojohnson_inverse(yeojohnson(x, lam), lam)),
        np.asarray(x), rtol=1e-6)
