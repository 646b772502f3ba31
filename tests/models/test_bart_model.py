"""bayestree-equivalent bart model smoke + sanity tests (model:
reference tests/bayestree/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu import uncert
from lsqfitgp_tpu.models import bart


@pytest.fixture
def data(rng):
    n = 40
    x = rng.uniform(0, 1, (n, 2))
    f = np.sin(2 * np.pi * x[:, 0]) + x[:, 1]
    y = f + 0.1 * rng.standard_normal(n)
    return x, y, f


def test_fit_and_pred_train(data):
    x, y, f = data
    m = bart(x, y, fitkw=dict(
        minkw=dict(method='L-BFGS-B', options=dict(maxiter=30, maxls=4)),
    ))
    assert 0 < float(m.alpha.mean) < 1
    assert float(m.beta.mean) > 0
    assert float(m.sigma.mean) > 0
    u = m.pred()
    assert u.shape == y.shape
    # in-sample predictions should track the signal
    resid = np.asarray(u.mean) - f
    assert np.sqrt(np.mean(resid**2)) < 3 * np.std(f)


def test_pred_test_points(data, rng):
    x, y, f = data
    m = bart(x, y, kernelkw=dict(maxd=2, reset=None), fitkw=dict(
        minkw=dict(method='L-BFGS-B', options=dict(maxiter=15, maxls=4)),
    ))
    xt = rng.uniform(0, 1, (7, 2))
    u = m.pred(x_test=xt)
    assert u.shape == (7,)
    assert np.all(np.isfinite(np.asarray(u.mean)))
    assert np.all(np.asarray(u.sdev) > 0)
    ue = m.pred(x_test=xt, error=True)
    assert np.all(np.asarray(ue.sdev) >= np.asarray(u.sdev) - 1e-9)


def test_hp_sample(data, rng):
    x, y, f = data
    m = bart(x, y, kernelkw=dict(maxd=2, reset=None), fitkw=dict(
        minkw=dict(method='L-BFGS-B', options=dict(maxiter=10, maxls=4)),
    ))
    hp = m._gethp('sample', rng)
    assert 0 < float(hp['alpha']) < 1
    u = m.pred(hp=hp)
    assert np.all(np.isfinite(np.asarray(u.mean)))


def test_weights(data):
    x, y, f = data
    w = np.ones(len(y))
    w[:5] = 0.1
    m = bart(x, y, weights=w, kernelkw=dict(maxd=2, reset=None),
             fitkw=dict(minkw=dict(method='L-BFGS-B',
                                   options=dict(maxiter=10, maxls=4))))
    assert np.isfinite(float(m.sigma.mean))
