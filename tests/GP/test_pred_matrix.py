"""All `pred` paths agree (model: reference tests/GP/test_pred.py:66 —
fromdata/fromfit × raw/keepcorr × gvar/separate-cov)."""

from util import lane_allclose
import numpy as np
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu import GP, uncert
from lsqfitgp_tpu.kernels import Expon


@pytest.fixture
def setup(rng):
    x = np.sort(rng.uniform(-3, 3, 15))
    xs = np.linspace(-4, 4, 8)
    y = np.sin(x)
    noise = 0.1 * np.eye(len(x))
    gp = GP(Expon()).addx(x, 'a').addx(xs, 'b')
    return gp, y, noise


@pytest.mark.parametrize('fromdata', [True, False])
def test_raw_vs_uarray_vs_keepcorr(setup, fromdata):
    gp, y, noise = setup

    # path 1: raw (mean, cov)
    mean1, cov1 = gp.pred({'a': y}, 'b', noise, fromdata=fromdata, raw=True)

    # path 2: plain data + explicit cov -> UArray
    u2 = gp.pred({'a': y}, 'b', noise, fromdata=fromdata)

    # path 3: data as UArray (keepcorr)
    yu = uncert.from_cov(y, noise)
    u3 = gp.pred({'a': yu}, 'b', fromdata=fromdata)

    lane_allclose(np.asarray(u2.mean), np.asarray(mean1),
                               rtol=1e-8, atol=1e-12)
    lane_allclose(np.asarray(u3.mean), np.asarray(mean1),
                               rtol=1e-8, atol=1e-12)
    lane_allclose(np.asarray(u2.cov()), np.asarray(cov1),
                               rtol=1e-6, atol=1e-9)
    lane_allclose(np.asarray(u3.cov()), np.asarray(cov1),
                               rtol=1e-6, atol=1e-9)


def test_multikey_output_correlations(setup):
    gp, y, noise = setup
    out = gp.predfromdata({'a': y}, ['a', 'b'], noise)
    # predicting the data key under noise: posterior of f at x
    assert out['a'].shape == y.shape
    assert out['b'].shape == (8,)
    # joint covariance consistent with single-key calls
    ub = gp.predfromdata({'a': y}, 'b', noise)
    lane_allclose(
        np.asarray(out['b'].cov()), np.asarray(ub.cov()),
        rtol=1e-7, atol=1e-10,
    )
    # cross covariance symmetric consistency
    Cab = np.asarray(uncert.evalcov(out['a'], out['b']))
    Cba = np.asarray(uncert.evalcov(out['b'], out['a']))
    lane_allclose(Cab, Cba.T, rtol=1e-8, atol=1e-12)


def test_pred_default_outkeys(setup):
    gp, y, noise = setup
    out = gp.predfromdata({'a': y}, givencov=noise)
    assert set(out) == {'b'}


def test_mlkw_epsrel(setup):
    gp, y, noise = setup
    dec0, r = gp._prior_decomp({'a': y}, noise)
    dec1, _ = gp._prior_decomp({'a': y}, noise, epsrel=0.1)
    assert float(dec1.eps) > float(dec0.eps)
    # r is in the lane's default float; compare after the same cast
    np.testing.assert_array_equal(np.asarray(r), np.asarray(jnp.asarray(y)))
