"""Statistical correctness of the fitter: chi-square coverage test
(model: reference tests/test_fit.py check_fit/chisq_test — fit synthetic
data from known hyperparameters and check the truth is covered by the
estimated posterior)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.stats

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP, empbayes_fit
from lsqfitgp_tpu.kernels import ExpQuad

from util import tryagain


def make_fit(rng, true_logscale=np.log(2.0), true_logamp=0.3, n=60,
             sigma=0.05):
    x = np.sort(rng.uniform(-5, 5, n))
    k = np.exp(true_logamp) ** 2 * ExpQuad(scale=np.exp(true_logscale))
    K = np.asarray(k(x[:, None], x[None, :]))
    f = np.linalg.cholesky(np.asarray(K, 'f8') + 1e-6 * np.eye(n)) \
        @ rng.standard_normal(n)
    y = f + sigma * rng.standard_normal(n)

    def gpf(hp):
        gp = GP(hp['amp'] ** 2 * ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f').addcov(sigma ** 2 * jnp.eye(n), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    # 'precision loss' exits with a good iterate are routine for these
    # statistical fixtures (see the noise-floor note in fit.py); the
    # assertions judge the estimate itself
    return empbayes_fit(
        {'log(scale)': (0.0, 1.5), 'log(amp)': (0.0, 1.5)},
        gpf, {'y': y}, raises=False,
    )


@tryagain
def test_chisq_coverage(rng):
    """The whitened residual of the true hyperparameters under the
    estimated posterior should be chi-square distributed."""
    truth = np.array([np.log(2.0), 0.3])
    fit = make_fit(rng, *truth)
    est = np.asarray(fit.pmean.buf)
    cov = np.asarray(fit.pcov)
    resid = est - truth
    q = float(resid @ np.linalg.solve(cov, resid))
    # p-value of the chi-square statistic with 2 dof; reject only at
    # the 1e-3 level (loose: MAP+Laplace is approximate)
    p = scipy.stats.chi2(2).sf(q)
    assert p > 1e-3, (q, p, est, np.sqrt(np.diag(cov)))


# -- parametrized battery: kernels x methods x optimizers ---------------
# (model: reference tests/test_fit.py:60-200 multi-kernel multi-method
# grid with the flaky-tolerant retry of tests/util.py:105)

_KERNELS = {
    'expquad': lambda scale: lgp.ExpQuad(scale=scale),
    'matern52': lambda scale: lgp.Maternp(p=2, scale=scale),
    'cauchy': lambda scale: lgp.Cauchy(scale=scale),
}

_DRIVERS = [
    ('gradient', 'scipy'),
    ('gradient', 'optax'),
    ('fisher', 'scipy'),
]


@pytest.mark.parametrize('method,optimizer', _DRIVERS,
                         ids=[f'{m}-{o}' for m, o in _DRIVERS])
@pytest.mark.parametrize('kernel', sorted(_KERNELS))
@tryagain
def test_chisq_coverage_grid(rng, kernel, method, optimizer):
    """Coverage of the true hyperparameters across kernel families,
    minimization methods, and optimizers."""
    true_logscale, true_logamp = np.log(2.0), 0.2
    n, sigma = 50, 0.05
    kfam = _KERNELS[kernel]
    x = np.sort(rng.uniform(-5, 5, n))
    k = np.exp(true_logamp) ** 2 * kfam(np.exp(true_logscale))
    K = np.asarray(k(x[:, None], x[None, :]), 'f8')
    f = np.linalg.cholesky(K + 1e-6 * np.eye(n)) @ rng.standard_normal(n)
    y = f + sigma * rng.standard_normal(n)

    def gpf(hp):
        gp = GP(hp['amp'] ** 2 * kfam(hp['scale']))
        gp = gp.addx(x, 'f').addcov(sigma ** 2 * jnp.eye(n), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    fit = empbayes_fit(
        {'log(scale)': (0.0, 1.5), 'log(amp)': (0.0, 1.5)},
        gpf, {'y': y}, method=method, optimizer=optimizer,
        raises=False,
    )
    truth = np.array([true_logscale, true_logamp])
    est = np.asarray(fit.pmean.buf)
    cov = np.asarray(fit.pcov)
    resid = est - truth
    q = float(resid @ np.linalg.solve(cov, resid))
    p = scipy.stats.chi2(2).sf(q)
    assert p > 1e-3, (q, p, est, np.sqrt(np.diag(cov)))


@tryagain
def test_residuals_normalized(rng):
    """Posterior predictive standardized residuals roughly N(0, 1)."""
    fit = make_fit(rng)
    given, gcov = fit.data
    gp = fit.gp()
    y = np.asarray(given['y'])
    u = gp.predfromdata(given, 'f')
    sd = np.sqrt(np.asarray(u.sdev) ** 2 + 0.05 ** 2)
    z = (y - np.asarray(u.mean)) / sd
    # mean ~ 0, scale ~ 1 within generous tolerance
    assert abs(z.mean()) < 0.5
    assert 0.4 < z.std() < 2.0


def test_save_load_roundtrip(tmp_path):
    """Checkpoint/resume: no object arrays, no pickling in the .npz."""
    import zipfile
    import jax.numpy as jnp
    import lsqfitgp_tpu as lgp

    x = jnp.linspace(0, 1, 10)
    y = jnp.asarray(np.sin(3 * np.linspace(0, 1, 10)))

    def factory(p):
        gp = lgp.GP(lgp.ExpQuad(scale=p['scale']))
        gp = gp.addx(x, 'f').addcov(0.01 * jnp.eye(10), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'd',
                               checklin=False)

    fit = lgp.empbayes_fit({'log(scale)': (0.0, 1.0)}, factory, {'d': y})
    path = tmp_path / 'fit.npz'
    fit.save(path)
    # the archive must load fine with pickling disabled
    dat = np.load(path, allow_pickle=False)
    assert 'layout' in dat and 'allow_pickle' not in dat.files
    state = lgp.empbayes_fit.load(path)
    np.testing.assert_allclose(np.asarray(state['pmean']),
                               np.asarray(fit.pmean.buf), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state['pcov']),
                               np.asarray(fit.pcov), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(state['p']['log(scale)'].mean),
        np.asarray(fit.p['log(scale)'].mean), rtol=1e-12)


def test_in_jit_phase_timing(rng):
    # timing=True threads host-callback marks through the compiled
    # objective; spans must be recorded for both phases
    import numpy as np
    from lsqfitgp_tpu import GP, empbayes_fit
    from lsqfitgp_tpu.kernels import ExpQuad
    import jax.numpy as jnp

    x = np.sort(rng.uniform(-3, 3, 15))
    y = np.sin(x) + 0.1 * rng.standard_normal(15)

    def gpf(hp):
        return (
            GP(ExpQuad(scale=hp['scale']))
            .addx(x, 'f').addcov(0.01 * jnp.eye(15), 'e')
            .addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                          checklin=False)
        )

    fit = empbayes_fit({'log(scale)': (0.0, 1.0)}, gpf, {'y': y},
                       timing=True, raises=False,
                       minkw=dict(options=dict(maxiter=5)))
    tot = fit.phase_timer.totals()
    assert set(tot) == {'gpbuild+decomp', 'likelihood'}
    assert all(v >= 0 for v in tot.values())
    assert fit.phase_timer.counts()['likelihood'] >= 1


def test_addtransf_validation(rng):
    import numpy as np
    import jax.numpy as jnp
    import pytest as pt
    from lsqfitgp_tpu import GP
    from lsqfitgp_tpu.kernels import ExpQuad

    gp = GP(ExpQuad()).addx(np.linspace(0, 1, 5), 'a') \
                      .addx(np.linspace(0, 1, 3), 'b')
    with pt.raises(ValueError):
        gp.addtransf({}, 'c')
    with pt.raises(ValueError):
        gp.addtransf({'a': np.ones((2, 4))}, 'c')  # 4 != 5
    with pt.raises(ValueError):
        gp.addtransf({'a': np.ones((2, 5)), 'b': np.ones((3, 3))}, 'c')
    with pt.raises(ValueError):
        gp.addtransf({'a': np.ones(5)}, 'c', axes=-1)
    with pt.raises(AssertionError):
        gp.addtransf({'a': np.full(5, np.nan)}, 'c')
    # matrix + scalar with broadcasting
    T = rng.standard_normal((3, 5))
    gp2 = gp.addtransf({'a': T, 'b': 2.0}, 'c')
    K = np.asarray(gp2.prior('c', raw=True))
    Ka = np.asarray(gp.prior('a', raw=True))
    Kb = np.asarray(gp.prior('b', raw=True))
    Kab = np.asarray(gp._assemble(['a'], ['b']))
    want = T @ Ka @ T.T + 4.0 * Kb + 2.0 * (T @ Kab) + 2.0 * (T @ Kab).T
    np.testing.assert_allclose(K, want, rtol=1e-6, atol=1e-8)


def test_iteration_timing_records(rng):
    import numpy as np
    from lsqfitgp_tpu import GP, empbayes_fit
    from lsqfitgp_tpu.kernels import ExpQuad
    import jax.numpy as jnp

    x = np.sort(rng.uniform(-3, 3, 15))
    y = np.sin(x)

    def gpf(hp):
        return (
            GP(ExpQuad(scale=hp['scale']))
            .addx(x, 'f').addcov(0.01 * jnp.eye(15), 'e')
            .addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                          checklin=False)
        )

    fit = empbayes_fit({'log(scale)': (0.0, 1.0)}, gpf, {'y': y},
                       raises=False)
    assert len(fit.itertimes) >= 1
    assert all(t >= 0 for t in fit.itertimes)
    if len(fit.itertimes) >= 3:
        assert fit.jit_overhead is None or fit.jit_overhead >= 0
