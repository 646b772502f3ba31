"""GP object behavior + posterior correctness vs dense-formula oracles
(model: reference tests/GP/test_GP.py, test_pred.py)."""

from util import lane_allclose
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP, uncert
from lsqfitgp_tpu.kernels import ExpQuad, Maternp, Expon


def reg_eps(K):
    """The same regularization Chol applies (unit diagonal case)."""
    from lsqfitgp_tpu.linalg import Chol
    return float(Chol(jnp.asarray(K)).eps)


def dense_posterior(Kxx, Kxs, Kss, y, ycov=None):
    C = Kxx + (ycov if ycov is not None else 0)
    C = C + reg_eps(C) * np.eye(len(C))
    A = np.linalg.solve(C, Kxs)
    mean = A.T @ y
    cov = Kss - Kxs.T @ A
    return mean, cov


@pytest.fixture
def setup(rng):
    x = np.sort(rng.uniform(-3, 3, 20))
    xs = np.linspace(-4, 4, 15)
    k = ExpQuad(scale=1.3)
    Kxx = np.asarray(k(x[:, None], x[None, :]))
    Kxs = np.asarray(k(x[:, None], xs[None, :]))
    Kss = np.asarray(k(xs[:, None], xs[None, :]))
    y = np.sin(x)
    return x, xs, k, Kxx, Kxs, Kss, y


def test_predfromdata_raw(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addx(xs, 'b')
    mean, cov = gp.predfromdata({'a': y}, 'b', raw=True)
    wm, wc = dense_posterior(Kxx, Kxs, Kss, y)
    lane_allclose(np.asarray(mean), wm, rtol=1e-4, atol=1e-6)
    lane_allclose(np.asarray(cov), wc, rtol=1e-4, atol=1e-6)


def test_predfromdata_uarray(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addx(xs, 'b')
    u = gp.predfromdata({'a': y}, 'b')
    wm, wc = dense_posterior(Kxx, Kxs, Kss, y)
    lane_allclose(np.asarray(u.mean), wm, rtol=1e-4, atol=1e-6)
    lane_allclose(
        np.asarray(u.cov()), wc, rtol=1e-4, atol=1e-6
    )


def test_predfromdata_noisy(setup, rng):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    noise = 0.1 * np.eye(len(x))
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addx(xs, 'b')
    # pass data as a UArray carrying its own covariance
    yu = uncert.from_cov(y, noise)
    u = gp.predfromdata({'a': yu}, 'b')
    wm, wc = dense_posterior(Kxx, Kxs, Kss, y, noise)
    lane_allclose(np.asarray(u.mean), wm, rtol=1e-4, atol=1e-6)
    lane_allclose(np.asarray(u.cov()), wc, rtol=1e-4, atol=1e-6)
    # explicit givencov path must agree
    mean2, cov2 = gp.predfromdata({'a': y}, 'b', noise, raw=True)
    lane_allclose(np.asarray(mean2), wm, rtol=1e-4, atol=1e-6)
    lane_allclose(np.asarray(cov2), wc, rtol=1e-4, atol=1e-6)


def test_keepcorr_correlates_with_data(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    noise = 0.05 * np.eye(len(x))
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addx(xs, 'b')
    yu = uncert.from_cov(y, noise)
    u = gp.predfromdata({'a': yu}, 'b')
    # cov(pred, data) = A' ycov  where A = (Kxx+noise)^-1 Kxs
    A = np.linalg.solve(Kxx + noise, Kxs)
    want = A.T @ noise
    got = np.asarray(uncert.evalcov(u, yu))
    lane_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_predfromfit(setup):
    # use a well-conditioned kernel: fromfit inverts the bare prior Gram
    x, xs, _, _, _, _, y = setup
    k = Expon()
    Kxx = np.asarray(k(x[:, None], x[None, :]))
    Kxs = np.asarray(k(x[:, None], xs[None, :]))
    Kss = np.asarray(k(xs[:, None], xs[None, :]))
    fitcov = 0.05 * np.eye(len(x))
    gp = GP(Expon()).addx(x, 'a').addx(xs, 'b')
    mean, cov = gp.predfromfit({'a': y}, 'b', fitcov, raw=True)
    A = np.linalg.solve(Kxx + reg_eps(Kxx) * np.eye(len(Kxx)), Kxs)
    wm = A.T @ y
    wc = Kss - Kxs.T @ A + A.T @ fitcov @ A
    lane_allclose(np.asarray(mean), wm, rtol=1e-5, atol=1e-7)
    lane_allclose(np.asarray(cov), wc, rtol=1e-4, atol=1e-7)


def test_marginal_likelihood(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a')
    noise = 0.1 * np.eye(len(x))
    got = float(gp.marginal_likelihood({'a': y}, noise))
    C = Kxx + noise
    want = -0.5 * (
        y @ np.linalg.solve(C, y) + np.linalg.slogdet(C)[1]
        + len(x) * np.log(2 * np.pi)
    )
    lane_allclose(got, want, rtol=1e-6)


def test_prior(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addx(xs, 'b')
    pr = gp.prior()
    lane_allclose(np.asarray(pr['a'].mean), 0, atol=1e-12)
    lane_allclose(np.asarray(pr['a'].cov()), Kxx,
                               rtol=1e-6, atol=1e-8)
    lane_allclose(
        np.asarray(uncert.evalcov(pr['a'], pr['b'])), Kxs,
        rtol=1e-6, atol=1e-8,
    )


def test_addlintransf(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a')
    gp = gp.addlintransf(lambda a: jnp.cumsum(a), ['a'], 'cum')
    pr = gp.prior(['a', 'cum'])
    S = np.tril(np.ones((len(x), len(x))))
    lane_allclose(
        np.asarray(pr['cum'].cov()), S @ Kxx @ S.T, rtol=1e-6, atol=1e-7
    )
    # posterior through the transformation
    u = gp.predfromdata({'a': y}, 'cum')
    wm, _ = dense_posterior(Kxx, Kxx @ S.T, S @ Kxx @ S.T, y)
    lane_allclose(np.asarray(u.mean), wm, rtol=1e-4, atol=1e-6)


def test_addtransf(setup, rng):
    x, xs, k, Kxx, Kxs, Kss, y = setup
    T = rng.standard_normal((7, len(x)))
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a').addtransf({'a': T}, 't')
    pr = gp.prior('t')
    lane_allclose(
        np.asarray(pr.cov()), T @ Kxx @ T.T, rtol=1e-6, atol=1e-7
    )


def test_addcov(rng):
    C = np.eye(4) * 2.0
    gp = GP().addcov(C, 'e')
    pr = gp.prior('e')
    lane_allclose(np.asarray(pr.cov()), C, atol=1e-10)


def test_error_term_model(setup, rng):
    # y = f(x) + eps via addcov + addlintransf sum: the bart-style model
    x, xs, k, Kxx, Kxs, Kss, y = setup
    n = len(x)
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'f').addcov(0.1 * np.eye(n), 'e')
    gp = gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y')
    got = float(gp.marginal_likelihood({'y': y}))
    C = Kxx + 0.1 * np.eye(n)
    want = -0.5 * (
        y @ np.linalg.solve(C, y) + np.linalg.slogdet(C)[1]
        + n * np.log(2 * np.pi)
    )
    lane_allclose(got, want, rtol=1e-6)


def test_multiprocess_independent(rng):
    x = np.linspace(0, 1, 8)
    gp = GP()
    gp = gp.defproc('p1', ExpQuad())
    gp = gp.defproc('p2', Expon())
    gp = gp.addx(x, 'a', proc='p1').addx(x, 'b', proc='p2')
    pr = gp.prior(['a', 'b'])
    lane_allclose(
        np.asarray(uncert.evalcov(pr['a'], pr['b'])), 0, atol=1e-12
    )


def test_deftransf_sum_of_processes(rng):
    x = np.linspace(0, 1, 8)
    k1, k2 = ExpQuad(), Expon()
    gp = GP()
    gp = gp.defproc('p1', k1).defproc('p2', k2)
    gp = gp.deftransf('s', {'p1': 2.0, 'p2': 1.0})
    gp = gp.addx(x, 'a', proc='s')
    K = np.asarray(gp.prior('a').cov())
    want = 4 * np.asarray(k1(x[:, None], x[None, :])) + \
        np.asarray(k2(x[:, None], x[None, :]))
    lane_allclose(K, want, rtol=1e-6, atol=1e-8)


def test_defderiv(rng):
    x = np.sort(rng.uniform(-2, 2, 9))
    gp = GP(ExpQuad())
    gp = gp.defderiv('df', 1, lgp.DefaultProcess)
    gp = gp.addx(x, 'f').addx(x, 'd', proc='df')
    pr = gp.prior(['f', 'd'])
    K = np.asarray(uncert.evalcov(pr['f'], pr['d']))
    d = x[:, None] - x[None, :]
    # cov(f(x), f'(y)) = d/dy exp(-d²/2) = d * exp(-d²/2)
    lane_allclose(K, d * np.exp(-0.5 * d**2), rtol=1e-6,
                               atol=1e-8)


def test_addx_deriv_equivalent_to_defderiv(rng):
    x = np.sort(rng.uniform(-2, 2, 9))
    gp1 = GP(ExpQuad()).addx(x, 'd', deriv=1)
    gp2 = GP(ExpQuad()).defderiv('df', 1, lgp.DefaultProcess) \
        .addx(x, 'd', proc='df')
    K1 = np.asarray(gp1.prior('d').cov())
    K2 = np.asarray(gp2.prior('d').cov())
    lane_allclose(K1, K2, rtol=1e-7, atol=1e-10)


def test_defxtransf_defrescale(rng):
    x = np.sort(rng.uniform(0.1, 2, 8))
    gp = GP(ExpQuad())
    gp = gp.defxtransf('sq', lambda x: x**2, lgp.DefaultProcess)
    gp = gp.defrescale('rs', lambda x: x, lgp.DefaultProcess)
    gp = gp.addx(x, 'a', proc='sq').addx(x, 'b', proc='rs')
    Ka = np.asarray(gp.prior('a').cov())
    d2 = (x[:, None]**2 - x[None, :]**2) ** 2
    lane_allclose(Ka, np.exp(-0.5 * d2), rtol=1e-6, atol=1e-9)
    Kb = np.asarray(gp.prior('b').cov())
    d = x[:, None] - x[None, :]
    lane_allclose(
        Kb, np.outer(x, x) * np.exp(-0.5 * d**2), rtol=1e-6, atol=1e-9
    )


def test_errors():
    gp = GP(ExpQuad())
    with pytest.raises(KeyError):
        gp.addx([1.0], 'a').addx([2.0], 'a')
    with pytest.raises(KeyError):
        gp.defproc(lgp.DefaultProcess, ExpQuad())
    with pytest.raises(TypeError):
        GP(ExpQuad().linop('diff', 1, None))  # cross kernel not allowed
    with pytest.raises(RuntimeError):
        GP(ExpQuad()).addx([1., 2.], 'a') \
            .addlintransf(lambda a: a**2, ['a'], 'b')


def test_jit_marginal_likelihood(setup):
    x, xs, k, Kxx, Kxs, Kss, y = setup

    @jax.jit
    def ml(scale, y):
        gp = GP(ExpQuad(scale=scale)).addx(x, 'a')
        return gp.marginal_likelihood({'a': y})

    v1 = float(ml(1.3, jnp.asarray(y)))
    gp = GP(ExpQuad(scale=1.3)).addx(x, 'a')
    v2 = float(gp.marginal_likelihood({'a': y}))
    lane_allclose(v1, v2, rtol=1e-7)
    # gradient through hyperparameters
    g = jax.grad(lambda s: ml(s, jnp.asarray(y)))(1.3)
    assert np.isfinite(float(g))


def test_pred_multidim_x(rng):
    x = lgp.asarray({'u': rng.standard_normal(10), 'v': rng.standard_normal(10)})
    xs = lgp.asarray({'u': rng.standard_normal(5), 'v': rng.standard_normal(5)})
    y = rng.standard_normal(10)
    gp = GP(ExpQuad()).addx(x, 'a').addx(xs, 'b')
    u = gp.predfromdata({'a': y}, 'b')
    assert u.shape == (5,)
    assert np.all(np.isfinite(np.asarray(u.mean)))
