"""Property-based tests over the kernel zoo (model: reference
tests/kernels/test_kernels.py) plus scipy oracles for special functions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.special as sps

import lsqfitgp_tpu.kernels as zoo
from lsqfitgp_tpu import kernelalg as ka

from util import tol, is_f32


# (constructor, needs_positive_x, domain)
KERNELS = [
    (lambda: zoo.ExpQuad(), 'real'),
    (lambda: zoo.Constant(), 'real'),
    (lambda: zoo.White(), 'real'),
    (lambda: zoo.Linear(), 'real'),
    (lambda: zoo.GammaExp(gamma=1.3), 'real'),
    (lambda: zoo.GammaExp(gamma=2), 'real'),
    (lambda: zoo.NNKernel(sigma0=0.7), 'real'),
    (lambda: zoo.Gibbs(scalefun=lambda x: 1 + jnp.cosh(x / 10)), 'real'),
    (lambda: zoo.Periodic(outerscale=1.5), 'real'),
    (lambda: zoo.Rescaling(stdfun=lambda x: 1 + x**2), 'real'),
    (lambda: zoo.Expon(), 'real'),
    (lambda: zoo.HoleEffect(), 'real'),
    (lambda: zoo.Cauchy(alpha=1.5, beta=1.0), 'real'),
    (lambda: zoo.Cauchy(), 'real'),
    (lambda: zoo.CausalExpQuad(alpha=1.0), 'real'),
    (lambda: zoo.Decaying(alpha=1.2), 'positive'),
    (lambda: zoo.Log(), 'real'),
    (lambda: zoo.Taylor(), 'real'),
    (lambda: zoo.Maternp(p=0), 'real'),
    (lambda: zoo.Maternp(p=1), 'real'),
    (lambda: zoo.Maternp(p=2), 'real'),
    (lambda: zoo.Wiener(), 'positive'),
    (lambda: zoo.FracBrownian(H=0.3), 'positive'),
    (lambda: zoo.FracBrownian(H=0.7, K=0.8), 'positive'),
    (lambda: zoo.WienerIntegral(), 'positive'),
    (lambda: zoo.OrnsteinUhlenbeck(), 'positive'),
    (lambda: zoo.BrownianBridge(), 'unit'),
    (lambda: zoo.StationaryFracBrownian(H=0.4), 'real'),
    (lambda: zoo.Celerite(gamma=1.2, B=1.0), 'real'),
    (lambda: zoo.Harmonic(Q=0.3), 'real'),
    (lambda: zoo.Harmonic(Q=0.8), 'real'),
    (lambda: zoo.Harmonic(Q=1), 'real'),
    (lambda: zoo.Harmonic(Q=2.5), 'real'),
    (lambda: zoo.Wendland(k=1, alpha=2), 'real'),
    (lambda: zoo.Wendland(k=2, alpha=3), 'real'),
    (lambda: zoo.Circular(), 'real'),
    (lambda: zoo.Cos(), 'real'),
    (lambda: zoo.Pink(dw=2), 'real'),
    (lambda: zoo.Color(n=2), 'real'),
    (lambda: zoo.Color(n=4), 'real'),
    (lambda: zoo.Sinc(), 'real'),
]


def sample_x(rng, domain, n=25):
    if domain == 'positive':
        return np.sort(rng.uniform(0.05, 5, n))
    if domain == 'unit':
        return np.sort(rng.uniform(0.01, 0.99, n))
    return np.sort(rng.uniform(-5, 5, n))


@pytest.mark.parametrize(
    'make,domain', KERNELS,
    ids=[f'{i}-{k[0]().__class__.__name__}' for i, k in enumerate(KERNELS)],
)
class TestZoo:

    def test_psd_and_symmetric(self, make, domain, rng):
        k = make()
        x = sample_x(rng, domain)
        K = np.asarray(k(x[:, None], x[None, :]))
        assert np.all(np.isfinite(K))
        np.testing.assert_allclose(K, K.T, **tol(1e-10, 1e-12, rtol32=1e-5, atol32=1e-5))
        eigs = np.linalg.eigvalsh(K.astype('f8'))
        lim = 1e-8 if not is_f32() else 1e-4
        assert eigs.min() > -lim * max(1.0, eigs.max())

    def test_jittable(self, make, domain, rng):
        k = make()
        x = sample_x(rng, domain, 8)

        @jax.jit
        def f(x, y):
            return k(x, y)

        K1 = np.asarray(f(x[:, None], x[None, :]))
        K2 = np.asarray(k(x[:, None], x[None, :]))
        np.testing.assert_allclose(K1, K2, **tol(5e-7, 1e-10, rtol32=1e-4, atol32=1e-5))

    def test_posterior_end_to_end(self, make, domain, rng):
        """Every zoo kernel drives the full user pipeline: GP +
        noisy data -> posterior -> joint sample (Chol, pred, uncert,
        raniter all engaged; the BagOfWords regexp bug showed that
        per-kernel unit values can pass while the end-to-end path is
        broken)."""
        import lsqfitgp_tpu as lgp
        k = make()
        xd = sample_x(rng, domain, 10)
        xg = sample_x(rng, domain, 14)
        y = rng.standard_normal(xd.size)
        gp = lgp.GP(k).addx(xd, 'd').addx(xg, 'g')
        post = gp.predfromdata(
            {'d': y}, ['g'], {('d', 'd'): 0.1 * np.eye(xd.size)})
        m = np.asarray(post['g'].mean)
        sd = np.asarray(post['g'].sdev)
        assert np.all(np.isfinite(m)) and np.all(np.isfinite(sd))
        s = next(lgp.raniter(post, rng=0))
        assert np.all(np.isfinite(np.asarray(s['g'])))


class TestOracles:
    """Value checks against scipy implementations."""

    def test_maternp_vs_scipy(self, rng):
        from scipy.spatial.distance import cdist
        x = np.sort(rng.uniform(-3, 3, 20))[:, None]
        for p in [0, 1, 2, 3]:
            nu = p + 0.5
            d = cdist(x, x)
            arg = np.sqrt(2 * nu) * d
            from scipy.special import kv, gamma
            with np.errstate(invalid='ignore'):
                ref = 2 ** (1 - nu) / gamma(nu) * arg ** nu * kv(nu, arg)
            ref[d == 0] = 1
            k = zoo.Maternp(p=p)
            got = np.asarray(k(x[:, None, 0], x[None, :, 0]))
            np.testing.assert_allclose(got, ref, **tol(1e-9, 1e-12, rtol32=1e-4, atol32=1e-5))

    def test_j0_vs_scipy(self):
        from lsqfitgp_tpu.special import j0
        x = np.linspace(0, 50, 1001)
        got = np.asarray(j0(jnp.asarray(x)))
        np.testing.assert_allclose(got, sps.j0(x), **tol(0, 5e-9, rtol32=0, atol32=1e-5))

    def test_ci_vs_scipy(self):
        from lsqfitgp_tpu.special import ci
        x = np.linspace(0.01, 30, 300)
        got = np.asarray(ci(jnp.asarray(x)))
        np.testing.assert_allclose(got, sps.sici(x)[1], **tol(1e-8, 1e-12, rtol32=1e-4, atol32=1e-5))

    def test_expn_imag_vs_mpmath(self):
        from lsqfitgp_tpu.special import expn_imag_real
        import mpmath
        for n in [2, 3, 4, 6]:
            for x in [0.0, 0.3, 2.0, 10.0, 34.9, 35.1, 50.0, 300.0]:
                want = (
                    float(mpmath.expint(n, -1j * x).real) if x else 1 / (n - 1)
                )
                got = float(expn_imag_real(n, jnp.asarray(x, jnp.float64)))
                # f32: the large-x asymptotic tail of E_n(ix) is accurate only in
                # absolute terms (value ~ 1/x)
                np.testing.assert_allclose(got, want, **tol(1e-6, 1e-9, rtol32=1e-3, atol32=1e-3),
                                           err_msg=f'n={n} x={x}')

    def test_expm1x(self):
        from lsqfitgp_tpu.special import expm1x
        x = np.array([-2.0, -0.5, -1e-8, 0.0, 1e-8, 0.5, 2.0])
        import mpmath
        with mpmath.workdps(50):
            want = [float(mpmath.exp(mpmath.mpf(v)) - 1 - mpmath.mpf(v))
                    for v in x]
        got = np.asarray(expm1x(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, **tol(1e-14, 1e-30, rtol32=1e-6, atol32=1e-10))

    def test_harmonic_continuity_at_q1(self):
        x = np.linspace(0, 5, 50)
        k1 = np.asarray(zoo.Harmonic(Q=1)(x, np.zeros_like(x)))
        keps = np.asarray(zoo.Harmonic(Q=1 + 1e-12)(x, np.zeros_like(x)))
        np.testing.assert_allclose(k1, keps, **tol(1e-6, rtol32=1e-3))

    def test_taylor_vs_series(self):
        x = np.array([0.5, 1.0, -0.5])
        y = np.array([0.3, -2.0, 0.7])
        want = np.array([
            sum((xx * yy) ** k / sps.factorial(k) ** 2 for k in range(60))
            for xx, yy in zip(x, y)
        ])
        got = np.asarray(zoo.Taylor()(x, y))
        np.testing.assert_allclose(got, want, **tol(1e-9, rtol32=1e-4))


def test_derivatives_of_smooth_kernels(rng):
    x = np.sort(rng.uniform(-2, 2, 10))
    for make in [lambda: zoo.ExpQuad(), lambda: zoo.Maternp(p=2),
                 lambda: zoo.Periodic(), lambda: zoo.Cos()]:
        k = make()
        kdd = k.linop('diff', 1, 1)
        K = np.asarray(kdd(x[:, None], x[None, :]))
        assert np.all(np.isfinite(K))
        eigs = np.linalg.eigvalsh(K.astype('f8'))
        lim2 = 1e-7 if not is_f32() else 1e-4
        assert eigs.min() > -lim2 * max(1.0, eigs.max())


def test_bagofwords_strings():
    """BagOfWords on real string input, end to end through the GP
    (regression: the word-separator character class contained an
    accidental ':'..'–' range that swallowed every letter, splitting
    each string into characters and yielding an identically-zero Gram;
    also exercises host-side string arrays through addx/asarray)."""
    import lsqfitgp_tpu as lgp
    texts = np.array(['hello world', 'world of words', 'hello'])
    k = lgp.BagOfWords()
    K = np.asarray(k(texts[:, None], texts[None, :]), float)
    # counts: {hello,world} / {world,of,words} / {hello}
    expected = np.array([
        [2.0, 1.0, 1.0],
        [1.0, 3.0, 0.0],
        [1.0, 0.0, 1.0],
    ])
    np.testing.assert_array_equal(K, expected)
    gp = lgp.GP(lgp.BagOfWords()).addx(texts, 't')
    np.testing.assert_array_equal(
        np.asarray(gp.prior('t', raw=True), float), expected)
    post = gp.predfromdata({'t': [1.0, 0.5, 0.2]}, ['t'])
    np.testing.assert_allclose(
        np.asarray(post['t'].mean), [1.0, 0.5, 0.2], atol=1e-4)


def test_traced_parameters_in_derivable_guards():
    """Kernels whose derivability depends on a parameter EQUALITY
    (Celerite B == gamma, Cauchy alpha == 2, FracBrownian H == K == 1)
    must construct under jit with TRACED parameters (regression: the
    guard's `B == gamma` raised TracerBoolConversionError inside
    empbayes_fit's jitted objective; traced values conservatively count
    as not-equal, so no derivability is granted)."""
    import jax
    import lsqfitgp_tpu as lgp
    x = np.linspace(0, 5, 8)

    @jax.jit
    def celerite_gram(g):
        return lgp.Celerite(gamma=g, B=0.05)(x[:, None], x[None, :])

    @jax.jit
    def cauchy_gram(a):
        return lgp.Cauchy(alpha=a)(x[:, None], x[None, :])

    @jax.jit
    def fbm_gram(h):
        xp = x + 0.1
        return lgp.FracBrownian(H=h)(xp[:, None], xp[None, :])

    for fn, v in [(celerite_gram, 0.7), (cauchy_gram, 1.5),
                  (fbm_gram, 0.4)]:
        K = np.asarray(fn(jnp.float32(v)))
        assert K.shape == (8, 8) and np.all(np.isfinite(K))

    # concrete equality still grants derivability: Celerite with
    # B == gamma is once-derivable, generic B is not, traced B is
    # conservatively not
    from lsqfitgp_tpu.kernels._celerite import _celerite_derivable
    assert _celerite_derivable(gamma=0.5, B=0.5) == 1
    assert _celerite_derivable(gamma=0.5, B=0.2) is False
    assert float(jax.jit(
        lambda b: jnp.ones(())
        if _celerite_derivable(gamma=0.5, B=b) else jnp.zeros(())
    )(jnp.float32(0.5))) == 0.0
