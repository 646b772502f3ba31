"""Zeta/Fourier family, generic Matern, Bessel kernel tests + special
function oracles (model: reference tests/kernels/test_kernels.py Fourier
mixin and tests/test_special.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import mpmath
import pytest
import scipy.special as sps

import lsqfitgp_tpu as lgp

from util import tol
from lsqfitgp_tpu import uncert
from lsqfitgp_tpu.special import zeta_real, periodic_zeta, kv, kvmodx2


class TestSpecials:

    def test_zeta_real_vs_mpmath(self):
        for s in [-10.5, -3.3, -0.7, 0.3, 0.9, 1.5, 2.4, 2.6, 12.0]:
            want = float(mpmath.zeta(s))
            got = float(zeta_real(s))
            np.testing.assert_allclose(got, want, **tol(1e-8, 1e-10, rtol32=2e-5, atol32=1e-6))

    def test_periodic_zeta_vs_mpmath(self):
        for s in [1.5, 3.0, 4.7, 11.0, 20.0]:
            for x in [0.05, 0.3, 0.77]:
                v = mpmath.polylog(s, mpmath.e ** (2j * mpmath.pi * x))
                got_r = float(periodic_zeta(jnp.asarray(x), s))
                got_i = float(periodic_zeta(jnp.asarray(x), s, True))
                np.testing.assert_allclose(
                    got_r, float(v.real),
                    **tol(1e-8, 1e-8, rtol32=1e-4, atol32=1e-4))
                np.testing.assert_allclose(
                    got_i, float(v.imag),
                    **tol(1e-8, 1e-8, rtol32=1e-4, atol32=1e-4))

    def test_kv_vs_scipy(self):
        from util import is_f32
        for nu in [0.0, 0.5, 1.0, 2.7, 9.5]:
            for x in [1e-4, 0.5, 5.0, 50.0, 300.0]:
                want = sps.kv(nu, x)
                if is_f32() and not 1e-37 < abs(want) < 1e37:
                    continue  # outside float32 representable range
                np.testing.assert_allclose(
                    float(kv(nu, x)), want,
                    **tol(1e-8, rtol32=1e-4),
                    err_msg=f'nu={nu} x={x}',
                )

    def test_kvmodx2_derivative(self):
        g = float(jax.grad(lambda x2: kvmodx2(1.7, x2))(0.5))

        def f(x2):
            x = np.sqrt(x2)
            return 2 ** (1 - 1.7) / sps.gamma(1.7) * x ** 1.7 * sps.kv(1.7, x)

        h = 1e-6
        fd = (f(0.5 + h) - f(0.5 - h)) / (2 * h)
        np.testing.assert_allclose(g, fd, **tol(1e-5, rtol32=3e-3))


class TestMatern:

    @pytest.mark.parametrize('nu', [0.7, 1.5, 3.2])
    def test_vs_scipy(self, nu, rng):
        x = np.sort(rng.uniform(-3, 3, 15))
        K = np.asarray(lgp.Matern(nu=nu)(x[:, None], x[None, :]))
        d = np.abs(x[:, None] - x[None, :]) * np.sqrt(2 * nu)
        with np.errstate(invalid='ignore'):
            want = 2 ** (1 - nu) / sps.gamma(nu) * d ** nu * sps.kv(nu, d)
        want[d == 0] = 1
        np.testing.assert_allclose(K, want, **tol(1e-7, 1e-10, rtol32=2e-5, atol32=2e-6))
        assert np.linalg.eigvalsh(K).min() > -1e-9

    def test_bessel_vs_scipy(self, rng):
        nu = 1.2
        x = np.sort(rng.uniform(-2, 2, 12))
        K = np.asarray(lgp.Bessel(nu=nu)(x[:, None], x[None, :]))
        s = 2 + nu / 2
        d = np.abs(x[:, None] - x[None, :]) * s
        with np.errstate(invalid='ignore', divide='ignore'):
            want = sps.gamma(nu + 1) * (2 / d) ** nu * sps.jv(nu, d)
        want[d == 0] = 1
        np.testing.assert_allclose(K, want, **tol(1e-6, 1e-9, rtol32=1e-3, atol32=1e-4))

    def test_matern_deriv_psd(self, rng):
        x = np.sort(rng.uniform(-2, 2, 10))
        kd = lgp.Matern(nu=2.4).linop('diff', 1, 1)
        K = np.asarray(kd(x[:, None], x[None, :]))
        assert np.all(np.isfinite(K))
        assert np.linalg.eigvalsh(K).min() > -1e-7


class TestZeta:

    def test_psd_and_diag(self, rng):
        x = np.linspace(0, 1, 17)
        K = np.asarray(lgp.Zeta(nu=1.5)(x[:, None], x[None, :]))
        np.testing.assert_allclose(np.diag(K), 1,
                                   **tol(1e-8, rtol32=1e-4))
        assert np.linalg.eigvalsh(K.astype('f8')).min() > \
            -1e-9 * (1 if K.dtype == np.float64 else 1e3)

    def test_vs_direct_series(self):
        nu = 2.0
        s = 1 + 2 * nu
        x = np.linspace(0, 1, 9)
        K = np.asarray(lgp.Zeta(nu=nu)(x, np.zeros_like(x)))
        ks = np.arange(1, 4000)
        want = np.array([
            np.sum(np.cos(2 * np.pi * ks * d) / ks ** s) for d in x
        ]) / float(zeta_real(s))
        np.testing.assert_allclose(K, want, **tol(1e-5, 1e-7, rtol32=5e-4, atol32=5e-5))

    def test_fourier_family(self):
        nu = 1.5
        s = 1 + 2 * nu
        zf = lgp.Zeta(nu=nu).linop('fourier', True)
        ks = np.arange(1, 7)
        K = np.asarray(zf(ks[:, None], ks[None, :]))
        orders = np.ceil(ks / 2)
        want = np.diag(1 / (float(zeta_real(s)) * orders ** s))
        np.testing.assert_allclose(K, want, **tol(0, 1e-12, rtol32=0, atol32=1e-6))

    def test_fourier_inference_roundtrip(self, rng):
        # infer Fourier coefficients from function values
        nu = 2.0
        gp = lgp.GP()
        gp = gp.defproc('f', lgp.Zeta(nu=nu))
        gp = gp.deflinop('F', 'fourier', True, 'f')
        x = np.linspace(0, 1, 31)[:-1]
        # synthetic function: cos(2πx) with unit coefficient
        y = np.cos(2 * np.pi * x)
        gp = gp.addx(x, 'x', proc='f').addx(np.array([2]), 'c1', proc='F')
        u = gp.predfromdata({'x': y}, 'c1')
        # posterior mean of the order-1 cosine coefficient should be ~1
        np.testing.assert_allclose(float(u.mean[0]), 1.0, rtol=1e-3)
        assert float(u.sdev[0]) < 0.1

    def test_affine_tracking_in_fourier(self):
        # after a loc shift, the fourier cross kernel must stay
        # consistent with reconstructing the kernel from the series:
        # k(x, y) = Σ_k cross(k, x) cross(k, y) / var_k
        nu = 1.5
        s = 1 + 2 * nu
        moved = lgp.Zeta(nu=nu).linop('loc', 0.25)
        cross = moved.linop('fourier', True, None)
        both = moved.linop('fourier', True)
        x = np.linspace(0, 1, 7)
        kmax = 600
        ks = np.arange(1, kmax)
        C = np.asarray(cross(ks[:, None], x[None, :]))     # (k, x)
        V = np.asarray(both(ks, ks))                        # variances
        recon = np.einsum('ka,k,kb->ab', C, 1 / V, C)
        direct = np.asarray(moved(x[:, None], x[None, :]))
        np.testing.assert_allclose(recon, direct, **tol(1e-4, 1e-6, rtol32=3e-3, atol32=3e-4))


def test_periodic_zeta_at_integer_s():
    # exactly-integer and nearly-integer s: the Γ-pole cancellation is
    # handled by symmetric evaluation; accuracy must be ~eps^(2/3)
    import mpmath
    mpmath.mp.dps = 30
    for s in [2.0, 3.0, 4.0, 5.0, 3.0 + 1e-9, 5.0 - 1e-9]:
        for x in [0.05, 0.3, 0.77]:
            v = complex(mpmath.polylog(s, mpmath.e ** (2j * mpmath.pi * x)))
            got_r = float(periodic_zeta(jnp.asarray(x), s))
            got_i = float(periodic_zeta(jnp.asarray(x), s, True))
            np.testing.assert_allclose(
                got_r, v.real, **tol(0, 1e-8, rtol32=0, atol32=1e-4))
            np.testing.assert_allclose(
                got_i, v.imag, **tol(0, 1e-8, rtol32=0, atol32=1e-4))
