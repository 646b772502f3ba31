"""Double-float (paired-f32) rescue path: ``lsqfitgp_tpu.linalg._df``
and its integration into ``Chol``.

The rescue is the accuracy-RECOVERING final rung of the f32 eps ladder
(reference contract: ``/root/reference/src/lsqfitgp/_linalg/_decomp.py:
245-278`` never returns degraded results because it hard-requires
float64; the df path restores that on TPU where f64 does not exist).

All truths here are f64 computed with numpy on the CPU lane; the df
machinery itself always runs in f32 pairs, so these tests are
lane-independent (they build explicit f32 inputs).
"""

import warnings

import numpy as np
import jax
from jax import numpy as jnp
import pytest

from lsqfitgp_tpu.linalg import _df
from lsqfitgp_tpu.linalg._decomp import Chol, chol_nll


def _illcond(n, *, scale=2.0, noise=1e-4, seed=0, span=10.0):
    """f32 smooth Gram + small nugget: cond ~ bound/noise >> 1/eps32."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, span, n))
    d2 = (x[:, None] - x[None, :]) ** 2
    K64 = np.exp(-0.5 * d2 / scale ** 2) + noise * np.eye(n)
    y64 = np.linalg.cholesky(K64 + 1e-12 * np.eye(n)) \
        @ rng.standard_normal(n)
    return K64.astype(np.float32), y64, d2


class TestPrimitives:

    def test_two_sum_exact(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal(1000).astype(np.float32)
        b = (rng.standard_normal(1000) * 1e-5).astype(np.float32)
        s, err = jax.jit(_df._two_sum)(a, b)
        exact = a.astype(np.float64) + b.astype(np.float64)
        got = np.asarray(s, np.float64) + np.asarray(err, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_two_prod_exact(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal(1000).astype(np.float32)
        b = rng.standard_normal(1000).astype(np.float32)
        p, err = jax.jit(_df._two_prod)(a, b)
        exact = a.astype(np.float64) * b.astype(np.float64)
        got = np.asarray(p, np.float64) + np.asarray(err, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_div_sqrt_accuracy(self):
        rng = np.random.default_rng(2)
        x = np.abs(rng.standard_normal(1000)).astype(np.float32) + 0.1
        y = np.abs(rng.standard_normal(1000)).astype(np.float32) + 0.1
        qh, ql = jax.jit(_df.div)(x, np.zeros_like(x), y,
                                  np.zeros_like(y))
        got = np.asarray(qh, np.float64) + np.asarray(ql, np.float64)
        exact = x.astype(np.float64) / y.astype(np.float64)
        assert np.max(np.abs(got / exact - 1)) < 1e-13
        rh, rl = jax.jit(_df.dfsqrt)(x, np.zeros_like(x))
        got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        exact = np.sqrt(x.astype(np.float64))
        assert np.max(np.abs(got / exact - 1)) < 1e-13

    def test_dfsqrt_nan_on_negative(self):
        h, l = _df.dfsqrt(jnp.float32(-1.0), jnp.float32(0.0))
        assert not np.isfinite(np.asarray(h))

    def test_sum_df_cancelling(self):
        # sum of cond-amplified cancelling terms: f32 tree-sum loses
        # percent-level accuracy, the compensated reduction does not
        rng = np.random.default_rng(3)
        big = (rng.standard_normal(4096) * 1e6).astype(np.float32)
        x = np.concatenate([big, -big, np.float32(
            rng.standard_normal(100))]).astype(np.float32)
        rng.shuffle(x)
        exact = np.sum(x.astype(np.float64))
        sh, sl = jax.jit(_df.sum_df)(x, np.zeros_like(x))
        assert abs(float(sh) + float(sl) - exact) < 1e-3 * abs(exact)


class TestFactorization:

    def test_chol_df_vs_f64(self):
        K32, _, _ = _illcond(300)
        eps = np.float32(1e-6)
        L64 = np.linalg.cholesky(K32.astype(np.float64)
                                 + eps * np.eye(300))
        Lh, Ll = jax.jit(_df.chol_df)(jnp.asarray(K32), eps)
        Ldf = np.asarray(Lh, np.float64) + np.asarray(Ll, np.float64)
        relerr = np.max(np.abs(Ldf - L64)) / np.max(np.abs(L64))
        assert relerr < 1e-9
        # plain f32 is orders of magnitude worse on the same matrix
        L32 = np.linalg.cholesky(K32 + eps * np.eye(300,
                                                    dtype=np.float32))
        f32err = np.max(np.abs(L32.astype(np.float64) - L64)) \
            / np.max(np.abs(L64))
        assert f32err > 100 * relerr

    def test_solves_vs_f64(self):
        n = 300
        K32, y64, _ = _illcond(n)
        eps = np.float32(1e-6)
        L64 = np.linalg.cholesky(K32.astype(np.float64)
                                 + eps * np.eye(n))
        Lh, Ll = jax.jit(_df.chol_df)(jnp.asarray(K32), eps)
        b = y64.astype(np.float32)
        for solve, ref in [
            (_df.solve_lower_df,
             np.linalg.solve(L64, b.astype(np.float64))),
            (_df.solve_lower_t_df,
             np.linalg.solve(L64.T, b.astype(np.float64))),
        ]:
            xh, xl = jax.jit(solve)(Lh, Ll, jnp.asarray(b))
            got = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
            assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-8

    def test_matrix_rhs(self):
        n = 150
        K32, _, _ = _illcond(n, seed=5)
        eps = np.float32(1e-6)
        L64 = np.linalg.cholesky(K32.astype(np.float64)
                                 + eps * np.eye(n))
        Lh, Ll = jax.jit(_df.chol_df)(jnp.asarray(K32), eps)
        B = np.eye(n, dtype=np.float32)
        Wh, Wl = jax.jit(_df.solve_lower_df)(Lh, Ll, jnp.asarray(B))
        Wdf = np.asarray(Wh, np.float64) + np.asarray(Wl, np.float64)
        Winv = np.linalg.inv(L64)
        assert np.max(np.abs(Wdf - Winv)) / np.max(np.abs(Winv)) < 1e-8

    def test_syrk_df(self):
        n = 150
        K32, _, _ = _illcond(n, seed=5)
        eps = np.float32(1e-6)
        Lh, Ll = jax.jit(_df.chol_df)(jnp.asarray(K32), eps)
        Wh, Wl = jax.jit(_df.solve_lower_df)(
            Lh, Ll, jnp.eye(n, dtype=jnp.float32))
        Ch, Cl = jax.jit(_df.syrk_df)(Wh, Wl)
        got = np.asarray(Ch, np.float64) + np.asarray(Cl, np.float64)
        Kinv = np.linalg.inv(K32.astype(np.float64) + eps * np.eye(n))
        assert np.max(np.abs(got - Kinv)) / np.max(np.abs(Kinv)) < 1e-7

    def test_logdet_df(self):
        n = 300
        K32, _, _ = _illcond(n)
        eps = np.float32(1e-6)
        L64 = np.linalg.cholesky(K32.astype(np.float64)
                                 + eps * np.eye(n))
        Lh, Ll = jax.jit(_df.chol_df)(jnp.asarray(K32), eps)
        ld = float(jax.jit(_df.logdet_df)(Lh, Ll))
        ld64 = 2 * np.sum(np.log(np.diag(L64)))
        # absolute ~ sqrt(n) * f32 log rounding (module docstring)
        assert abs(ld - ld64) < 1e-3


class TestCholRescue:
    """Integration: the ``df='auto'`` rescue inside ``Chol``."""

    def _reg_truth(self, K32, y64, dec):
        """f64 truth of the model the rescue actually solves:
        the f32-rounded K plus the primary eps (unscaled)."""
        n = K32.shape[0]
        s = np.asarray(dec._s, np.float64)
        epsp = float(np.asarray(dec._eps))
        Kreg = K32.astype(np.float64) + np.diag(epsp / s ** 2)
        L = np.linalg.cholesky(Kreg)
        z = np.linalg.solve(L, y64)
        nll = 0.5 * z @ z + np.sum(np.log(np.diag(L))) \
            + 0.5 * n * np.log(2 * np.pi)
        Kinv = np.linalg.inv(Kreg)
        return nll, Kinv, Kinv @ y64

    def test_rescue_triggers_and_values(self):
        n = 384
        K32, y64, _ = _illcond(n)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            dec = Chol(jnp.asarray(K32))
        assert bool(np.asarray(dec._df_rescued))
        nll64, Kinv, alpha = self._reg_truth(K32, y64, dec)
        y32 = jnp.asarray(y64, jnp.float32)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            nll = float(dec.minus_log_normal_density(y32))
            ld = float(dec.logdet())
            sol = np.asarray(dec.ginv_linear(y32), np.float64)
        assert abs(nll - nll64) < 1e-4 * abs(nll64)
        ld64 = float(np.linalg.slogdet(
            K32.astype(np.float64) + np.diag(
                float(np.asarray(dec._eps))
                / np.asarray(dec._s, np.float64) ** 2))[1])
        assert abs(ld - ld64) < 1e-2
        assert np.max(np.abs(sol - alpha)) / np.max(np.abs(alpha)) < 1e-4

    def test_rescue_warns_and_df_false_disables(self):
        n = 384
        K32, y64, _ = _illcond(n)
        y32 = jnp.asarray(y64, jnp.float32)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter('always')
            dec = Chol(jnp.asarray(K32))
            dec.minus_log_normal_density(y32)
        assert any('emulated-double' in str(x.message) for x in w)
        dec2 = Chol(jnp.asarray(K32), df=False)
        assert dec2._Ldf_h is None

    def test_wellposed_untouched(self):
        # big noise: cond within f32 reach -> no rescue, results match
        # the df=False path bit-for-bit
        n = 200
        K32, y64, _ = _illcond(n, noise=1e-1)
        y32 = jnp.asarray(y64, jnp.float32)
        dec = Chol(jnp.asarray(K32))
        assert not bool(np.asarray(dec._df_rescued))
        a = dec.minus_log_normal_density(y32)
        b = Chol(jnp.asarray(K32), df=False).minus_log_normal_density(y32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_escalated_singular_rescued(self):
        # noiseless smooth Gram: the f32 small-eps rung fails, the old
        # outcome was the ~30%-biased eps2 refactorization; the df
        # rescue factors at the primary eps instead
        n = 256
        K32, y64, _ = _illcond(n, noise=0.0)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            dec = Chol(jnp.asarray(K32))
        assert bool(np.asarray(dec._df_rescued))
        epsp = float(np.asarray(dec._eps))
        s = np.asarray(dec._s, np.float64)
        # primary eps, not the 32*mach*bound rung
        mach = float(np.finfo(np.float32).eps)
        bound = np.max(np.abs(s * (np.abs(K32.astype(np.float64)) @ s)))
        assert epsp < 8 * mach  # diagonal-anchored, not bound-scaled
        ld = float(dec.logdet())
        ld64 = float(np.linalg.slogdet(
            K32.astype(np.float64) + np.diag(epsp / s ** 2))[1])
        assert abs(ld - ld64) < 1e-2 * max(1.0, abs(ld64))

    def test_gradients_finite_and_accurate(self):
        # reverse-mode gradient through BOTH the unfused density and
        # the fused chol_nll in the rescue regime: finite, and within
        # each path's structural floor of the regularized f64 truth.
        # The fused rule assembles Kbar in double-float (~1% floor from
        # the f32 cotangent of dK); the unfused path's cotangents flow
        # through the ladder's f32 dL = L Φ(...) rule, whose error is
        # ~mach·cond-amplified — measured 8% at this cond (~6e6), vs
        # 18-65% without the rescue's df primal solves
        n = 384
        K32, y64, d2 = _illcond(n)
        y32 = y64.astype(np.float32)
        scale0 = 2.0
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            dec = Chol(jnp.asarray(K32))
        epsp = float(np.asarray(dec._eps))
        s = np.asarray(dec._s, np.float64)

        def nll64(scale):
            K = jnp.exp(-0.5 * jnp.asarray(d2) / scale ** 2) \
                + jnp.asarray(1e-4 * np.eye(n)) \
                + jnp.asarray(np.diag(epsp / s ** 2))
            L = jnp.linalg.cholesky(K)
            z = jax.scipy.linalg.solve_triangular(
                L, jnp.asarray(y64), lower=True)
            return 0.5 * z @ z + jnp.sum(jnp.log(jnp.diag(L))) \
                + 0.5 * n * jnp.log(2 * jnp.pi)

        if jax.config.jax_enable_x64:
            g64 = float(jax.grad(nll64)(jnp.float64(scale0)))
        else:
            g64 = None

        d232 = jnp.asarray(d2, jnp.float32)
        eye32 = jnp.asarray(1e-4 * np.eye(n), jnp.float32)

        def makeK(scale):
            return jnp.exp(-0.5 * d232 / scale ** 2) + eye32

        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            gu = float(jax.jit(jax.grad(lambda sc: Chol(makeK(sc))
                       .minus_log_normal_density(jnp.asarray(y32))))(
                           jnp.float32(scale0)))
            gf = float(jax.jit(jax.grad(lambda sc: chol_nll(
                makeK(sc), jnp.asarray(y32))))(jnp.float32(scale0)))
        assert np.isfinite(gu) and np.isfinite(gf)
        if g64 is not None:
            assert abs(gu - g64) < 1.5e-1 * abs(g64)
            assert abs(gf - g64) < 1e-1 * abs(g64)

    def test_forward_mode_gradient(self):
        # forward-mode (jacfwd) keeps the compensated contraction
        # inside the fused rule, so the remaining error is the f32
        # REPRESENTATION of the traced tangent dK (rounding of exp·d2
        # intermediates, amplified by the cancelling contraction):
        # measured ~6e-3 here, vs ~2-5e-2 for the reverse-mode
        # f32-cotangent floor
        if not jax.config.jax_enable_x64:
            pytest.skip('needs f64 truth in-process')
        n = 384
        K32, y64, d2 = _illcond(n)
        y32 = y64.astype(np.float32)
        scale0 = 2.0
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            dec = Chol(jnp.asarray(K32))
        epsp = float(np.asarray(dec._eps))
        s = np.asarray(dec._s, np.float64)
        Kreg = K32.astype(np.float64) + np.diag(epsp / s ** 2)
        Kinv = np.linalg.inv(Kreg)
        alpha = Kinv @ y64
        Kbar64 = 0.5 * (Kinv - np.outer(alpha, alpha))
        dK64 = np.exp(-0.5 * d2 / scale0 ** 2) * (d2 / scale0 ** 3)
        g64 = np.vdot(Kbar64, dK64.astype(np.float32).astype(np.float64))

        d232 = jnp.asarray(d2, jnp.float32)
        eye32 = jnp.asarray(1e-4 * np.eye(n), jnp.float32)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            gfwd = float(jax.jit(jax.jacfwd(lambda sc: chol_nll(
                jnp.exp(-0.5 * d232 / sc ** 2) + eye32,
                jnp.asarray(y32))))(jnp.float32(scale0)))
        assert abs(gfwd - g64) < 1.5e-2 * abs(g64)
