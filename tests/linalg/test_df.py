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


class TestDfGram:
    """Double-float Gram assembly: exact r², df exp, and the
    pair-input rescue that starts from the TRUE model (the reference
    never needs this because it assembles in f64,
    ``/root/reference/src/lsqfitgp/_linalg/_decomp.py:245-278``)."""

    def test_exp_df_accuracy(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-60, 0, 20001).astype(np.float32)
        h, l = jax.jit(_df.exp_df)(jnp.asarray(x))
        got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        want = np.exp(np.asarray(x, np.float64))
        assert np.max(np.abs(got - want) / want) < 1e-9

    def test_r2_pairs_df_exact(self):
        rng = np.random.default_rng(1)
        X = rng.uniform(-50, 50, (200, 3)).astype(np.float32)
        X64 = np.asarray(X, np.float64)
        want = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
        # eager: exact on every backend
        r2h, r2l = _df.r2_pairs_df(jnp.asarray(X))
        got = np.asarray(r2h, np.float64) + np.asarray(r2l, np.float64)
        rel = np.abs(got - want) / np.maximum(want, 1e-30)
        np.fill_diagonal(rel, 0)
        assert rel.max() < 1e-13
        # under jit: exact only where the backend preserves EFT
        # semantics (XLA:CPU's LLVM backend contracts FMAs and
        # degrades the pair to f32 — see _df.eft_jit_exact)
        r2h, r2l = jax.jit(_df.r2_pairs_df)(jnp.asarray(X))
        got = np.asarray(r2h, np.float64) + np.asarray(r2l, np.float64)
        rel = np.abs(got - want) / np.maximum(want, 1e-30)
        np.fill_diagonal(rel, 0)
        assert rel.max() < (1e-13 if _df.eft_jit_exact() else 1e-6)

    def test_gram_df_expquad(self):
        rng = np.random.default_rng(2)
        x = np.sort(rng.uniform(-5, 5, 300)).astype(np.float32)[:, None]
        pdf = lambda h, l: _df.exp_df(-0.5 * h, -0.5 * l)
        Kh, Kl = _df.gram_df(pdf, jnp.asarray(x),
                             lenscale=np.float32(0.7))
        got = np.asarray(Kh, np.float64) + np.asarray(Kl, np.float64)
        x64 = np.asarray(x, np.float64)
        want = np.exp(-0.5 * (x64 - x64.T) ** 2
                      / np.float64(np.float32(0.7)) ** 2)
        assert np.abs(got - want).max() < 1e-9

    def test_pair_rescues_corrupted_assembly(self):
        """The λmin = −9e-5 repro: an assembly-error-corrupted f32 Gram
        is indefinite (chol_df NaN = honest failure), while the df
        PAIR from gram_df factors fine and matches the f64 truth."""
        rng = np.random.default_rng(3)
        n = 400
        x = np.sort(rng.uniform(0, 8, n)).astype(np.float32)
        noise = np.float32(1e-4)
        pdf = lambda h, l: _df.exp_df(-0.5 * h, -0.5 * l)
        Kh, Kl = _df.gram_df(pdf, jnp.asarray(x)[:, None],
                             lenscale=np.float32(2.0))
        # simulate the TPU's transcendental assembly error (CPU f32
        # exp is ~1 ULP, so inject a corruption exceeding the nugget's
        # spectral protection: ||dK||_2 ~ 1e-5*sqrt(n*n)/sqrt(3) > eps)
        corrupt = np.asarray(Kh) \
            + (rng.uniform(-1, 1, (n, n)) * 1e-5).astype(np.float32)
        corrupt = np.triu(corrupt) + np.triu(corrupt, 1).T
        w = np.linalg.eigvalsh(corrupt.astype(np.float64)
                               + noise * np.eye(n))
        assert w.min() < 0          # corrupted: indefinite with nugget
        Lh, _ = _df.chol_df(jnp.asarray(corrupt), noise)
        assert not bool(np.isfinite(np.asarray(jnp.diag(Lh))).all())
        Lh2, Ll2 = _df.chol_df(Kh, noise, Kl)
        assert bool(np.isfinite(np.asarray(jnp.diag(Lh2))).all())
        x64 = np.asarray(x, np.float64)
        K64 = np.exp(-0.5 * (x64[:, None] - x64[None, :]) ** 2
                     / np.float64(np.float32(2.0)) ** 2) \
            + np.float64(noise) * np.eye(n)
        Lt = np.linalg.cholesky(K64)
        L = np.asarray(Lh2, np.float64) + np.asarray(Ll2, np.float64)
        assert np.max(np.abs(np.diag(L) / np.diag(Lt) - 1)) < 1e-8

    def test_gp_df_gram_end_to_end(self):
        """GP surface: a cond ≈ 3e6 ExpQuad model rides the df-Gram
        rescue through marginal_likelihood and matches the f64 NLL to
        ~1e-6 relative (the VERDICT round-4 'fit matches f64 truth'
        bar; gradient accuracy is limited separately by the f32
        tangent assembly — see the Chol df_gram docs)."""
        if jnp.zeros(1).dtype == jnp.float64:
            pytest.skip('df rescue engages in the f32 lane only')
        import lsqfitgp_tpu as lgp
        rng = np.random.default_rng(4)
        n = 500
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32)
        noise = 1e-4
        x64 = np.asarray(x, np.float64)
        K64 = np.exp(-0.5 * (x64[:, None] - x64[None, :]) ** 2 / 4.0) \
            + noise * np.eye(n)
        y = np.linalg.cholesky(K64) @ rng.standard_normal(n)
        nll64 = 0.5 * (y @ np.linalg.solve(K64, y)
                       + np.linalg.slogdet(K64)[1]
                       + n * np.log(2 * np.pi))
        gp = lgp.GP(lgp.ExpQuad(scale=2.0)).addx(x, 'a')
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter('always')
            ml = gp.marginal_likelihood(
                {'a': y},
                {('a', 'a'): noise * np.eye(n, dtype=np.float32)})
        assert abs(-float(ml) - nll64) < 1e-6 * abs(nll64)
        assert any('rescued' in str(r.message) for r in rec)

    def test_warning_distinguishes_model_singular(self):
        """df rescue attempted + failed: the warning names the cause —
        'MODEL itself is singular' when the Gram was df-assembled,
        'may still be rescuable' when it was not."""
        rng = np.random.default_rng(5)
        n = 64
        x = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
        pdf = lambda h, l: _df.exp_df(-0.5 * h, -0.5 * l)
        Kh, Kl = _df.gram_df(pdf, jnp.asarray(x)[:, None],
                             lenscale=np.float32(1.0))
        # a df pair that is INDEFINITE beyond df reach: the model
        # itself (as the pair describes it) is singular
        Kbad = jnp.asarray(
            np.asarray(Kh) - np.float32(1e-3) * np.eye(n, k=1,
                                                       dtype=np.float32)
            - np.float32(1e-3) * np.eye(n, k=-1, dtype=np.float32))
        K32 = np.asarray(Kh)
        y32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        with warnings.catch_warnings(record=True) as w1:
            warnings.simplefilter('always')
            dec = Chol(jnp.asarray(K32), df_gram=lambda: (Kbad, Kl))
            dec.minus_log_normal_density(y32)
        assert bool(np.asarray(dec._df_failed))
        assert any('MODEL itself is singular' in str(x.message)
                   for x in w1)
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter('always')
            dec2 = Chol(jnp.asarray(K32))
            dec2.minus_log_normal_density(y32)
        if bool(np.asarray(dec2._df_failed)):
            assert any('may still be rescuable' in str(x.message)
                       for x in w2)

    def test_build_profile_df_registry(self):
        """build_profile_df: df evaluators for registered cores
        (ExpQuad incl. post chains and term sums), None otherwise."""
        import lsqfitgp_tpu as lgp
        from lsqfitgp_tpu.kernelalg import _fastgram as fg
        k = 2.5 * lgp.ExpQuad() + 0.5
        pdf = fg.build_profile_df(k._fastgram)
        assert pdf is not None
        r2 = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
        h, l = pdf(r2, jnp.zeros_like(r2))
        got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        want = 2.5 * np.exp(-0.5 * np.asarray(r2, np.float64)) + 0.5
        assert np.abs(got - want).max() < 1e-6
        ks = 1.5 * lgp.ExpQuad(scale=2.0) + 0.5 * lgp.ExpQuad(scale=9.0)
        pdfs = fg.build_profile_df(ks._fastgram)
        assert pdfs is not None
        h, l = pdfs(r2, jnp.zeros_like(r2))
        got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        r264 = np.asarray(r2, np.float64)
        want = 1.5 * np.exp(-0.5 * r264 / 4.0) \
            + 0.5 * np.exp(-0.5 * r264 / 81.0)
        assert np.abs(got - want).max() < 1e-6
        assert fg.build_profile_df(
            lgp.Cauchy(alpha=1.0)._fastgram) is None
