"""Fused marginal-likelihood value/gradient (linalg.chol_nll) against
AD through the factorization (the round-2 path) and dense oracles.
Reference counterpart of the contract: hand-derived gradrev formulas in
``/root/reference/src/lsqfitgp/_linalg/_decomp.py:441-586``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu.linalg import Chol, chol_nll, trtri_blocked
from lsqfitgp_tpu.linalg import _blocked

from util import tol


def _spd(rng, n, noise=0.1):
    x = np.sort(rng.uniform(-5, 5, n))
    K = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2)
    return jnp.asarray(K + noise * np.eye(n)), x


class TestTrtri:

    @pytest.mark.parametrize('n', [64, 200, 512, 700])
    def test_inverse_identity(self, n, rng):
        K, _ = _spd(rng, n)
        L, Dinv = _blocked.chol_factor(K, block=128)
        W = trtri_blocked(L, Dinv, block=128)
        eye = np.asarray(W @ L)
        np.testing.assert_allclose(
            eye, np.eye(n), **tol(0, 1e-8, atol32=2e-4, rtol32=0))

    def test_no_dinv(self, rng):
        K, _ = _spd(rng, 130)
        L, Dinv = _blocked.chol_factor(K, block=64)
        W1 = trtri_blocked(L, Dinv, block=64)
        W2 = trtri_blocked(L, None, block=64)
        np.testing.assert_allclose(np.asarray(W1), np.asarray(W2),
                                   **tol(1e-9, 1e-11, rtol32=1e-3, atol32=1e-4))

    def test_lower_triangular(self, rng):
        K, _ = _spd(rng, 200)
        L, Dinv = _blocked.chol_factor(K, block=128)
        W = np.asarray(trtri_blocked(L, Dinv, block=128))
        assert np.all(np.triu(W, 1) == 0)


def _ad_nll(K, r, **kw):
    """The unfused path: AD flows through Chol's factorization."""
    return Chol(K, **kw).minus_log_normal_density(r)


class TestCholNLLFused:

    @pytest.mark.parametrize('n', [40, 300, 1100])
    def test_value_matches_unfused(self, n, rng):
        K, _ = _spd(rng, n)
        r = jnp.asarray(rng.standard_normal(n))
        v1 = float(chol_nll(K, r))
        v2 = float(_ad_nll(K, r))
        np.testing.assert_allclose(v1, v2, **tol(1e-12, rtol32=1e-6))

    @pytest.mark.parametrize('n', [40, 300, 1100])
    def test_grad_K_matches_ad(self, n, rng):
        """Gradient wrt hyperparameters (the pullback the fit uses)
        agrees with AD through the factorization."""
        x = jnp.asarray(np.sort(rng.uniform(-5, 5, n)))
        y = jnp.asarray(rng.standard_normal(n))

        def build(w):
            k = lgp.ExpQuad(scale=jnp.exp(w[0]))
            return jnp.exp(2 * w[1]) * k.core(x[:, None], x[None, :]) \
                + jnp.exp(w[2]) * jnp.eye(n, dtype=x.dtype)

        w0 = jnp.asarray([0.3, 0.1, -2.0], x.dtype)
        g1 = jax.grad(lambda w: chol_nll(build(w), y))(w0)
        g2 = jax.grad(lambda w: _ad_nll(build(w), y))(w0)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2),
            **tol(1e-6, 1e-9, rtol32=2e-2, atol32=1e-2))

    def test_grad_r(self, rng):
        n = 150
        K, _ = _spd(rng, n)
        r = jnp.asarray(rng.standard_normal(n))
        g1 = jax.grad(lambda r: chol_nll(K, r))(r)
        g2 = jax.grad(lambda r: _ad_nll(K, r))(r)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   **tol(1e-8, 1e-10, rtol32=1e-3, atol32=1e-4))

    def test_jacfwd_matches_reverse(self, rng):
        """forward=True fits use jacfwd: both AD modes of the custom
        rule must agree."""
        n = 120
        x = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
        y = jnp.asarray(rng.standard_normal(n))

        def f(w):
            K = jnp.exp(2 * w[1]) * lgp.ExpQuad(scale=jnp.exp(w[0])) \
                .core(x[:, None], x[None, :]) \
                + 0.1 * jnp.eye(n, dtype=x.dtype)
            return chol_nll(K, y)

        w0 = jnp.asarray([0.2, -0.1], x.dtype)
        gf = jax.jacfwd(f)(w0)
        gr = jax.grad(f)(w0)
        # f32: forward and reverse accumulate roundoff in different
        # orders through the n² contraction; ~1e-3 relative is the
        # expected agreement, not a rule defect
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   **tol(1e-9, 1e-12, rtol32=1e-3, atol32=1e-3))

    def test_grad_vs_dense_oracle(self, rng):
        """f64: gradient against the closed-form dense formula
        dV = <(K⁻¹ - zz')/2, dK>, z = K⁻¹r, on a well-conditioned
        matrix where the regularization is negligible."""
        if jnp.zeros(1).dtype == jnp.float32:
            pytest.skip('oracle comparison needs f64 accumulation')
        n = 250
        K, _ = _spd(rng, n, noise=0.5)
        r = jnp.asarray(rng.standard_normal(n))

        def f(K):
            return chol_nll(K, r)

        G = jax.grad(f)(K)
        Ki = np.linalg.inv(np.asarray(K, 'f8'))
        z = Ki @ np.asarray(r, 'f8')
        want = 0.5 * (Ki - np.outer(z, z))
        got = np.asarray(G, 'f8')
        got = 0.5 * (got + got.T)  # symmetrize the AD gauge
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    def test_gp_prior_nll_routes_fused(self, rng):
        """GP.marginal_likelihood gradient path agrees with the raw
        fused call, and an addcov-decomps GP falls back cleanly."""
        n = 60
        x = np.sort(rng.uniform(-3, 3, n))
        y = rng.standard_normal(n)
        gp = lgp.GP(lgp.ExpQuad(), checkpos=False).addx(x, 'x')
        ml = float(gp.marginal_likelihood(
            {'x': y}, givencov={('x', 'x'): 0.1 * np.eye(n)}))
        K = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2) \
            + 0.1 * np.eye(n)
        want = -float(chol_nll(jnp.asarray(K), jnp.asarray(y)))
        np.testing.assert_allclose(ml, want, **tol(1e-10, rtol32=1e-5))

    def test_fused_under_jit_and_f32_lane(self, rng):
        n = 80
        K, _ = _spd(rng, n)
        r = jnp.asarray(rng.standard_normal(n))
        f = jax.jit(jax.value_and_grad(lambda K: chol_nll(K, r)))
        v, g = f(K)
        assert np.isfinite(float(v))
        assert np.all(np.isfinite(np.asarray(g)))
