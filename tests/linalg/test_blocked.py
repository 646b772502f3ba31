"""Blocked MXU Cholesky + solves: correctness vs dense reference, padding
(non-multiple sizes), forward/reverse AD vs the XLA cholesky rule, and
Chol integration (blocked path agrees with the XLA path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from lsqfitgp_tpu import linalg
from util import tol
from lsqfitgp_tpu.linalg import (
    cholesky_blocked, solve_lower, solve_lower_t, diag_block_inverses, Chol,
)


def spd(rng, n, dtype=None):
    A = rng.standard_normal((n, n + 8))
    K = A @ A.T + n * np.eye(n)
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize('n,block', [(64, 16), (70, 16), (128, 32),
                                     (100, 64), (16, 16), (8, 16)])
def test_cholesky_blocked_matches_dense(rng, n, block):
    K = spd(rng, n)
    L = cholesky_blocked(K, block)
    Lref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), Lref,
                               **tol(1e-8, 1e-8, rtol32=1e-3, atol32=1e-3))
    # strictly zero above the diagonal
    assert np.all(np.triu(np.asarray(L), 1) == 0)


@pytest.mark.parametrize('n,block,m', [(64, 16, 3), (70, 32, 5), (33, 16, 1)])
def test_solves(rng, n, block, m):
    K = spd(rng, n)
    L = cholesky_blocked(K, block)
    Dinv = diag_block_inverses(L, block)
    B = jnp.asarray(rng.standard_normal((n, m)))
    X = solve_lower(L, B, block=block, Dinv=Dinv)
    np.testing.assert_allclose(
        np.asarray(L @ X), np.asarray(B),
        **tol(1e-8, 1e-8, rtol32=1e-3, atol32=1e-3))
    Xt = solve_lower_t(L, B, block=block, Dinv=Dinv)
    np.testing.assert_allclose(
        np.asarray(L.T @ Xt), np.asarray(B),
        **tol(1e-8, 1e-8, rtol32=1e-3, atol32=1e-3))
    # vector forms
    b = B[:, 0]
    np.testing.assert_allclose(
        np.asarray(solve_lower(L, b, block=block)),
        np.asarray(X[:, 0]), **tol(1e-9, rtol32=1e-4, atol32=1e-5))
    np.testing.assert_allclose(
        np.asarray(solve_lower_t(L, b, block=block)),
        np.asarray(Xt[:, 0]), **tol(1e-9, rtol32=1e-4, atol32=1e-5))


def test_jvp_matches_xla(rng):
    n, block = 48, 16
    K = spd(rng, n)
    dK_ = rng.standard_normal((n, n))
    dK = jnp.asarray(dK_ + dK_.T)
    _, dL = jax.jvp(lambda K: cholesky_blocked(K, block), (K,), (dK,))
    _, dLref = jax.jvp(lax.linalg.cholesky, (K,), (dK,))
    np.testing.assert_allclose(np.asarray(dL), np.asarray(dLref),
                               **tol(1e-7, 1e-8, rtol32=2e-2, atol32=1e-2))


def test_vjp_matches_xla(rng):
    n, block = 48, 16
    K = spd(rng, n)
    v = jnp.asarray(rng.standard_normal(n))

    def f_blocked(K):
        L = cholesky_blocked(K, block)
        return jnp.sum(jnp.log(jnp.diag(L))) + v @ (L @ v)

    def f_xla(K):
        L = lax.linalg.cholesky(K)
        return jnp.sum(jnp.log(jnp.diag(L))) + v @ (L @ v)

    g1 = jax.grad(f_blocked)(K)
    g2 = jax.grad(f_xla)(K)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               **tol(1e-6, 1e-9, rtol32=2e-2, atol32=1e-2))


def test_grad_through_solves(rng):
    # pred-path pattern: gradient w.r.t. both L-source and rhs
    n, block = 40, 16
    K = spd(rng, n)
    B = jnp.asarray(rng.standard_normal((n, 2)))

    def f(K, B):
        L = cholesky_blocked(K, block)
        X = solve_lower(L, B, block=block)
        return jnp.sum(X ** 2)

    def fref(K, B):
        from jax.scipy.linalg import solve_triangular
        L = lax.linalg.cholesky(K)
        X = solve_triangular(L, B, lower=True)
        return jnp.sum(X ** 2)

    gK, gB = jax.grad(f, argnums=(0, 1))(K, B)
    gKr, gBr = jax.grad(fref, argnums=(0, 1))(K, B)
    np.testing.assert_allclose(np.asarray(gB), np.asarray(gBr),
                               **tol(1e-7, rtol32=1e-2, atol32=1e-3))
    np.testing.assert_allclose(np.asarray(gK), np.asarray(gKr),
                               **tol(1e-6, 1e-9, rtol32=2e-2, atol32=1e-2))


def test_chol_blocked_vs_plain(rng):
    n = 160
    K = spd(rng, n)
    r = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((n, 4)))
    cb = Chol(K, blocked=True)
    cp = Chol(K, blocked=False)
    np.testing.assert_allclose(
        float(cb.minus_log_normal_density(r)),
        float(cp.minus_log_normal_density(r)), **tol(1e-9, rtol32=1e-4))
    np.testing.assert_allclose(
        np.asarray(cb.ginv_linear(A)), np.asarray(cp.ginv_linear(A)),
        **tol(1e-7, 1e-10, rtol32=1e-2, atol32=1e-3))
    np.testing.assert_allclose(
        np.asarray(cb.ginv_quad(A)), np.asarray(cp.ginv_quad(A)),
        **tol(1e-7, 1e-10, rtol32=1e-2, atol32=1e-3))
    np.testing.assert_allclose(
        np.asarray(cb.pinv_correlate(r)), np.asarray(cp.pinv_correlate(r)),
        **tol(1e-7, 1e-10, rtol32=1e-2, atol32=1e-3))
    np.testing.assert_allclose(float(cb.logdet()), float(cp.logdet()),
                               **tol(1e-10, rtol32=1e-4, atol32=1e-4))


def test_chol_auto_threshold(rng):
    # auto uses blocked for n >= 1024; result must agree with plain
    n = 1024
    K = spd(rng, n)
    r = jnp.asarray(rng.standard_normal(n))
    ca = Chol(K)
    assert ca._Dinv is not None
    cp = Chol(K, blocked=False)
    np.testing.assert_allclose(
        float(ca.minus_log_normal_density(r)),
        float(cp.minus_log_normal_density(r)), **tol(1e-8, rtol32=1e-4))


def test_chol_blocked_grad(rng):
    # hyperparameter-gradient pattern through the blocked path under jit
    n = 96
    x = jnp.linspace(0, 1, n)
    y = jnp.asarray(np.sin(4 * np.linspace(0, 1, n)))

    def nll(logscale, blocked):
        K = jnp.exp(-0.5 * ((x[:, None] - x[None, :])
                            / jnp.exp(logscale)) ** 2)
        K = K + 0.01 * jnp.eye(n)
        return Chol(K, blocked=blocked).minus_log_normal_density(y)

    g1 = jax.jit(jax.grad(lambda t: nll(t, True)))(jnp.asarray(0.3))
    g2 = jax.jit(jax.grad(lambda t: nll(t, False)))(jnp.asarray(0.3))
    np.testing.assert_allclose(float(g1), float(g2),
                               **tol(1e-6, rtol32=1e-3))
