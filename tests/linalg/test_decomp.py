import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.linalg import Chol


def random_psd(rng, n, rank=None):
    rank = n if rank is None else rank
    A = rng.standard_normal((n, rank))
    return A @ A.T


@pytest.fixture(params=[1, 5, 20])
def n(request):
    return request.param


def test_solve_matches_dense(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    b = rng.standard_normal(n)
    x = d.ginv_linear(b)
    np.testing.assert_allclose(np.asarray(K @ x), b, atol=1e-6, rtol=1e-6)


def test_scaled_matrix(rng, n):
    # badly scaled diagonal must still solve accurately
    K0 = random_psd(rng, n)
    s = 10.0 ** rng.uniform(-8, 8, n)
    K = K0 * np.outer(s, s)
    d = Chol(K)
    b = rng.standard_normal(n) * s
    x = np.asarray(d.ginv_linear(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(K @ x), b, rtol=1e-5)


def test_pinv_bilinear(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    A = rng.standard_normal((n, 3))
    r = rng.standard_normal(n)
    got = np.asarray(d.pinv_bilinear(A, r))
    want = A.T @ np.linalg.solve(K, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_ginv_quad(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    A = rng.standard_normal((n, 4))
    got = np.asarray(d.ginv_quad(A))
    want = A.T @ np.linalg.solve(K, A)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.ginv_diagquad(A)), np.diag(want), rtol=1e-5, atol=1e-8
    )


def test_correlate_roundtrip(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    x = rng.standard_normal(n)
    y = np.asarray(d.correlate(x))
    # cov of correlate = K
    M = np.asarray(d.correlate(np.eye(n)))
    np.testing.assert_allclose(M @ M.T, np.asarray(d.matrix()), rtol=1e-7)
    z = np.asarray(d.pinv_correlate(jnp.asarray(y)))
    np.testing.assert_allclose(z, x, rtol=1e-5, atol=1e-8)


def test_logdet(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    sign, want = np.linalg.slogdet(K)
    got = float(d.logdet())
    assert sign > 0
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_density_value(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    r = rng.standard_normal(n)
    got = float(d.minus_log_normal_density(jnp.asarray(r)))
    want = 0.5 * (
        r @ np.linalg.solve(K, r)
        + np.linalg.slogdet(K)[1]
        + n * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_density_grad_vs_ad(rng):
    # gradient through the full Chol construction must match AD of an
    # unregularized dense formula on a well-conditioned matrix
    n = 8
    K0 = random_psd(rng, n) + 10 * np.eye(n)
    V = rng.standard_normal((n, n))
    r0 = rng.standard_normal(n)
    w = rng.standard_normal(n)

    def density(p, use_chol):
        K = jnp.asarray(K0) + p * jnp.asarray(V @ V.T)
        r = jnp.asarray(r0) + p * jnp.asarray(w)
        if use_chol:
            return Chol(K, epsrel=0).minus_log_normal_density(r)
        return 0.5 * (
            r @ jnp.linalg.solve(K, r)
            + jnp.linalg.slogdet(K)[1]
            + n * jnp.log(2 * jnp.pi)
        )

    g1 = jax.grad(density)(0.5, True)
    g2 = jax.grad(density)(0.5, False)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-6)


def test_fisher(rng):
    n, P = 6, 3
    K0 = random_psd(rng, n) + 5 * np.eye(n)
    dK = np.stack([random_psd(rng, n) for _ in range(P)])
    dr = rng.standard_normal((P, n))
    d = Chol(K0, epsrel=0)
    got = np.asarray(d.fisher(jnp.asarray(dK), jnp.asarray(dr)))
    Ki = np.linalg.inv(K0)
    want = np.empty((P, P))
    for i in range(P):
        for j in range(P):
            want[i, j] = 0.5 * np.trace(Ki @ dK[i] @ Ki @ dK[j]) + dr[i] @ Ki @ dr[j]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rank_deficient(rng):
    n = 10
    K = random_psd(rng, n, rank=4)
    d = Chol(K)
    r = np.asarray(K @ rng.standard_normal(n))
    x = np.asarray(d.ginv_linear(jnp.asarray(r)))
    # K x should reproduce r for r in range(K)
    np.testing.assert_allclose(np.asarray(K @ x), r, rtol=1e-3, atol=1e-6)


def test_jit_pytree(rng):
    K = random_psd(rng, 5)

    @jax.jit
    def f(K, r):
        d = Chol(K)
        return d.minus_log_normal_density(r)

    r = jnp.asarray(rng.standard_normal(5))
    v = float(f(jnp.asarray(K), r))
    assert np.isfinite(v)

    @jax.jit
    def g(d, r):
        return d.minus_log_normal_density(r)

    d = Chol(jnp.asarray(K))
    assert np.isclose(float(g(d, r)), v)
