import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.linalg import Chol

from util import tol, is_f32


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
    # the solver's contract is about the regularized matrix it factored;
    # in fp32 the eps regularization is large enough that comparing
    # against the unregularized K measures conditioning, not the solver
    Kr = np.asarray(d.matrix(), 'f8')
    b = rng.standard_normal(n)
    x = d.ginv_linear(b)
    np.testing.assert_allclose(np.asarray(Kr @ np.asarray(x, 'f8')), b,
                               **tol(1e-6, 1e-6, rtol32=2e-3, atol32=2e-4))


def test_scaled_matrix(rng, n):
    # badly scaled diagonal must still solve accurately
    K0 = random_psd(rng, n)
    s = 10.0 ** rng.uniform(-4 if is_f32() else -8, 4 if is_f32() else 8, n)
    K = K0 * np.outer(s, s)
    d = Chol(K)
    Kr = np.asarray(d.matrix(), 'f8')
    b = rng.standard_normal(n) * s
    x = np.asarray(d.ginv_linear(jnp.asarray(b)), 'f8')
    np.testing.assert_allclose(Kr @ x, b,
                               **tol(1e-5, rtol32=2e-3, atol32=0))


def test_pinv_bilinear(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    A = rng.standard_normal((n, 3))
    r = rng.standard_normal(n)
    got = np.asarray(d.pinv_bilinear(A, r))
    want = A.T @ np.linalg.solve(np.asarray(d.matrix(), 'f8'), r)
    np.testing.assert_allclose(got, want, **tol(1e-5, 1e-8, rtol32=1e-2, atol32=1e-2))


def test_ginv_quad(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    A = rng.standard_normal((n, 4))
    got = np.asarray(d.ginv_quad(A))
    want = A.T @ np.linalg.solve(np.asarray(d.matrix(), 'f8'), A)
    np.testing.assert_allclose(got, want, **tol(1e-5, 1e-8, rtol32=1e-2, atol32=1e-2))
    np.testing.assert_allclose(
        np.asarray(d.ginv_diagquad(A)), np.diag(want),
        **tol(1e-5, 1e-8, rtol32=1e-2, atol32=1e-2)
    )


def test_correlate_roundtrip(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    x = rng.standard_normal(n)
    y = np.asarray(d.correlate(x))
    # cov of correlate = K
    M = np.asarray(d.correlate(np.eye(n)))
    np.testing.assert_allclose(M @ M.T, np.asarray(d.matrix()),
                               **tol(1e-7, rtol32=1e-3, atol32=1e-3))
    z = np.asarray(d.pinv_correlate(jnp.asarray(y)))
    np.testing.assert_allclose(z, x, **tol(1e-5, 1e-8, rtol32=2e-2, atol32=1e-2))


def test_logdet(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    sign, want = np.linalg.slogdet(K)
    got = float(d.logdet())
    assert sign > 0
    np.testing.assert_allclose(got, want, **tol(1e-4, rtol32=2e-3))


def test_density_value(rng, n):
    K = random_psd(rng, n)
    d = Chol(K)
    r = rng.standard_normal(n)
    got = float(d.minus_log_normal_density(jnp.asarray(r)))
    Kr = np.asarray(d.matrix(), 'f8')
    want = 0.5 * (
        r @ np.linalg.solve(Kr, r)
        + np.linalg.slogdet(Kr)[1]
        + n * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(got, want, **tol(1e-5, rtol32=5e-3))


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
    np.testing.assert_allclose(float(g1), float(g2), **tol(1e-6, rtol32=3e-3))


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
    np.testing.assert_allclose(got, want, **tol(1e-6, rtol32=3e-3))


def test_rank_deficient(rng):
    n = 10
    K = random_psd(rng, n, rank=4)
    d = Chol(K)
    r = np.asarray(K @ rng.standard_normal(n))
    x = np.asarray(d.ginv_linear(jnp.asarray(r)))
    # K x should reproduce r for r in range(K)
    np.testing.assert_allclose(np.asarray(K @ x), r,
                               **tol(1e-3, 1e-6, rtol32=3e-2, atol32=3e-2))


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


def test_fishvec_cotangent(rng):
    # the fishvec cotangent pulled back through jax.vjp of p -> (K, r)
    # must reproduce the dense Fisher @ v (reference _decomp.py:20-109)
    n, P = 8, 5
    K0 = random_psd(rng, n) + 5 * np.eye(n)
    Vs = np.stack([random_psd(rng, n) for _ in range(P)])
    W = rng.standard_normal((P, n))
    r0 = rng.standard_normal(n)

    def make_Kr(p):
        K = jnp.asarray(K0) + jnp.einsum('i,iab->ab', p, jnp.asarray(Vs))
        r = jnp.asarray(r0) + p @ jnp.asarray(W)
        return K, r

    p0 = jnp.asarray(0.1 * rng.standard_normal(P))
    v = jnp.asarray(rng.standard_normal(P))

    K, r = make_Kr(p0)
    d = Chol(K, epsrel=0)

    # dense reference
    dK, dr = jax.jacfwd(make_Kr)(p0)            # (n, n, P), (n, P)
    F = d.fisher(jnp.moveaxis(dK, -1, 0), dr.T)
    want = np.asarray(F @ v)

    # fishvec: one jvp + cotangent + one vjp, no (P, n, n) stack
    _, (dKv, drv) = jax.jvp(make_Kr, (p0,), (v,))
    CK, cr = d.fishvec_cotangent(dKv, drv)
    _, vjp = jax.vjp(make_Kr, p0)
    (got,) = vjp((CK, cr))
    np.testing.assert_allclose(np.asarray(got), want,
                               **tol(1e-10, rtol32=1e-4, atol32=1e-4))


def test_chol_knobs(rng):
    # precision / block / blocked pass-throughs all factor correctly
    n = 64
    K = random_psd(rng, n) + n * np.eye(n)
    b = rng.standard_normal(n)
    ref = np.linalg.solve(np.asarray(K, 'f8'), np.asarray(b, 'f8'))
    for kw in (dict(), dict(precision='highest'),
               dict(blocked=True, block=16),
               dict(blocked=True, block=16, precision='highest'),
               dict(blocked=False)):
        d = Chol(jnp.asarray(K), **kw)
        x = np.asarray(d.ginv_linear(jnp.asarray(b)), 'f8')
        np.testing.assert_allclose(x, ref, **tol(1e-8, 1e-10,
                                                 rtol32=1e-2, atol32=1e-3))
