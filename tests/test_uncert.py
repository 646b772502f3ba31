import numpy as np
import jax
import jax.numpy as jnp

from lsqfitgp_tpu import uncert

from util import tol


def test_from_cov_roundtrip(rng):
    n = 6
    A = rng.standard_normal((n, n))
    covmat = A @ A.T
    m = rng.standard_normal(n)
    u = uncert.from_cov(m, covmat)
    np.testing.assert_allclose(np.asarray(u.mean), m)
    np.testing.assert_allclose(np.asarray(u.cov()), covmat, **tol(1e-8, 1e-10, rtol32=1e-4, atol32=1e-5))
    np.testing.assert_allclose(
        np.asarray(u.sdev), np.sqrt(np.diag(covmat)), **tol(1e-8, rtol32=1e-4, atol32=1e-5)
    )


def test_linear_ops(rng):
    n = 5
    A = rng.standard_normal((n, n))
    covmat = A @ A.T
    u = uncert.from_cov(rng.standard_normal(n), covmat)
    v = 2.0 * u + 1.0
    np.testing.assert_allclose(np.asarray(v.cov()), 4 * covmat, **tol(1e-8, rtol32=1e-4, atol32=1e-5))
    w = u - u
    np.testing.assert_allclose(np.asarray(w.sdev), 0, **tol(0, 1e-10, rtol32=0, atol32=1e-5))
    M = rng.standard_normal((3, n))
    y = M @ u
    np.testing.assert_allclose(
        np.asarray(y.cov()), M @ covmat @ M.T, **tol(1e-8, 1e-10, rtol32=1e-4, atol32=1e-5)
    )


def test_correlation_across_arrays(rng):
    n = 4
    A = rng.standard_normal((2 * n, 2 * n))
    covmat = A @ A.T
    u = uncert.from_cov(rng.standard_normal(2 * n), covmat)
    a, b = u[:n], u[n:]
    np.testing.assert_allclose(
        np.asarray(uncert.evalcov(a, b)), covmat[:n, n:], **tol(1e-8, 1e-10, rtol32=1e-4, atol32=1e-5)
    )


def test_independent_blocks(rng):
    a = uncert.from_cov(np.zeros(3), np.eye(3))
    b = uncert.from_cov(np.zeros(3), np.eye(3))
    np.testing.assert_allclose(np.asarray(uncert.evalcov(a, b)), 0, **tol(0, 1e-12, rtol32=0, atol32=1e-5))
    s = a + b
    np.testing.assert_allclose(np.asarray(s.cov()), 2 * np.eye(3), **tol(1e-8, rtol32=1e-4, atol32=1e-5))


def test_nonlinear_delta(rng):
    u = uncert.from_cov(np.array([2.0]), np.array([[0.01]]))
    v = u * u
    np.testing.assert_allclose(float(v.mean[0]), 4.0)
    # var(x²) ≈ (2x)² var(x)
    np.testing.assert_allclose(float(v.var[0]), 16 * 0.01, **tol(1e-8, rtol32=1e-4, atol32=1e-5))
    w = uncert.ufunc(jnp.exp, u)
    np.testing.assert_allclose(float(w.sdev[0]), np.exp(2) * 0.1, **tol(1e-8, rtol32=1e-4, atol32=1e-5))


def test_sample_stats(rng, key):
    n = 3
    A = rng.standard_normal((n, n))
    covmat = A @ A.T + np.eye(n)
    m = rng.standard_normal(n)
    u = uncert.from_cov(m, covmat)
    s = np.asarray(uncert.sample(key, u, 40000))
    np.testing.assert_allclose(s.mean(0), m, atol=0.1)
    np.testing.assert_allclose(np.cov(s.T), covmat, atol=0.15, rtol=0.1)


def test_concatenate(rng):
    a = uncert.from_cov(np.zeros(2), np.eye(2))
    b = uncert.from_cov(np.ones(3), 2 * np.eye(3))
    c = uncert.uconcatenate([a, b])
    assert c.shape == (5,)
    want = np.zeros((5, 5))
    want[:2, :2] = np.eye(2)
    want[2:, 2:] = 2 * np.eye(3)
    np.testing.assert_allclose(np.asarray(c.cov()), want, **tol(0, 1e-10, rtol32=0, atol32=1e-5))


def test_matmul_forms(rng):
    u = uncert.from_cov(rng.standard_normal(4), np.eye(4))
    M = rng.standard_normal((4, 2))
    v = rng.standard_normal(4)
    np.testing.assert_allclose(
        np.asarray((u @ M).cov()), M.T @ M, **tol(1e-8, 1e-10, rtol32=1e-4, atol32=1e-5)
    )
    np.testing.assert_allclose(float((u @ v).var), v @ v, **tol(1e-8, rtol32=1e-4, atol32=1e-5))
    np.testing.assert_allclose(float((v @ u).var), v @ v, **tol(1e-8, rtol32=1e-4, atol32=1e-5))


def test_getitem_trailing_axis(rng):
    # regression: keys addressing trailing axes must not leak into the
    # Jacobian primary-block axis
    from lsqfitgp_tpu import uncert
    import jax.numpy as jnp
    mean = jnp.asarray(rng.standard_normal((3, 4)))
    cov_flat = rng.standard_normal((12, 24))
    cov = jnp.asarray(cov_flat @ cov_flat.T)
    u = uncert.from_cov(mean.ravel(), cov).reshape(3, 4)
    full_var = np.asarray(u.var)

    v = u[..., 0]
    assert v.shape == (3,)
    np.testing.assert_allclose(np.asarray(v.var), full_var[:, 0],
                                  **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    v2 = u[1, 2]
    assert v2.shape == ()
    np.testing.assert_allclose(np.asarray(v2.var), full_var[1, 2],
                                  **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    v3 = u[:, 1]
    np.testing.assert_allclose(np.asarray(v3.var), full_var[:, 1],
                                  **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    v4 = u[..., 1:3]
    assert v4.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(v4.var), full_var[:, 1:3],
                                  **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    # None (newaxis) insertion
    v5 = u[None, ..., 0]
    assert v5.shape == (1, 3)

    # boolean mask over the leading axis
    mask = np.array([True, False, True])
    v6 = u[mask]
    assert v6.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(v6.var), full_var[mask],
                                  **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    # over-long key must raise
    try:
        u[0, 0, 0]
    except IndexError:
        pass
    else:
        raise AssertionError('over-long key accepted')
