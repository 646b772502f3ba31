"""Multi-chip layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu.parallel import (
    make_mesh, sharded_gram, sharded_nll, sharded_nll_distributed,
    sharded_train_step, block_cholesky, block_solve_lower,
)


@pytest.fixture
def mesh1d():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ('r',))


@pytest.fixture
def mesh2d():
    return make_mesh(8)


def spd(rng, n):
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


class TestBlockCholesky:

    @pytest.mark.parametrize('n,B', [(64, 8), (256, 16), (128, 128)])
    def test_vs_dense(self, mesh1d, rng, n, B):
        A = spd(rng, n)
        Aj = jax.device_put(
            jnp.asarray(A), NamedSharding(mesh1d, P('r', None))
        )
        L = np.asarray(block_cholesky(Aj, mesh1d, block=B))
        np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-10)

    def test_solve(self, mesh1d, rng):
        n, B = 128, 16
        A = spd(rng, n)
        Aj = jax.device_put(
            jnp.asarray(A), NamedSharding(mesh1d, P('r', None))
        )
        L = block_cholesky(Aj, mesh1d, block=B)
        b = jnp.asarray(rng.standard_normal(n))
        x = np.asarray(block_solve_lower(L, b, mesh1d, block=B))
        want = np.linalg.solve(np.linalg.cholesky(A), np.asarray(b))
        np.testing.assert_allclose(x, want, atol=1e-10)

    def test_bad_sizes(self, mesh1d):
        A = jnp.eye(100)
        with pytest.raises(ValueError):
            block_cholesky(A, mesh1d, block=16)


class TestShardedNLL:

    def test_distributed_matches_dense(self, mesh1d, rng):
        n = 128
        x = jnp.linspace(-3, 3, n)
        y = jnp.asarray(rng.standard_normal(n))
        k = lgp.ExpQuad(scale=1.5)
        kf = lambda a, b: k.core(a, b)

        got = float(jax.jit(
            lambda x, y: sharded_nll_distributed(
                kf, x, y, 0.1, mesh=mesh1d, block=16
            )
        )(x, y))

        K = np.asarray(k(np.asarray(x)[:, None], np.asarray(x)[None, :]))
        C = K + 0.1 * np.eye(n)
        want = 0.5 * (
            np.asarray(y) @ np.linalg.solve(C, np.asarray(y))
            + np.linalg.slogdet(C)[1] + n * np.log(2 * np.pi)
        )
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_distributed_grad(self, mesh1d, rng):
        n = 64
        x = jnp.linspace(-3, 3, n)
        y = jnp.sin(x)

        def nll(logscale):
            k = lgp.ExpQuad(scale=jnp.exp(logscale))
            return sharded_nll_distributed(
                lambda a, b: k.core(a, b), x, y, 0.05,
                mesh=mesh1d, block=16,
            )

        g = jax.jit(jax.grad(nll))(jnp.asarray(0.3))
        # finite-difference check
        h = 1e-5
        fd = (float(nll(jnp.asarray(0.3 + h)))
              - float(nll(jnp.asarray(0.3 - h)))) / (2 * h)
        np.testing.assert_allclose(float(g), fd, rtol=1e-4)

    def test_sharded_gram(self, mesh2d, rng):
        n = 40
        x = jnp.linspace(-2, 2, n)
        k = lgp.ExpQuad()
        with mesh2d:
            K = jax.jit(
                lambda x: sharded_gram(lambda a, b: k.core(a, b), x,
                                       mesh=mesh2d)
            )(x)
        want = np.asarray(k(np.asarray(x)[:, None], np.asarray(x)[None, :]))
        np.testing.assert_allclose(np.asarray(K), want, rtol=1e-10)

    def test_train_step(self, mesh2d):
        def kernel_family(params):
            k = lgp.ExpQuad(scale=jnp.exp(params['log_scale']))
            return lambda a, b: k.core(a, b)

        step = sharded_train_step(kernel_family, mesh=mesh2d)
        x = jnp.linspace(-3, 3, 64)
        y = jnp.sin(x)
        params = {'log_scale': jnp.zeros(()),
                  'noise_var': jnp.asarray(0.01)}
        with mesh2d:
            value, grads = step(params, x, y)
        assert np.isfinite(float(value))
        assert np.isfinite(float(grads['log_scale']))
