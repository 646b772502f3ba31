"""Formatting, seqalg, toeplitz drivers, fasthash, fit checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from util import tol

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import uncert
from lsqfitgp_tpu.utils import uformat, format_uarray, tabulate_together
from lsqfitgp_tpu.linalg import seqalg, toeplitz


class TestFormat:

    def test_uformat_pm(self):
        assert uformat(1.23456, 0.012, sep=' ± ') == '1.235 ± 0.012'
        # leading error digit 4 -> one digit shown at errdig=1.5
        assert uformat(1.23456, 0.045, sep=' ± ') == '1.23 ± 0.04'

    def test_uformat_compact(self):
        # parenthesis mode is the default (sep=None)
        assert uformat(1.23456, 0.012) == '1.235(12)'

    def test_format_uarray(self):
        u = uncert.normal([1.0, 2.0], [0.1, 0.25])
        out = format_uarray(u, 'u')
        assert out.shape == (2,)
        assert '±' in out[0]

    def test_tabulate(self):
        prior = {'a': uncert.normal(0.0, 1.0), 'b': 3.0}
        post = {'a': uncert.normal(0.5, 0.1)}
        s = tabulate_together(prior, post, headers=['prior', 'post'])
        assert 'a' in s and 'prior' in s and 'post' in s


class TestSeqalg:

    def test_matmul_row_by_full(self, rng):
        A = rng.standard_normal((8, 5))
        B = rng.standard_normal((5, 3))
        prod = seqalg.Rows(jnp.asarray(A))
        mm = seqalg.MatMulRowByFull(prod, jnp.asarray(B))
        _, out = seqalg.sequential_algorithm(8, [prod, mm])
        np.testing.assert_allclose(np.asarray(out), A @ B, **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    def test_solve_tri(self, rng):
        L = np.tril(rng.standard_normal((6, 6))) + 3 * np.eye(6)
        B = rng.standard_normal((6, 2))
        prod = seqalg.Rows(jnp.asarray(L))
        sol = seqalg.SolveTriLowerColByFull(prod, jnp.asarray(B))
        _, out = seqalg.sequential_algorithm(6, [prod, sol])
        np.testing.assert_allclose(np.asarray(out), np.linalg.solve(L, B),
                                   **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    def test_sum_log_diag(self, rng):
        L = np.tril(rng.standard_normal((6, 6))) + 3 * np.eye(6)
        prod = seqalg.Rows(jnp.asarray(L))
        sld = seqalg.SumLogDiag(prod)
        _, out = seqalg.sequential_algorithm(6, [prod, sld])
        np.testing.assert_allclose(float(out), np.sum(np.log(np.diag(L))),
                                   **tol(1e-12, rtol32=1e-6))

    def test_toeplitz_rows_stack(self):
        t = jnp.asarray([3.0, 1.0, 0.5, 0.2])
        prod = seqalg.ToeplitzRows(t)
        st = seqalg.Stack(prod)
        _, out = seqalg.sequential_algorithm(4, [prod, st])
        import scipy.linalg as sl
        np.testing.assert_allclose(np.asarray(out),
                                   sl.toeplitz(np.asarray(t)), **tol(1e-10, rtol32=1e-4, atol32=1e-5))


class TestToeplitz:

    def test_chol_solve_logdet(self, rng):
        import scipy.linalg as sl
        n = 25
        t = 0.7 ** np.arange(n)
        T = sl.toeplitz(t)
        L = np.asarray(toeplitz.chol(jnp.asarray(t)))
        np.testing.assert_allclose(L @ L.T, T, **tol(0, 1e-12, rtol32=0, atol32=1e-5))
        b = rng.standard_normal(n)
        np.testing.assert_allclose(
            np.asarray(toeplitz.solve(jnp.asarray(t), jnp.asarray(b))),
            np.linalg.solve(T, b), **tol(1e-9, 1e-12, rtol32=1e-3, atol32=1e-4),
        )
        np.testing.assert_allclose(
            float(toeplitz.logdet(jnp.asarray(t))),
            np.linalg.slogdet(T)[1], **tol(1e-10, rtol32=1e-4, atol32=1e-5),
        )

    def test_chol_solve_driver(self, rng):
        import scipy.linalg as sl
        n = 10
        t = 0.5 ** np.arange(n)
        b = rng.standard_normal(n)
        L = np.linalg.cholesky(sl.toeplitz(t))
        np.testing.assert_allclose(
            np.asarray(toeplitz.chol_solve(jnp.asarray(t), jnp.asarray(b))),
            np.linalg.solve(L, b), **tol(1e-9, rtol32=1e-3, atol32=1e-4),
        )


def _fasthash64_py(data, seed=0):
    """Independent pure-python fast-hash (from the published algorithm)."""
    M = 0x880355F21E6D1965
    MASK = (1 << 64) - 1

    def mix(h):
        h ^= h >> 23
        h = (h * 0x2127599BF4325C37) & MASK
        h ^= h >> 47
        return h

    n = len(data)
    h = (seed ^ ((n * M) & MASK)) & MASK
    nwords = n // 8
    for i in range(nwords):
        w = int.from_bytes(data[8 * i:8 * i + 8], 'little')
        h = ((h ^ mix(w)) * M) & MASK
    tail = data[nwords * 8:]
    if tail:
        v = 0
        for b in reversed(tail):
            v = (v << 8) | b
        h = ((h ^ mix(v)) * M) & MASK
    return mix(h)


@pytest.mark.x64only  # uint64 hash state
class TestFasthash:

    @pytest.mark.parametrize('n', [0, 1, 7, 8, 9, 64, 100])
    def test_vs_python(self, n, rng):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        want = _fasthash64_py(data, seed=0x123456789)
        got = int(lgp.fasthash64(data, seed=0x123456789))
        assert got == want

    def test_fasthash32(self, rng):
        data = bytes(rng.integers(0, 256, 20, dtype=np.uint8))
        h64 = _fasthash64_py(data, seed=(1 ^ (1 >> 32)))
        want = (h64 - (h64 >> 32)) & 0xFFFFFFFF
        got = int(lgp.fasthash32(data, seed=1))
        assert got == want


class TestFitCheckpoint:

    def test_save_load(self, rng, tmp_path):
        from lsqfitgp_tpu import GP, empbayes_fit
        from lsqfitgp_tpu.kernels import ExpQuad
        x = np.linspace(-3, 3, 20)
        y = np.sin(x) + 0.05 * rng.standard_normal(20)

        def gpf(hp):
            gp = GP(ExpQuad(scale=hp['scale']))
            gp = gp.addx(x, 'f').addcov(0.01 * jnp.eye(20), 'e')
            return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                                   checklin=False)

        fit = empbayes_fit({'log(scale)': (0.0, 1.0)}, gpf, {'y': y},
                           raises=False)
        path = tmp_path / 'fit.npz'
        fit.save(path)
        state = empbayes_fit.load(path)
        np.testing.assert_allclose(
            float(state['p']['scale'].mean), float(fit.p['scale'].mean),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(state['p']['scale'].sdev), float(fit.p['scale'].sdev),
            rtol=1e-6,
        )


class TestTaylorAndSignature:

    def test_taylor_exp(self):
        from lsqfitgp_tpu.special import taylor
        # exp series: c_k = 1/k!
        import scipy.special as sps

        def coefgen(start, end):
            k = np.arange(start, end)
            return jnp.asarray(1 / sps.factorial(k))

        x = jnp.asarray(0.7)
        v = float(taylor(coefgen, (), 0, 25, x))
        np.testing.assert_allclose(v, np.exp(0.7), **tol(1e-10, rtol32=1e-4, atol32=1e-5))
        g = float(jax.grad(lambda x: taylor(coefgen, (), 0, 25, x))(x))
        np.testing.assert_allclose(g, np.exp(0.7), **tol(1e-10, rtol32=1e-4, atol32=1e-5))

    def test_signature(self):
        from lsqfitgp_tpu._signature import Signature
        sig = Signature('(n),(n,m)->(m)')
        assert sig.nin == 2 and sig.nout == 1
        sizes, out = sig.eval((5,), (5, 3))
        assert sizes == {'n': 5, 'm': 3}
        assert out == ((3,),)
        with pytest.raises(ValueError):
            sig.eval((5,), (4, 3))

    def test_distribution_with_signature(self):
        from lsqfitgp_tpu import copula
        from jax.scipy import special as jspecial

        # dirichlet-like custom distribution via signature
        def softmax_normal(x, scale):
            return jax.nn.softmax(x * scale)

        D = copula.distribution(softmax_normal, signature='(n),(n)->(n)')
        d = D(jnp.asarray([1.0, 1.0, 1.0]))
        assert d.in_size == 3
        out = np.asarray(d.partial_invfcn(jnp.asarray([0.1, -0.2, 0.4])))
        np.testing.assert_allclose(out.sum(), 1.0, **tol(1e-10, rtol32=1e-4, atol32=1e-5))
