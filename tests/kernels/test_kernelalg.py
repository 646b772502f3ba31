"""Transformation-engine contract tests (model: reference
tests/kernels/test_kernel.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu import kernelalg as ka
from lsqfitgp_tpu import asarray

from util import tol, is_f32


@ka.isotropickernel(derivable=True)
def ExpQuad(r2):
    return jnp.exp(-0.5 * r2)


@ka.kernel
def Linear(x, y):
    return x * y


@ka.stationarykernel(input='abs', derivable=False)
def Expon(d):
    return jnp.exp(-d)


@pytest.fixture
def x():
    return np.linspace(-2, 2, 7)


class TestClassLogic:

    def test_decorated_class_kept(self):
        assert type(ExpQuad()).__name__ == 'ExpQuad'
        assert isinstance(ExpQuad(), ka.IsotropicKernel)

    def test_constructor_linop_demotes(self):
        # scale is defined on IsotropicKernel level for isotropic kernels
        assert type(ExpQuad(scale=2)) is ka.IsotropicKernel

    def test_algop_promotion(self):
        k = ExpQuad() + Expon()
        # least common superclass of Isotropic and Stationary
        assert type(k) is ka.StationaryKernel
        k2 = ExpQuad() + Linear()
        assert type(k2) is ka.Kernel

    def test_scalar_add_is_constant(self):
        k = ExpQuad() + 1.0
        assert isinstance(k, ka.IsotropicKernel)

    def test_diff_asymmetric_demotes_to_cross(self):
        kd = ExpQuad().linop('diff', 1, None)
        assert type(kd) is ka.CrossKernel
        kdd = ExpQuad().linop('diff', 1, 1)
        assert type(kdd) is ka.Kernel

    def test_linop_noop(self):
        k = ExpQuad()
        assert k.linop('scale', None) is k

    def test_pow(self):
        k = ExpQuad() ** 3
        x = np.linspace(0, 1, 4)
        np.testing.assert_allclose(
            np.asarray(k(x[:, None], x[None, :])),
            np.asarray(ExpQuad()(x[:, None], x[None, :])) ** 3,
        )
        with pytest.raises(TypeError):
            ExpQuad() ** 1.5

    def test_rpow(self):
        k = 2.0 ** ExpQuad()
        x = np.linspace(0, 1, 4)
        np.testing.assert_allclose(
            np.asarray(k(x[:, None], x[None, :])),
            2.0 ** np.asarray(ExpQuad()(x[:, None], x[None, :])),
        )


class TestTransfValues:

    def test_loc_scale(self, x):
        k = ExpQuad(loc=1.0, scale=3.0)
        got = np.asarray(k(x[:, None], x[None, :]))
        d = ((x[:, None] - 1) - (x[None, :] - 1)) / 3
        np.testing.assert_allclose(got, np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_rescale(self, x):
        f = lambda x: 1 + x**2
        k = ExpQuad().linop('rescale', f, None)
        got = np.asarray(k(x[:, None], x[None, :]))
        d = x[:, None] - x[None, :]
        np.testing.assert_allclose(got, (1 + x[:, None]**2) * np.exp(-0.5*d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_normalize(self, x):
        k = (2.5 * ExpQuad()).linop('normalize', True)
        got = np.asarray(k(x[:, None], x[None, :]))
        d = x[:, None] - x[None, :]
        np.testing.assert_allclose(got, np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_xtransf(self, x):
        k = ExpQuad().linop('xtransf', lambda t: t**2)
        got = np.asarray(k(x[:, None], x[None, :]))
        d = x[:, None]**2 - x[None, :]**2
        np.testing.assert_allclose(got, np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_dim(self, x):
        xs = asarray({'a': x, 'b': 2 * x})
        k = ExpQuad().linop('dim', 'b')
        got = np.asarray(k(xs[:, None], xs[None, :]))
        d = 2 * (x[:, None] - x[None, :])
        np.testing.assert_allclose(got, np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_forcekron(self, x):
        xs = asarray({'a': x, 'b': 2 * x})
        k = Linear(forcekron=True)
        got = np.asarray(k(xs[:, None], xs[None, :]))
        want = (x[:, None] * x[None, :]) * (2*x[:, None] * 2*x[None, :])
        np.testing.assert_allclose(got, want, **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_structured_isotropic(self, x):
        xs = asarray({'a': x, 'b': -x})
        k = ExpQuad()
        got = np.asarray(k(xs[:, None], xs[None, :]))
        r2 = 2 * (x[:, None] - x[None, :])**2
        np.testing.assert_allclose(got, np.exp(-0.5 * r2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_diff_named_field(self, x):
        xs = asarray({'a': x, 'b': 0 * x})
        k = ExpQuad().linop('diff', 'a', 'a')
        got = np.asarray(k(xs[:, None], xs[None, :]))
        d = x[:, None] - x[None, :]
        np.testing.assert_allclose(got, (1 - d**2) * np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-5))

    def test_cond(self, x):
        k = ExpQuad().linop('cond', Expon(), lambda t: t > 0)
        got = np.asarray(k(x[:, None], x[None, :]))
        pos = x > 0
        both = np.outer(pos, pos)
        neither = np.outer(~pos, ~pos)
        d = x[:, None] - x[None, :]
        want = np.where(
            both, np.exp(-0.5 * d**2), np.where(neither, np.exp(-np.abs(d)), 0)
        )
        np.testing.assert_allclose(got, want, **tol(1e-7, rtol32=1e-5, atol32=1e-6))

    def test_maxdim(self, x):
        xs = asarray({'a': x, 'b': x})
        k = ExpQuad(maxdim=1)
        with pytest.raises(ValueError):
            k(xs[:, None], xs[None, :])
        k2 = ExpQuad(maxdim=2)
        k2(xs[:, None], xs[None, :])

    def test_derivable_guard(self, x):
        k = Expon()  # derivable=False
        kd = k.linop('diff', 1, 1)
        with pytest.raises(Exception):
            kd(x[:, None], x[None, :])

    def test_batch(self, x):
        k = ExpQuad().batch(200)
        got = np.asarray(k(x[:, None], x[None, :]))
        d = x[:, None] - x[None, :]
        np.testing.assert_allclose(got, np.exp(-0.5 * d**2), **tol(1e-7, rtol32=1e-5, atol32=1e-6))


class TestRegistry:

    def test_has_transf(self):
        assert ExpQuad.has_transf('diff')
        assert not ExpQuad.has_transf('nonexistent')

    def test_transf_help(self):
        assert 'derive' in ka.CrossKernel.transf_help('diff').lower()

    def test_register_and_inherit(self):
        @ka.kernel
        def MyK(x, y):
            return 1 + 0 * (x * y)

        with pytest.raises(KeyError):
            MyK.inherit_transf('not_a_transf')

    def test_ufuncalgop(self, x):
        k = ExpQuad().algop('exp')
        got = np.asarray(k(x[:, None], x[None, :]))
        d = x[:, None] - x[None, :]
        np.testing.assert_allclose(got, np.exp(np.exp(-0.5 * d**2)))

    def test_linop_on_algop_name_raises(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('add', 1.0)
        with pytest.raises(ValueError):
            ExpQuad().algop('scale', 2.0)


class TestAffineSpan:

    def test_affine_tracking(self):
        @ka.crosskernel(bases=(ka.AffineSpan, ka.Kernel))
        def AffK(x, y, *, lloc, rloc, lscale, rscale, offset, ampl):
            return offset + ampl * (lscale * (x - lloc)) * (rscale * (y - rloc))

        k = AffK()
        k2 = (2.0 * k.linop('scale', 3.0).linop('loc', 1.0)) + 5.0
        assert isinstance(k2, AffK)
        dk = k2.dynkw
        assert dk['lscale'] == pytest.approx(3.0)
        assert dk['lloc'] == pytest.approx(3.0)
        assert dk['offset'] == pytest.approx(5.0)
        assert dk['ampl'] == pytest.approx(2.0)


def test_positive_definite(rng):
    x = np.sort(rng.uniform(-3, 3, 30))
    for k in [ExpQuad(), Expon(), Linear(), ExpQuad() * Expon(),
              ExpQuad() + Linear(), 2.3 * ExpQuad()]:
        K = np.asarray(k(x[:, None], x[None, :]))
        np.testing.assert_allclose(K, K.T, **tol(1e-12, rtol32=1e-6, atol32=1e-6))
        eigs = np.linalg.eigvalsh(K.astype('f8'))
        lim = 1e-9 if not is_f32() else 1e-5
        assert eigs.min() > -lim * max(1, eigs.max())
