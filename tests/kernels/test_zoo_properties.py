"""Additional generic kernel-zoo properties (model: the reference's
mixin battery in tests/kernels/test_kernels.py: loc/scale consistency
:248, structured-field equivalence :240, continuity at zero :293,
normalization :303)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import asarray

from util import tol


STATIONARY = [
    ('ExpQuad', lambda: lgp.ExpQuad()),
    ('Expon', lambda: lgp.Expon()),
    ('Maternp2', lambda: lgp.Maternp(p=2)),
    ('Matern1.7', lambda: lgp.Matern(nu=1.7)),
    ('Periodic', lambda: lgp.Periodic()),
    ('HoleEffect', lambda: lgp.HoleEffect()),
    ('Cauchy', lambda: lgp.Cauchy()),
    ('Harmonic', lambda: lgp.Harmonic(Q=0.8)),
    ('Celerite', lambda: lgp.Celerite(gamma=1.0, B=0.5)),
    ('Cos', lambda: lgp.Cos()),
    ('Sinc', lambda: lgp.Sinc()),
    ('Wendland', lambda: lgp.Wendland(k=1, alpha=2)),
]


@pytest.mark.parametrize('name,make', STATIONARY,
                         ids=[c[0] for c in STATIONARY])
class TestStationaryProperties:

    def test_loc_scale_consistency(self, name, make, rng):
        """k(loc=l, scale=s)(x, y) == k()((x-l)/s, (y-l)/s)."""
        k0 = make()
        k1 = make().linop('loc', 1.5).linop('scale', 0.7)
        x = np.sort(rng.uniform(-2, 2, 12))
        got = np.asarray(k1(x[:, None], x[None, :]))
        xt = (x - 1.5) / 0.7
        want = np.asarray(k0(xt[:, None], xt[None, :]))
        np.testing.assert_allclose(got, want, **tol(1e-10, 1e-12, rtol32=3e-5, atol32=3e-6))

    def test_unit_variance(self, name, make):
        k = make()
        v = float(k(np.array([0.3]), np.array([0.3]))[0])
        np.testing.assert_allclose(v, 1.0, **tol(1e-8, rtol32=1e-5))

    def test_continuity_at_zero(self, name, make):
        k = make()
        tiny = 1e-7
        v0 = float(k(np.array([0.5]), np.array([0.5]))[0])
        v1 = float(k(np.array([0.5]), np.array([0.5 + tiny]))[0])
        np.testing.assert_allclose(v0, v1, rtol=1e-3)


ISOTROPIC_2D = [
    ('ExpQuad', lambda: lgp.ExpQuad()),
    ('Matern1.7', lambda: lgp.Matern(nu=1.7)),
    ('Maternp1', lambda: lgp.Maternp(p=1)),
    ('Cauchy', lambda: lgp.Cauchy()),
    ('Bessel', lambda: lgp.Bessel(nu=1.5)),
]


@pytest.mark.parametrize('name,make', ISOTROPIC_2D,
                         ids=[c[0] for c in ISOTROPIC_2D])
class TestIsotropicStructured:

    def test_2d_psd(self, name, make, rng):
        k = make()
        xs = asarray({'a': rng.uniform(-2, 2, 20),
                      'b': rng.uniform(-2, 2, 20)})
        K = np.asarray(k(xs[:, None], xs[None, :]))
        assert np.all(np.isfinite(K))
        eigs = np.linalg.eigvalsh(K)
        assert eigs.min() > -1e-8 * max(1, eigs.max())

    def test_structured_matches_euclidean(self, name, make, rng):
        k = make()
        a = rng.uniform(-2, 2, 10)
        b = rng.uniform(-2, 2, 10)
        xs = asarray({'a': a, 'b': b})
        K1 = np.asarray(k(xs[:, None], xs[None, :]))
        # same kernel on the euclidean distance computed by hand, via
        # 1D input trick: evaluate on r along one axis
        r2 = (a[:, None] - a[None, :])**2 + (b[:, None] - b[None, :])**2
        r = np.sqrt(r2)
        K2 = np.asarray(k(r, np.zeros_like(r)))
        np.testing.assert_allclose(K1, K2, **tol(1e-7, 1e-10, rtol32=2e-4, atol32=2e-5))


def test_normalize_linop(rng):
    k = (3.3 * lgp.Maternp(p=1)).linop('normalize', True)
    x = np.sort(rng.uniform(-2, 2, 8))
    K = np.asarray(k(x[:, None], x[None, :]))
    np.testing.assert_allclose(np.diag(K), 1, **tol(1e-10, rtol32=1e-5))


def test_forcekron_matches_product(rng):
    x = rng.uniform(-2, 2, 8)
    y = rng.uniform(-2, 2, 8)
    xs = asarray({'a': x, 'b': y})
    k = lgp.ExpQuad(forcekron=True)
    K = np.asarray(k(xs[:, None], xs[None, :]))
    k1 = lgp.ExpQuad()
    Ka = np.asarray(k1(x[:, None], x[None, :]))
    Kb = np.asarray(k1(y[:, None], y[None, :]))
    np.testing.assert_allclose(K, Ka * Kb, **tol(1e-10, rtol32=1e-5))
    # for ExpQuad (separable) forcekron == isotropic product
    Kiso = np.asarray(k1(xs[:, None], xs[None, :]))
    np.testing.assert_allclose(K, Kiso, **tol(1e-10, rtol32=1e-5))


# -- derivative batteries (model: reference tests/kernels/test_kernels.py
# Deriv1/Deriv2 mixins :340-417) ---------------------------------------------

DERIVABLE1 = [
    ('Matern1.7', lambda: lgp.Matern(nu=1.7)),
    ('Harmonic', lambda: lgp.Harmonic(Q=0.8)),
    ('Maternp1', lambda: lgp.Maternp(p=1)),
    ('Wendland_k1', lambda: lgp.Wendland(k=1, alpha=2)),
]

DERIVABLE2 = [
    ('ExpQuad', lambda: lgp.ExpQuad()),
    ('Periodic', lambda: lgp.Periodic()),
    ('Maternp2', lambda: lgp.Maternp(p=2)),
    ('Matern2.7', lambda: lgp.Matern(nu=2.7)),
    ('Cos', lambda: lgp.Cos()),
    ('Cauchy', lambda: lgp.Cauchy()),
]


def _joint_deriv_gram(kernel, x, maxderiv):
    """Joint covariance of (f, f', ..., f^(D)) at points x via the GP."""
    from lsqfitgp_tpu import GP
    gp = GP(kernel, checkpos=False)
    keys = []
    for d in range(maxderiv + 1):
        gp = gp.addx(x, f'd{d}', deriv=d)
        keys.append(f'd{d}')
    return np.asarray(gp._assemble(keys, keys))


def _check_joint_psd(kernel, x, maxderiv):
    K = _joint_deriv_gram(kernel, x, maxderiv)
    np.testing.assert_allclose(K, K.T, **tol(1e-6, 1e-8, rtol32=1e-4, atol32=1e-5))
    eig = np.linalg.eigvalsh((K + K.T).astype('f8'))
    scale = max(abs(eig.max()), 1e-300)
    lim = 1e-5 if K.dtype == np.float64 else 5e-4
    assert eig.min() > -lim * scale, eig.min() / scale


@pytest.mark.parametrize('name,make', DERIVABLE1,
                         ids=[c[0] for c in DERIVABLE1])
class TestDeriv1:

    def test_joint_gram_psd(self, name, make, rng):
        x = np.sort(rng.uniform(-2, 2, 8))
        _check_joint_psd(make(), x, 1)

    def test_diff_composition_commutes(self, name, make, rng):
        x = np.sort(rng.uniform(-2, 2, 6))
        k = make()
        K1 = np.asarray(
            k.linop('diff', 1, 1)(x[:, None], x[None, :]))
        K2 = np.asarray(
            k.linop('diff', 1, 0).linop('diff', 0, 1)
            (x[:, None], x[None, :]))
        np.testing.assert_allclose(K1, K2, **tol(1e-6, 1e-9, rtol32=1e-3, atol32=1e-4))

    def test_jit_deriv(self, name, make, rng):
        x = jnp.asarray(np.sort(rng.uniform(-2, 2, 6)))
        k = make().linop('diff', 1, 1)
        f = jax.jit(lambda x: k(x[:, None], x[None, :]))
        np.testing.assert_allclose(
            np.asarray(f(x)), np.asarray(k(x[:, None], x[None, :])),
            **tol(1e-6, 1e-9, rtol32=1e-3, atol32=1e-4))


@pytest.mark.parametrize('name,make', DERIVABLE2,
                         ids=[c[0] for c in DERIVABLE2])
class TestDeriv2:

    def test_joint_gram_psd_2(self, name, make, rng):
        x = np.sort(rng.uniform(-2, 2, 6))
        _check_joint_psd(make(), x, 2)

    def test_deriv_block_transpose(self, name, make, rng):
        # Cov[f'(x), f(y)] = Cov[f(y), f'(x)]'
        x = np.sort(rng.uniform(-2, 2, 6))
        k = make()
        K10 = np.asarray(k.linop('diff', 1, 0)(x[:, None], x[None, :]))
        K01 = np.asarray(k.linop('diff', 0, 1)(x[:, None], x[None, :]))
        np.testing.assert_allclose(K10, K01.T, **tol(1e-6, 1e-9, rtol32=1e-3, atol32=1e-4))

    def test_second_deriv_sign(self, name, make, rng):
        # Var[f'] = -(d²k/dΔ²)(0) must be nonnegative on the diagonal
        x = np.sort(rng.uniform(-2, 2, 6))
        k = make().linop('diff', 1, 1)
        d = np.diag(np.asarray(k(x[:, None], x[None, :])))
        assert np.all(d > -1e-10)


def test_deriv_structured_field(rng):
    # derivative along one named field of a 2-field input
    x = np.empty(6, dtype=[('u', float), ('v', float)])
    x['u'] = np.sort(rng.uniform(-2, 2, 6))
    x['v'] = rng.uniform(-2, 2, 6)
    k = lgp.ExpQuad()
    xs = asarray(x)
    K = np.asarray(
        k.linop('diff', 'u', 'u')(xs[:, None], xs[None, :]))
    eig = np.linalg.eigvalsh(K + K.T)
    assert eig.min() > -1e-6 * abs(eig.max())
