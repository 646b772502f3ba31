"""Additional generic kernel-zoo properties (model: the reference's
mixin battery in tests/kernels/test_kernels.py: loc/scale consistency
:248, structured-field equivalence :240, continuity at zero :293,
normalization :303)."""

import numpy as np
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import asarray


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
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_unit_variance(self, name, make):
        k = make()
        v = float(k(np.array([0.3]), np.array([0.3]))[0])
        np.testing.assert_allclose(v, 1.0, rtol=1e-8)

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
        np.testing.assert_allclose(K1, K2, rtol=1e-7, atol=1e-10)


def test_normalize_linop(rng):
    k = (3.3 * lgp.Maternp(p=1)).linop('normalize', True)
    x = np.sort(rng.uniform(-2, 2, 8))
    K = np.asarray(k(x[:, None], x[None, :]))
    np.testing.assert_allclose(np.diag(K), 1, rtol=1e-10)


def test_forcekron_matches_product(rng):
    x = rng.uniform(-2, 2, 8)
    y = rng.uniform(-2, 2, 8)
    xs = asarray({'a': x, 'b': y})
    k = lgp.ExpQuad(forcekron=True)
    K = np.asarray(k(xs[:, None], xs[None, :]))
    k1 = lgp.ExpQuad()
    Ka = np.asarray(k1(x[:, None], x[None, :]))
    Kb = np.asarray(k1(y[:, None], y[None, :]))
    np.testing.assert_allclose(K, Ka * Kb, rtol=1e-10)
    # for ExpQuad (separable) forcekron == isotropic product
    Kiso = np.asarray(k1(xs[:, None], xs[None, :]))
    np.testing.assert_allclose(K, Kiso, rtol=1e-10)
