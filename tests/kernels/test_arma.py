"""AR/MA kernel oracle tests (model: reference tests/kernels/
test_autoreg.py: Yule-Walker identities, evolution consistency,
degenerate roots)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.kernels import MA, AR

from util import tol


def test_ma_values():
    w = np.array([1.0, 0.5, 0.25])
    k = MA(w=jnp.asarray(w))
    lags = np.arange(5)
    got = np.asarray(k(lags, np.zeros_like(lags)))
    want = np.array([
        sum(w[j] * w[j - d] for j in range(d, len(w))) for d in lags
    ])
    np.testing.assert_allclose(got, want, **tol(1e-12, rtol32=1e-4, atol32=1e-5))


def test_ma_norm():
    w = np.array([2.0, 1.0])
    k = MA(w=jnp.asarray(w), norm=True)
    got = float(k(np.array([0]), np.array([0]))[0])
    np.testing.assert_allclose(got, 1.0, **tol(1e-12, rtol32=1e-4, atol32=1e-5))


def test_ar1_analytic():
    phi = 0.75
    k = AR(phi=jnp.asarray([phi]), maxlag=20)
    lags = np.arange(10)
    got = np.asarray(k(lags, np.zeros_like(lags)))
    want = phi ** lags / (1 - phi ** 2)
    np.testing.assert_allclose(got, want, **tol(1e-10, rtol32=1e-4, atol32=1e-5))


def test_yule_walker_roundtrip(rng):
    phi = np.array([0.5, -0.3, 0.1])
    gamma = np.asarray(AR.gamma_from_phi(jnp.asarray(phi)))
    phi2 = np.asarray(AR.phi_from_gamma(jnp.asarray(gamma)))
    np.testing.assert_allclose(phi2, phi, **tol(1e-8, rtol32=1e-3, atol32=1e-4))


def test_gamma_param_matches_phi_param():
    phi = np.array([0.4, 0.2])
    gamma = np.asarray(AR.gamma_from_phi(jnp.asarray(phi)))
    k1 = AR(phi=jnp.asarray(phi), maxlag=15)
    k2 = AR(gamma=jnp.asarray(gamma), maxlag=15)
    lags = np.arange(12)
    z = np.zeros_like(lags)
    np.testing.assert_allclose(
        np.asarray(k1(lags, z)), np.asarray(k2(lags, z)), **tol(1e-8, rtol32=1e-3, atol32=1e-4)
    )


def test_extend_gamma_satisfies_recursion():
    phi = np.array([0.5, -0.2])
    gamma = np.asarray(AR.gamma_from_phi(jnp.asarray(phi)))
    ext = np.asarray(AR.extend_gamma(jnp.asarray(gamma), jnp.asarray(phi), 10))
    for m in range(len(phi), len(ext)):
        np.testing.assert_allclose(
            ext[m], phi[0] * ext[m - 1] + phi[1] * ext[m - 2], **tol(1e-8, rtol32=1e-3, atol32=1e-4)
        )


def test_phi_from_roots_real():
    # single real root x = 2 (slnr = log 2): P(x) = 1 - x/2 -> phi = [0.5]
    phi = np.asarray(AR.phi_from_roots(jnp.asarray([np.log(2.0)]),
                                       jnp.asarray([], complex)))
    np.testing.assert_allclose(phi, [0.5], **tol(1e-12, rtol32=1e-4, atol32=1e-5))
    # negative root -2: P(x) = 1 + x/2 -> phi = [-0.5]
    phi = np.asarray(AR.phi_from_roots(jnp.asarray([-np.log(2.0)]),
                                       jnp.asarray([], complex)))
    np.testing.assert_allclose(phi, [-0.5], **tol(1e-12, rtol32=1e-4, atol32=1e-5))


def test_phi_from_roots_complex():
    # complex root pair x = 2 e^{±i π/4}: lnc = log2 + iπ/4
    lnc = np.log(2.0) + 1j * np.pi / 4
    phi = np.asarray(AR.phi_from_roots(jnp.asarray([], float),
                                       jnp.asarray([lnc])))
    # P(x) = 1 - 2 Re(1/x) x + |1/x|^2 x^2
    r = 1 / (2 * np.exp(1j * np.pi / 4))
    np.testing.assert_allclose(phi, [2 * r.real, -(abs(r) ** 2)],
                               **tol(1e-12, rtol32=1e-4, atol32=1e-5))


def test_roots_param_matches_phi_param():
    slnr = np.array([np.log(1.5)])
    lnc = np.array([np.log(2.0) + 1j * 0.7])
    phi = np.asarray(AR.phi_from_roots(jnp.asarray(slnr), jnp.asarray(lnc)))
    k1 = AR(slnr=jnp.asarray(slnr), lnc=jnp.asarray(lnc))
    k2 = AR(phi=jnp.asarray(phi), maxlag=30)
    lags = np.arange(20)
    z = np.zeros_like(lags)
    np.testing.assert_allclose(
        np.asarray(k1(lags, z)), np.asarray(k2(lags, z)),
        **tol(1e-6, rtol32=1e-3, atol32=1e-4),
    )


def test_repeated_real_root():
    # double real root at x = 2: P(x) = (1 - x/2)^2 = 1 - x + x²/4
    lam = np.log(2.0)
    slnr = np.array([lam, lam])
    phi = np.asarray(AR.phi_from_roots(jnp.asarray(slnr),
                                       jnp.asarray([], complex)))
    np.testing.assert_allclose(phi, [1.0, -0.25], **tol(1e-12, rtol32=1e-4, atol32=1e-5))
    k1 = AR(slnr=jnp.asarray(slnr), lnc=jnp.asarray([], complex))
    k2 = AR(phi=jnp.asarray(phi), maxlag=25)
    lags = np.arange(15)
    z = np.zeros_like(lags)
    np.testing.assert_allclose(
        np.asarray(k1(lags, z)), np.asarray(k2(lags, z)), **tol(1e-6, rtol32=1e-3, atol32=1e-4)
    )


def test_ar_psd(rng):
    phi = np.array([0.5, -0.3])
    k = AR(phi=jnp.asarray(phi), maxlag=50)
    x = np.arange(20)
    K = np.asarray(k(x[:, None], x[None, :]))
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-10 * eigs.max()


def test_ar_norm():
    phi = np.array([0.6])
    k = AR(phi=jnp.asarray(phi), maxlag=10, norm=True)
    np.testing.assert_allclose(
        float(k(np.array([0]), np.array([0]))[0]), 1.0, rtol=1e-10
    )
