"""Modified Bessel K of fractional order and the Matérn profile.

Counterpart of reference ``_special/_bessel.py`` (``kv``, ``kvmodx2``),
which wraps scipy in host callbacks.  Here:

- small/moderate x: K_ν from the reflection K_ν = π(I_{−ν} − I_ν)/(2 sin πν)
  with power-series I_ν (ν nudged off integers by √eps; the e^x
  cancellation limits this branch to x ≲ 18 in float64);
- large x: the standard asymptotic expansion
  K_ν(x) ~ √(π/2x) e^{−x} Σ_k a_k(ν)/x^k.

Accurate to ~1e-9 relative for 0 ≤ ν ≲ 10 (GP practice); the Matérn
profile ``kvmodx2`` has a custom JVP implementing the exact recurrence
d/dx² f_ν = −f_{ν−1}/(4(ν−1)), so kernel derivatives at zero distance
are exact.
"""

from __future__ import annotations

import functools

import jax
from jax import numpy as jnp
from jax.scipy import special as jspecial

__all__ = ['iv', 'kv', 'kvmodx2', 'jv', 'jvmodx2']

_SERIES_K = 40
_XSWITCH = 8.0

# fixed Gauss-Legendre rule for the integral representation branch
import numpy as _numpy
_GL_X, _GL_W = _numpy.polynomial.legendre.leggauss(100)
_GL_X = jnp.asarray(_GL_X)
_GL_W = jnp.asarray(_GL_W)


def _iv_series(nu, x):
    """I_ν(x) power series, log-prefactor form.  Valid for negative
    non-integer ν too: the sign of Γ(ν+k+1) is tracked with gammasgn."""
    k = jnp.arange(_SERIES_K, dtype=float)
    logx2 = jnp.log(jnp.maximum(x / 2, jnp.finfo(float).tiny))[..., None]
    nu_ = nu[..., None] if jnp.ndim(nu) else nu
    logterm = (
        (2 * k + nu_) * logx2
        - jspecial.gammaln(k + 1)
        - jspecial.gammaln(nu_ + k + 1)
    )
    sign = jspecial.gammasgn(nu_ + k + 1)
    return jnp.sum(sign * jnp.exp(logterm), axis=-1)


def iv(nu, x):
    """Modified Bessel I_ν(x), series implementation (x ≲ 20)."""
    nu = jnp.asarray(nu, float)
    x = jnp.asarray(x, float)
    return _iv_series(nu, x)


def _kv_series(nu, x):
    """K_ν by reflection, ν nudged off integers."""
    eps = jnp.finfo(float).eps
    nudge = jnp.sqrt(eps)
    frac = nu % 1.0
    nu = jnp.where(frac < nudge, nu + (nudge - frac),
                   jnp.where(frac > 1 - nudge, nu + (1 - frac) + nudge, nu))
    return (
        jnp.pi / 2 * (_iv_series(-nu, x) - _iv_series(nu, x))
        / jnp.sin(jnp.pi * nu)
    )


def _acosh1p(u):
    """arccosh(1 + u), overflow-safe for huge u (the naive form squares
    u, which overflows float32 already at u ~ 1e19)."""
    us = jnp.minimum(u, 1e6)
    small = jnp.log1p(us + jnp.sqrt(us * (us + 2.0)))
    large = jnp.log(2.0) + jnp.log(jnp.maximum(u, 1.0))
    return jnp.where(u < 1e6, small, large)


def _logcosh(z):
    """log cosh z without overflow: |z| + log1p(e^{−2|z|}) − log 2."""
    a = jnp.abs(z)
    return a + jnp.log1p(jnp.exp(-2 * a)) - jnp.log(2.0)


def _kv_quad_scaled(nu, x, logpref=None):
    """e^{logpref} K_ν(x) with the prefactor FUSED into the quadrature
    exponent: K_ν(x) = e^{−x} ∫_0^∞ e^{−x(cosh t − 1)} cosh(νt) dt by
    100-point Gauss-Legendre on [0, tmax].

    For x → 0, K_ν ~ x^{−ν} overflows float32 around x ~ 1e-14 while a
    typical Matérn prefactor e^{logpref} ~ x^ν underflows — computed
    separately their product is 0·inf = NaN, which then poisons masked
    derivative chains at zero distance; fused per-node the exponent is
    moderate.  All internal quantities are overflow-guarded."""
    # floor x so 45/x cannot overflow (K_ν there is astronomically
    # large anyway; only masked-out branches ever see such x)
    x = jnp.maximum(x, 1e3 * jnp.finfo(x.dtype).tiny)
    # choose tmax so x(cosh t − 1) − νt ≈ 45 (integrand < e^{-45})
    t0 = _acosh1p(45.0 / x)
    tmax = _acosh1p((45.0 + nu * t0) / x)
    t = 0.5 * tmax[..., None] * (_GL_X + 1.0)
    w = 0.5 * tmax[..., None] * _GL_W
    big = jnp.finfo(x.dtype).max / 4
    cosh_m1 = jnp.minimum(jnp.cosh(t) - 1, big)
    e = -(x[..., None] * cosh_m1 + x[..., None]) \
        + _logcosh(nu[..., None] * t)
    if logpref is not None:
        e = e + logpref[..., None]
    return jnp.sum(w * jnp.exp(e), axis=-1)


def _kv_quad(nu, x):
    return _kv_quad_scaled(nu, x)


def kv(nu, x):
    """Modified Bessel K_ν(x) for real ν (uses |ν|), x > 0.

    Implemented entirely with the Gauss-Legendre quadrature of the
    integral representation, which measures uniformly ≲1e-9 relative
    error over ν ∈ [0, 15], x ∈ [1e-6, 500] — unlike the
    series-reflection route, whose I_{−ν} − I_ν cancellation degrades
    near integer ν (the reason the reference falls back to scipy)."""
    nu, x = jnp.broadcast_arrays(
        jnp.abs(jnp.asarray(nu, float)), jnp.asarray(x, float)
    )
    return _kv_quad(nu, x)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def kvmodx2(nu, x2):
    """Matérn profile 2^{1−ν}/Γ(ν) x^ν K_ν(x) as a function of x² (so
    it is analytic in x² and equals 1 at x² = 0)."""
    x2 = jnp.asarray(x2, float)
    x = jnp.sqrt(jnp.maximum(x2, jnp.finfo(x2.dtype).tiny))
    lpref = (1 - nu) * jnp.log(2.0) - jspecial.gammaln(nu) \
        + nu * jnp.log(x)
    lpref, xb = jnp.broadcast_arrays(lpref, x)
    val = _kv_quad_scaled(jnp.abs(jnp.zeros_like(xb) + nu), xb, lpref)
    # ν = 0 limit is white noise: 1 at 0, 0 elsewhere
    val = jnp.where(nu == 0, jnp.where(x2 == 0, 1.0, 0.0), val)
    return jnp.where(x2 <= jnp.finfo(x2.dtype).tiny, 1.0, val)


@kvmodx2.defjvp
def _kvmodx2_jvp(nu, primals, tangents):
    (x2,), (t,) = primals, tangents
    primal = kvmodx2(nu, x2)
    try:
        nu_gt1 = float(nu) > 1
    except TypeError:  # traced order: combine both branches
        nu_gt1 = None
    if nu_gt1 or nu_gt1 is None:
        # exact recurrence d/dx² f_ν = −f_{ν−1}/(4(ν−1)): regular at
        # x² = 0 (value −1/(4(ν−1))) and recursively differentiable, so
        # higher kernel derivatives at zero distance come out exact
        rec = -kvmodx2(abs(nu - 1), x2) / (4 * (nu - 1)) * t
        if nu_gt1:
            return primal, rec
    # ν ≤ 1: the derivative is genuinely singular at x = 0 (the Matérn
    # process is not mean-square differentiable); raw form
    # d/dx² f_ν = −(1/2) 2^{1−ν}/Γ(ν) x^{ν−1} K_{|ν−1|}(x),
    # prefactor fused into the quadrature (see _kv_quad_scaled)
    x = jnp.sqrt(jnp.maximum(x2, jnp.finfo(x2.dtype).tiny))
    lpref = (1 - nu) * jnp.log(2.0) - jspecial.gammaln(nu) \
        + (nu - 1) * jnp.log(x)
    lpref, xb = jnp.broadcast_arrays(lpref, x)
    raw = -0.5 * _kv_quad_scaled(
        jnp.abs(jnp.zeros_like(xb) + (nu - 1)), xb, lpref
    ) * t
    if nu_gt1 is None:
        return primal, jnp.where(nu > 1, rec, raw)
    return primal, raw


# -- Bessel J of fractional order ------------------------------------------


def _jv_series(nu, x):
    k = jnp.arange(_SERIES_K, dtype=float)
    logx2 = jnp.log(jnp.maximum(x / 2, jnp.finfo(float).tiny))[..., None]
    nu_ = nu[..., None] if jnp.ndim(nu) else nu
    logterm = (
        (2 * k + nu_) * logx2
        - jspecial.gammaln(k + 1)
        - jspecial.gammaln(nu_ + k + 1)
    )
    return jnp.sum((-1.0) ** k * jnp.exp(logterm), axis=-1)


def _jv_asymp(nu, x, nterms=10):
    """Hankel expansion: J_ν(x) ~ √(2/πx)(cos ω P − sin ω Q)."""
    mu = 4 * nu * nu
    omega = x - nu * jnp.pi / 2 - jnp.pi / 4
    P = jnp.ones_like(x * nu)
    Q = jnp.zeros_like(x * nu)
    term = jnp.ones_like(x * nu)
    for k in range(1, 2 * nterms + 1):
        term = term * (mu - (2 * k - 1) ** 2) / (8 * x * k)
        if k % 2 == 1:
            Q = Q + term * (-1.0) ** ((k - 1) // 2)
        else:
            P = P + term * (-1.0) ** (k // 2)
    return jnp.sqrt(2 / (jnp.pi * x)) * (
        jnp.cos(omega) * P - jnp.sin(omega) * Q
    )


def jv(nu, x):
    """Bessel J_ν(x) for real ν ≥ 0, x ≥ 0 (series / Hankel branches).

    The alternating series cancels catastrophically: the largest term
    is ~e^x/√(2πx) against a result of order 1, so in float32 it is
    unusable beyond x ≈ 10 (measured errors up to 5e1 at x = 20); the
    branch switch is therefore dtype-aware (Hankel is already ~4e-8
    accurate at x = 8)."""
    nu = jnp.asarray(nu, float)
    x = jnp.asarray(x, float)
    cut = 20.0 if jnp.finfo(x.dtype).eps < 1e-10 else 8.0
    small = _jv_series(nu, jnp.minimum(x, cut))
    large = _jv_asymp(nu, jnp.maximum(x, cut))
    return jnp.where(x < cut, small, large)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def jvmodx2(nu, x2):
    """Γ(ν+1) (2/x)^ν J_ν(x) as a function of x² (1 at x² = 0)."""
    x2 = jnp.asarray(x2, float)
    x = jnp.sqrt(jnp.maximum(x2, jnp.finfo(float).tiny))
    lpref = jspecial.gammaln(nu + 1) + nu * (jnp.log(2.0) - jnp.log(x))
    val = jnp.exp(lpref) * jv(nu, x)
    return jnp.where(x2 <= jnp.finfo(x2.dtype).tiny, 1.0, val)


@jvmodx2.defjvp
def _jvmodx2_jvp(nu, primals, tangents):
    (x2,), (t,) = primals, tangents
    primal = jvmodx2(nu, x2)
    # d/dx² [Γ(ν+1)(2/x)^ν J_ν] = −jvmodx2(ν+1, x²)/(4(ν+1))
    tangent = -jvmodx2(nu + 1, x2) / (4 * (nu + 1)) * t
    return primal, tangent
