"""Exponential-integral special functions (pure JAX).

Counterpart of reference ``_special/_expint.py`` (``expn_imag``, ``ci``);
implemented on jax.scipy.special.sici plus series/recurrence/asymptotic
branches for the imaginary-argument exponential integral.
"""

from __future__ import annotations

import math

from jax import numpy as jnp
from jax.scipy import special as jspecial

__all__ = ['ci', 'si', 'expn_imag_real']


def si(x):
    """Sine integral Si(x)."""
    s, _ = jspecial.sici(x)
    return s


def ci(x):
    """Cosine integral Ci(x)."""
    _, c = jspecial.sici(x)
    return c


def _expn_imag_series_real(n, x, nterms=40):
    """Re E_n(-ix) for integer n >= 2 via DLMF 8.19.8, |x| small.

    E_n(z) = (-z)^(n-1)/(n-1)! (psi(n) - ln z)
             - sum_{k>=0, k!=n-1} (-z)^k / (k! (k - n + 1)),
    taking the real part for z = -i x with x real > 0.
    """
    # real part of (-z)^k = (ix)^k: x^k cos(k π/2) → nonzero for even k
    # real part of (-z)^{n-1} (psi(n) - ln z):
    #   (ix)^{n-1} (psi(n) - ln|x| + i π/2)
    psi_n = -0.5772156649015329 + sum(1.0 / j for j in range(1, n))
    lnz_re = jnp.log(jnp.abs(x))   # ln(-ix) = ln|x| - iπ/2 for x > 0
    lnz_im = -math.pi / 2
    # (ix)^{n-1} = x^{n-1} i^{n-1}
    m = (n - 1) % 4
    xp = x ** (n - 1) / math.factorial(n - 1)
    # real of i^{n-1} (A + iB) with A = psi_n - lnz_re, B = -lnz_im
    A = psi_n - lnz_re
    B = -lnz_im
    if m == 0:
        lead = xp * A
    elif m == 1:
        lead = -xp * B
    elif m == 2:
        lead = -xp * A
    else:
        lead = xp * B

    ssum = jnp.zeros_like(x)
    for k in range(nterms):
        if k == n - 1:
            continue
        if k % 2 == 0:
            sign = 1.0 if (k % 4 == 0) else -1.0
            c = sign / (math.factorial(k) * (k - n + 1))
            ssum = ssum + c * x ** k
    return lead - ssum


def _expn_imag_cf_real(n, x, iters=130):
    """Re E_n(-ix) by the modified-Lentz continued fraction

        E_n(z) = e^{-z} / (z + n/(1 + 1/(z + (n+1)/(1 + 2/(z + ...)))))

    with z = -ix.  Converges for x ≳ 1 with near-machine accuracy in
    the working dtype — unlike the upward recurrence from E_1, whose
    error is amplified ~x^{n-1}/(n-1)! (fatal in float32 already at
    x ~ 20, n ~ 5)."""
    from jax import lax

    z = lax.complex(jnp.zeros_like(x), -x)
    b0 = z + n
    d0 = 1.0 / b0
    c0 = jnp.full_like(z, 1e30)
    h0 = d0

    def body(i, carry):
        b, c, d, h = carry
        a = (-i * (n - 1 + i)).astype(z.dtype)
        b = b + 2
        d = 1.0 / (a * d + b)
        c = b + a / c
        h = h * (c * d)
        return b, c, d, h

    _, _, _, h = lax.fori_loop(
        1, iters + 1, body, (b0, c0, d0, h0), unroll=8
    )
    return (h * jnp.exp(-z)).real


def expn_imag_real(n, x):
    """Re E_n(-i x) = ∫_1^∞ cos(x t) / t^n dt for static integer n ≥ 2,
    real x ≥ 0.  Power series below x = 1, continued fraction above."""
    assert int(n) == n and n >= 2, n
    n = int(n)
    x = jnp.asarray(x)
    eps = jnp.finfo(x.dtype).eps if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.finfo(jnp.float64).eps
    tiny = eps  # below this, return the exact limit 1/(n-1)
    xs = jnp.maximum(x, tiny)
    small = _expn_imag_series_real(n, jnp.where(xs < 1, xs, 0.5))
    large = _expn_imag_cf_real(n, jnp.where(xs >= 1, xs, 5.0))
    out = jnp.where(xs < 1, small, large)
    return jnp.where(x < tiny, 1.0 / (n - 1), out)
