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


def _expn_imag_recur_real(n, x):
    """Re E_n(-ix) via upward recurrence from E_1(-ix), x ~ O(1)."""
    # E_1(-ix) = -Ci(x) - i (Si(x) - π/2)  for x > 0
    re = -ci(x)
    im = -(si(x) - math.pi / 2)
    cos = jnp.cos(x)
    sin = jnp.sin(x)
    for m in range(1, n):
        # E_{m+1}(z) = (e^{-z} - z E_m(z)) / m, with z = -ix:
        # e^{ix} + ix E_m, components:
        re, im = (cos - x * im) / m, (sin + x * re) / m
    return re


def _expn_imag_asymp_real(n, x, nterms=26):
    """Re E_n(-ix) via the large-|z| asymptotic expansion
    E_n(z) ~ e^{-z}/z · sum_k (-1)^k (n)_k / z^k."""
    # z = -ix; 1/z = i/x; e^{-z} = e^{ix}; (-1)^k / z^k = (-i/x)^k
    # E_n = e^{ix} (i/x) Σ_k (n)_k (-i/x)^k
    inv_re = jnp.zeros_like(x)
    inv_im = -1.0 / x
    s_re = jnp.zeros_like(x)
    s_im = jnp.zeros_like(x)
    t_re = jnp.ones_like(x)
    t_im = jnp.zeros_like(x)
    poch = 1.0
    for k in range(nterms):
        if k > 0:
            poch *= (n + k - 1)
            t_re, t_im = (
                t_re * inv_re - t_im * inv_im,
                t_re * inv_im + t_im * inv_re,
            )
        s_re = s_re + poch * t_re
        s_im = s_im + poch * t_im
    # multiply by e^{ix} (i/x)  [note: +i/x, unlike the series factor]
    cos = jnp.cos(x)
    sin = jnp.sin(x)
    pos_im = 1.0 / x
    pre_re = -sin * pos_im
    pre_im = cos * pos_im
    return pre_re * s_re - pre_im * s_im


def expn_imag_real(n, x):
    """Re E_n(-i x) = ∫_1^∞ cos(x t) / t^n dt for static integer n ≥ 2,
    real x ≥ 0.  Series / recurrence / asymptotic branches."""
    assert int(n) == n and n >= 2, n
    n = int(n)
    x = jnp.asarray(x)
    eps = jnp.finfo(x.dtype).eps if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.finfo(jnp.float64).eps
    tiny = eps  # below this, return the exact limit 1/(n-1)
    xs = jnp.maximum(x, tiny)
    small = _expn_imag_series_real(n, jnp.where(xs < 1, xs, 0.5))
    mid = _expn_imag_recur_real(n, jnp.where((xs >= 1) & (xs < 35), xs, 5.0))
    large = _expn_imag_asymp_real(n, jnp.where(xs >= 35, xs, 100.0))
    out = jnp.where(xs < 1, small, jnp.where(xs < 35, mid, large))
    return jnp.where(x < tiny, 1.0 / (n - 1), out)
