"""Riemann / Hurwitz / periodic zeta functions, pure JAX.

Counterpart of reference ``src/lsqfitgp/_special/_zeta.py``; same DLMF
formulas, different implementation choices:

- Riemann ζ on the whole real line: jax.scipy ζ for s ≥ 2.5, the
  Stieltjes (Laurent) expansion around the pole for |s−1| ≤ 1.5, and
  the functional equation (DLMF 25.4.1) for s ≤ −0.5.
- periodic ζ  F(x, s) = Σ_{k≥1} e^{2πikx}/k^s (real or imaginary part):
  direct 50-term series for large s; for smaller s, DLMF 25.13.2 with
  the Hurwitz-ζ Taylor expansion around a = 1.  Near integer s the
  Γ·cos·ζ pole/zero cancellations are analytic; they are handled by
  evaluating symmetrically at s₀ ± eps^{1/3} and averaging (the linear
  bias cancels), measuring ≤3e-10 absolute error at and around integer
  s in f64 and machine precision elsewhere (the reference instead
  carries analytic cancellation helpers at ~200 extra LoC).

Like the reference, ``periodic_zeta`` is differentiable in x (one
derivative lowers s by 1) and treats s as non-differentiable.
"""

from __future__ import annotations

import functools
import math

import jax
from jax import numpy as jnp
from jax.scipy import special as jspecial

__all__ = ['zeta_real', 'periodic_zeta', 'periodic_bernoulli']

# Stieltjes constants γ_n (generated with mpmath.stieltjes at 40 dps)
_STIELTJES = jnp.array([
    0.5772156649015329, -0.07281584548367673, -0.00969036319287232,
    0.002053834420303346, 0.0023253700654673, 0.0007933238173010627,
    -0.0002387693454301996, -0.000527289567057751,
    -0.0003521233538030395, -3.439477441808805e-05,
    0.0002053328149090648, 0.0002701844395439035, 0.0001672729121051402,
    -2.7463806603760158e-05, -0.00020920926205929996,
    -0.0002834686553202414, -0.00019969685830896976,
    2.6277037109918338e-05, 0.0003073684081492528, 0.0005036054530473557,
    0.00046634356151155945, 0.00010443776975600011,
    -0.0005415995822039977, -0.0012439620904082457,
    -0.0015885112789035616, -0.0010745919527384888,
    0.0006568035186371545, 0.0034778369136185382, 0.00640006853170063,
    0.007371151770472239,
])


def _zeta_laurent(s):
    """ζ(s) = 1/(s−1) + Σ_n (−1)^n γ_n (s−1)^n / n!, |s−1| ≲ 1.5."""
    ds = s - 1.0
    n = jnp.arange(_STIELTJES.size, dtype=float)
    fact = jnp.cumprod(jnp.maximum(n, 1.0))
    coef = _STIELTJES * (-1.0) ** n / fact
    return 1.0 / ds + jnp.polyval(coef[::-1], ds)


def _jax_zeta(s):
    return jspecial.zeta(s, 1.0)


def _zeta_refl(s):
    """DLMF 25.4.1: ζ(s) = 2 (2π)^{s−1} sin(πs/2) Γ(1−s) ζ(1−s), s < 0."""
    s1 = 1.0 - s  # > 1
    log = (s - 1.0) * jnp.log(2 * jnp.pi) + jspecial.gammaln(s1)
    zs1 = jnp.where(
        s1 >= 2.5,
        _jax_zeta(jnp.maximum(s1, 2.5)),
        _zeta_laurent(jnp.minimum(s1, 2.5)),
    )
    return 2.0 * jnp.exp(log) * jnp.sin(jnp.pi * s / 2) * zs1


def zeta_real(s):
    """Riemann ζ(s) for any real s (s = 1 is the pole)."""
    s = jnp.asarray(s, float)
    large = _jax_zeta(jnp.maximum(s, 2.5))
    mid = _zeta_laurent(jnp.clip(s, -0.5, 2.5))
    small = _zeta_refl(jnp.minimum(s, -0.5))
    return jnp.where(s >= 2.5, large, jnp.where(s > -0.5, mid, small))


def _standard_x(x):
    """Map x to [0, 1/2] by periodicity and reflection.  The reflection
    flips the sign of the imaginary part."""
    x = x % 1.0
    neg = x > 0.5
    return neg, jnp.where(neg, 1.0 - x, x)


_NMAX = 50      # direct-series terms
_KSER = 40      # Hurwitz Taylor terms


def _pz_larges(x, s, imag):
    """Direct series; truncation error < NMAX^{-s}."""
    k = jnp.arange(1, _NMAX + 1.0)
    neg, kx = _standard_x(x[..., None] * k)
    fn = jnp.sin if imag else jnp.cos
    terms = fn(2 * jnp.pi * kx) / k ** s[..., None]
    if imag:
        terms = terms * jnp.where(neg, -1.0, 1.0)
    return jnp.sum(terms, axis=-1)


def _hurwitz_pm(s1, x, odd):
    """2 Σ_{k parity} c_k x^k with c_k = (−1)^k (s1)_k ζ(s1+k) / k!:

    = ζ(s1, 1+x) + ζ(s1, 1−x)   (even k), or
    = ζ(s1, 1+x) − ζ(s1, 1−x)   (odd k).
    """
    k = jnp.arange(_KSER, dtype=float)
    M = s1[..., None] + k                                  # (..., K)
    # (s1)_k / k! as a cumulative product of O(1) factors (s1+j)/(j+1):
    # separate cumprods of the Pochhammer and the factorial overflow
    # float32 beyond k = 34
    factors = M / (k + 1.0)
    pf = jnp.concatenate([
        jnp.ones(M.shape[:-1] + (1,)),
        jnp.cumprod(factors[..., :-1], axis=-1),
    ], axis=-1)
    zetas = zeta_real(M)
    coef = (-1.0) ** k * pf * zetas
    parity = (k % 2 == 1) if odd else (k % 2 == 0)
    pw = x[..., None] ** k
    return 2.0 * jnp.sum(jnp.where(parity, coef * pw, 0.0), axis=-1)


def _pz_smalls(x, s, imag):
    """DLMF 25.13.2 with the Γ(s1)-pole cancellations at integer s
    handled by SYMMETRIC evaluation: the analytic F(x, ·) is computed
    at s₀ ± eps^{1/3} and averaged, cancelling the linear bias so the
    total error is O(eps^{2/3}) (≈3e-11 in f64, ≈2e-5 in f32) instead
    of the O(√eps) of a one-sided nudge.  Away from integers both
    evaluation points coincide with s."""
    dt = jnp.result_type(x, s, 1.0)
    delta = float(jnp.finfo(dt).eps) ** (1.0 / 3.0)
    srnd = jnp.round(s)
    near = jnp.abs(s - srnd) < delta
    s_lo = jnp.where(near, srnd - delta, s)
    s_hi = jnp.where(near, srnd + delta, s)
    return 0.5 * (_pz_smalls_core(x, s_lo, imag)
                  + _pz_smalls_core(x, s_hi, imag))


def _pz_smalls_core(x, s, imag):
    """DLMF 25.13.2 for moderate s > 1 (non-integer), x in [0, 1/2]:

    Re/Im F(x,s) = (2π)^{−s1} Γ(s1) {cos,sin}(πs1/2)
                   · [x^{−s1} + (ζ(s1,1+x) ± ζ(s1,1−x))],  s1 = 1−s.
    """
    s1 = jnp.asarray(1.0 - s)

    # Γ(s1), s1 negative non-integer, by reflection
    gam = jnp.pi / (
        jnp.sin(jnp.pi * s1) * jnp.exp(jspecial.gammaln(1.0 - s1))
    )
    pref = (2 * jnp.pi) ** (-s1) * gam
    pha = jnp.sin(jnp.pi * s1 / 2) if imag else jnp.cos(jnp.pi * s1 / 2)

    xs = jnp.maximum(x, jnp.finfo(float).tiny)
    power = xs ** (-s1)                       # −s1 = s − 1 > 0
    comb = power + _hurwitz_pm(s1, x, odd=imag)
    out = pref * pha * comb
    if imag:
        out = jnp.where(x == 0, 0.0, out)
    return out


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def periodic_zeta(x, s, imag=False):
    """F(x, s) = Σ_{k≥1} e^{2πikx}/k^s for real s > 1: real part by
    default, imaginary part with ``imag=True``.  Differentiable in x
    (each derivative lowers s by 1); s is non-differentiable."""
    x = jnp.asarray(x, float)
    s = jnp.asarray(s, float)
    eps = float(jnp.finfo(jnp.result_type(x, s)).eps)
    larges = math.ceil(-math.log(eps) / math.log(_NMAX))

    neg, xstd = _standard_x(x)
    z_small = _pz_smalls(xstd, jnp.minimum(s, float(larges)), imag)
    if imag:
        z_small = jnp.where(neg, -z_small, z_small)
    z_large = _pz_larges(x, jnp.maximum(s, 1.0), imag)
    return jnp.where(s < larges, z_small, z_large)


@periodic_zeta.defjvp
def _periodic_zeta_jvp(s, imag, primals, tangents):
    (x,), (xt,) = primals, tangents
    primal = periodic_zeta(x, s, imag)
    sgn = 1.0 if imag else -1.0
    tangent = 2 * jnp.pi * sgn * periodic_zeta(x, s - 1, not imag) * xt
    return primal, tangent


def periodic_bernoulli(n, x):
    """Periodic Bernoulli polynomial B_n(x mod 1) for static int n ≥ 2:

    B_{2m}(x)   = (−1)^{m+1} 2 (2m)!/(2π)^{2m}   Σ cos(2πkx)/k^{2m},
    B_{2m+1}(x) = (−1)^{m+1} 2 (2m+1)!/(2π)^{2m+1} Σ sin(2πkx)/k^{2m+1}.
    """
    n = int(n)
    x = jnp.asarray(x, float)
    m = n // 2
    sign = (-1.0) ** (m + 1)
    pref = sign * 2.0 * math.factorial(n) / (2 * math.pi) ** n
    return pref * periodic_zeta(x, float(n), bool(n % 2))
