"""Bessel functions, pure JAX (no host callbacks).

The reference wraps scipy's Bessel functions in ``pure_callback``
(reference ``_special/_bessel.py:47-122``); on TPU host callbacks stall
the pipeline, so here the needed functions are implemented with
series/asymptotic branches that compile to XLA.
"""

from __future__ import annotations

import functools

import jax
from jax import numpy as jnp

__all__ = ['j0', 'kv_half', 'kvmodx2_hi']


def _float(x):
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.result_type(x.dtype, jnp.float32))
    return x


def j0(x):
    """Bessel function of the first kind J0.

    Power series for |x| < 8, Hankel asymptotic expansion (Abramowitz &
    Stegun 9.4.3 coefficients) beyond.
    """
    x = _float(x)
    ax = jnp.abs(x)

    # series branch: J0(x) = sum_k (-1)^k (x^2/4)^k / (k!)^2
    q = jnp.where(ax < 8, ax, 0.0) ** 2 / 4
    nterms = 20 if x.dtype == jnp.float32 else 36
    term = jnp.ones_like(q)
    acc = jnp.ones_like(q)
    for k in range(1, nterms + 1):
        term = -term * q / (k * k)
        acc = acc + term
    small = acc

    # asymptotic branch (A&S 9.4.3)
    z = jnp.where(ax >= 8, ax, 8.0)
    y = 64.0 / (z * z)
    p0 = (1.0 + y * (-0.1098628627e-2 + y * (0.2734510407e-4
          + y * (-0.2073370639e-5 + y * 0.2093887211e-6))))
    q0 = (-0.1562499995e-1 + y * (0.1430488765e-3 + y * (-0.6911147651e-5
          + y * (0.7621095161e-6 + y * -0.934935152e-7))))
    xx = z - 0.785398164
    big = jnp.sqrt(0.636619772 / z) * (
        jnp.cos(xx) * p0 - (8.0 / z) * jnp.sin(xx) * q0
    )

    return jnp.where(ax < 8, small, big)


def kv_half(p, x):
    """Modified Bessel K of half-integer order ν = p + 1/2, scaled form:

    K_{p+1/2}(x) = sqrt(π/(2x)) e^{-x} Σ_{i=0}^p (p+i)! / (i! (p-i)!) (2x)^{-i}

    ``p`` must be a static nonnegative int.
    """
    import math
    x = _float(x)
    acc = jnp.zeros_like(x)
    for i in range(p + 1):
        c = math.factorial(p + i) / (math.factorial(i) * math.factorial(p - i))
        acc = acc + c * (2 * x) ** float(-i)
    return jnp.sqrt(jnp.pi / (2 * x)) * jnp.exp(-x) * acc


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def kvmodx2_hi(x2, p):
    """The Matérn half-integer normalized profile as a function of the
    *squared* scaled distance: with x = sqrt(x2),

    f(x) = 2^{1-ν}/Γ(ν) x^ν K_ν(x),  ν = p + 1/2
         = e^{-x} p!/(2p)! Σ_{i=0}^p (p+i)!/(i!(p-i)!) (2x)^{p-i}

    ``p`` static nonnegative int.  The derivative w.r.t. x2 uses the
    exact recurrence d/dx² f_ν = −f_{ν−1}/(4(ν−1)) (custom JVP): AD
    through sqrt(x2) instead produces 1/√x2-singular terms that cancel
    only analytically, so kernel derivatives at zero distance would be
    catastrophically wrong (reference ``_special/_bessel.py``
    kvmodx2_hi semantics).
    """
    import math
    x2 = _float(x2)
    x = jnp.sqrt(x2)
    pref = math.factorial(p) / math.factorial(2 * p)
    acc = jnp.zeros_like(x)
    for i in range(p + 1):
        c = math.factorial(p + i) / (math.factorial(i) * math.factorial(p - i))
        acc = acc + c * (2 * x) ** (p - i)
    return pref * jnp.exp(-x) * acc


@kvmodx2_hi.defjvp
def _kvmodx2_hi_jvp(p, primals, tangents):
    (x2,), (t,) = primals, tangents
    primal = kvmodx2_hi(x2, p)
    if p >= 1:
        # ν = p + 1/2: −f_{ν−1}/(4(ν−1)) = −f_{p−1}/(2(2p−1)),
        # regular at x2 = 0 and recursively differentiable
        tangent = -kvmodx2_hi(x2, p - 1) / (2 * (2 * p - 1)) * t
    else:
        # ν = 1/2 (exponential kernel): d/dx² e^{−√x2} = −e^{−x}/(2x),
        # genuinely singular at zero distance
        x2f = _float(x2)
        x = jnp.sqrt(jnp.maximum(x2f, jnp.finfo(x2f.dtype).tiny))
        tangent = -jnp.exp(-x) / (2 * x) * t
    return primal, tangent
