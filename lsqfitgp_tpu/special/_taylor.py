"""Taylor-series evaluator with exact derivative chaining.

Counterpart of reference ``_special/_taylor.py:27`` (``taylor``): given a
coefficient generator, evaluate the series; the custom JVP re-invokes
the generator at shifted derivative order, so derivatives of any order
are themselves exact truncated series.
"""

from __future__ import annotations

import functools

import jax
from jax import numpy as jnp
from jax.scipy import special as jspecial

__all__ = ['taylor']


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2, 3))
def taylor(coefgen, args, n, m, x):
    """Evaluate the n-th derivative of the series with coefficients
    ``coefgen(start, end, *args)`` (powers start..end-1), using m terms:

    d^n/dx^n Σ_k c_k x^k = Σ_k c_{k} k!/(k−n)! x^{k−n}.
    """
    c = coefgen(n, n + m, *args)
    k = jnp.arange(n, n + m)
    c = c * jnp.exp(jspecial.gammaln(1.0 + k) - jspecial.gammaln(1.0 + k - n))
    return jnp.polyval(c[::-1], x)


@taylor.defjvp
def _taylor_jvp(coefgen, args, n, m, primals, tangents):
    (x,), (xt,) = primals, tangents
    return (
        taylor(coefgen, args, n, m, x),
        taylor(coefgen, args, n + 1, m, x) * xt,
    )
