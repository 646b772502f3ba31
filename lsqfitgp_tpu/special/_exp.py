"""Accurate exponential-family special functions (pure JAX, no callbacks)."""

from __future__ import annotations

import jax
from jax import numpy as jnp

__all__ = ['expm1x']


@jax.custom_jvp
def expm1x(x):
    r"""Accurately compute :math:`e^x - 1 - x`.

    Taylor series for |x| < 1, ``expm1(x) - x`` otherwise; dtype-adaptive
    series length.  Counterpart of reference ``_special/_exp.py:25``.
    """
    x = jnp.asarray(x)
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float64
    x = x.astype(dt)
    nterms = 10 if dt == jnp.float32 else 17
    # x²/2 · ₁F₁(1, 3, x) as a Horner polynomial in x
    k = jnp.arange(2, nterms + 1)
    fact = jnp.cumprod(k.astype(dt))
    coef = 1 / fact[::-1]
    small = x * x * jnp.polyval(coef, x)
    return jnp.where(jnp.abs(x) < 1, small, jnp.expm1(x) - x)


@expm1x.defjvp
def _expm1x_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return expm1x(x), jnp.expm1(x) * t
