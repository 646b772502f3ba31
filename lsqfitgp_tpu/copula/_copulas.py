"""The predefined copula distributions.

Counterpart of reference ``src/lsqfitgp/copula/_copulas.py``: each
distribution's ``invfcn`` maps standard Normals through Φ and the target
quantile function, with branch selection for tail stability (the
reference's ``_piecewise_multiarg`` pattern becomes ``jnp.where`` on the
sign of the Normal input).
"""

from __future__ import annotations

import math

from jax import numpy as jnp
from jax.scipy import special as jspecial

from ..special import gammaincinv, gammainccinv, betaincinv
from ._distr import Distr

__all__ = [
    'beta', 'dirichlet', 'gamma', 'loggamma', 'invgamma',
    'halfcauchy', 'halfnorm', 'uniform', 'lognorm',
]


def _phi(x):
    return jspecial.ndtr(x)


class beta(Distr):
    """beta(alpha, beta) ∈ (0, 1)."""

    @staticmethod
    def invfcn(x, a, b):
        # upper tail via the reflection I_x(a,b) = 1 − I_{1−x}(b,a):
        # Φ(x) rounds to exactly 1 already at x ≈ 5.7 in float32, where
        # betaincinv at p = 1 is NaN; Φ(−x) stays accurate instead
        lo = betaincinv(a, b, _phi(jnp.minimum(x, 0.0)))
        hi = 1.0 - betaincinv(b, a, _phi(-jnp.maximum(x, 0.0)))
        return jnp.where(x <= 0, lo, hi)


class uniform(Distr):
    """uniform(a, b)."""

    @staticmethod
    def invfcn(x, a=0.0, b=1.0):
        return a + (b - a) * _phi(x)


class halfnorm(Distr):
    """Half-normal with scale sigma."""

    @staticmethod
    def invfcn(x, sigma=1.0):
        # F⁻¹(p) = Φ⁻¹((1+p)/2); for x > 0 use the complementary form
        # Φ⁻¹(1 − Φ(−x)/2) = −Φ⁻¹(Φ(−x)/2) for accuracy
        pneg = _phi(-jnp.abs(x))
        lo = jspecial.ndtri((1 + _phi(jnp.minimum(x, 0))) / 2)
        hi = -jspecial.ndtri(pneg / 2)
        return sigma * jnp.where(x <= 0, lo, hi)


class halfcauchy(Distr):
    """Half-Cauchy with scale gamma."""

    @staticmethod
    def invfcn(x, gamma=1.0):
        # F⁻¹(p) = tan(πp/2); for p → 1 use cot of the complement
        p = _phi(jnp.minimum(x, 0))
        q = _phi(-jnp.abs(x))
        lo = jnp.tan(math.pi / 2 * p)
        hi = 1 / jnp.tan(math.pi / 2 * q)
        return gamma * jnp.where(x <= 0, lo, hi)


class lognorm(Distr):
    """Log-normal: exp(mu + sigma · Normal)."""

    @staticmethod
    def invfcn(x, mu=0.0, sigma=1.0):
        return jnp.exp(mu + sigma * x)


class gamma(Distr):
    """gamma(alpha, beta) with shape alpha, rate beta (mean alpha/beta)."""

    @staticmethod
    def invfcn(x, alpha, beta=1.0):
        y = jnp.where(
            x <= 0,
            gammaincinv(alpha, _phi(jnp.minimum(x, 0))),
            gammainccinv(alpha, _phi(-jnp.maximum(x, 0))),
        )
        return y / beta


class invgamma(Distr):
    """Inverse gamma: 1/gamma(alpha, 1) scaled by beta."""

    @staticmethod
    def invfcn(x, alpha, beta=1.0):
        t = jnp.where(
            x <= 0,
            gammainccinv(alpha, _phi(jnp.minimum(x, 0))),
            gammaincinv(alpha, _phi(-jnp.maximum(x, 0))),
        )
        return beta / t


class loggamma(Distr):
    """scipy.stats.loggamma(c): log of a standard gamma(c) variate."""

    @staticmethod
    def invfcn(x, c):
        y = jnp.where(
            x <= 0,
            gammaincinv(c, _phi(jnp.minimum(x, 0))),
            gammainccinv(c, _phi(-jnp.maximum(x, 0))),
        )
        return jnp.log(y)


class dirichlet(Distr):
    """dirichlet(alpha_vector): normalized independent gammas."""

    @staticmethod
    def invfcn(x, alpha):
        alpha = jnp.asarray(alpha, float)
        g = jnp.where(
            x <= 0,
            gammaincinv(alpha, _phi(jnp.minimum(x, 0))),
            gammainccinv(alpha, _phi(-jnp.maximum(x, 0))),
        )
        return g / jnp.sum(g, axis=-1, keepdims=True)

    @staticmethod
    def _core_size(alpha):
        return len(alpha)

    @staticmethod
    def _out_shape(alpha):
        return (len(alpha),)
