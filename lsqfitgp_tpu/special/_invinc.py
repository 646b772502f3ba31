"""Inverse incomplete gamma/beta functions, TPU-resident.

The reference wraps scipy's inverses in ``pure_callback`` with hand
implicit-function JVPs (reference ``copula/_gamma.py:41-96``,
``copula/_beta.py:32-50``).  Host callbacks stall TPU pipelines, so here
the forward passes are safeguarded Newton rootfinds compiled to XLA; the
JVP rules are the same implicit-function formulas, using jax's native
gradients of ``gammainc``/``gammaincc`` (including w.r.t. the shape
parameter ``a``).  ``betaincinv`` is differentiable w.r.t. ``y`` only
(a, b nondiff), matching the reference.
"""

from __future__ import annotations

import functools

import jax
from jax import lax
from jax import numpy as jnp
from jax.scipy import special as jspecial

from .._jaxutil import elementwise_grad

__all__ = ['gammaincinv', 'gammainccinv', 'betaincinv']

_NEWTON_ITERS = 40


def _wilson_hilferty(a, z):
    """Initial guess for P^-1(a, Phi-ish z)."""
    wh = a * (1 - 1 / (9 * a) + z / (3 * jnp.sqrt(a))) ** 3
    return jnp.clip(wh, 1e-300, jnp.inf)


_BISECT_ITERS = 90
_POLISH_ITERS = 4


def _bisect_monotone(f, lo, hi, iters=_BISECT_ITERS):
    """Vectorized bisection for f increasing in u, f(lo) ≤ 0 ≤ f(hi)."""
    def body(_, loh):
        lo, hi = loh
        mid = 0.5 * (lo + hi)
        below = f(mid) < 0
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def _gammaincinv_newton(a, p):
    """Solve P(a, x) = p: log-space bisection + Newton polish.

    Bisection in u = log x is branchless, vectorizes, and is immune to
    the flat tails of P that break plain Newton at extreme p/a.
    """
    lggam = jspecial.gammaln(a)
    p = jnp.clip(p, 1e-300, 1 - 1e-16)
    # bracket: small-x expansion P ≈ x^a/(aΓ(a)) gives a lower edge;
    # upper edge from the far upper tail
    u_lo = jnp.minimum((jnp.log(p) + lggam + jnp.log(a)) / a - 1.0, -1.0)
    u_hi = jnp.log(jnp.maximum(4 * a + 40.0, 100.0))
    f = lambda u: jspecial.gammainc(a, jnp.exp(u)) - p
    u = _bisect_monotone(f, u_lo, u_hi)

    def polish(_, u):
        x = jnp.exp(u)
        dfdu = jnp.exp(a * u - x - lggam)      # dP/du
        step = f(u) / jnp.maximum(dfdu, 1e-300)
        return u - jnp.clip(step, -1.0, 1.0)

    u = lax.fori_loop(0, _POLISH_ITERS, polish, u)
    return jnp.exp(u)


def _gammainccinv_newton(a, q):
    """Solve Q(a, x) = q: log-space bisection + Newton polish."""
    lggam = jspecial.gammaln(a)
    q = jnp.clip(q, 1e-300, 1 - 1e-16)
    # far-tail upper edge: log q ≈ (a−1)log x − x − lnΓ(a)
    y0 = jnp.maximum(-jnp.log(q), 1.0)
    y_far = y0 + jnp.maximum(a - 1, 0) * jnp.log(
        y0 + jnp.maximum(a, 2.0)) + jnp.abs(lggam) + 10.0
    u_hi = jnp.log(y_far + 4 * a + 40.0)
    # lower edge: x where P = 1−q is tiny
    u_lo = jnp.minimum(
        (jnp.log1p(-q) + lggam + jnp.log(a)) / a - 1.0, -1.0
    )
    f = lambda u: q - jspecial.gammaincc(a, jnp.exp(u))   # increasing in u
    u = _bisect_monotone(f, u_lo, u_hi)

    def polish(_, u):
        x = jnp.exp(u)
        dfdu = jnp.exp(a * u - x - lggam)
        step = f(u) / jnp.maximum(dfdu, 1e-300)
        return u - jnp.clip(step, -1.0, 1.0)

    u = lax.fori_loop(0, _POLISH_ITERS, polish, u)
    return jnp.exp(u)


@jax.custom_jvp
def gammaincinv(a, y):
    """x with P(a, x) = y (regularized lower incomplete gamma inverse)."""
    a, y = jnp.broadcast_arrays(jnp.asarray(a, float), jnp.asarray(y, float))
    return _gammaincinv_newton(a, y)


@gammaincinv.defjvp
def _gammaincinv_jvp(primals, tangents):
    a, y = primals
    at, yt = tangents
    x = gammaincinv(a, y)
    dP_dx = elementwise_grad(jspecial.gammainc, 1)(a, x)
    inv = 1 / dP_dx
    xt = inv * yt
    dP_da = elementwise_grad(jspecial.gammainc, 0)(a, x)
    xt = xt - inv * dP_da * at
    return x, xt


@jax.custom_jvp
def gammainccinv(a, y):
    """x with Q(a, x) = y (regularized upper incomplete gamma inverse)."""
    a, y = jnp.broadcast_arrays(jnp.asarray(a, float), jnp.asarray(y, float))
    return _gammainccinv_newton(a, y)


@gammainccinv.defjvp
def _gammainccinv_jvp(primals, tangents):
    a, y = primals
    at, yt = tangents
    x = gammainccinv(a, y)
    dQ_dx = elementwise_grad(jspecial.gammaincc, 1)(a, x)
    inv = 1 / dQ_dx
    xt = inv * yt
    dQ_da = elementwise_grad(jspecial.gammaincc, 0)(a, x)
    xt = xt - inv * dQ_da * at
    return x, xt


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def betaincinv(a, b, y):
    """x with I_x(a, b) = y (regularized incomplete beta inverse).
    Differentiable in y only (like the reference)."""
    a = jnp.asarray(a, float)
    b = jnp.asarray(b, float)
    y = jnp.asarray(y, float)
    yc = jnp.clip(y, 1e-300, 1 - 1e-16)
    lnB = jspecial.betaln(a, b)

    # initial guess: mean, refined toward the tails by the power-law
    # approximations I_x ≈ x^a/(a B) (x→0), 1−I_x ≈ (1−x)^b/(b B) (x→1)
    t_small = (jnp.log(yc) + lnB + jnp.log(a)) / a                 # log x
    t_large = (jnp.log1p(-yc) + lnB + jnp.log(b)) / b              # log(1-x)
    x0 = jnp.where(
        yc < 0.1, jnp.exp(t_small),
        jnp.where(yc > 0.9, 1 - jnp.exp(t_large), a / (a + b)),
    )
    x0 = jnp.clip(x0, 1e-15, 1 - 1e-15)
    # Newton in t = logit(x)
    t0 = jnp.log(x0) - jnp.log1p(-x0)

    def body(_, t):
        x = jspecial.expit(t)
        f = jspecial.betainc(a, b, x) - yc
        # dI/dt = pdf(x)·x(1−x) = exp(a log x + b log(1−x) − lnB)
        dfdt = jnp.exp(
            a * jnp.log(x) + b * jnp.log1p(-x) - lnB
        )
        step = f / jnp.maximum(dfdt, 1e-300)
        return t - jnp.clip(step, -4.0, 4.0)

    t = lax.fori_loop(0, _NEWTON_ITERS + 20, body, t0)
    return jspecial.expit(t)


@betaincinv.defjvp
def _betaincinv_jvp(a, b, primals, tangents):
    (y,), (yt,) = primals, tangents
    x = betaincinv(a, b, y)
    lnB = jspecial.betaln(a, b)
    dIdx = jnp.exp(
        (a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x) - lnB
    )
    return x, yt / dIdx
