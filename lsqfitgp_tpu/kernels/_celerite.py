"""Celerite-family kernels (damped oscillators).

Counterpart of reference ``src/lsqfitgp/_kernels/_celerite.py``.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import stationarykernel

__all__ = ['Celerite', 'Harmonic']


def _celerite_derivable(**kw):
    # derivable only on the measure-zero ridge B == gamma; traced
    # parameters sit at generic values, so conservatively False
    gamma = kw.get('gamma', 1)
    B = kw.get('B', 0)
    return 1 if _jaxutil.concrete_eq(B, gamma) else False


@stationarykernel(derivable=_celerite_derivable, input='abs', maxdim=1)
def Celerite(delta, gamma=1, B=0):
    r"""Celerite kernel: k(Δ) = exp(-γ|Δ|)(cos Δ + B sin |Δ|), |B| ≤ γ.
    Covariance of an AR(2) process with complex roots (Foreman-Mackey et
    al.).  Reference ``_kernels/_celerite.py:35``."""
    def check():
        assert 0 <= gamma < jnp.inf, gamma
        assert abs(B) <= gamma, (B, gamma)
    _jaxutil.skipifabstract(check)
    return jnp.exp(-gamma * delta) * (jnp.cos(delta) + B * jnp.sin(delta))


def _sqrt1pm1(x):
    """sqrt(1 + x) - 1, stable for small x."""
    return jnp.expm1(0.5 * jnp.log1p(x))


@jax.custom_jvp
def _matern32(x):
    return (1 + x) * jnp.exp(-x)


_matern32.defjvps(lambda g, ans, x: g * -x * jnp.exp(-x))


def _harmonic_q1(x, Q):
    # continuous-in-Q formulation around Q=1 via the Matérn-3/2 profile
    return _matern32(x / Q) + jnp.exp(-x / Q) * (1 - Q) * jnp.square(x) * (
        1 + x / 3
    )


@stationarykernel(derivable=1, maxdim=1)
def Harmonic(delta, Q=1):
    r"""Damped stochastically-driven harmonic oscillator kernel; solution
    of f'' + 2/Q f' + f = white noise.  Q-regime branches keep the
    expression numerically stable and once-derivable, including the Q=1
    Matérn-3/2 limit.  Reference ``_kernels/_celerite.py:58``."""
    def check():
        assert 0 < Q < jnp.inf, Q
    _jaxutil.skipifabstract(check)

    tau = jnp.abs(delta)

    if isinstance(Q, (int, float)):
        # near-1 window in the WORKING dtype: e.g. Q = 1 + 1e-12 in
        # float32 makes sqrt(Q² − 1) collapse to 0 and sin(η τ)/η to
        # NaN; inside |Q − 1| < √eps use the first-order-in-(1−Q)
        # Matérn-3/2 formulation (error O((1−Q)²) < eps)
        import math
        dt = jnp.result_type(tau.dtype, jnp.float32)
        if abs(Q - 1) < math.sqrt(float(jnp.finfo(dt).eps)):
            return _harmonic_q1(tau, Q)
        if Q < 1 / 2:
            etaQ = jnp.sqrt((1 - Q) * (1 + Q))
            tauQ = tau / Q
            pexp = jnp.exp(_sqrt1pm1(-jnp.square(Q)) * tauQ)
            mexp = jnp.exp(-(1 + etaQ) * tauQ)
            return (pexp + mexp + (pexp - mexp) / etaQ) / 2
        elif Q < 1:
            etaQ = jnp.sqrt(1 - jnp.square(Q))
            tauQ = tau / Q
            etatau = etaQ * tauQ
            return jnp.exp(-tauQ) * (jnp.cosh(etatau) + jnp.sinh(etatau) / etaQ)
        else:
            etaQ = jnp.sqrt(jnp.square(Q) - 1)
            tauQ = tau / Q
            etatau = etaQ * tauQ
            return jnp.exp(-tauQ) * (jnp.cos(etatau) + jnp.sin(etatau) / etaQ)

    # traced Q: branch with jnp.where, all branches evaluated
    Q = jnp.asarray(Q)
    tauQ = tau / Q
    eps = jnp.finfo(tauQ.dtype).eps
    safe_lo = jnp.minimum(Q, 1 - eps)
    eta_lo = jnp.sqrt((1 - safe_lo) * (1 + safe_lo))
    lo = jnp.exp(-tauQ) * (
        jnp.cosh(eta_lo * tauQ) + jnp.sinh(eta_lo * tauQ) / eta_lo
    )
    safe_hi = jnp.maximum(Q, 1 + eps)
    eta_hi = jnp.sqrt(jnp.square(safe_hi) - 1)
    hi = jnp.exp(-tau / safe_hi) * (
        jnp.cos(eta_hi * tau / safe_hi) + jnp.sin(eta_hi * tau / safe_hi) / eta_hi
    )
    mid = _harmonic_q1(tau, Q)
    near1 = jnp.abs(Q - 1) < jnp.sqrt(eps)
    return jnp.where(near1, mid, jnp.where(Q < 1, lo, hi))
