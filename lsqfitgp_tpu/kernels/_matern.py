"""Matérn-family kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_matern.py``.  `Maternp`
(half-integer order) uses the closed-form polynomial, pure JAX.  The
generic real-ν `Matern` requires K_ν for fractional order, implemented in
:mod:`lsqfitgp_tpu.special` without host callbacks.
"""

from __future__ import annotations

import math

from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import isotropickernel
from ..special import kvmodx2_hi, kvmodx2, jvmodx2

__all__ = ['Maternp', 'Matern', 'Bessel']


def _maternp_derivable(p=None):
    return p


@isotropickernel(derivable=_maternp_derivable)
def Maternp(r2, p=None):
    r"""Matérn kernel of half-integer order ν = p + 1/2:

    k(r) = exp(-x) p!/(2p)! Σ_{i=0}^p (p+i)!/(i!(p-i)!) (2x)^{p-i},
    x = sqrt(2ν) r.

    Derivable p times.  Reference ``_kernels/_matern.py:30``.
    """
    def check():
        assert int(p) == p and p >= 0, p
    _jaxutil.skipifabstract(check)
    r2 = (2 * p + 1) * r2
    # +tiny keeps sqrt differentiable at zero distance
    return kvmodx2_hi(r2, int(p))


def _matern_derivable(nu=None):
    try:
        return int(max(0, math.ceil(float(nu)) - 1))
    except (TypeError, ValueError):
        return None


@isotropickernel(derivable=_matern_derivable)
def Matern(r2, nu=None):
    r"""Matérn kernel of real order ν ≥ 0:
    k(r) = 2^{1-ν}/Γ(ν) x^ν K_ν(x), x = √(2ν) r.
    ⌈ν⌉−1 times derivable.  Reference ``_kernels/_matern.py:56``."""
    def check():
        assert 0 <= nu < jnp.inf, nu
    _jaxutil.skipifabstract(check)
    r2 = 2 * jnp.where(nu, nu, 1) * r2
    return kvmodx2(nu, r2)


def _bessel_derivable(nu=0):
    try:
        return int(float(nu) // 2)
    except (TypeError, ValueError):
        return None


def _bessel_maxdim(nu=0):
    try:
        return 2 * int(math.floor(float(nu)) + 1)
    except (TypeError, ValueError):
        return None


@isotropickernel(derivable=_bessel_derivable, maxdim=_bessel_maxdim)
def Bessel(r2, nu=0):
    r"""Bessel kernel: k(r) = Γ(ν+1) 2^ν (sr)^{-ν} J_ν(sr), s = 2 + ν/2;
    usable up to 2(⌊ν⌋+1) dimensions, ⌊ν/2⌋ times derivable.
    Reference ``_kernels/_matern.py:102``."""
    def check():
        assert 0 <= nu < jnp.inf, nu
    _jaxutil.skipifabstract(check)
    r2 = r2 * (2 + nu / 2) ** 2
    return jvmodx2(nu, r2)
