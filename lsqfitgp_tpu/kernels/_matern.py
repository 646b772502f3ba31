"""Matérn-family kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_matern.py``.  `Maternp`
(half-integer order) uses the closed-form polynomial, pure JAX.  The
generic real-ν `Matern` requires K_ν for fractional order, implemented in
:mod:`lsqfitgp_tpu.special` without host callbacks.
"""

from __future__ import annotations

from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import isotropickernel
from ..special import kvmodx2_hi

__all__ = ['Maternp']


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
    return kvmodx2_hi(r2 + 1e-30, int(p))
