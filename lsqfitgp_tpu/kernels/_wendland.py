"""Compact-support kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_wendland.py``.
"""

from __future__ import annotations

from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import stationarykernel, isotropickernel

__all__ = ['Wendland', 'Circular']


def _wendland_derivable(k=0, **_):
    return k


def _wendland_maxdim(k=0, alpha=1):
    return int(jnp.floor(2 * alpha - 1))


_WENDLAND_POLY = {
    0: [[1]],
    1: [[1, 1], [1]],
    2: [[1 / 3, 4 / 3, 1], [1, 2], [1]],
    3: [[1 / 15, 3 / 5, 23 / 15, 1], [2 / 5, 12 / 5, 3], [1, 3], [1]],
}


@isotropickernel(input='posabs', derivable=_wendland_derivable,
                 maxdim=_wendland_maxdim)
def Wendland(r, k=0, alpha=1):
    r"""Wendland compact-support kernel: polynomial × (1-r)_+^{ν+k} with
    ν = k + α; zero for r ≥ 1; k ∈ {0..3} sets differentiability, usable
    up to ⌊2α-1⌋ dimensions.  Reference ``_kernels/_wendland.py:33``."""
    def check():
        assert _wendland_maxdim(k, alpha) >= 1
    _jaxutil.skipifabstract(check)

    try:
        poly = _WENDLAND_POLY[k]
    except KeyError:
        raise NotImplementedError(f'Wendland k={k} not implemented')

    nu = k + alpha
    coeffs = jnp.array([jnp.polyval(jnp.array(pj, float), nu) for pj in poly])
    polyval = jnp.polyval(coeffs, r)
    return jnp.where(r < 1, (1 - r) ** (nu + k) * polyval, 0)


@stationarykernel(derivable=1, maxdim=1, input='posabs')
def Circular(delta, tau=4, c=1 / 2):
    r"""Circular kernel: periodic with period 1,
    W_c(t) = (1 + τt/c)(1 - t/c)_+^τ on geodesic distance.
    Reference ``_kernels/_wendland.py:96``."""
    def check():
        assert tau >= 4, tau
        assert 0 < c <= 1 / 2, c
    _jaxutil.skipifabstract(check)
    x = delta % 1
    t = jnp.minimum(x, 1 - x)
    return (1 + tau * t / c) * jnp.maximum(1 - t / c, 0) ** tau
