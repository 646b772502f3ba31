"""Random-walk family kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_randomwalk.py``.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import kernel, stationarykernel

__all__ = [
    'Wiener', 'FracBrownian', 'WienerIntegral', 'OrnsteinUhlenbeck',
    'BrownianBridge', 'StationaryFracBrownian',
]


@kernel(derivable=False, maxdim=1)
def Wiener(x, y):
    r"""Wiener process kernel: k(x, y) = min(x, y), x, y ≥ 0.
    Reference ``_kernels/_randomwalk.py:27``."""
    def check():
        assert jnp.all(x >= 0)
        assert jnp.all(y >= 0)
    _jaxutil.skipifabstract(check)
    return jnp.minimum(x, y)


def _fracbrownian_derivable(H=1 / 2, K=1):
    # tracer-safe: traced H/K sit at generic values -> not derivable
    return _jaxutil.concrete_eq(H, 1) and _jaxutil.concrete_eq(K, 1)


@kernel(derivable=_fracbrownian_derivable, maxdim=1)
def FracBrownian(x, y, H=1 / 2, K=1):
    r"""Bifractional Brownian motion kernel:
    k(x, y) = ((|x|^{2H} + |y|^{2H})^K - |x-y|^{2HK}) / 2^K, H, K ∈ (0, 1].
    Reference ``_kernels/_randomwalk.py:47``."""
    def check():
        assert 0 < H <= 1, H
        assert 0 < K <= 1, K
    _jaxutil.skipifabstract(check)
    H2 = 2 * H
    return 2.0 ** -K * (
        (jnp.abs(x) ** H2 + jnp.abs(y) ** H2) ** K
        - jnp.abs(x - y) ** (H2 * K)
    )


# min/max with derivative convention consistent at ties (jax yields 1/2
# at x == y, which breaks kernel PSD-ness of derivatives at ties)

@jax.custom_jvp
def _minimum(x, y):
    return jnp.minimum(x, y)


@_minimum.defjvp
def _minimum_jvp(primals, tangents):
    x, y = primals
    xd, yd = tangents
    return _minimum(x, y), jnp.where(x < y, xd, yd)


@jax.custom_jvp
def _maximum(x, y):
    return jnp.maximum(x, y)


@_maximum.defjvp
def _maximum_jvp(primals, tangents):
    x, y = primals
    xd, yd = tangents
    return _maximum(x, y), jnp.where(x >= y, xd, yd)


@kernel(derivable=1, maxdim=1)
def WienerIntegral(x, y):
    r"""Integrated Wiener process kernel:
    k(x, y) = a²(b - a/3)/2 with a = min(x,y), b = max(x,y).
    Reference ``_kernels/_randomwalk.py:94``."""
    def check():
        assert jnp.all(x >= 0)
        assert jnp.all(y >= 0)
    _jaxutil.skipifabstract(check)
    a = _minimum(x, y)
    b = _maximum(x, y)
    return 0.5 * a ** 2 * (b - a / 3)


@kernel(derivable=False, maxdim=1)
def OrnsteinUhlenbeck(x, y):
    r"""Ornstein-Uhlenbeck (non-stationary start at 0):
    k(x, y) = exp(-|x-y|) - exp(-(x+y)), x, y ≥ 0.
    Reference ``_kernels/_randomwalk.py:113``."""
    def check():
        assert jnp.all(x >= 0)
        assert jnp.all(y >= 0)
    _jaxutil.skipifabstract(check)
    return jnp.exp(-jnp.abs(x - y)) - jnp.exp(-(x + y))


@kernel(derivable=False, maxdim=1)
def BrownianBridge(x, y):
    r"""Brownian bridge kernel: k(x, y) = min(x, y) - xy on [0, 1].
    Reference ``_kernels/_randomwalk.py:135``."""
    def check():
        assert jnp.all((x >= 0) & (x <= 1))
        assert jnp.all((y >= 0) & (y <= 1))
    _jaxutil.skipifabstract(check)
    return jnp.minimum(x, y) - x * y


def _sfb_derivable(H=1 / 2):
    return _jaxutil.concrete_eq(H, 1)


@stationarykernel(derivable=_sfb_derivable, input='signed', maxdim=1)
def StationaryFracBrownian(delta, H=1 / 2):
    r"""Stationary fractional Brownian motion kernel:
    k(Δ) = (|Δ+1|^{2H} + |Δ-1|^{2H} - 2|Δ|^{2H})/2, H ∈ (0, 1].
    Reference ``_kernels/_randomwalk.py:157``."""
    def check():
        assert 0 < H <= 1, H
    _jaxutil.skipifabstract(check)
    H2 = 2 * H
    return 0.5 * (
        jnp.abs(delta + 1) ** H2 + jnp.abs(delta - 1) ** H2
        - 2 * jnp.abs(delta) ** H2
    )
