"""Band-limited / power-law spectrum kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_spectral.py``.
"""

from __future__ import annotations

from jax import numpy as jnp

from ..kernelalg import stationarykernel
from ..special import ci, expn_imag_real

__all__ = ['Cos', 'Pink', 'Color', 'Sinc']


@stationarykernel(derivable=True, maxdim=1)
def Cos(delta):
    r"""Cosine kernel: k(Δ) = cos(Δ); samples are harmonic functions.
    Reference ``_kernels/_spectral.py:26``."""
    return jnp.cos(delta)


@stationarykernel(maxdim=1, derivable=1, input='abs')
def Pink(delta, dw=1):
    r"""Pink-noise kernel: spectrum 1/ω truncated to [1, 1+δω]:
    k(Δ) = (Ci(Δ(1+δω)) - Ci(Δ)) / log1p(δω).
    Reference ``_kernels/_spectral.py:42``."""
    l = ci(delta)
    r = ci(delta * (1 + dw))
    mean = delta * (1 + dw / 2)
    norm = jnp.log1p(dw)
    tol = jnp.sqrt(jnp.finfo(jnp.empty(0).dtype).eps)
    return jnp.where(delta * dw < tol, jnp.cos(mean), (r - l) / norm)


def _color_derivable(n=2):
    return n // 2 - 1


@stationarykernel(maxdim=1, derivable=_color_derivable, input='abs')
def Color(delta, n=2):
    r"""Colored-noise kernel: spectrum 1/ωⁿ truncated below ω=1:
    k(Δ) = (n-1) Re Eₙ(-iΔ), integer n ≥ 2.
    Reference ``_kernels/_spectral.py:74``."""
    assert int(n) == n and n >= 2, n
    return (n - 1) * expn_imag_real(int(n), delta)


@stationarykernel(derivable=True, input='posabs', maxdim=1)
def Sinc(delta):
    r"""Sinc kernel: k(Δ) = sin(πΔ)/(πΔ) (Tobar 2019).
    Reference ``_kernels/_spectral.py:114``."""
    return jnp.sinc(delta)
