"""Zeta kernel and its Fourier-domain linop family.

Counterpart of reference ``src/lsqfitgp/_kernels/_zeta.py``: the Zeta
kernel is the prior of a zero-mean Fourier series of period 1 with
coefficient variances 1/(ζ(s) k^s), s = 1 + 2ν; the registered
``'fourier'`` linop family maps the process to its Fourier coefficients
(``ZetaFourier``/``CrossZetaFourier``), enabling inference directly in
the coefficient domain.  Built on `AffineSpan` so accumulated loc/scale
transforms are known to the transformed-domain kernels.
"""

from __future__ import annotations

from jax import numpy as jnp

from .. import _jaxutil
from ..kernelalg import (
    AffineSpan, CrossKernel, PreservedBySwap, StationaryKernel,
    crosskernel, kernel,
)
from ..special import periodic_zeta, zeta_real

__all__ = ['Zeta', 'ZetaFourier', 'CrossZetaFourier']


def _check_nu(nu):
    def check():
        assert 0 <= nu < jnp.inf, nu
    _jaxutil.skipifabstract(check)


def _zeta_derivable(*, nu):
    _check_nu(nu)
    try:
        return int(max(0, jnp.ceil(nu) - 1))
    except Exception:
        return None


@crosskernel(bases=(AffineSpan, StationaryKernel), maxdim=1,
             derivable=_zeta_derivable)
def Zeta(delta, *, nu, **_):
    r"""Zeta kernel: k(Δ) = Re F(Δ, s)/ζ(s), s = 1 + 2ν ≥ 1.

    Equivalent to a Fourier series of period 1 with independent
    zero-mean priors of variance 1/(ζ(s) k^s) on the k-th pair of
    coefficients; ⌈ν⌉−1 times derivable.  The k = 0 term is excluded,
    so the process has zero mean over one period.
    Reference ``_kernels/_zeta.py:38``.
    """
    _check_nu(nu)
    s = 1 + 2 * nu
    pos = periodic_zeta(delta, s) / zeta_real(s)
    zero = jnp.where(delta % 1, 0.0, 1.0)
    return jnp.where(s > 1, pos, zero)


@kernel(maxdim=1, derivable=False)
def ZetaFourier(k, q, *, nu, lloc, rloc, lscale, rscale, offset, ampl):
    r"""Prior covariance of the Fourier coefficients of a Zeta process:
    diagonal with variance ampl/(ζ(s)·order^s); accounts for the
    accumulated affine transformations of the process.
    Reference ``_kernels/_zeta.py:79``.

    Coefficient indexing: even k ≥ 2 ↔ cos(2π(k/2)x) terms, odd
    k ↔ sin(2π((k+1)/2)x) terms, k = 0 ↔ the offset."""
    _check_nu(nu)
    s = 1 + 2 * nu
    lorder = jnp.ceil(k / 2)
    rorder = jnp.ceil(q / 2)
    lodd = k % 2
    rodd = q % 2
    var = ampl / (lorder ** s * zeta_real(s))
    arg = 2 * jnp.pi * lorder * (lloc / lscale - rloc / rscale)
    return jnp.where(
        lorder == rorder,
        jnp.where(
            lodd == rodd,
            jnp.where(lorder, var * jnp.cos(arg), offset),
            var * jnp.sin(arg) * jnp.where(lodd, 1, -1),
        ),
        0.0,
    )


def _crosszeta_derivable(*, nu, **_):
    return 0, _zeta_derivable(nu=nu)


@crosskernel(bases=(PreservedBySwap, CrossKernel), maxdim=1,
             derivable=_crosszeta_derivable)
def CrossZetaFourier(k, y, *, nu, lloc, rloc, lscale, rscale, offset, ampl):
    r"""Cross covariance between the Fourier coefficients and the Zeta
    process itself.  Reference ``_kernels/_zeta.py:100``."""
    _check_nu(nu)
    s = 1 + 2 * nu
    order = jnp.ceil(k / 2)
    odd = k % 2
    var = ampl / (order ** s * zeta_real(s))
    arg = 2 * jnp.pi * order * (lloc / lscale + (y - rloc) / rscale)
    return jnp.where(
        odd,
        var * jnp.sin(arg),
        jnp.where(order, var * jnp.cos(arg), offset),
    )


def _fourier_argparser(do):
    return do if do else None


def _translkw(*, dynkw, **initkw):
    return dict(**dynkw, **initkw)


Zeta.make_linop_family(
    'fourier', ZetaFourier, CrossZetaFourier,
    translkw=_translkw, argparser=_fourier_argparser,
    doc="""Fourier-series transform of the process: T(f)(k) are the
cosine (even k) / sine (odd k) coefficients of the period-1 series.""",
)
