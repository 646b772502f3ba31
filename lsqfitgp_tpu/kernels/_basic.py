"""Basic kernel zoo.

Counterpart of reference ``src/lsqfitgp/_kernels/_basic.py``; same
covariance functions, pure JAX (TPU-resident) except `BagOfWords` which
is inherently a host/string computation.
"""

from __future__ import annotations

import collections
import re

import jax
import numpy
from jax import numpy as jnp
from jax.scipy import special as jspecial

from .. import _jaxutil
from ..kernelalg import (
    kernel, stationarykernel, isotropickernel, _util,
)

__all__ = [
    'Constant', 'White', 'ExpQuad', 'Linear', 'GammaExp', 'NNKernel',
    'Gibbs', 'Periodic', 'Categorical', 'Rescaling', 'Expon', 'BagOfWords',
    'HoleEffect', 'Cauchy', 'CausalExpQuad', 'Decaying', 'Log', 'Taylor',
]


@isotropickernel(derivable=True, input='raw')
def Constant(x, y):
    r"""Constant kernel: k(x, y) = 1 (all points fully correlated).
    Reference ``_kernels/_basic.py:35``."""
    return jnp.ones(jnp.broadcast_shapes(x.shape, y.shape))


@isotropickernel(derivable=False, input='raw')
def White(x, y):
    r"""White noise kernel: k(x, y) = 1 if x == y else 0.
    Reference ``_kernels/_basic.py:49``."""
    return _util.prod_recurse_fields(
        lambda x, y: x == y, x, y
    ).astype(int)


# register White's core as a δ-noise kernel: its instances carry a
# pure-noise fast-Gram spec, so sums like amp*ExpQuad() + s2*White()
# keep the tiled/streaming dispatch with the noise factored out
from ..kernelalg import _fastgram as _fg  # noqa: E402
_fg.NOISE_CORES.append(White.__wrapped__)


@isotropickernel(derivable=True)
def ExpQuad(r2):
    r"""Exponential quadratic (squared-exponential / RBF) kernel:
    k(r) = exp(-r²/2).  Reference ``_kernels/_basic.py:62``."""
    return jnp.exp(-0.5 * r2)


def _expquad_df(r2h, r2l):
    # exp(-r²/2) with the halving exact (power of two) and a df exp —
    # the double-float Gram evaluator for the conditioning rescue
    from ..linalg import _df
    return _df.exp_df(-0.5 * r2h, -0.5 * r2l)


_fg.DF_CORES[ExpQuad.__wrapped__] = _expquad_df


def _dot(x, y):
    return _util.sum_recurse_fields(lambda x, y: x * y, x, y)


@kernel(derivable=True)
def Linear(x, y):
    r"""Dot-product kernel: k(x, y) = x · y.
    Reference ``_kernels/_basic.py:81``."""
    return _dot(x, y)


@isotropickernel(derivable=lambda gamma=1: gamma == 2)
def GammaExp(r2, gamma=1):
    r"""Gamma exponential kernel: k(r) = exp(-r^γ), γ ∈ (0, 2].
    Reference ``_kernels/_basic.py:95``."""
    def check():
        assert 0 < gamma <= 2, gamma
    _jaxutil.skipifabstract(check)
    # keep the γ=2 branch separate: d²/dr2² of r2^(γ/2) at 0 is nan for
    # floating γ even when γ == 2.  The tiny offset keeps d/dr2 finite
    # at r2 = 0 for γ < 2 (r2^{γ/2-1} → ∞ would turn the exact-zero
    # dr2 of coincident points into inf·0 = NaN hyperparameter
    # gradients); the value shift is ~tiny^{γ/2}, far below eps.
    if not isinstance(gamma, jax.core.Tracer) and gamma == 2:
        # static γ=2: emit ONLY the smooth branch.  The phantom
        # (r2+tiny)^(γ/2) branch of the where stays differentiable for
        # two passes, but its THIRD derivative carries tiny^(γ/2-3),
        # which overflows to ∞ and makes where's 0·∞ cotangent NaN —
        # hit by diff(1,1)+scale-gradient chains at coincident points
        return jnp.exp(-r2)
    tiny = jnp.finfo(jnp.result_type(r2, 1.0)).tiny
    nondiff = jnp.exp(-((r2 + tiny) ** (gamma / 2)))
    diff = jnp.exp(-r2)
    return jnp.where(gamma == 2, diff, nondiff)


@kernel(derivable=True)
def NNKernel(x, y, sigma0=1):
    r"""Neural-network kernel (infinite hidden layer, erf response):
    k(x,y) = 2/π asin(2(q + x·y) / ((1+2(q+x·x))(1+2(q+y·y)))), q=σ₀².
    Reference ``_kernels/_basic.py:123``."""
    def check():
        assert 0 < sigma0 < jnp.inf
    _jaxutil.skipifabstract(check)
    bias2 = sigma0 ** 2
    # augmented dot products <(σ₀, x), (σ₀, y)> of the bias-extended
    # inputs; the two diagonal ones normalize the arcsin argument
    gxy = bias2 + _dot(x, y)
    gxx = bias2 + _dot(x, x)
    gyy = bias2 + _dot(y, y)
    return 2 / jnp.pi * jnp.arcsin(
        2 * gxy / ((1 + 2 * gxx) * (1 + 2 * gyy)))


@kernel
def Gibbs(x, y, scalefun=lambda x: 1):
    r"""Gibbs kernel: a Gaussian kernel with pointwise-varying scale
    s = scalefun(x).  Reference ``_kernels/_basic.py:157``."""
    sx = scalefun(x)
    sy = scalefun(y)
    def check():
        assert jnp.all(sx > 0)
        assert jnp.all(sy > 0)
    _jaxutil.skipifabstract(check)
    # mean-square of the two local scales sets the effective Gaussian
    # width; the prefactor restores k(x, x) = 1
    ms2 = sx ** 2 + sy ** 2
    norm = jnp.sqrt(2 * sx * sy / ms2)
    d2 = _util.sum_recurse_fields(lambda x, y: (x - y) ** 2, x, y)
    return norm * jnp.exp(-d2 / ms2)


@stationarykernel(derivable=True, maxdim=1)
def Periodic(delta, outerscale=1):
    r"""Periodic Gaussian kernel: k(Δ) = exp(-2 (sin(Δ/2)/outerscale)²);
    period 2π under the default scale.  Reference ``_kernels/_basic.py:188``."""
    def check():
        assert 0 < outerscale < jnp.inf
    _jaxutil.skipifabstract(check)
    return jnp.exp(-2 * (jnp.sin(delta / 2) / outerscale) ** 2)


@kernel(derivable=False, maxdim=1)
def Categorical(x, y, cov=None):
    r"""Categorical kernel over integers 0..N-1: k(x, y) = cov[x, y].
    Reference ``_kernels/_basic.py:211``."""
    assert jnp.issubdtype(x.dtype, jnp.integer)
    cov = jnp.asarray(cov)
    assert cov.ndim == 2 and cov.shape[0] == cov.shape[1]
    def check():
        assert jnp.allclose(cov, cov.T)
    _jaxutil.skipifabstract(check)
    return cov[x, y]


@kernel
def Rescaling(x, y, stdfun=None):
    r"""Outer-product kernel: k(x, y) = stdfun(x) stdfun(y); modulates the
    variance of other kernels.  Reference ``_kernels/_basic.py:232``."""
    if stdfun is None:
        stdfun = lambda x: jnp.ones(x.shape)
    return stdfun(x) * stdfun(y)


@stationarykernel(derivable=False, input='abs', maxdim=1)
def Expon(delta):
    r"""Exponential kernel: k(Δ) = exp(-|Δ|) (Matérn 1/2 in 1D).
    Reference ``_kernels/_basic.py:255``."""
    return jnp.exp(-delta)


def _expon_df(rh, rl):
    from ..linalg import _df
    return _df.exp_df(-rh, -rl)


_fg.DF_CORES[Expon.__wrapped__] = _expon_df


# word separators: whitespace + punctuation.  The hyphen goes LAST in
# the class — written mid-class after ':' it formed the range
# U+003A..U+2013, which swallows every ASCII letter and made the split
# cut on all characters (all bags empty, K identically zero)
_bow_regexp = re.compile(r'\s|[!«»"“”‘’/()\'?¡¿„‚<>,;.:–—-]')


@kernel(derivable=False, maxdim=1)
@numpy.vectorize
def BagOfWords(x, y):
    r"""Bag-of-words kernel over strings: k(x, y) = Σ_w c_w(x) c_w(y).
    Host-side (strings are not device data).  Reference
    ``_kernels/_basic.py:274``."""
    xbag = collections.Counter(_bow_regexp.split(x))
    ybag = collections.Counter(_bow_regexp.split(y))
    xbag[''] = 0
    ybag[''] = 0
    common = set(xbag) & set(ybag)
    # float, not int: the Gram matrix feeds the float solvers
    return float(sum(xbag[k] * ybag[k] for k in common))


@stationarykernel(derivable=False, input='abs', maxdim=1)
def HoleEffect(delta):
    r"""Hole-effect kernel: k(Δ) = (1 - Δ) exp(-Δ).
    Reference ``_kernels/_basic.py:300``."""
    return (1 - delta) * jnp.exp(-delta)


def _cauchy_derivable(alpha=2, **_):
    # tracer-safe: a traced alpha is generic -> not derivable
    return _jaxutil.concrete_eq(alpha, 2)


@isotropickernel(derivable=_cauchy_derivable)
def Cauchy(r2, alpha=2, beta=2):
    r"""Generalized Cauchy kernel: k(r) = (1 + r^α/β)^(-β/α),
    α ∈ (0, 2], β > 0 (rational quadratic for α=2).
    Reference ``_kernels/_basic.py:316``."""
    def check():
        assert 0 < alpha <= 2, alpha
        assert 0 < beta, beta
    _jaxutil.skipifabstract(check)
    # same singular-derivative guard (and static-α=2 where-elision,
    # see GammaExp: the phantom branch's 3rd derivative is 0·∞ = NaN)
    if not isinstance(alpha, jax.core.Tracer) and alpha == 2:
        power = r2
    else:
        tiny = jnp.finfo(jnp.result_type(r2, 1.0)).tiny
        power = jnp.where(alpha == 2, r2, (r2 + tiny) ** (alpha / 2))
    return (1 + power / beta) ** (-beta / alpha)


@isotropickernel(derivable=lambda alpha=1: alpha == 0, input='posabs')
def CausalExpQuad(r, alpha=1):
    r"""Causal exponential quadratic kernel:
    k(r) = erfc(αr/4) exp(-r²/2).  Reference ``_kernels/_basic.py:347``."""
    def check():
        assert alpha >= 0, alpha
    _jaxutil.skipifabstract(check)
    return jspecial.erfc(alpha / 4 * r) * jnp.exp(-0.5 * jnp.square(r))


@kernel(derivable=True, maxdim=1)
def Decaying(x, y, alpha=1):
    r"""Decaying kernel: k(x, y) = 1/(x + y + 1)^α for x, y ≥ 0.
    Reference ``_kernels/_basic.py:363``."""
    def check():
        assert jnp.all(x >= 0)
        assert jnp.all(y >= 0)
    _jaxutil.skipifabstract(check)
    return 1 / (x + y + 1) ** alpha


@isotropickernel(derivable=False, input='posabs')
def Log(r):
    r"""Log kernel: k(r) = log1p(r)/r.  Reference ``_kernels/_basic.py:382``."""
    return jnp.log1p(r) / r


@kernel(derivable=True, maxdim=1)
def Taylor(x, y):
    r"""Taylor-series kernel: k(x, y) = Σ_k (xy)^k/(k!)² = I₀(2√(xy)).
    Reference ``_kernels/_basic.py:394``."""
    from ..special import j0
    mul = x * y
    val = 2 * jnp.sqrt(jnp.abs(mul))
    return jnp.where(mul >= 0, jspecial.i0(val), j0(val))
