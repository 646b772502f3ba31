"""Algebraic (PSD-preserving) operations on kernels.

Counterpart of reference ``src/lsqfitgp/_Kernel/_alg.py``: add, mul, pow,
rpow, plus the ufunc algops (functions with nonnegative Taylor
coefficients, which map PSD kernels to PSD kernels), and the AffineSpan
scalar add/mul overrides.
"""

from __future__ import annotations

import functools

from jax import numpy as jnp
from jax.scipy import special as jspecial

from ..special import expm1x
from . import _util
from ._core import CrossKernel, AffineSpan


@CrossKernel.register_algop
def add(tcls, self, other):
    r"""Sum of kernels: newkernel(x, y) = kernel(x, y) + other(x, y)."""
    core = self.core
    if _util.is_numerical_scalar(other):
        newcore = lambda x, y, **kw: core(x, y, **kw) + other
        new = self._clone(core=newcore)
        # scalar offset composes with the tiled-Gram profile
        from . import _fastgram
        new._fastgram = _fastgram.post_spec(self._fastgram, 'add', other)
        return new
    elif isinstance(other, CrossKernel):
        ocore = other.core
        newcore = lambda x, y, **kw: core(x, y, **kw) + ocore(x, y, **kw)
        new = self._clone(core=newcore)
        # kernel sums keep the fast-Gram dispatch when one side is a
        # noise/constant spec (White / Constant chains): the universal
        # observation model amp*iso + c + sigma2*White() then reaches
        # the streaming GP solver with the noise factored out
        from . import _fastgram
        new._fastgram = _fastgram.add_specs(self._fastgram,
                                            other._fastgram)
        return new
    else:
        return NotImplemented
    return self._clone(core=newcore)


@CrossKernel.register_algop
def mul(tcls, self, other):
    r"""Product of kernels: newkernel(x, y) = kernel(x, y) * other(x, y)."""
    core = self.core
    if _util.is_numerical_scalar(other):
        newcore = lambda x, y, **kw: core(x, y, **kw) * other
        new = self._clone(core=newcore)
        # amplitude hyperparameters (amp * k, the universal fit form)
        # keep the tiled-Gram dispatch
        from . import _fastgram
        new._fastgram = _fastgram.post_spec(self._fastgram, 'mul', other)
        return new
    elif isinstance(other, CrossKernel):
        ocore = other.core
        newcore = lambda x, y, **kw: core(x, y, **kw) * ocore(x, y, **kw)
    else:
        return NotImplemented
    return self._clone(core=newcore)


@CrossKernel.register_algop
def pow(tcls, self, *, exponent):
    r"""Power of the kernel, nonnegative integer exponent."""
    if _util.is_nonnegative_integer_scalar(exponent):
        core = self.core
        newcore = lambda x, y, **kw: core(x, y, **kw) ** exponent
        return self._clone(core=newcore)
    return NotImplemented


@CrossKernel.register_algop
def rpow(tcls, self, *, base):
    r"""Exponentiation base**kernel(x, y), base >= 1."""
    if _util.is_scalar_cond_trueontracer(base, lambda v: v >= 1):
        core = self.core
        newcore = lambda x, y, **kw: base ** core(x, y, **kw)
        return self._clone(core=newcore)
    return NotImplemented


# functions with nonnegative Taylor coefficients: map PSD -> PSD
CrossKernel.register_ufuncalgop(jnp.tan)
CrossKernel.register_ufuncalgop(lambda x: 1 / jnp.cos(x), '1/cos')
CrossKernel.register_ufuncalgop(jnp.arcsin)
CrossKernel.register_ufuncalgop(lambda x: 1 / jnp.arccos(x), '1/arccos')
CrossKernel.register_ufuncalgop(lambda x: 1 / (1 - x), '1/(1-x)')
CrossKernel.register_ufuncalgop(jnp.exp)
CrossKernel.register_ufuncalgop(lambda x: -jnp.log1p(-x), '-log1p(-x)')
CrossKernel.register_ufuncalgop(jnp.expm1)
CrossKernel.register_ufuncalgop(expm1x)
CrossKernel.register_ufuncalgop(jnp.sinh)
CrossKernel.register_ufuncalgop(jnp.cosh)
CrossKernel.register_ufuncalgop(jnp.arctanh)
CrossKernel.register_ufuncalgop(jspecial.i0)
CrossKernel.register_ufuncalgop(jspecial.i1)


@functools.partial(AffineSpan.register_algop, transfname='add')
def _affine_add(tcls, self, other):
    new = AffineSpan.super_transf('add', self, other)
    if _util.is_numerical_scalar(other):
        dynkw = dict(self.dynkw)
        dynkw['offset'] = dynkw['offset'] + other
        return new._clone(self.__class__, dynkw=dynkw)
    return new


@functools.partial(AffineSpan.register_algop, transfname='mul')
def _affine_mul(tcls, self, other):
    new = AffineSpan.super_transf('mul', self, other)
    if _util.is_numerical_scalar(other):
        dynkw = dict(self.dynkw)
        dynkw['offset'] = other * dynkw['offset']
        dynkw['ampl'] = other * dynkw['ampl']
        return new._clone(self.__class__, dynkw=dynkw)
    return new
