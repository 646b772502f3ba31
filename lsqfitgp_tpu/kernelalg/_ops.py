"""Linear-operator transformations on kernels.

Counterpart of reference ``src/lsqfitgp/_Kernel/_ops.py``: rescale,
derivable, diff, xtransf, dim, maxdim, loc, scale, normalize, cond, plus
the AffineSpan-preserving overrides of loc/scale.
"""

from __future__ import annotations

import functools
import numbers

from jax import numpy as jnp

from .. import _array, _deriv, _jaxutil
from . import _util
from ._core import CrossKernel, Kernel, AffineSpan

__all__ = []


def _rescale_argparser(fun):
    if not callable(fun):
        raise ValueError("argument to 'rescale' must be a function")
    return fun


@functools.partial(CrossKernel.register_corelinop, argparser=_rescale_argparser)
def rescale(core, xfun, yfun):
    r"""Rescale the process output: T(f)(x) = fun(x) f(x).

    xfun, yfun : callable or None
        Functions from the input domain to scalars.
    """
    if not xfun:
        return lambda x, y, **kw: core(x, y, **kw) * yfun(y)
    elif not yfun:
        return lambda x, y, **kw: xfun(x) * core(x, y, **kw)
    return lambda x, y, **kw: xfun(x) * core(x, y, **kw) * yfun(y)


@CrossKernel.register_xtransf
def derivable(derivable):
    """Declare the degree of derivability of the process.

    xderivable, yderivable : int, bool, or None
        Number of guaranteed derivatives; True means infinite, None
        unknown. The check is injected into the core and triggers at
        trace time if more derivatives are taken.
    """
    import sys

    if isinstance(derivable, bool):
        derivable = sys.maxsize if derivable else 0
    elif not isinstance(derivable, numbers.Integral) or derivable < 0:
        raise ValueError(f'invalid derivability degree {derivable!r}')

    def limit(v):
        if jnp.issubdtype(v.dtype, jnp.inexact):
            return _jaxutil.limit_derivatives(v, derivable)
        return v

    def xtransf(x):
        if isinstance(x, _array.StructuredArray):
            import jax
            return jax.tree.map(limit, x)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.number):
            return limit(x)
        return x

    return xtransf


def _asfloat(x):
    return x.astype(_jaxutil.float_type(x))


def _diff_argparser(deriv):
    d = _deriv.Deriv(deriv)
    return d if d else None


@functools.partial(CrossKernel.register_corelinop, argparser=_diff_argparser)
def diff(core, xderiv, yderiv):
    r"""Derive the process: T(f)(x) = ∂ⁿf/∂xⁿ (x).

    xderiv, yderiv : Deriv-like
        Per-side derivative specifications (see `Deriv`).
    """
    xderiv = _deriv.Deriv(xderiv)
    yderiv = _deriv.Deriv(yderiv)

    # base function with the derived fields exposed as separate scalar
    # arguments so elementwise_grad can target them
    def f(x, y, *args, **kw):
        i = -1
        if not xderiv.implicit:
            for i, dim in enumerate(xderiv):
                x = _array.set_field(x, dim, args[i])
        if not yderiv.implicit:
            for j, dim in enumerate(yderiv):
                y = _array.set_field(y, dim, args[1 + i + j])
        return core(x, y, **kw)

    i = -1
    if xderiv.implicit:
        for _ in range(xderiv.order):
            f = _jaxutil.elementwise_grad(f, 0)
    else:
        for i, dim in enumerate(xderiv):
            for _ in range(xderiv[dim]):
                f = _jaxutil.elementwise_grad(f, 2 + i)

    if yderiv.implicit:
        for _ in range(yderiv.order):
            f = _jaxutil.elementwise_grad(f, 1)
    else:
        for j, dim in enumerate(yderiv):
            for _ in range(yderiv[dim]):
                f = _jaxutil.elementwise_grad(f, 2 + 1 + i + j)

    def check_arg(x, deriv, side):
        if _util.is_structured(x):
            for dim in deriv:
                if dim not in x.fields:
                    raise ValueError(
                        f'derivative along missing field {dim!r} on {side} '
                        f'argument'
                    )
                if _util.is_structured(x[dim]):
                    raise TypeError(
                        f'derivative along non-numeric field {dim!r}'
                    )
            return x
        if not deriv.implicit:
            raise ValueError(
                f'derivative on named fields with non-structured array on '
                f'{side} argument'
            )
        if not jnp.issubdtype(x.dtype, jnp.number):
            raise TypeError(f'derivative along non-numeric {side} argument')
        return x

    def newcore(x, y, **kw):
        x = check_arg(x, xderiv, 'left')
        y = check_arg(y, yderiv, 'right')

        args = []
        if not xderiv.implicit:
            for dim in xderiv:
                args.append(_asfloat(x[dim]))
        elif xderiv:
            x = _asfloat(x)
        if not yderiv.implicit:
            for dim in yderiv:
                args.append(_asfloat(y[dim]))
        elif yderiv:
            y = _asfloat(y)

        return f(x, y, *args, **kw)

    return newcore


@CrossKernel.register_xtransf
def xtransf(fun):
    r"""Transform the process input: T(f)(x) = f(fun(x)).

    xfun, yfun : callable or None
        Map from the new input domain to the kernel's input domain.
    """
    if not callable(fun):
        raise ValueError("argument to 'xtransf' must be a function")
    return fun


@CrossKernel.register_xtransf
def dim(dim):
    """Restrict the process to a field of structured input:
    T(f)(x) = f(x[dim]).

    xdim, ydim : None, str, or list of str
    """
    if not isinstance(dim, (str, list)):
        raise TypeError(f'dim must be a (list of) string, found {dim!r}')

    def fun(x):
        if not _util.is_structured(x):
            raise ValueError(
                f'cannot take dim={dim!r} of non-structured input'
            )
        if isinstance(dim, str) and x._tails[dim]:
            return x[[dim]]
        return x[dim]

    return fun


@CrossKernel.register_xtransf
def maxdim(maxdim):
    """Restrict the process to a maximum input dimensionality.

    xmaxdim, ymaxdim : None or int
    """
    if not isinstance(maxdim, numbers.Integral) or maxdim < 0:
        raise ValueError(f'invalid maximum dimensionality {maxdim!r}')

    def fun(x):
        nd = _array.nscalars(x)
        if nd > maxdim:
            raise ValueError(
                f'kernel applied to input with {nd} fields > '
                f'maxdim={maxdim}'
            )
        return x

    return fun


@CrossKernel.register_xtransf
def loc(loc):
    r"""Translate the process input: T(f)(x) = f(x - loc).

    xloc, yloc : None or number
    """
    def check():
        assert -jnp.inf < loc < jnp.inf, loc
    _jaxutil.skipifabstract(check)
    return lambda x: _util.map_recurse_fields(lambda v: v - loc, x)


@CrossKernel.register_xtransf
def scale(scale):
    r"""Rescale the process input: T(f)(x) = f(x / scale).

    xscale, yscale : None or number
    """
    def check():
        assert 0 < scale < jnp.inf, scale
    _jaxutil.skipifabstract(check)
    return lambda x: _util.map_recurse_fields(lambda v: v / scale, x)


def _normalize_argparser(do):
    return do if do else None


@functools.partial(CrossKernel.register_corelinop,
                   argparser=_normalize_argparser)
def normalize(core, dox, doy):
    r"""Rescale the process to unit variance:
    T(f)(x) = f(x) / sqrt(kernel(x, x)).

    dox, doy : bool
    """
    if dox and doy:
        return lambda x, y, **kw: core(x, y, **kw) / jnp.sqrt(
            core(x, x, **kw) * core(y, y, **kw)
        )
    elif dox:
        return lambda x, y, **kw: core(x, y, **kw) / jnp.sqrt(core(x, x, **kw))
    return lambda x, y, **kw: core(x, y, **kw) / jnp.sqrt(core(y, y, **kw))


@CrossKernel.register_corelinop
def cond(core, cond1, cond2, other):
    r"""Switch between two independent processes on a condition:
    T(f, g)(x) = f(x) if cond(x) else g(x).

    cond1, cond2 : callable
        Boolean functions of the input.
    other : CrossKernel
        Kernel used where the condition is false.
    """
    def newcore(x, y, **kw):
        xc = cond1(x)
        yc = cond2(y)
        r = jnp.where(xc & yc, core(x, y, **kw), other(x, y, **kw))
        return jnp.where(xc ^ yc, 0, r)

    return newcore


# symmetric diff/xtransf keep Kernel class when both sides are equal
Kernel.inherit_transf('xtransf')
Kernel.inherit_transf('diff')

# AffineSpan: loc/scale preserve the class and update the affine record
AffineSpan.inherit_transf('maxdim')
AffineSpan.inherit_transf('derivable')


@functools.partial(AffineSpan.register_linop, transfname='loc')
def _affine_loc(tcls, self, xloc, yloc):
    dynkw = dict(self.dynkw)
    new = tcls.super_transf('loc', self, xloc, yloc)
    if xloc is not None:
        dynkw['lloc'] = dynkw['lloc'] + xloc * dynkw['lscale']
    if yloc is not None:
        dynkw['rloc'] = dynkw['rloc'] + yloc * dynkw['rscale']
    return new._clone(self.__class__, dynkw=dynkw)


@functools.partial(AffineSpan.register_linop, transfname='scale')
def _affine_scale(tcls, self, xscale, yscale):
    dynkw = dict(self.dynkw)
    new = tcls.super_transf('scale', self, xscale, yscale)
    if xscale is not None:
        dynkw['lscale'] = dynkw['lscale'] * xscale
    if yscale is not None:
        dynkw['rscale'] = dynkw['rscale'] * yscale
    return new._clone(self.__class__, dynkw=dynkw)
