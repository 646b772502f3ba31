"""Scalar predicates and structured-dtype reductions for kernel cores.

Counterpart of reference ``src/lsqfitgp/_Kernel/_util.py:30-117``.
"""

from __future__ import annotations

import numbers
import operator

import jax
import numpy
from jax import numpy as jnp

from .._array import StructuredArray

__all__ = [
    'is_numerical_scalar',
    'is_nonnegative_integer_scalar',
    'is_scalar_cond_trueontracer',
    'is_nonnegative_scalar_trueontracer',
    'sum_recurse_fields',
    'prod_recurse_fields',
    'map_recurse_fields',
    'is_structured',
]


def is_structured(x):
    return isinstance(x, StructuredArray)


def is_numerical_scalar(x):
    if isinstance(x, numbers.Number):
        return True
    return (
        isinstance(x, (numpy.ndarray, jnp.ndarray, jax.Array))
        and getattr(x, 'ndim', None) == 0
        and jnp.issubdtype(x.dtype, jnp.number)
    )


def is_nonnegative_integer_scalar(x):
    if isinstance(x, bool):
        return False
    if isinstance(x, numbers.Integral):
        return x >= 0
    if (
        isinstance(x, numpy.ndarray)
        and x.ndim == 0
        and numpy.issubdtype(x.dtype, numpy.integer)
    ):
        return x.item() >= 0
    if (
        isinstance(x, (jnp.ndarray, jax.Array))
        and getattr(x, 'ndim', None) == 0
        and jnp.issubdtype(x.dtype, jnp.integer)
    ):
        try:
            return x.item() >= 0
        except jax.errors.ConcretizationTypeError:
            return jnp.issubdtype(x.dtype, jnp.unsignedinteger)
    return False


def is_scalar_cond_trueontracer(x, cond):
    if isinstance(x, numbers.Number):
        return bool(cond(x))
    if (
        isinstance(x, numpy.ndarray)
        and x.ndim == 0
        and numpy.issubdtype(x.dtype, numpy.number)
    ):
        return bool(cond(x.item()))
    if (
        isinstance(x, (jnp.ndarray, jax.Array))
        and getattr(x, 'ndim', None) == 0
        and jnp.issubdtype(x.dtype, jnp.number)
    ):
        try:
            return bool(cond(x.item()))
        except jax.errors.ConcretizationTypeError:
            return True
    return False


def is_nonnegative_scalar_trueontracer(x):
    return is_scalar_cond_trueontracer(x, lambda v: v >= 0)


def _reduce_recurse(fun, args, combine, jreduce, **kw):
    x = args[0]
    if not is_structured(x):
        return fun(*args, **kw)
    acc = None
    for name in x.fields:
        sub = tuple(a[name] for a in args)
        res = _reduce_recurse(fun, sub, combine, jreduce, **kw)
        tail = x._tails[name]
        if tail:
            axes = tuple(range(-len(tail), 0))
            res = jreduce(res, axis=axes)
        acc = res if acc is None else combine(acc, res)
    return acc


def sum_recurse_fields(fun, *args, **kw):
    """Reduce ``fun`` over all leaf fields with +, summing tail dims."""
    return _reduce_recurse(fun, args, operator.add, jnp.sum, **kw)


def prod_recurse_fields(fun, *args, **kw):
    """Reduce ``fun`` over all leaf fields with *, multiplying tail dims."""
    return _reduce_recurse(fun, args, operator.mul, jnp.prod, **kw)


def map_recurse_fields(fun, x, *args):
    """Apply ``fun`` to all leaf fields (ufunc semantics)."""
    if is_structured(x):
        return jax.tree.map(fun, x, *args)
    return fun(x, *args)
