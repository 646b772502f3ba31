"""Stationary kernel classes.

Counterpart of reference ``src/lsqfitgp/_Kernel/_stationary.py:28-86``.
"""

from __future__ import annotations

from jax import numpy as jnp

from . import _core, _util

__all__ = ['CrossStationaryKernel', 'StationaryKernel']


def _eps_of(x):
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.finfo(x.dtype).eps
    return jnp.finfo(jnp.empty(()).dtype).eps


def softabs(x):
    """|x| offset away from zero, for cores singular at 0."""
    return jnp.abs(x) + _eps_of(x)


class CrossStationaryKernel(_core.CrossKernel):
    """Kernel depending only on x - y (dimension by dimension).

    The core takes ``delta = x - y`` as its only positional argument.
    ``input`` selects the preprocessing: 'signed' (bare difference),
    'abs' (absolute value), 'posabs' (absolute value, zero shifted to a
    tiny positive number for cores non-differentiable at 0).
    """

    def __new__(cls, core, *, input='signed', **kw):
        if input == 'posabs':
            dist = lambda x, y: softabs(x - y)
        elif input == 'signed':
            dist = lambda x, y: x - y
        elif input == 'abs':
            dist = lambda x, y: jnp.abs(x - y)
        else:
            raise KeyError(input)

        def newcore(x, y, **kwargs):
            q = _util.map_recurse_fields(dist, x, y)
            return core(q, **kwargs)

        return super().__new__(cls, newcore, **kw)


class StationaryKernel(CrossStationaryKernel, _core.Kernel):
    pass


StationaryKernel.inherit_transf('dim', intermediates=True)
