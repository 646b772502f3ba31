"""Stationary kernel classes.

Counterpart of reference ``src/lsqfitgp/_Kernel/_stationary.py:28-86``.
"""

from __future__ import annotations

from jax import numpy as jnp

from . import _core, _fastgram, _util

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

        self = super().__new__(cls, newcore, **kw)
        if not self._dynkw:
            # In ONE dimension a stationary kernel of |Δ| IS an
            # isotropic kernel of the Euclidean distance r = √r², so
            # 'abs'/'posabs' cores ride the same tiled/streaming
            # fast-Gram dispatch as isotropic constructors (the spec's
            # 'abs'/'posabs' modes already feed the core √r²).  A
            # SYMMETRIC 'signed' kernel qualifies too: k(x, y) = k(y, x)
            # forces the core to be an even function of Δ, so values at
            # |Δ| are identical (cross kernels need not be even — they
            # stay on the broadcast path).
            mode = input
            if input == 'signed':
                mode = 'abs' if issubclass(cls, _core.Kernel) else None
            if mode is not None:
                spec = _fastgram.make_spec(core, mode, kw)
                if spec is not None:
                    # the r²-profile equals the per-field stationary
                    # core only when a SINGLE coordinate column enters
                    # the distance
                    md = spec.maxdim
                    spec = spec._replace(
                        maxdim=1 if md is None else min(md, 1))
                self._fastgram = spec
        return self


class StationaryKernel(CrossStationaryKernel, _core.Kernel):
    pass


StationaryKernel.inherit_transf('dim', intermediates=True)
