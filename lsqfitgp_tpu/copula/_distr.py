"""Gaussian-copula probabilistic program nodes.

TPU-native counterpart of reference ``src/lsqfitgp/copula/_base.py`` and
``_distr.py``: a :class:`Distr` represents a random variable defined as
a transformation of iid standard Normals; parameters may themselves be
`Distr` instances, forming a DAG where shared nodes are counted (and
sampled) once.  ``partial_invfcn`` maps a flat standard-Normal vector to
the variable, compiled to pure XLA (no host callbacks).
"""

from __future__ import annotations


import jax
from jax import numpy as jnp

from .. import uncert

__all__ = ['DistrBase', 'Distr', 'distribution']


class DistrBase:
    """Shared machinery for Distr and Copula."""

    @property
    def in_size(self):
        """Number of standard Normals consumed (shared nodes once)."""
        return self._in_size_memo({})

    def partial_invfcn(self, x):
        """Map flat standard-Normal array (..., in_size) to the variate."""
        x = jnp.asarray(x) if not isinstance(x, uncert.UArray) else x
        out, consumed = self._invfcn_memo(x, 0, {})
        return out

    def add_distribution(self, name):
        """Register this program as a BufferDict transformation."""
        uncert.add_distribution(name, self.partial_invfcn)
        return name

    def gvars(self):
        """Standard-Normal UArray suitable as the stored prior value."""
        n = self.in_size
        return uncert.normal(jnp.zeros(n), jnp.ones(n))

    # subclasses implement:
    #   _in_size_memo(memo) -> int
    #   _invfcn_memo(x, offset, memo) -> (value, new_offset)


def _take(x, offset, size):
    """Slice a block out of the flat input; works for UArray too."""
    return x[..., offset:offset + size]


class Distr(DistrBase):
    """A distribution node.  Subclasses define:

    - ``invfcn(x, *params)`` static: map standard Normal block + concrete
      parameter values to the variate;
    - ``_core_size(*params) -> int``: Normals consumed by this node;
    - ``_out_shape(*params) -> tuple``: output shape.
    """

    def __init__(self, *params, name=None):
        self.params = params
        self._name = name or type(self).__name__

    @staticmethod
    def invfcn(x, *params):  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def _core_size(*params):
        return 1

    @staticmethod
    def _out_shape(*params):
        return ()

    @property
    def _concrete_params(self):
        return [p for p in self.params if not isinstance(p, DistrBase)]

    def _in_size_memo(self, memo):
        if id(self) in memo:
            return 0
        memo[id(self)] = True
        total = 0
        for p in self.params:
            if isinstance(p, Distr):
                total += p._in_size_memo(memo)
        total += self._core_size(*self._static_params())
        return total

    def _static_params(self):
        """Parameter values usable for static size computation: Distr
        params contribute their shape via a zeros placeholder."""
        out = []
        for p in self.params:
            if isinstance(p, Distr):
                out.append(jnp.zeros(p._out_shape(*p._static_params())))
            else:
                out.append(p)
        return out

    def _invfcn_memo(self, x, offset, memo):
        if id(self) in memo:
            return memo[id(self)], offset
        vals = []
        for p in self.params:
            if isinstance(p, Distr):
                v, offset = p._invfcn_memo(x, offset, memo)
                vals.append(v)
            else:
                vals.append(p)
        size = self._core_size(*self._static_params())
        block = _take(x, offset, size)
        offset += size
        shape = self._out_shape(*self._static_params())
        if not shape and size == 1:
            block = block[..., 0] if not isinstance(block, uncert.UArray) \
                else block.reshape(block.shape[:-1])
        if isinstance(block, uncert.UArray):
            raise TypeError(
                'UArray inputs to copula transformations are propagated '
                'through BufferDict, not via partial_invfcn directly'
            )
        out = self.invfcn(block, *vals)
        memo[id(self)] = out
        return out, offset

    # -- arithmetic: build transformed nodes -------------------------------

    def _binop(self, other, fn, sym):
        return _TransformedDistr(fn, [self, other], sym)

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b, '+')

    __radd__ = __add__

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b, '-')

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: b - a, 'r-')

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b, '*')

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b, '/')

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: b / a, 'r/')

    def __pow__(self, other):
        return self._binop(other, lambda a, b: a ** b, '**')

    def __neg__(self):
        return _TransformedDistr(lambda a: -a, [self], 'neg')

    def __array_ufunc__(self, ufunc, method, *inputs, **kw):
        """numpy/jnp ufuncs applied to Distr nodes build transformed
        nodes (reference ``copula/_distr.py:519-561``)."""
        if method != '__call__' or kw:
            return NotImplemented
        fn = getattr(jnp, ufunc.__name__, None)
        if fn is None:
            return NotImplemented
        return _TransformedDistr(fn, list(inputs), ufunc.__name__)

    def __repr__(self):
        args = ', '.join(
            repr(p) if not isinstance(p, Distr) else repr(p)
            for p in self.params
        )
        return f'{self._name}({args})'


class _TransformedDistr(Distr):
    """Deterministic function of other nodes (consumes no Normals)."""

    def __init__(self, fn, operands, sym):
        super().__init__(*operands, name=sym)
        self._fn = fn

    @staticmethod
    def _core_size(*params):
        return 0

    def _out_shape(self, *params):
        try:
            out = jax.eval_shape(
                self._fn, *[jnp.zeros(jnp.shape(p)) for p in params]
            )
            return out.shape
        except Exception:
            return ()

    def _invfcn_memo(self, x, offset, memo):
        if id(self) in memo:
            return memo[id(self)], offset
        vals = []
        for p in self.params:
            if isinstance(p, Distr):
                v, offset = p._invfcn_memo(x, offset, memo)
                vals.append(v)
            else:
                vals.append(p)
        out = self._fn(*vals)
        memo[id(self)] = out
        return out, offset

    def __repr__(self):
        return f'{self._name}({", ".join(map(repr, self.params))})'


def distribution(invfcn, core_size=1, out_shape=(), signature=None):
    """Create a Distr subclass from an inverse-transformation function
    ``invfcn(x, *params)`` (reference ``copula/_distr.py:564``).

    Shapes can be given directly (``core_size``/``out_shape``, values or
    callables of the concrete params) or via a numpy-gufunc ``signature``
    whose first input core is the standard-Normal block, e.g.
    ``'(n),(n)->(n)'`` for a dirichlet-like map — unknown dimension names
    are resolved from the parameter shapes (reference ``_signature.py``).
    """
    name = getattr(invfcn, '__name__', 'CustomDistr')

    if signature is not None:
        from .._signature import Signature
        sig = Signature(signature)

        def _bind(params):
            sizes = {}
            for core, p in zip(sig.incores[1:], params):
                shape = jnp.shape(p)
                tail = shape[len(shape) - len(core):]
                for nm, size in zip(core, tail):
                    if not nm.isdigit():
                        sizes[nm] = size
            return sizes

        def core_size(*params):
            sizes = _bind(params)
            total = 1
            for nm in sig.incores[0]:
                total *= int(nm) if nm.isdigit() else sizes[nm]
            return total

        def out_shape(*params):
            sizes = _bind(params)
            return tuple(
                int(nm) if nm.isdigit() else sizes[nm]
                for nm in sig.outcores[0]
            )

    ns = dict(
        invfcn=staticmethod(invfcn),
        _core_size=staticmethod(
            core_size if callable(core_size) else (lambda *p: core_size)
        ),
        _out_shape=staticmethod(
            out_shape if callable(out_shape) else (lambda *p: out_shape)
        ),
    )
    return type(name, (Distr,), ns)
