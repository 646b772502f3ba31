"""Automatic pytree registration for decomposition objects.

Counterpart of reference ``src/lsqfitgp/_linalg/_pytree.py:26-74``
(``AutoPyTree``): subclasses are registered as JAX pytrees, with array-
valued instance attributes as children and everything else as aux data,
so decompositions can cross ``jit``/``grad`` boundaries.
"""

from __future__ import annotations

import jax
import numpy
from jax import tree_util

__all__ = ['AutoPyTree']


def _is_array(v):
    return isinstance(v, (jax.Array, numpy.ndarray)) or (
        hasattr(v, 'shape') and hasattr(v, 'dtype')
    )


class AutoPyTree:

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        tree_util.register_pytree_node(cls, cls._flatten, cls._unflatten)

    def _flatten(self):
        names = sorted(vars(self))
        children = []
        child_names = []
        aux = []
        for name in names:
            v = vars(self)[name]
            if _is_array(v) or isinstance(v, AutoPyTree):
                children.append(v)
                child_names.append(name)
            else:
                aux.append((name, v))
        return children, (tuple(child_names), tuple(aux))

    @classmethod
    def _unflatten(cls, auxdata, children):
        child_names, aux = auxdata
        self = object.__new__(cls)
        for name, v in zip(child_names, children):
            vars(self)[name] = v
        for name, v in aux:
            vars(self)[name] = v
        return self
