"""BufferDict: a dict packed into one flat buffer, with transformed keys.

Native replacement for ``gvar.BufferDict`` as used by the reference
(hyperparameter dictionaries for `empbayes_fit`, copula transformation
keys — reference ``_patch_gvar.py:28-62``, ``copula/_makedict.py``).

A key like ``'log(sigma)'`` stores the variable ``log(sigma)`` in the
buffer; reading ``bd['sigma']`` applies the inverse transformation
(``exp``).  Transformations are registered globally with
`add_distribution`; 'log', 'sqrt', 'erfinv' are predefined like in gvar.

The buffer may hold plain jnp arrays or :class:`UArray`; BufferDict is a
pytree, so it flows through jit/grad.
"""

from __future__ import annotations

import re

import jax
from jax import numpy as jnp
from jax import tree_util
from jax.scipy import special as jspecial

from ._uarray import UArray

__all__ = ['BufferDict', 'add_distribution', 'has_distribution']

_distributions = {}


def add_distribution(name, invfcn, *, derivative=None):
    """Register a transformation: a key ``'name(x)'`` stores ``v`` and
    ``bd['x']`` returns ``invfcn(v)``."""
    if not re.fullmatch(r'[A-Za-z_][\w.]*', name):
        raise ValueError(f'invalid distribution name {name!r}')
    _distributions[name] = (invfcn, derivative)


def has_distribution(name):
    return name in _distributions


add_distribution('log', jnp.exp)
add_distribution('sqrt', jnp.square)
add_distribution('erfinv', jspecial.erf)

_KEYPAT = re.compile(r'^([A-Za-z_][\w.]*)\((.+)\)$')


def _parse_key(key):
    """Return (transf_name, inner_key) or (None, key)."""
    if isinstance(key, str):
        m = _KEYPAT.match(key)
        if m and m.group(1) in _distributions:
            return m.group(1), m.group(2)
    return None, key


def _apply_inv(name, v):
    invfcn, _ = _distributions[name]
    if isinstance(v, UArray):
        # general (possibly non-elementwise) map: first-order propagation
        # J_out = (df/dv) @ J via jvp over each primary-block column
        out_mean = invfcn(v.mean)
        jac = {}
        for k, J in v.jac.items():
            push = lambda t: jax.jvp(invfcn, (v.mean,), (t,))[1]
            jac[k] = jax.vmap(push, in_axes=-1, out_axes=-1)(J)
        return UArray(out_mean, jac)
    return invfcn(v)


class BufferDict:
    """Ordered dict of arrays packed in one flat buffer."""

    def __init__(self, data=None, *, keys=None, shapes=None, buf=None):
        if data is not None:
            self._keys = []
            self._shapes = []
            vals = []
            for k, v in dict(data).items():
                if isinstance(v, UArray):
                    v_ = v
                    shape = v_.shape
                else:
                    v_ = jnp.asarray(v)
                    shape = v_.shape
                self._keys.append(k)
                self._shapes.append(shape)
                vals.append(v_.reshape(-1) if shape else v_.reshape(1))
            if any(isinstance(v, UArray) for v in vals):
                from ._uarray import uconcatenate
                vals = [
                    v if isinstance(v, UArray) else UArray(v) for v in vals
                ]
                self._buf = uconcatenate(vals) if vals else UArray(jnp.zeros(0))
            else:
                self._buf = (
                    jnp.concatenate(vals) if vals else jnp.zeros(0)
                )
        else:
            self._keys = list(keys)
            self._shapes = list(shapes)
            self._buf = buf
        self._slices = {}
        i = 0
        for k, s in zip(self._keys, self._shapes):
            n = 1
            for d in s:
                n *= d
            self._slices[k] = (slice(i, i + n), s)
            i += n

    # -- mapping interface ----------------------------------------------------

    def __contains__(self, key):
        if key in self._slices:
            return True
        # a plain key is accessible if some transformed version is stored
        for stored in self._keys:
            name, inner = _parse_key(stored)
            if name is not None and inner == key:
                return True
        return False

    def __getitem__(self, key):
        if key in self._slices:
            sl, shape = self._slices[key]
            return self._buf[sl].reshape(shape)
        for stored in self._keys:
            name, inner = _parse_key(stored)
            if name is not None and inner == key:
                return _apply_inv(name, self[stored])
        raise KeyError(key)

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)

    def keys(self):
        return list(self._keys)

    def values(self):
        return [self[k] for k in self._keys]

    def items(self):
        return [(k, self[k]) for k in self._keys]

    def all_keys(self):
        """Stored keys plus accessible transformed keys."""
        out = list(self._keys)
        for stored in self._keys:
            name, inner = _parse_key(stored)
            if name is not None:
                out.append(inner)
        return out

    @property
    def buf(self):
        return self._buf

    def flatten(self):
        return self._buf

    def has_dictkey(self, key):
        """Whether key is stored or reachable via a transformation."""
        return key in self

    def pop(self, key):
        """Return a new BufferDict without ``key`` and the removed value
        (BufferDict is immutable: unlike gvar's, this does not mutate)."""
        if key not in self._slices:
            raise KeyError(key)
        items = {k: self[k] for k in self._keys if k != key}
        return BufferDict(items)

    def update(self, other):
        """Return a new BufferDict with ``other``'s entries merged in."""
        items = {k: self[k] for k in self._keys}
        for k, v in (other.items() if hasattr(other, 'items')
                     else dict(other).items()):
            items[k] = v
        return BufferDict(items)

    def replace_buf(self, buf):
        """New BufferDict with the same layout and a different buffer."""
        return BufferDict(
            keys=self._keys, shapes=self._shapes, buf=buf
        )

    def __repr__(self):
        inner = ', '.join(f'{k!r}: {self[k]!r}' for k in self._keys)
        return f'BufferDict({{{inner}}})'

    # -- pytree -----------------------------------------------------------------

    def tree_flatten(self):
        return (self._buf,), (tuple(self._keys), tuple(self._shapes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, shapes = aux
        return cls(keys=keys, shapes=shapes, buf=children[0])


tree_util.register_pytree_node(
    BufferDict, BufferDict.tree_flatten, BufferDict.tree_unflatten
)
