"""Structured input arrays as JAX pytrees.

TPU-native re-design of the reference's ``StructuredArray``
(reference ``src/lsqfitgp/_array.py:30-695``): an immutable, pytree-
registered container of named fields, where each field is either a JAX
array or a nested ``StructuredArray``.  Fields may carry a per-field
trailing ("tail") shape, mirroring numpy structured dtypes with subarray
fields; all fields share a common leading *base shape* which is the shape
of the structured array itself.

Design differences from the reference (intentional, TPU-first):

- Fields are stored in a plain dict of device arrays; there is no lazy
  numpy recarray emulation.  All data lives on device and flows through
  ``jit``/``vmap``/``grad`` untouched.
- The base shape is *derived* from the leaves on unflatten, so the same
  pytree works under ``vmap`` (which changes leaf shapes).
- numpy interop (``__array__``, construction from structured arrays /
  DataFrames / dicts) happens only at the boundary, in ``asarray`` and
  ``unstructured_to_structured``.
"""

from __future__ import annotations

import math

import numpy

import jax
from jax import numpy as jnp
from jax import tree_util

__all__ = [
    'StructuredArray',
    'asarray',
    'broadcast_to',
    'broadcast_arrays',
    'broadcast_shapes',
    'concatenate',
    'unstructured_to_structured',
    'set_field',
]


def _is_structured_dtype(dtype):
    return getattr(dtype, 'names', None) is not None


class StructuredArray:
    """Immutable named-field array container, registered as a JAX pytree.

    Parameters
    ----------
    fields : dict[str, array or StructuredArray]
        Field values. All values must share a common leading base shape.
    tails : dict[str, tuple[int, ...]], optional
        Per-field trailing shapes. Defaults to all-scalar fields, with the
        base shape inferred as the full shape of the first field.
    """

    __slots__ = ('_fields', '_tails', '_shape')

    def __init__(self, fields, tails=None, shape=None):
        if isinstance(fields, StructuredArray):
            # copy-construction: share the (immutable) field storage
            if tails is None:
                tails = fields._tails
            if shape is None:
                shape = fields._shape
            fields = fields._fields
        elif isinstance(fields, numpy.ndarray):
            # wrap a numpy structured array (reference _array.py:30 lets
            # StructuredArray stand in for any structured ndarray)
            if fields.dtype.names is None:
                raise ValueError(
                    'plain (unstructured) arrays cannot become a '
                    'StructuredArray; use a structured dtype'
                )
            src = _from_numpy_structured(fields)
            fields, tails, shape = src._fields, src._tails, src._shape
        if not fields:
            raise ValueError('StructuredArray needs at least one field')
        fields = dict(fields)
        if tails is None:
            tails = {name: () for name in fields}
        else:
            tails = {name: tuple(tails.get(name, ())) for name in fields}
        if shape is None:
            name0 = next(iter(fields))
            v0 = fields[name0]
            t0 = tails[name0]
            nd = v0.ndim - len(t0)
            shape = tuple(v0.shape[:nd])
        shape = tuple(shape)
        for name, v in fields.items():
            t = tails[name]
            expected = shape + t
            if tuple(v.shape) != expected:
                raise ValueError(
                    f'field {name!r} has shape {tuple(v.shape)}, expected '
                    f'base {shape} + tail {t} = {expected}'
                )
        object.__setattr__(self, '_fields', fields)
        object.__setattr__(self, '_tails', tails)
        object.__setattr__(self, '_shape', shape)

    def __setattr__(self, name, value):
        raise AttributeError('StructuredArray is immutable')

    # -- basic introspection ------------------------------------------------

    @property
    def shape(self):
        return self._shape

    @property
    def ndim(self):
        return len(self._shape)

    @property
    def size(self):
        out = 1
        for s in self._shape:
            out *= s
        return out

    def __len__(self):
        if not self._shape:
            raise TypeError('len() of 0-d StructuredArray')
        return self._shape[0]

    @property
    def dtype(self):
        """Equivalent numpy structured dtype."""
        descr = []
        for name, v in self._fields.items():
            tail = self._tails[name]
            if isinstance(v, StructuredArray):
                sub = v.dtype
            else:
                sub = numpy.dtype(str(v.dtype))
            if tail:
                descr.append((name, sub, tail))
            else:
                descr.append((name, sub))
        return numpy.dtype(descr)

    @property
    def fields(self):
        return tuple(self._fields)

    # -- field & positional access ------------------------------------------

    def __getitem__(self, key):
        if isinstance(key, str):
            v = self._fields[key]
            return v
        if isinstance(key, list) and key and all(isinstance(k, str) for k in key):
            return StructuredArray(
                {k: self._fields[k] for k in key},
                {k: self._tails[k] for k in key},
                self._shape,
            )
        return self._index(key)

    def _index(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        # expand Ellipsis against the *base* ndim
        n_special = sum(1 for k in key if k is Ellipsis)
        if n_special > 1:
            raise IndexError('only one Ellipsis allowed')
        n_idx = sum(1 for k in key if k is not None and k is not Ellipsis)
        if n_special:
            i = key.index(Ellipsis)
            fill = (slice(None),) * (self.ndim - n_idx)
            key = key[:i] + fill + key[i + 1:]
        elif n_idx < self.ndim:
            key = key + (slice(None),) * (self.ndim - n_idx)

        newfields = {}
        newtails = {}
        for name, v in self._fields.items():
            tail = self._tails[name]
            fullkey = key + (slice(None),) * len(tail)
            if isinstance(v, StructuredArray):
                newfields[name] = v._index(fullkey)
            else:
                newfields[name] = v[fullkey]
            newtails[name] = tail
        name0 = next(iter(newfields))
        v0 = newfields[name0]
        base = tuple(v0.shape[: v0.ndim - len(newtails[name0])])
        return StructuredArray(newfields, newtails, base)

    @property
    def at(self):
        return _At(self)

    # -- shape manipulation --------------------------------------------------

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        # resolve -1
        if -1 in shape:
            known = 1
            for s in shape:
                if s != -1:
                    known *= s
            shape = tuple(self.size // known if s == -1 else s for s in shape)
        newfields = {}
        for name, v in self._fields.items():
            tail = self._tails[name]
            newfields[name] = v.reshape(shape + tail)
        return StructuredArray(newfields, self._tails, shape)

    def squeeze(self, axis=None):
        shape = self._shape
        if axis is None:
            newshape = tuple(s for s in shape if s != 1)
        else:
            if not isinstance(axis, tuple):
                axis = (axis,)
            axis = tuple(a % len(shape) for a in axis)
            newshape = tuple(s for i, s in enumerate(shape) if i not in axis)
        return self.reshape(newshape)

    def broadcast_to(self, shape):
        shape = tuple(shape)
        newfields = {}
        for name, v in self._fields.items():
            tail = self._tails[name]
            if isinstance(v, StructuredArray):
                newfields[name] = v.broadcast_to(shape + tail)
            else:
                newfields[name] = jnp.broadcast_to(v, shape + tail)
        return StructuredArray(newfields, self._tails, shape)

    def swapaxes(self, i, j):
        """Swap two base axes (field tail axes are untouched)."""
        nd = self.ndim
        i, j = i % nd, j % nd
        newfields = {}
        for name, v in self._fields.items():
            tail = self._tails[name]
            if isinstance(v, StructuredArray):
                newfields[name] = v.swapaxes(i, j)
            else:
                newfields[name] = jnp.swapaxes(v, i, j)
        shape = list(self._shape)
        shape[i], shape[j] = shape[j], shape[i]
        return StructuredArray(newfields, self._tails, tuple(shape))

    # -- numpy interop -------------------------------------------------------

    def __array__(self, dtype=None, copy=None):
        out = numpy.empty(self._shape, self.dtype)
        self._fill_numpy(out)
        return out

    _np_impls = {}

    @classmethod
    def _register_np(cls, *np_functions):
        """Route the given numpy functions through the
        ``__array_function__`` protocol (reference ``_array.py:389-411``
        interop surface)."""
        def deco(fn):
            for np_fn in np_functions:
                cls._np_impls[np_fn] = fn
            return fn
        return deco

    def __array_function__(self, func, types, args, kwargs):
        impl = self._np_impls.get(func)
        if impl is None:
            return NotImplemented
        return impl(*args, **kwargs)

    def _fill_numpy(self, out):
        for name, v in self._fields.items():
            if isinstance(v, StructuredArray):
                v._fill_numpy(out[name])
            else:
                out[name] = numpy.asarray(v)

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        names = tuple(self._fields)
        children = tuple(self._fields[n] for n in names)
        tails = tuple(self._tails[n] for n in names)
        return children, (names, tails)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, tails = aux
        fields = dict(zip(names, children))
        tailmap = dict(zip(names, tails))
        # derive base shape from the first leaf that is a real array; under
        # tree transformations leaves may be None or abstract placeholders
        shape = None
        for n in names:
            v = fields[n]
            if hasattr(v, 'shape'):
                t = tailmap[n]
                shape = tuple(v.shape[: v.ndim - len(t)])
                break
        if shape is None:
            shape = ()
        obj = object.__new__(cls)
        object.__setattr__(obj, '_fields', fields)
        object.__setattr__(obj, '_tails', tailmap)
        object.__setattr__(obj, '_shape', shape)
        return obj

    # -- misc ------------------------------------------------------------------

    def __repr__(self):
        inner = ', '.join(
            f'{name}={v!r}' for name, v in self._fields.items()
        )
        return f'StructuredArray(shape={self._shape}, {inner})'

    def __eq__(self, other):
        return NotImplemented

    def __hash__(self):
        return object.__hash__(self)


class _At:
    """Functional field update: ``x.at['f'].set(v)``."""

    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, name):
        return _AtField(self._arr, name)


class _AtField:
    def __init__(self, arr, name):
        self._arr = arr
        self._name = name

    def set(self, value):
        return set_field(self._arr, self._name, value)


def set_field(arr, name, value):
    """Return a copy of ``arr`` with field ``name`` set/added to ``value``."""
    fields = dict(arr._fields)
    tails = dict(arr._tails)
    value = asarray(value) if isinstance(value, (dict,)) else value
    if not isinstance(value, StructuredArray):
        value = jnp.asarray(value)
    nd = len(arr.shape)
    tail = tuple(value.shape[nd:])
    if tuple(value.shape[:nd]) != arr.shape:
        value = (
            value.broadcast_to(arr.shape + tail)
            if isinstance(value, StructuredArray)
            else jnp.broadcast_to(value, arr.shape + tail)
        )
    fields[name] = value
    tails[name] = tail
    return StructuredArray(fields, tails, arr.shape)


tree_util.register_pytree_node(
    StructuredArray,
    StructuredArray.tree_flatten,
    StructuredArray.tree_unflatten,
)


# -- constructors ------------------------------------------------------------


def _from_numpy_structured(x):
    fields = {}
    tails = {}
    for name in x.dtype.names:
        sub = x[name]
        subdtype, tail = x.dtype.fields[name][0], ()
        if subdtype.subdtype is not None:
            tail = subdtype.shape
        if _is_structured_dtype(sub.dtype):
            fields[name] = _from_numpy_structured(sub)
        else:
            fields[name] = jnp.asarray(sub)
        tails[name] = tail
    return StructuredArray(fields, tails, x.shape)


def asarray(x, dtype=None):
    """Convert ``x`` to a StructuredArray (if structured) or jnp array.

    Accepts: StructuredArray, numpy structured arrays, dicts of arrays
    (including nested dicts), pandas DataFrames, and plain array-likes.
    Counterpart of reference ``_array.py:447`` (``asarray``).
    """
    if isinstance(x, StructuredArray):
        return x
    if isinstance(x, dict):
        fields = {}
        for name, v in x.items():
            fields[name] = asarray(v)
        # common base shape: full broadcast if possible (all scalar fields),
        # else treat extra trailing dims as per-field tails
        shapes = [f.shape for f in fields.values()]
        try:
            base = broadcast_shapes(*shapes)
            tails = {name: () for name in fields}
        except ValueError:
            nd = min(len(s) for s in shapes)
            base = broadcast_shapes(*(s[:nd] for s in shapes))
            tails = {n: tuple(f.shape[nd:]) for n, f in fields.items()}
        out = {}
        for name, v in fields.items():
            target = base + tails[name]
            if isinstance(v, StructuredArray):
                out[name] = v.broadcast_to(target)
            else:
                out[name] = jnp.broadcast_to(v, target)
        return StructuredArray(out, tails, base)
    if hasattr(x, 'columns') and hasattr(x, 'to_numpy'):  # pandas DataFrame
        return StructuredArray(
            {str(c): jnp.asarray(numpy.asarray(x[c])) for c in x.columns}
        )
    x_np = x if isinstance(x, numpy.ndarray) else None
    if x_np is None and not isinstance(x, (jnp.ndarray, jax.Array)):
        try:
            if _is_structured_dtype(getattr(x, 'dtype', None)):
                x_np = numpy.asarray(x)
        except TypeError:
            pass
        if x_np is None and isinstance(x, (list, tuple)):
            probe = numpy.asarray(x) if _has_structured_content(x) else None
            x_np = probe
    if x_np is not None and _is_structured_dtype(x_np.dtype):
        return _from_numpy_structured(x_np)
    if dtype is None:
        probe = x_np if x_np is not None else (
            x if isinstance(x, numpy.ndarray) else None)
        if probe is None and isinstance(x, (list, tuple, str, bytes,
                                            numpy.str_, numpy.bytes_)):
            probe = numpy.asarray(x)
        if probe is not None and probe.dtype.kind in 'USO':
            # strings/objects are host data (e.g. text kernels like
            # BagOfWords): never coerce them to device arrays
            return probe
    return jnp.asarray(x, dtype=dtype)


def _has_structured_content(x):
    try:
        a = numpy.asarray(x)
    except Exception:
        return False
    return _is_structured_dtype(a.dtype)


def nscalars(x):
    """Number of scalar entries per point of ``x`` (1 for plain arrays,
    recursive count over fields and tail shapes for StructuredArray).
    Counterpart of reference ``_array.py:555`` (``_nd``)."""
    if not isinstance(x, StructuredArray):
        return 1
    total = 0
    for name, v in x._fields.items():
        tail = x._tails[name]
        size = math.prod(tail) if tail else 1
        total += size * nscalars(v) if isinstance(v, StructuredArray) else size
    return total


def broadcast_shapes(*shapes):
    return jnp.broadcast_shapes(*shapes)


def broadcast_to(x, shape):
    if isinstance(x, StructuredArray):
        return x.broadcast_to(shape)
    if isinstance(x, numpy.ndarray) and x.dtype.kind in 'USO':
        # strings/objects are host data (text kernels): numpy broadcast
        return numpy.broadcast_to(x, shape)
    return jnp.broadcast_to(x, shape)


def broadcast_arrays(*arrays):
    shapes = [a.shape for a in arrays]
    base = broadcast_shapes(*shapes)
    return tuple(broadcast_to(a, base) for a in arrays)


def concatenate(arrays, axis=0):
    arrays = list(arrays)
    if not arrays:
        raise ValueError('need at least one array')
    if not isinstance(arrays[0], StructuredArray):
        return jnp.concatenate(arrays, axis=axis)
    names = arrays[0].fields
    for a in arrays:
        if a.fields != names:
            raise ValueError('field mismatch in concatenate')
    fields = {}
    for name in names:
        fields[name] = concatenate([a[name] for a in arrays], axis=axis)
    return StructuredArray(fields, arrays[0]._tails)


def unstructured_to_structured(x, dtype=None, names=None):
    """Pack the last axis of ``x`` into named fields.

    Counterpart of reference ``_array.py:488``. ``names`` defaults to
    'f0', 'f1', ... ; ``dtype`` may be a numpy structured dtype whose field
    names/tails are used.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if dtype is not None:
        dtype = numpy.dtype(dtype)
        fields = {}
        tails = {}
        i = 0
        for name in dtype.names:
            ft, _ = dtype.fields[name][0], None
            if ft.subdtype is not None:
                tail = ft.shape
                size = int(numpy.prod(tail))
                fields[name] = x[..., i:i + size].reshape(x.shape[:-1] + tail)
                tails[name] = tail
                i += size
            else:
                fields[name] = x[..., i]
                tails[name] = ()
                i += 1
        if i != n:
            raise ValueError(f'dtype consumes {i} columns, array has {n}')
        return StructuredArray(fields, tails, x.shape[:-1])
    if names is None:
        names = [f'f{i}' for i in range(n)]
    return StructuredArray(
        {name: x[..., i] for i, name in enumerate(names)},
        None,
        x.shape[:-1],
    )


def structured_to_unstructured(x, dtype=None):
    """Flatten all leaf fields (including subarray tails, recursing into
    nested structured fields) into a trailing axis.  Counterpart of
    ``numpy.lib.recfunctions.structured_to_unstructured`` (reference
    ``_array.py:542``)."""
    cols = []

    def visit(v):
        if isinstance(v, StructuredArray):
            for name in v.fields:
                visit(v[name])
        else:
            a = jnp.asarray(v)
            cols.append(a.reshape(x.shape + (-1,)))

    visit(x)
    out = jnp.concatenate(cols, axis=-1)
    return out.astype(dtype) if dtype is not None else out


def append_fields(base, names, data):
    """New StructuredArray with extra fields appended (counterpart of
    ``numpy.lib.recfunctions.append_fields``, reference
    ``_array.py:679``)."""
    if isinstance(names, str):
        names = [names]
        data = [data]
    out = base
    for name, v in zip(names, data):
        if name in out.fields:
            raise ValueError(f'field {name!r} already present')
        out = out.at[name].set(jnp.asarray(v))
    return out


def ix_(*arrays):
    """Open-mesh broadcasting of 1-D (possibly structured) index/sample
    arrays: the i-th output has shape (1, ..., n_i, ..., 1)
    (counterpart of ``numpy.ix_``, reference ``_array.py:478``)."""
    out = []
    k = len(arrays)
    for i, a in enumerate(arrays):
        a = asarray(a)
        if a.ndim != 1:
            raise ValueError(f'argument {i} is not 1-D')
        shape = (1,) * i + (a.shape[0],) + (1,) * (k - i - 1)
        out.append(a.reshape(shape))
    return tuple(out)


def swapaxes(x, i, j):
    if isinstance(x, StructuredArray):
        return x.swapaxes(i, j)
    return jnp.swapaxes(x, i, j)


def _zeros_field(shape, dt):
    """(fields, tails) of zeros for a numpy structured dtype."""
    fields, tails = {}, {}
    for name in dt.names:
        ft = dt.fields[name][0]
        if ft.subdtype is not None:
            sub, tail = ft.subdtype
        else:
            sub, tail = ft, ()
        if sub.names is not None:
            f2, t2 = _zeros_field(shape + tail, sub)
            fields[name] = StructuredArray(f2, t2, shape + tail)
        else:
            fields[name] = jnp.zeros(shape + tail, sub)
        tails[name] = tail
    return fields, tails


def empty(shape, dtype):
    """StructuredArray of zeros with the given structured dtype
    ('empty' in name for numpy parity; values are deterministic zeros,
    reference ``_array.py:609``)."""
    if isinstance(shape, int):
        shape = (shape,)
    dt = numpy.dtype(dtype)
    if dt.names is None:
        return jnp.zeros(shape, dt)
    fields, tails = _zeros_field(tuple(shape), dt)
    return StructuredArray(fields, tails, tuple(shape))


def empty_like(x):
    if isinstance(x, StructuredArray):
        return empty(x.shape, x.dtype)
    return jnp.zeros_like(x)


# numpy-function protocol routing (numpy.fn(structured_array, ...) and
# the like= variants dispatch here)
StructuredArray._register_np(numpy.broadcast_to)(broadcast_to)
StructuredArray._register_np(numpy.broadcast_arrays)(broadcast_arrays)
StructuredArray._register_np(numpy.concatenate)(concatenate)
StructuredArray._register_np(numpy.squeeze)(
    lambda x, axis=None: x.squeeze(axis))
StructuredArray._register_np(numpy.swapaxes)(swapaxes)
StructuredArray._register_np(numpy.ix_)(ix_)
StructuredArray._register_np(numpy.empty)(
    lambda shape, dtype=float, *, like=None: empty(shape, dtype))
StructuredArray._register_np(numpy.empty_like)(empty_like)
from numpy.lib import recfunctions as _recfunctions
StructuredArray._register_np(
    _recfunctions.structured_to_unstructured
)(structured_to_unstructured)
