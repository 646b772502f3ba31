"""Correlated-Gaussian uncertainty propagation (native gvar replacement).

The reference library leans on the `gvar` package for error propagation:
posteriors are returned as arrays of correlated Gaussian variables whose
covariances can be evaluated later (reference ``_gvarext/``,
``_GP/_elements.py:682-743``).  gvar stores per-element sparse Jacobians
w.r.t. a global pool of primary Gaussians, in object-dtype numpy arrays —
a host-side, scalar-at-a-time design that cannot run on TPU.

This module is the TPU-native re-design: a :class:`UArray` is a pytree of

- ``mean``  : array, shape ``s``
- ``jac``   : dict mapping *primary block id* -> array of shape
  ``s + (n_block,)``, the Jacobian w.r.t. that block of iid standard
  normals.

All propagation is dense linear algebra on device; two UArrays correlate
through shared block ids.  First-order (delta-method) propagation through
nonlinear functions matches gvar semantics.
"""

from __future__ import annotations

import itertools

import numpy

import jax
from jax import numpy as jnp
from jax import tree_util

__all__ = [
    'UArray', 'from_cov', 'from_jacobian', 'ufunc', 'mean', 'sdev', 'var',
    'evalcov', 'cov', 'corr', 'sample', 'next_block_id',
]

_block_counter = itertools.count()


def next_block_id():
    return next(_block_counter)


class UArray:
    """Array of correlated Gaussian variables: mean + per-block Jacobians."""

    __slots__ = ('mean', 'jac')

    # make numpy defer to our reflected operators instead of trying to
    # coerce the UArray elementwise
    __array_ufunc__ = None

    def __init__(self, mean, jac=None):
        object.__setattr__(self, 'mean', jnp.asarray(mean))
        object.__setattr__(self, 'jac', dict(jac or {}))

    def __setattr__(self, *_):
        raise AttributeError('UArray is immutable')

    # -- introspection ------------------------------------------------------

    @property
    def shape(self):
        return self.mean.shape

    @property
    def ndim(self):
        return self.mean.ndim

    @property
    def size(self):
        return self.mean.size

    def __len__(self):
        return len(self.mean)

    @property
    def sdev(self):
        return jnp.sqrt(self.var)

    @property
    def var(self):
        out = jnp.zeros(self.shape, self.mean.dtype)
        for J in self.jac.values():
            out = out + jnp.sum(J * J, axis=-1)
        return out

    def cov(self):
        """Full covariance matrix of the flattened array."""
        n = self.size
        out = jnp.zeros((n, n), self.mean.dtype)
        for J in self.jac.values():
            Jf = J.reshape(n, J.shape[-1])
            out = out + Jf @ Jf.T
        return out.reshape(self.shape + self.shape)

    # -- indexing / reshaping ---------------------------------------------

    def __getitem__(self, key):
        # The Jacobians carry an extra trailing primary-block axis; the
        # caller's key addresses only the mean's axes, so it must be
        # normalized (Ellipsis expanded, missing trailing axes filled with
        # full slices) before a full slice for the block axis is appended.
        # Otherwise e.g. ``u[..., 0]`` would silently index into the block
        # axis of J and corrupt the propagated uncertainty.
        jkey = self._jac_key(key)
        return UArray(
            self.mean[key], {k: J[jkey] for k, J in self.jac.items()}
        )

    def _jac_key(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        nell = sum(1 for k in key if k is Ellipsis)
        if nell > 1:
            raise IndexError('an index can only have a single ellipsis')
        consumed = 0
        for k in key:
            if k is None or k is Ellipsis:
                continue
            if hasattr(k, 'dtype') and getattr(k, 'dtype', None) is not None \
                    and numpy.issubdtype(k.dtype, numpy.bool_):
                consumed += k.ndim
            else:
                consumed += 1
        if consumed > self.mean.ndim:
            raise IndexError(
                f'too many indices: array is {self.mean.ndim}-d, '
                f'index consumes {consumed} axes'
            )
        fill = (slice(None),) * (self.mean.ndim - consumed)
        if nell:
            i = key.index(Ellipsis)
            expanded = key[:i] + fill + key[i + 1:]
        else:
            expanded = key + fill
        return expanded + (slice(None),)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return UArray(
            self.mean.reshape(shape),
            {k: J.reshape(shape + (J.shape[-1],))
             for k, J in self.jac.items()},
        )

    def ravel(self):
        return self.reshape(-1)

    @property
    def T(self):
        if self.ndim < 2:
            return self
        perm = tuple(reversed(range(self.ndim)))
        return UArray(
            self.mean.transpose(perm),
            {k: J.transpose(perm + (self.ndim,))
             for k, J in self.jac.items()},
        )

    # -- arithmetic (exact for linear, delta method for nonlinear) ----------

    def _binary(self, other, fmean, dself, dother):
        if isinstance(other, UArray):
            m = fmean(self.mean, other.mean)
            ws = dself(self.mean, other.mean)
            wo = dother(self.mean, other.mean)
            jac = {}
            for k, J in self.jac.items():
                jac[k] = ws[..., None] * J
            for k, J in other.jac.items():
                prev = jac.get(k)
                term = wo[..., None] * J
                jac[k] = term if prev is None else _addb(prev, term)
            return UArray(m, jac)
        other = jnp.asarray(other)
        m = fmean(self.mean, other)
        ws = dself(self.mean, other)
        return UArray(
            m, {k: ws[..., None] * J for k, J in self.jac.items()}
        )

    def __add__(self, other):
        return self._binary(
            other, lambda a, b: a + b,
            lambda a, b: jnp.ones(jnp.broadcast_shapes(a.shape, b.shape)),
            lambda a, b: jnp.ones(jnp.broadcast_shapes(a.shape, b.shape)),
        )

    __radd__ = __add__

    def __sub__(self, other):
        return self._binary(
            other, lambda a, b: a - b,
            lambda a, b: jnp.ones(jnp.broadcast_shapes(a.shape, b.shape)),
            lambda a, b: -jnp.ones(jnp.broadcast_shapes(a.shape, b.shape)),
        )

    def __rsub__(self, other):
        return (-self) + other

    def __neg__(self):
        return UArray(-self.mean, {k: -J for k, J in self.jac.items()})

    def __mul__(self, other):
        return self._binary(
            other, lambda a, b: a * b,
            lambda a, b: jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape)),
            lambda a, b: jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape)),
        )

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binary(
            other, lambda a, b: a / b,
            lambda a, b: jnp.broadcast_to(1 / b, jnp.broadcast_shapes(a.shape, b.shape)),
            lambda a, b: jnp.broadcast_to(-a / b**2, jnp.broadcast_shapes(a.shape, b.shape)),
        )

    def __rtruediv__(self, other):
        other = jnp.asarray(other)
        m = other / self.mean
        w = -other / self.mean ** 2
        return UArray(m, {k: w[..., None] * J for k, J in self.jac.items()})

    def __matmul__(self, other):
        """Linear contraction with a plain array (exact propagation).
        Supports self 1D/2D with other 1D/2D."""
        if isinstance(other, UArray):
            raise NotImplementedError('UArray @ UArray not supported')
        other = jnp.asarray(other)
        if self.ndim == 1 and other.ndim == 1:
            jac = {k: jnp.einsum('nz,n->z', J, other)
                   for k, J in self.jac.items()}
        elif self.ndim == 1 and other.ndim == 2:
            jac = {k: jnp.einsum('nz,nm->mz', J, other)
                   for k, J in self.jac.items()}
        elif self.ndim == 2 and other.ndim == 1:
            jac = {k: jnp.einsum('anz,n->az', J, other)
                   for k, J in self.jac.items()}
        elif self.ndim == 2 and other.ndim == 2:
            jac = {k: jnp.einsum('anz,nm->amz', J, other)
                   for k, J in self.jac.items()}
        else:
            raise NotImplementedError('matmul supports 1D/2D operands')
        return UArray(self.mean @ other, jac)

    def __rmatmul__(self, other):
        other = jnp.asarray(other)
        if other.ndim == 1 and self.ndim == 1:
            jac = {k: jnp.einsum('n,nz->z', other, J)
                   for k, J in self.jac.items()}
        elif other.ndim == 2 and self.ndim == 1:
            jac = {k: jnp.einsum('mn,nz->mz', other, J)
                   for k, J in self.jac.items()}
        elif other.ndim == 1 and self.ndim == 2:
            jac = {k: jnp.einsum('n,nkz->kz', other, J)
                   for k, J in self.jac.items()}
        elif other.ndim == 2 and self.ndim == 2:
            jac = {k: jnp.einsum('mn,nkz->mkz', other, J)
                   for k, J in self.jac.items()}
        else:
            raise NotImplementedError('matmul supports 1D/2D operands')
        return UArray(other @ self.mean, jac)

    def __repr__(self):
        return f'UArray(mean={self.mean!r}, sdev={self.sdev!r})'

    # -- pytree --------------------------------------------------------------

    def tree_flatten(self):
        keys = tuple(sorted(self.jac))
        return (self.mean, tuple(self.jac[k] for k in keys)), keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        mean, jacs = children
        return cls(mean, dict(zip(keys, jacs)))


def _addb(a, b):
    """Add jacobian blocks with broadcasting over leading dims."""
    return a + b


tree_util.register_pytree_node(
    UArray, UArray.tree_flatten, UArray.tree_unflatten
)


# -- constructors --------------------------------------------------------


def from_cov(mean, covmat, *, block_id=None):
    """Create a UArray with given mean and covariance (one new primary
    block).  cov may have shape ``s + s`` (matrix over flattened s).

    Factorized by symmetric eigendecomposition with negative eigenvalues
    clipped to zero: posterior covariances are often indefinite at the
    eps level (Kss − Kxs'K⁻¹Kxs in floating point), which would NaN a
    Cholesky."""
    mean = jnp.asarray(mean)
    covmat = jnp.asarray(covmat)
    s = mean.shape
    n = mean.size
    covf = covmat.reshape(n, n)
    covf = 0.5 * (covf + covf.T)
    w, V = jnp.linalg.eigh(covf)
    L = V * jnp.sqrt(jnp.clip(w, 0, None))
    if block_id is None:
        block_id = next_block_id()
    return UArray(mean, {block_id: L.reshape(s + (n,))})


def from_jacobian(mean, jac):
    """Create a UArray from mean and explicit per-block jacobians."""
    return UArray(mean, jac)


def normal(mean, sdev):
    """Independent normal variables with the given means and sdevs
    (one new primary block); the gvar-style constructor."""
    mean = jnp.asarray(mean, float)
    sdev = jnp.asarray(sdev, float)
    mean, sdev = jnp.broadcast_arrays(mean, sdev)
    n = mean.size
    J = jnp.zeros((n, n), mean.dtype)
    J = J.at[jnp.arange(n), jnp.arange(n)].set(sdev.reshape(-1))
    return UArray(mean, {next_block_id(): J.reshape(mean.shape + (n,))})


def ufunc(f, x, dfdx=None):
    """Apply a scalar function elementwise with delta-method propagation."""
    import numpy
    if isinstance(f, numpy.ufunc):
        # numpy ufuncs can't trace; swap in the jax twin (np.exp -> jnp.exp)
        jf = getattr(jnp, f.__name__, None)
        if jf is None:
            raise TypeError(
                f'numpy ufunc {f.__name__} has no jax.numpy equivalent; '
                f'pass a traceable function'
            )
        f = jf
    if not isinstance(x, UArray):
        return f(x)
    if dfdx is None:
        from .._jaxutil import elementwise_grad
        dfdx = elementwise_grad(f)
    m = f(x.mean)
    w = dfdx(x.mean)
    return UArray(m, {k: w[..., None] * J for k, J in x.jac.items()})


def mean(x):
    return x.mean if isinstance(x, UArray) else jnp.asarray(x)


def var(x):
    return x.var if isinstance(x, UArray) else jnp.zeros(jnp.shape(x))


def sdev(x):
    return jnp.sqrt(var(x))


def cov(x):
    if isinstance(x, UArray):
        return x.cov()
    n = jnp.size(x)
    return jnp.zeros((n, n))


def evalcov(a, b=None):
    """Covariance between (the flattened) a and b (defaults to a)."""
    if b is None:
        b = a
    na, nb = a.size, b.size
    out = jnp.zeros((na, nb), a.mean.dtype)
    for k, Ja in a.jac.items():
        Jb = b.jac.get(k)
        if Jb is not None:
            out = out + Ja.reshape(na, -1) @ Jb.reshape(nb, -1).T
    return out.reshape(a.shape + b.shape)


def corr(a, b=None):
    c = evalcov(a, b)
    sa = sdev(a).ravel()
    sb = sdev(b if b is not None else a).ravel()
    n = c.reshape(sa.size, sb.size)
    return (n / jnp.outer(sa, sb)).reshape(c.shape)


def sample(key, x, shape=()):
    """Draw joint samples from the distribution of UArray ``x``."""
    if not isinstance(shape, tuple):
        shape = (shape,)
    out = jnp.broadcast_to(x.mean, shape + x.shape)
    for k, J in x.jac.items():
        nb = J.shape[-1]
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, shape + (nb,), x.mean.dtype)
        # contract J (s..., nb) with z (shape..., nb) -> (shape..., s...)
        out = out + jnp.tensordot(z, J, axes=[[-1], [-1]])
    return out


def uconcatenate(arrays, axis=0):
    """Concatenate UArrays, aligning primary blocks."""
    arrays = [a if isinstance(a, UArray) else UArray(a) for a in arrays]
    m = jnp.concatenate([a.mean for a in arrays], axis=axis)
    allkeys = sorted({k for a in arrays for k in a.jac})
    jac = {}
    for k in allkeys:
        parts = []
        for a in arrays:
            J = a.jac.get(k)
            if J is None:
                nb = next(
                    b.jac[k].shape[-1] for b in arrays if k in b.jac
                )
                J = jnp.zeros(a.shape + (nb,), m.dtype)
            parts.append(J)
        jac[k] = jnp.concatenate(parts, axis=axis if axis >= 0 else axis - 1)
    return UArray(m, jac)
