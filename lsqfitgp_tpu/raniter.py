"""Posterior/prior sampling utilities.

Counterpart of reference ``src/lsqfitgp/_fastraniter.py:36-121``
(``raniter``, ``sample``): draw joint samples from a (mean, cov) pair, a
dict of means + covariance dict, or an :class:`uncert.UArray` /
BufferDict of UArrays.  Device-resident: one Cholesky, then each sample
is a matvec.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp

from .linalg import Chol
from .uncert import UArray, BufferDict

__all__ = ['raniter', 'sample']


def _flatten_meancov(mean, cov):
    """Normalize inputs to flat (mean vector, cov matrix, unpack)."""
    if isinstance(mean, BufferDict):
        buf = mean.buf
        if isinstance(buf, UArray):
            m, C = buf.mean, buf.cov()
        else:
            m, C = buf, jnp.asarray(cov)
        unpack = lambda v: mean.replace_buf(v)
        return m, C, unpack
    if isinstance(mean, UArray):
        u = mean.reshape(-1)
        unpack = lambda v: v.reshape(mean.shape)
        return u.mean, u.cov(), unpack
    if isinstance(mean, dict):
        keys = list(mean)
        if cov is None and any(
                isinstance(mean[k], UArray) for k in keys):
            # dict of correlated UArrays (what GP.pred returns): the
            # joint covariance lives in the shared primary blocks, so
            # assemble it with evalcov over all key pairs (plain
            # entries are treated as exact constants)
            from .uncert import evalcov
            uas = [mean[k] if isinstance(mean[k], UArray)
                   else UArray(jnp.asarray(mean[k], float))
                   for k in keys]
            shapes = [u.shape for u in uas]
            sizes = [u.size for u in uas]
            m = jnp.concatenate([u.mean.reshape(-1) for u in uas])
            offs = [0]
            for s in sizes:
                offs.append(offs[-1] + s)
            C = jnp.zeros((m.size, m.size))
            for i, ua in enumerate(uas):
                for j, ub in enumerate(uas):
                    if j > i:
                        continue
                    blk = evalcov(ua, ub).reshape(sizes[i], sizes[j])
                    C = C.at[offs[i]:offs[i+1], offs[j]:offs[j+1]] \
                        .set(blk)
                    if j < i:
                        C = C.at[offs[j]:offs[j+1], offs[i]:offs[i+1]] \
                            .set(blk.T)

            def unpack(v):
                out = {}
                for k, s, o0, o1 in zip(keys, shapes, offs[:-1],
                                        offs[1:]):
                    out[k] = v[o0:o1].reshape(s)
                return out

            return m, C, unpack
        shapes = [jnp.shape(mean[k]) for k in keys]
        sizes = [int(jnp.size(mean[k])) for k in keys]
        m = jnp.concatenate([
            jnp.reshape(jnp.asarray(mean[k], float), (-1,)) for k in keys
        ])
        n = m.size
        C = jnp.zeros((n, n))
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        for i, ki in enumerate(keys):
            for j, kj in enumerate(keys):
                blk = cov.get((ki, kj)) if isinstance(cov, dict) else None
                if blk is None and isinstance(cov, dict):
                    blk = cov.get((kj, ki))
                    blk = None if blk is None else jnp.asarray(blk).T
                if blk is None and not isinstance(cov, dict):
                    blk = jnp.asarray(cov)[offs[i]:offs[i+1], offs[j]:offs[j+1]]
                if blk is not None:
                    C = C.at[offs[i]:offs[i+1], offs[j]:offs[j+1]].set(
                        jnp.reshape(blk, (sizes[i], sizes[j]))
                    )

        def unpack(v):
            out = {}
            for k, s, o0, o1 in zip(keys, shapes, offs[:-1], offs[1:]):
                out[k] = v[o0:o1].reshape(s)
            return out

        return m, C, unpack
    mean = jnp.asarray(mean, float)
    unpack = lambda v: v.reshape(mean.shape)
    return mean.reshape(-1), jnp.asarray(cov).reshape(mean.size, mean.size), \
        unpack


def _coerce_key(key, rng):
    """Accept a jax PRNG key, a plain int seed, or None (fresh).
    ``rng`` may be a numpy Generator, an int seed, or None."""
    if key is None:
        import numpy
        if isinstance(rng, (int, numpy.integer)):
            return jax.random.PRNGKey(int(rng))
        if rng is None:
            rng = numpy.random.default_rng()
        return jax.random.PRNGKey(int(rng.integers(2 ** 31)))
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key


def raniter(mean, cov=None, *, key=None, rng=None):
    """Infinite generator of joint samples from N(mean, cov).
    ``key``: jax PRNG key or plain int seed."""
    m, C, unpack = _flatten_meancov(mean, cov)
    dec = Chol(C)
    key = _coerce_key(key, rng)
    while True:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (m.size,), m.dtype)
        yield unpack(m + dec.correlate(z))


def sample(mean, cov=None, *, key=None, rng=None, shape=()):
    """One sample (or a batch of given shape) from N(mean, cov)."""
    if not isinstance(shape, tuple):
        shape = (shape,)
    m, C, unpack = _flatten_meancov(mean, cov)
    dec = Chol(C)
    key = _coerce_key(key, rng)
    z = jax.random.normal(key, shape + (m.size,), m.dtype)
    if not shape:
        return unpack(m + dec.correlate(z))
    z2d = z.reshape(-1, m.size)
    samples = m + dec.correlate(z2d.T).T            # (batch, n)
    out = jax.vmap(unpack)(samples)
    return jax.tree.map(
        lambda a: a.reshape(shape + a.shape[1:]), out
    )
