"""JAX utility layer.

TPU-native counterpart of reference ``src/lsqfitgp/_jaxext/__init__.py``:

- ``elementwise_grad``: per-argument elementwise derivative via jvp-with-
  ones (reference ``:85``), composable to arbitrary order.
- ``skipifabstract``: run eager sanity checks at trace time under
  ``ensure_compile_time_eval``; silently skip when values are abstract
  (reference ``:102-138``).  This is the "numerical sanitizer" seam.
- ``float_type``: result float dtype of inputs (reference ``:140``).
- ``batchufunc``: bound peak memory of a kernel's broadcast evaluation by
  chunking the leading axis (reference ``_jaxext/_batcher.py:27``).
- ``limit_derivatives``: custom-JVP counter raising past a derivability
  bound (reference ``:176-210``).
- ``fasthash64/32``: pure-JAX fast-hash (reference ``_jaxext/_fasthash.py``).

No ``pure_callback`` anywhere: TPUs cannot host-callback cheaply
mid-graph, so everything here is traceable to a single XLA program.
"""

from __future__ import annotations

import functools
import math

import jax
import numpy
from jax import lax
from jax import numpy as jnp

from . import _config

__all__ = [
    'elementwise_grad',
    'skipifabstract',
    'float_type',
    'batchufunc',
    'limit_derivatives',
    'fasthash64',
    'fasthash32',
    'is_abstract',
    'concrete_eq',
]


def elementwise_grad(fun, argnum=0):
    """Elementwise derivative of ``fun`` w.r.t. its ``argnum``-th argument.

    For a function applied elementwise (broadcasting allowed), the
    derivative is obtained by a single jvp with a ones tangent — O(1)
    passes instead of a full Jacobian. Composable: apply repeatedly for
    higher order.
    """

    @functools.wraps(fun)
    def grad_fun(*args, **kw):
        args = list(args)
        x = args[argnum]

        def only_x(x):
            args[argnum] = x
            return fun(*args, **kw)

        x = jnp.asarray(x)
        _, tangent = jax.jvp(only_x, (x,), (jnp.ones_like(x),))
        return tangent

    return grad_fun


def is_abstract(*values):
    """True if any value is a JAX tracer (abstract, inside a transform)."""
    return any(isinstance(v, jax.core.Tracer) for v in jax.tree.leaves(list(values)))


def concrete_eq(a, b):
    """``a == b`` when both are concrete; ``False`` for tracers.

    For parameter-dependent derivability guards: a TRACED parameter sits
    at a generic value (an optimizer will move it), so the measure-zero
    special case that would add derivability cannot be assumed —
    conservatively not equal."""
    if is_abstract(a, b):
        return False
    return bool(a == b)


def skipifabstract(check):
    """Run ``check()`` eagerly at trace time; skip if inputs are abstract.

    ``check`` must close over the values it inspects and return nothing.
    Under ``jax.ensure_compile_time_eval`` concrete values execute eagerly,
    so checks run exactly once at trace time and compile to nothing.
    """
    with jax.ensure_compile_time_eval():
        try:
            check()
        except (jax.errors.TracerArrayConversionError,
                jax.errors.TracerBoolConversionError,
                jax.errors.ConcretizationTypeError):
            pass


def float_type(*args):
    """Result floating dtype of the arguments, at least the default float."""
    dtypes = []
    for a in args:
        d = getattr(a, 'dtype', None)
        if d is None:
            d = numpy.asarray(a).dtype
        dtypes.append(numpy.dtype(str(d)))
    res = numpy.result_type(*dtypes) if dtypes else numpy.dtype('float64')
    if not numpy.issubdtype(res, numpy.floating):
        res = numpy.dtype(_config.default_float().__name__)
    # clamp to x64 policy
    if res == numpy.float64 and not jax.config.jax_enable_x64:
        res = numpy.float32
    return jnp.dtype(res)


def batchufunc(core, *, maxnbytes=None):
    """Wrap an elementwise (broadcasting) 2-arg kernel core so that its
    evaluation is chunked over the leading axis of the first argument,
    bounding peak memory to roughly ``maxnbytes`` per chunk.

    TPU-first note: on TPU the Gram tiles should instead flow through the
    Pallas evaluator in :mod:`lsqfitgp_tpu.ops`; this wrapper is the
    portable fallback with identical semantics to reference
    ``_jaxext/_batcher.py:27``.
    """
    if maxnbytes is None:
        maxnbytes = 10e6

    @functools.wraps(core)
    def batched(x, y, **kw):
        from . import _array

        xb, yb = _array.broadcast_arrays(x, y)
        shape = xb.shape
        if not shape:
            return core(xb, yb, **kw)
        # estimate bytes per output row
        total = math.prod(shape)
        rows = shape[0]
        per_row = max(1, total // max(rows, 1)) * 8
        chunk = max(1, int(maxnbytes // per_row))
        if chunk >= rows or is_abstract(xb, yb):
            # under tracing, avoid data-dependent chunking; evaluate whole
            # (the Pallas path handles memory on TPU)
            if chunk >= rows:
                return core(xb, yb, **kw)
            chunk = min(chunk, rows)
        nchunks = -(-rows // chunk)
        pad = nchunks * chunk - rows

        def pad0(a):
            if pad == 0:
                return a
            widths = [(0, pad)] + [(0, 0)] * (len(shape) - 1)
            if isinstance(a, _array.StructuredArray):
                return _array.concatenate([a, a[:pad]], axis=0) if pad <= rows else a
            return jnp.pad(a, widths, mode='edge')

        xp, yp = pad0(xb), pad0(yb)

        def reshape_chunks(a):
            return jax.tree.map(
                lambda leaf: leaf.reshape((nchunks, chunk) + leaf.shape[1:]), a
            )

        xc, yc = reshape_chunks(xp), reshape_chunks(yp)
        out = lax.map(lambda xy: core(xy[0], xy[1], **kw), (xc, yc))
        out = out.reshape((nchunks * chunk,) + out.shape[2:])
        return out[:rows]

    return batched


# -- derivative limiting -------------------------------------------------


class TooManyDerivativesError(Exception):
    pass


def limit_derivatives(x, n, *, error=True, name=None):
    """Return ``x`` but raise (at trace time) if differentiated more than
    ``n`` times. Implemented as a chain of custom-jvp identities that count
    derivative passes (reference ``_jaxext/__init__.py:176-210``).
    """
    if n is None:
        return x

    def make(level):
        @jax.custom_jvp
        def ident(x):
            return x

        @ident.defjvp
        def ident_jvp(primals, tangents):
            (x,), (t,) = primals, tangents
            if level >= n:
                if error:
                    raise TooManyDerivativesError(
                        f'kernel{" " + name if name else ""} is derivable only '
                        f'{n} times'
                    )
            return make(level + 1)(x), t

        return ident

    return make(0)(x)


# -- fast-hash ------------------------------------------------------------


def _mix(h):
    h = h ^ (h >> jnp.uint64(23))
    h = h * jnp.uint64(0x2127599BF4325C37)
    h = h ^ (h >> jnp.uint64(47))
    return h


def fasthash64(buf, seed=0):
    """64-bit fast-hash of a byte buffer (pure JAX, lax.scan over words).

    Port target: the fast-hash algorithm (public domain algorithm by
    Zilong Tan); parity checked against digests from the reference's C
    test vectors (reference ``tests/fast-hash``).
    Accepts bytes or a uint8 array.
    """
    if isinstance(buf, (bytes, bytearray)):
        data = numpy.frombuffer(bytes(buf), dtype=numpy.uint8)
    else:
        data = numpy.asarray(buf, dtype=numpy.uint8)
    n = data.size
    m = numpy.uint64(0x880355F21E6D1965)
    nwords = n // 8
    words = (
        data[: nwords * 8].view('<u8')
        if nwords
        else numpy.empty(0, numpy.uint64)
    )
    words = jnp.asarray(words.astype(numpy.uint64))
    h = jnp.uint64(seed) ^ (jnp.uint64(n) * m)

    def body(h, w):
        h = (h ^ _mix(w)) * m
        return h, None

    h, _ = lax.scan(body, h, words)
    tail = data[nwords * 8:]
    if tail.size:
        v = numpy.uint64(0)
        for i, b in enumerate(tail[::-1]):
            v = (v << numpy.uint64(8)) | numpy.uint64(int(b))
        h = (h ^ _mix(jnp.uint64(v))) * m
    return _mix(h)


def fasthash32(buf, seed=0):
    h = fasthash64(buf, jnp.uint64(seed) ^ (jnp.uint64(seed) >> jnp.uint64(32)))
    return (h - (h >> jnp.uint64(32))).astype(jnp.uint32)
