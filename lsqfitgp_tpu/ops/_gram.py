"""Pallas tiled Gram-matrix evaluator.

The TPU-idiomatic replacement for "broadcast the kernel core over
x[:, None], y[None, :]" (SURVEY §7.4).  A `pallas_call` grid over
(row-tile, column-tile) blocks:

- each program loads an x tile (T, p) and a y tile (T, p) into VMEM;
- the squared distance uses the MXU:  r² = ‖x‖² + ‖y‖² − 2 x yᵀ
  (the cross term is a (T, p) @ (p, T) matmul on the systolic array);
- the scalar profile g(r²) (e.g. exp(−r²/2)) is fused on the tile in
  VMEM, and an optional diagonal nugget is added on diagonal tiles —
  so the O(n²·p) assembly never round-trips intermediates through HBM
  (the XLA broadcast materializes the (n, m, p) difference tensor when
  p > 1).

On non-TPU backends the same kernel runs in interpreter mode (tests),
or the caller can use the plain XLA path via ``gram_xla``.
"""

from __future__ import annotations

import functools

import jax
import numpy
from jax import numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['gram', 'gram_sym', 'gram_xla']


def _round_up(n, m):
    return (n + m - 1) // m * m


def gram_xla(profile, x, y, *, noise=0.0):
    """Plain-XLA reference implementation: broadcast evaluation."""
    r2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    K = profile(r2)
    if noise:
        n, m = K.shape
        K = K + noise * jnp.eye(n, m, dtype=K.dtype)
    return K


def _gram_kernel(x_ref, y_ref, xn_ref, yn_ref, noise_ref, o_ref, *,
                 profile, with_noise, tile):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xt = x_ref[...]               # (T, p)
    yt = y_ref[...]               # (T, p)
    # MXU cross term + precomputed squared norms; HIGHEST precision
    # forces the 3-pass bf16 decomposition (single-pass bf16 loses ~3
    # decimal digits on r², visible in the kernel values)
    cross = jax.lax.dot_general(
        xt, yt.T, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    r2 = xn_ref[...] + yn_ref[...].T - 2 * cross   # (T,1) + (1,T)
    r2 = jnp.maximum(r2, 0.0)
    K = profile(r2)
    if with_noise:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile
        K = jnp.where(rows == cols, K + noise_ref[0, 0], K)
    o_ref[...] = K.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('profile', 'tile', 'interpret'),
)
def gram(profile, x, y=None, *, noise=None, tile=256, interpret=None):
    """Tiled Gram matrix K[i, j] = profile(‖x_i − y_j‖²) (+ noise·I).

    Parameters
    ----------
    profile : callable
        Scalar isotropic profile g(r²), traced inside the kernel.
    x, y : (n, p), (m, p) arrays
        Input points (y defaults to x).  1D inputs are treated as p=1.
    noise : scalar, optional
        Diagonal nugget fused into the kernel.
    tile : int
        Tile size (multiples of 128 for MXU alignment).
    interpret : bool, optional
        Force Pallas interpreter mode (defaults to True off-TPU).
    """
    if y is None:
        y = x
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    n, p = x.shape
    m, _ = y.shape
    dtype = jnp.result_type(x.dtype, jnp.float32)

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    npad = _round_up(n, tile)
    mpad = _round_up(m, tile)
    # pad with huge coordinates so padded distances are huge and the
    # profile of a decaying kernel underflows; the slice below removes
    # them anyway
    xp = jnp.zeros((npad, p), dtype).at[:n].set(x.astype(dtype))
    yp = jnp.zeros((mpad, p), dtype).at[:m].set(y.astype(dtype))
    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)   # (npad, 1)
    yn = jnp.sum(yp * yp, axis=-1, keepdims=True)

    noise_arr = jnp.asarray(
        0.0 if noise is None else noise, dtype
    ).reshape(1, 1)
    kernel = functools.partial(
        _gram_kernel, profile=profile, with_noise=noise is not None,
        tile=tile,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, mpad), dtype),
        grid=(npad // tile, mpad // tile),
        in_specs=[
            pl.BlockSpec((tile, p), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, p), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        interpret=interpret,
    )(xp, yp, xn, yn, noise_arr)
    return out[:n, :m]


def _gram_sym_kernel(ij_ref, x_ref, y_ref, xn_ref, yn_ref, noise_ref,
                     o_ref, *, profile, with_noise, tile):
    """Upper-triangle program: like _gram_kernel but the (i, j) tile
    coordinates come from a prefetched index list covering i <= j."""
    k = pl.program_id(0)
    i = ij_ref[k, 0]
    j = ij_ref[k, 1]
    xt = x_ref[...]
    yt = y_ref[...]
    cross = jax.lax.dot_general(
        xt, yt.T, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    r2 = xn_ref[...] + yn_ref[...].T - 2 * cross
    r2 = jnp.maximum(r2, 0.0)
    K = profile(r2)
    if with_noise:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile
        K = jnp.where(rows == cols, K + noise_ref[0, 0], K)
    o_ref[...] = K.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('profile', 'tile', 'interpret'),
)
def gram_sym(profile, x, *, noise=None, tile=256, interpret=None):
    """Symmetric Gram matrix exploiting K = K': only the ntiles(ntiles+1)/2
    upper-triangle tiles are evaluated (scalar-prefetched (i, j) tile
    list), then mirrored — half the kernel evaluations of `gram`.
    Counterpart of the reference's `halfmatrix` option (reference
    ``_GP/_elements.py:567-573``).

    Worth it only for *expensive* profiles (e.g. the BART recursion with
    its digammas): for cheap profiles like exp the mirror's two extra
    HBM passes outweigh the saved evaluations (measured 0.8x for
    ExpQuad at n=8192 on v5e, ~2x expected for transcendental-heavy
    cores)."""
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n, p = x.shape
    dtype = jnp.result_type(x.dtype, jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    npad = _round_up(n, tile)
    nt = npad // tile
    xp = jnp.zeros((npad, p), dtype).at[:n].set(x.astype(dtype))
    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)

    ij = numpy.array(
        [(i, j) for i in range(nt) for j in range(i, nt)], numpy.int32
    )
    nprog = len(ij)
    noise_arr = jnp.asarray(
        0.0 if noise is None else noise, dtype
    ).reshape(1, 1)
    kernel = functools.partial(
        _gram_sym_kernel, profile=profile, with_noise=noise is not None,
        tile=tile,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((tile, p), lambda k, ij: (ij[k, 0], 0)),
            pl.BlockSpec((tile, p), lambda k, ij: (ij[k, 1], 0)),
            pl.BlockSpec((tile, 1), lambda k, ij: (ij[k, 0], 0)),
            pl.BlockSpec((tile, 1), lambda k, ij: (ij[k, 1], 0)),
            pl.BlockSpec((1, 1), lambda k, ij: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda k, ij: (ij[k, 0], ij[k, 1])
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, npad), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(ij), xp, xp, xn, xn, noise_arr)
    out = out[:n, :n]
    # the lower-triangle tiles were never written: keep only the upper
    # triangle and mirror it
    return jnp.triu(out) + jnp.triu(out, k=1).T
