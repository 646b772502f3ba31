"""Pallas tiled Gram-matrix evaluator.

The TPU-idiomatic replacement for "broadcast the kernel core over
x[:, None], y[None, :]" (SURVEY §7.4).  A `pallas_call` grid over
(row-tile, column-tile) blocks:

- each program loads an x tile (T, p) and a y tile (T, p) into VMEM;
- the squared distance uses the MXU:  r² = ‖x‖² + ‖y‖² − 2 x yᵀ
  (the cross term is a (T, p) @ (p, T) matmul on the systolic array);
- the scalar profile g(r², *params) (e.g. exp(−r²/2)) is fused on the
  tile in VMEM, and an optional diagonal nugget is added on diagonal
  tiles — so the O(n²·p) assembly never round-trips intermediates
  through HBM (the XLA broadcast materializes the (n, m, p) difference
  tensor when p > 1).

Hyperparameters that are traced values (the normal case inside
``empbayes_fit``) are passed to the kernel through an SMEM parameter
vector, NOT closed over (Pallas kernels cannot capture tracers).

Differentiation: ``gram``/``gram_sym`` carry a ``jax.custom_jvp`` whose
tangent is expressed with plain jnp operations on *primal* weight
matrices (them themselves Pallas evaluations of the profile's
elementwise derivatives):

    dK = g'(r²) ⊙ dr² + Σ_k ∂g/∂p_k ⊙ dp_k + dnoise·I,
    dr² = 2(rowsum(x·dx) ⊕ rowsum(y·dy) − x dyᵀ − dx yᵀ)

which is linear in the tangents through transposable primitives, so
*both* forward (jvp) and reverse (grad/vjp) mode work — the fit's
Fisher-vector products need both.

On non-TPU backends the same kernels run in interpreter mode (tests),
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


def gram_xla(profile, x, y, *, params=(), noise=None):
    """Plain-XLA reference implementation: broadcast evaluation."""
    r2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    K = profile(r2, *params)
    if noise is not None:
        # static None test, not a Python truth test: noise may be a
        # traced hyperparameter
        n, m = K.shape
        K = K + noise * jnp.eye(n, m, dtype=K.dtype)
    return K


def _read_params(p_ref, nparams):
    return tuple(p_ref[k, 0] for k in range(nparams))


def _gram_kernel(x_ref, y_ref, xn_ref, yn_ref, p_ref, o_ref, *,
                 profile, nparams, with_noise, tile):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xt = x_ref[...]               # (T, p)
    yt = y_ref[...]               # (T, p)
    if xt.shape[1] == 1:
        # p = 1 (time series, 1-D regression): the outer difference is
        # EXACT in f32 — no norm-expansion cancellation, so √r²-mode
        # profiles (stationary |Δ| kernels) keep full precision near
        # the diagonal, where the expansion's absolute ~eps·‖x‖² error
        # would blow up to ~√eps·‖x‖ distance error
        d = xt - yt.T                                  # (T, T)
        r2 = d * d
    else:
        # MXU cross term + precomputed squared norms; HIGHEST precision
        # forces the 6-pass bf16 decomposition (a 3-pass split leaves
        # ~2^-18 relative error on r², 64x above f32 noise — measured
        # 7e-5 absolute on unit-scale inputs, outside the library's
        # gram accuracy contract; the profile evaluation dominates the
        # kernel anyway for cheap profiles)
        cross = jax.lax.dot_general(
            xt, yt.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.promote_types(xt.dtype,
                                                     jnp.float32),
        )
        r2 = xn_ref[...] + yn_ref[...].T - 2 * cross   # (T,1) + (1,T)
        r2 = jnp.maximum(r2, 0.0)
    K = profile(r2, *_read_params(p_ref, nparams))
    if with_noise:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile
        K = jnp.where(rows == cols, K + p_ref[nparams, 0], K)
    o_ref[...] = K.astype(o_ref.dtype)


def _pad_points(x, tile, dtype):
    """Pad to a tile multiple with DISTINCT far-away coordinates:
    zero padding would create artificial coincident points (r² = 0)
    among the pad rows and poison derivative weights with NaN/inf for
    profiles singular at zero distance; here every pad-pad and
    pad-real distance is >= 1e3, so padded entries (sliced away by the
    caller) stay finite through the custom-JVP weight matrices."""
    n, p = x.shape
    npad = _round_up(n, tile)
    far = 1e7 + 1e3 * jnp.arange(npad - n, dtype=dtype)
    xp = jnp.zeros((npad, p), dtype).at[:n].set(x.astype(dtype))
    xp = xp.at[n:, 0].set(far)
    return xp


def _paramvec(params, noise, dtype):
    """(P+1, 1) parameter vector: the profile params then the nugget."""
    vals = [jnp.asarray(v, dtype).reshape(()) for v in params]
    vals.append(jnp.asarray(0.0 if noise is None else noise,
                            dtype).reshape(()))
    return jnp.stack(vals).reshape(-1, 1)


def _gram_raw(profile, xp, yp, xn, yn, pvec, *, with_noise, tile,
              interpret):
    """Pallas full-grid evaluation on padded inputs."""
    npad, p = xp.shape
    mpad, _ = yp.shape
    nparams = pvec.shape[0] - 1
    dtype = xp.dtype
    kernel = functools.partial(
        _gram_kernel, profile=profile, nparams=nparams,
        with_noise=with_noise, tile=tile,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, mpad), dtype),
        grid=(npad // tile, mpad // tile),
        in_specs=[
            pl.BlockSpec((tile, p), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, p), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((pvec.shape[0], 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        interpret=interpret,
    )(xp, yp, xn, yn, pvec)


def _gram_sym_kernel(ij_ref, x_ref, y_ref, xn_ref, yn_ref, p_ref,
                     o_ref, *, profile, nparams, with_noise, tile):
    """Upper-triangle program: like _gram_kernel but the (i, j) tile
    coordinates come from a prefetched index list covering i <= j."""
    k = pl.program_id(0)
    i = ij_ref[0, k]
    j = ij_ref[1, k]
    xt = x_ref[...]
    yt = y_ref[...]
    if xt.shape[1] == 1:
        # p = 1: exact outer difference (see _gram_kernel)
        d = xt - yt.T
        r2 = d * d
    else:
        cross = jax.lax.dot_general(
            xt, yt.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.promote_types(xt.dtype,
                                                     jnp.float32),
        )
        r2 = xn_ref[...] + yn_ref[...].T - 2 * cross
        r2 = jnp.maximum(r2, 0.0)
    K = profile(r2, *_read_params(p_ref, nparams))
    if with_noise:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile
        K = jnp.where(rows == cols, K + p_ref[nparams, 0], K)
    o_ref[...] = K.astype(o_ref.dtype)


def _gram_sym_raw(profile, xp, xn, pvec, *, with_noise, tile,
                  interpret):
    """Pallas upper-triangle evaluation on padded inputs, mirrored.
    Counterpart of the reference's `halfmatrix` option (reference
    ``_GP/_elements.py:567-573``): half the profile evaluations of the
    full grid — worth it for *expensive* profiles (e.g. the BART
    recursion); for cheap ones the mirror's extra HBM passes win out
    (measured 0.8x for ExpQuad at n=8192 on v5e)."""
    from jax.experimental.pallas import tpu as pltpu

    npad, p = xp.shape
    nt = npad // tile
    nparams = pvec.shape[0] - 1
    dtype = xp.dtype
    ij = numpy.array(
        [(i, j) for i in range(nt) for j in range(i, nt)], numpy.int32
    ).T.copy()  # (2, npairs): SMEM pads each ROW to 128 lanes, so the
    # transposed layout keeps big tile lists within the 1 MB SMEM
    kernel = functools.partial(
        _gram_sym_kernel, profile=profile, nparams=nparams,
        with_noise=with_noise, tile=tile,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ij.shape[1],),
        in_specs=[
            pl.BlockSpec((tile, p), lambda k, ij: (ij[0, k], 0)),
            pl.BlockSpec((tile, p), lambda k, ij: (ij[1, k], 0)),
            pl.BlockSpec((tile, 1), lambda k, ij: (ij[0, k], 0)),
            pl.BlockSpec((tile, 1), lambda k, ij: (ij[1, k], 0)),
            pl.BlockSpec((pvec.shape[0], 1), lambda k, ij: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda k, ij: (ij[0, k], ij[1, k])
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, npad), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(ij), xp, xp, xn, xn, pvec)
    # the lower-triangle tiles were never written: keep only the upper
    # triangle and mirror it
    return jnp.triu(out) + jnp.triu(out, k=1).T


# -- differentiable wrappers --------------------------------------------------
#
# custom_jvp over the PADDED arrays; padding/slicing in the public
# functions is plain differentiable jnp.  The tangent rule evaluates
# the profile's elementwise derivatives with extra Pallas calls on the
# *primals* and combines them with the tangents through transposable
# jnp ops only, so reverse mode (linearize + transpose) works too.

def _elemgrad_r2(profile, nparams):
    def dprof(r2, *p):
        zeros = tuple(jnp.zeros_like(pk) for pk in p)
        d = jax.jvp(profile, (r2,) + p,
                    (jnp.ones_like(r2),) + zeros)[1]
        # r2 == 0 (post-clamp) means coincident points, where the true
        # tangent g'(r2)·dr2 vanishes (dr2 ∝ √r2 · tangent).  For
        # profiles with g' singular at 0 (|r|-type kernels guarded by
        # a tiny offset) the weight is astronomically large though
        # finite, and ±w·x terms in the REVERSE-mode transpose absorb
        # the entire real signal into their rounding — zero it exactly.
        return jnp.where(r2 <= 0, 0.0, d)
    return dprof


def _elemgrad_pk(profile, nparams, k):
    def dprof(r2, *p):
        tangents = [jnp.zeros_like(r2)]
        for i, pk in enumerate(p):
            tangents.append(jnp.ones_like(pk) if i == k
                            else jnp.zeros_like(pk))
        return jax.jvp(profile, (r2,) + p, tuple(tangents))[1]
    return dprof


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2, 3))
def _gram_d(profile, tile, interpret, with_noise, xp, yp, pvec):
    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)
    yn = jnp.sum(yp * yp, axis=-1, keepdims=True)
    return _gram_raw(profile, xp, yp, xn, yn, pvec,
                     with_noise=with_noise, tile=tile,
                     interpret=interpret)


@_gram_d.defjvp
def _gram_d_jvp(profile, tile, interpret, with_noise, primals, tangents):
    xp, yp, pvec = primals
    dx, dy, dpvec = tangents
    nparams = pvec.shape[0] - 1
    K = _gram_d(profile, tile, interpret, with_noise, xp, yp, pvec)

    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)
    yn = jnp.sum(yp * yp, axis=-1, keepdims=True)
    Wr = _gram_raw(_elemgrad_r2(profile, nparams), xp, yp, xn, yn,
                   pvec, with_noise=False, tile=tile,
                   interpret=interpret)
    if xp.shape[1] == 1:
        # p = 1: exact outer differences, matching the primal kernel's
        # exact r² (the norm-expansion form would pair a ~1/√r² weight
        # near the diagonal with an eps·‖x‖²-error dr²)
        dr2 = 2 * (xp[:, :1] - yp[:, :1].T) * (dx[:, :1] - dy[:, :1].T)
    else:
        dr2 = 2 * (
            jnp.sum(xp * dx, axis=-1, keepdims=True)
            + jnp.sum(yp * dy, axis=-1, keepdims=True).T
            - xp @ dy.T - dx @ yp.T
        )
    dK = Wr * dr2
    for k in range(nparams):
        Wk = _gram_raw(_elemgrad_pk(profile, nparams, k), xp, yp, xn,
                       yn, pvec, with_noise=False, tile=tile,
                       interpret=interpret)
        dK = dK + Wk * dpvec[k, 0]
    if with_noise:
        n, m = K.shape
        dK = dK + dpvec[nparams, 0] * jnp.eye(n, m, dtype=K.dtype)
    return K, dK


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2, 3))
def _gram_sym_d(profile, tile, interpret, with_noise, xp, pvec):
    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)
    return _gram_sym_raw(profile, xp, xn, pvec, with_noise=with_noise,
                         tile=tile, interpret=interpret)


@_gram_sym_d.defjvp
def _gram_sym_d_jvp(profile, tile, interpret, with_noise, primals,
                    tangents):
    xp, pvec = primals
    dx, dpvec = tangents
    nparams = pvec.shape[0] - 1
    K = _gram_sym_d(profile, tile, interpret, with_noise, xp, pvec)

    xn = jnp.sum(xp * xp, axis=-1, keepdims=True)
    Wr = _gram_sym_raw(_elemgrad_r2(profile, nparams), xp, xn, pvec,
                       with_noise=False, tile=tile, interpret=interpret)
    if xp.shape[1] == 1:
        # p = 1: exact outer differences (see _gram_d_jvp)
        dr2 = 2 * (xp[:, :1] - xp[:, :1].T) * (dx[:, :1] - dx[:, :1].T)
    else:
        xdx = jnp.sum(xp * dx, axis=-1, keepdims=True)
        dr2 = 2 * (xdx + xdx.T - xp @ dx.T - dx @ xp.T)
    dK = Wr * dr2
    for k in range(nparams):
        Wk = _gram_sym_raw(_elemgrad_pk(profile, nparams, k), xp, xn,
                           pvec, with_noise=False, tile=tile,
                           interpret=interpret)
        dK = dK + Wk * dpvec[k, 0]
    if with_noise:
        dK = dK + dpvec[nparams, 0] * jnp.eye(K.shape[0], dtype=K.dtype)
    return K, dK


# -- public API ---------------------------------------------------------------

def _prep(x):
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    dtype = jnp.result_type(x.dtype, jnp.float32)
    return x, dtype


def gram(profile, x, y=None, *, params=(), noise=None, tile=256,
         interpret=None):
    """Tiled Gram matrix K[i, j] = profile(‖x_i − y_j‖², *params)
    (+ noise·I).

    Parameters
    ----------
    profile : callable
        Scalar isotropic profile ``g(r², *params)``, traced inside the
        kernel.  Must be a *pure* function: traced hyperparameters go
        in ``params``, never in the closure.
    x, y : (n, p), (m, p) arrays
        Input points (y defaults to x).  1D inputs are treated as p=1.
    params : tuple of scalars
        Extra profile arguments, passed to the kernel through memory
        (may be traced values); differentiable.
    noise : scalar, optional
        Diagonal nugget fused into the kernel; differentiable.
    tile : int
        Tile size (multiples of 128 for MXU alignment).
    interpret : bool, optional
        Force Pallas interpreter mode (defaults to True off-TPU).
    """
    if y is None:
        y = x
    x, dtype = _prep(x)
    y, _ = _prep(y)
    n, p = x.shape
    m, _ = y.shape
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    xp = _pad_points(x, tile, dtype)
    yp = _pad_points(y, tile, dtype)
    pvec = _paramvec(params, noise, dtype)
    out = _gram_d(profile, tile, interpret, noise is not None,
                  xp, yp, pvec)
    return out[:n, :m]


def gram_sym(profile, x, *, params=(), noise=None, tile=256,
             interpret=None):
    """Symmetric Gram matrix exploiting K = K': only the
    ntiles(ntiles+1)/2 upper-triangle tiles are evaluated
    (scalar-prefetched (i, j) tile list), then mirrored — half the
    profile evaluations of `gram`.  See `gram` for arguments."""
    x, dtype = _prep(x)
    n, p = x.shape
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    xp = _pad_points(x, tile, dtype)
    pvec = _paramvec(params, noise, dtype)
    out = _gram_sym_d(profile, tile, interpret, noise is not None,
                      xp, pvec)
    return out[:n, :n]
