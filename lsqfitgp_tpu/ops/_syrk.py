"""Pallas lower-trapezoid symmetric-update kernels (TPU syrk).

XLA has no syrk primitive: ``jnp.dot(A, A.T)`` computes the full
square, twice the MACs actually needed for a symmetric result.  The
two hot symmetric products of the framework are

- the blocked Cholesky's Schur complement ``S = B − A Aᵀ`` (the
  factorization's trailing update, ~3/4 of its FLOPs), of which the
  recursion only ever reads the lower-trapezoid tiles, and
- the marginal-likelihood reverse rule's ``K⁻¹ = Wᵀ W`` (reference
  gradrev formulas, ``_linalg/_decomp.py:441-586``), needed in full but
  reconstructible from its lower triangle by mirroring.

Both are served by one kernel: a scalar-prefetched grid over the
lower-triangle (i ≥ j) tile pairs with an inner k-loop accumulating
``A`` chunks into the resident output tile (Pallas keeps the output
block in VMEM across the k steps because its index map does not depend
on k, and skips re-fetching inputs whose block index is unchanged).
The diagonal-scaling and eps-regularization of the factorization's
strip loads are fused into the k == 0 initialization, so the scaled
matrix never hits HBM (same contract as the strip scheme's fused
reads).

Only the lower tiles of the output are ever written: the upper
triangle of the returned buffer is UNINITIALIZED and must not be read
(the factorization only touches lower panels and diagonal blocks; the
``WᵀW`` wrapper mirrors explicitly).
"""

from __future__ import annotations

import functools

import jax
import numpy
from jax import lax
from jax import numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['schur_update', 'syrk_t_full']


def _dot_prec(a, b, dnums, precision, out_dtype):
    """dot_general with Mosaic-safe precision: the TPU kernel lowerer
    rejects ``Precision.HIGH``, so the bf16_3x decomposition it stands
    for (XLA's f32 = hi + lo bf16 split, dropping the lo·lo term) is
    spelled out manually; DEFAULT/HIGHEST lower natively."""
    if precision == lax.Precision.HIGH and a.dtype == jnp.float32:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return lax.dot_general(
                x, y, dnums, preferred_element_type=out_dtype)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return lax.dot_general(a, b, dnums, precision=precision,
                           preferred_element_type=out_dtype)


def _schur_kernel(ijk_ref, b_ref, sr_ref, sc_ref, e_ref, ai_ref,
                  aj_ref, o_ref, *, precision, tile, rtile, with_b,
                  with_scale, with_eps, nreal):
    p = pl.program_id(0)

    @pl.when(ijk_ref[3, p] == 1)
    def init():
        if with_b:
            t = b_ref[...]
            if with_scale:
                t = t * sr_ref[...] * sc_ref[...].T
        else:
            t = jnp.zeros_like(o_ref)
        if with_eps:
            i = ijk_ref[0, p]
            j = ijk_ref[1, p]
            rows = lax.broadcasted_iota(jnp.int32, (rtile, tile), 0) \
                + i * rtile
            cols = lax.broadcasted_iota(jnp.int32, (rtile, tile), 1) \
                + j * tile
            ondiag = rows == cols
            if nreal is not None:
                # eps only on the REAL diagonal: identity padding must
                # stay exactly 1 (log 1 = 0 in the logdet)
                ondiag = ondiag & (rows < nreal)
            t = jnp.where(ondiag, t + e_ref[0, 0], t)
        o_ref[...] = t

    acc = _dot_prec(ai_ref[...], aj_ref[...], (((1,), (1,)), ((), ())),
                    precision, o_ref.dtype)
    o_ref[...] = o_ref[...] - acc


def _as_precision(precision):
    if precision is None:
        return lax.Precision.DEFAULT
    if isinstance(precision, str):
        return dict(
            default=lax.Precision.DEFAULT,
            high=lax.Precision.HIGH,
            highest=lax.Precision.HIGHEST,
        )[precision]
    return precision


def schur_update(B, A, *, s=None, eps=None, size=None, offset=0,
                 tile=512, kchunk=512, rows=1, precision=None,
                 interpret=None, nreal=None):
    """Lower-trapezoid tiles of ``S = diag(s) B diag(s) + eps I − A Aᵀ``
    where B is the ``(size, size)`` sub-square of a larger array at
    ``(offset, offset)`` — the view is taken through the kernel's index
    maps, so the slice is never materialized.

    B : (mb, mb) with mb >= offset + size, or None (treated as zero)
    A : (size, h); h must be a multiple of ``tile``
    s : (mb,) or None — symmetric diagonal scaling fused into the load
    eps : scalar or None — diagonal shift fused into the load
    size, offset : view geometry; both multiples of ``tile``
    (offset defaults to 0, size to A.shape[0]).
    nreal : optional GLOBAL index bound; eps is applied only to
    diagonal entries with global index < nreal, so an identity-padded
    tail stays exactly 1 (its pivots contribute log 1 = 0).

    ``kchunk`` defaults to 512: at HIGH precision the in-kernel bf16_3x
    split holds 4 bf16 chunk copies + 3 f32 partials in VMEM, and a
    1024-wide chunk put the kernel's scoped working set at 20.2M > the
    16M VMEM budget (compile-time OOM on v5e).

    ``rows`` (1 or 2): output macro-tile height in units of ``tile``.
    ``rows=2`` raises the kernel's arithmetic intensity from tile·3/8 =
    192 to 256 MACs/byte (past the v5e compute/DMA balance of ~240),
    at the cost of computing the tiles just above the diagonal inside
    each macro-row (~3% extra MACs); requires size and offset to be
    multiples of ``rows * tile`` and is paired with a smaller kchunk
    to stay inside VMEM.

    Returns (size, size) with only the i >= j tiles written; the strict
    upper tiles are uninitialized memory — callers must never read them.
    """
    m, h = A.shape
    if size is None:
        size = m
    assert size == m, (size, m)
    assert size % tile == 0 and offset % tile == 0, (size, offset, tile)
    nt = size // tile
    ot = offset // tile
    dtype = A.dtype
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    emulate = interpret == 'pallas'  # run the real kernel, emulated
    if interpret and not emulate:
        # reference semantics for tests / non-TPU backends: full
        # computation, upper triangle zeroed to mimic "unwritten"
        S = -jnp.dot(A, A.T, precision=_as_precision(precision))
        if B is not None:
            Bs = B[offset:offset + size, offset:offset + size]
            if s is not None:
                sl = s[offset:offset + size]
                Bs = Bs * sl[:, None] * sl[None, :]
            S = S + Bs
        if eps is not None:
            gi = offset + jnp.arange(size)
            d = jnp.where(gi < (size + offset if nreal is None
                                else nreal), eps, 0.0)
            S = S + jnp.diag(d.astype(dtype))
        keep = jnp.tril(
            jnp.ones((nt, nt), bool)
        ).repeat(tile, 0).repeat(tile, 1)
        return jnp.where(keep, S, 0)

    if h % kchunk:
        kchunk = tile
    assert h % kchunk == 0, (h, kchunk, tile)
    rtile = rows * tile
    assert size % rtile == 0 and offset % rtile == 0, \
        (size, offset, rtile)
    nrt = size // rtile
    nk = h // kchunk
    ijk = []
    for i2 in range(nrt):
        for j in range(nt):
            # include the macro-row pair iff it contains any i >= j
            # tile (the partial tiles just above the diagonal are
            # computed — they are valid values, just never read)
            if j > rows * i2 + rows - 1:
                continue
            for k in range(nk):
                ijk.append((i2, j, k, 1 if k == 0 else 0))
    ijk = numpy.array(ijk, numpy.int32).T.copy()
    with_b = B is not None
    with_scale = s is not None
    if not with_b:
        B = jnp.zeros((rtile, tile), dtype)  # dummy, never varies
        bot = 0
    else:
        bot = ot
    if s is None:
        sv = jnp.ones((rtile, 1), dtype)  # dummy, never varies
        sot = 0
    else:
        sv = jnp.asarray(s, dtype).reshape(-1, 1)
        sot = ot
    # row-axis offsets are in rtile units, column-axis in tile units
    bot2 = offset // rtile if with_b else 0
    sot2 = offset // rtile if s is not None else 0
    ev = jnp.asarray(0.0 if eps is None else eps, dtype).reshape(1, 1)

    kernel = functools.partial(
        _schur_kernel, precision=_as_precision(precision), tile=tile,
        rtile=rtile, with_b=with_b, with_scale=with_scale,
        with_eps=eps is not None,
        # kernel row/col indices are local to the (size, size) output
        nreal=None if nreal is None else nreal - offset,
    )
    from jax.experimental.pallas import tpu as pltpu
    if with_b:
        b_spec = pl.BlockSpec(
            (rtile, tile),
            lambda p, ijk: (bot2 + ijk[0, p], bot + ijk[1, p]))
    else:
        b_spec = pl.BlockSpec((rtile, tile), lambda p, ijk: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ijk.shape[1],),
        in_specs=[
            b_spec,
            pl.BlockSpec(
                (rtile, 1), lambda p, ijk: (sot2 + ijk[0, p], 0)),
            pl.BlockSpec(
                (tile, 1), lambda p, ijk: (sot + ijk[1, p], 0)),
            pl.BlockSpec((1, 1), lambda p, ijk: (0, 0)),
            pl.BlockSpec(
                (rtile, kchunk), lambda p, ijk: (ijk[0, p], ijk[2, p])),
            pl.BlockSpec(
                (tile, kchunk), lambda p, ijk: (ijk[1, p], ijk[2, p])),
        ],
        out_specs=pl.BlockSpec(
            (rtile, tile), lambda p, ijk: (ijk[0, p], ijk[1, p])),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((size, size), dtype),
        grid_spec=grid_spec,
        interpret=emulate,
    )(jnp.asarray(ijk), B, sv, sv, ev, A, A)


def _syrk_t_kernel(ijk_ref, wi_ref, wj_ref, o_ref, *, precision):
    p = pl.program_id(0)

    @pl.when(ijk_ref[3, p] == 1)
    def init():
        o_ref[...] = jnp.zeros_like(o_ref)

    acc = _dot_prec(wi_ref[...], wj_ref[...], (((0,), (0,)), ((), ())),
                    precision, o_ref.dtype)
    o_ref[...] = o_ref[...] + acc


def syrk_t_full(W, *, lower=True, tile=512, kchunk=512,
                precision=None, interpret=None):
    """Full symmetric ``Wᵀ W`` for LOWER-TRIANGULAR W, computed on the
    lower-triangle output tiles only and skipping the k-chunks that are
    identically zero above W's diagonal — ~n³/6 MACs against the full
    square's n³ (the work list is a scalar-prefetched (i, j, k, first)
    table; ``first`` marks each output tile's initialization step).
    The result is mirrored to a full symmetric matrix.

    With ``lower=False`` no chunks are skipped (dense W, ~n³/2 MACs).

    W : (h, m); both dimensions padded internally as needed.
    """
    h, m = W.shape
    dtype = W.dtype
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    emulate = interpret == 'pallas'  # run the real kernel, emulated
    prec = _as_precision(precision)
    if (interpret and not emulate) or (not emulate and m < 4096):
        # below ~4096 the full W fits scoped VMEM and XLA may try to
        # stack-allocate the custom call's buffers there (observed
        # OOM-by-84KB at n=1536); the plain dot is fine at such sizes
        return jnp.dot(W.T, W, precision=prec)

    mp = -(-m // tile) * tile
    if mp != m:
        W = jnp.concatenate([W, jnp.zeros((h, mp - m), dtype)], axis=1)
    nt = mp // tile
    hp = -(-h // kchunk) * kchunk
    if hp != h:
        W = jnp.concatenate(
            [W, jnp.zeros((hp - h, W.shape[1]), dtype)], axis=0)
    nk = hp // kchunk
    ijk = []
    for j in range(nt):
        for i in range(j, nt):
            # W_ki = 0 for k < i*tile when W is lower triangular: skip
            # those chunks entirely (but keep at least one step so the
            # output tile gets initialized)
            k0 = min(i * tile // kchunk, nk - 1) if lower else 0
            for k in range(k0, nk):
                ijk.append((i, j, k, 1 if k == k0 else 0))
    ijk = numpy.array(ijk, numpy.int32).T.copy()
    kernel = functools.partial(_syrk_t_kernel, precision=prec)
    from jax.experimental.pallas import tpu as pltpu
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ijk.shape[1],),
        in_specs=[
            pl.BlockSpec(
                (kchunk, tile), lambda p, ijk: (ijk[2, p], ijk[0, p])),
            pl.BlockSpec(
                (kchunk, tile), lambda p, ijk: (ijk[2, p], ijk[1, p])),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda p, ijk: (ijk[0, p], ijk[1, p])),
    )
    C = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, mp), dtype),
        grid_spec=grid_spec,
        interpret=emulate,
    )(jnp.asarray(ijk), W, W)
    C = C[:m, :m]
    # mirror the lower tiles; the strict-upper tiles are uninitialized.
    # tril() zeroes them; the diagonal tiles' upper halves are valid
    # (each diagonal tile was computed in full).
    Lt = jnp.tril(C)
    return Lt + Lt.T - jnp.diag(jnp.diag(Lt))


def _schur_gram_kernel(ijk_ref, xr_ref, xc_ref, xnr_ref, xnc_ref,
                       p_ref, ai_ref, aj_ref, o_ref, *, profile,
                       nparams, precision, tile, with_eps, nreal,
                       offset):
    """Gram-fused Schur update: the output tile is INITIALIZED with the
    kernel matrix computed from the point tiles (r² on the MXU + the
    profile fused in VMEM, exactly like the tiled Gram evaluator) and
    then accumulates −A Aᵀ — so the trailing matrix of the streaming
    factorization is born already Schur-updated and the Gram block
    never exists in HBM."""
    p = pl.program_id(0)

    @pl.when(ijk_ref[3, p] == 1)
    def init():
        # per-tile-pair centering: the norm expansion's absolute r2
        # error is ~eps * max|x - c|^2, so subtracting the two tiles'
        # common mean makes the error RELATIVE (~eps) for every pair
        # geometry — without it, fine spacings on wide coordinate
        # ranges lose r2 entirely (eps * |x|^2 > spacing^2)
        xt = xr_ref[...]
        yt = xc_ref[...]
        if xt.shape[1] == 1:
            # p = 1: the outer difference is EXACT in f32 — no
            # norm-expansion cancellation, so √r²-mode profiles (1-D
            # stationary kernels) keep full precision near the diagonal
            d = xt - yt.T
            r2 = d * d
        else:
            c = 0.5 * (jnp.mean(xt, axis=0, keepdims=True)
                       + jnp.mean(yt, axis=0, keepdims=True))
            xt = xt - c
            yt = yt - c
            xn = jnp.sum(xt * xt, axis=1, keepdims=True)
            yn = jnp.sum(yt * yt, axis=1, keepdims=True)
            cross = lax.dot_general(
                xt, yt.T, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.promote_types(
                    xt.dtype, jnp.float32),
            )
            r2 = xn + yn.T - 2 * cross
            r2 = jnp.maximum(r2, 0.0)
        t = profile(r2, *(p_ref[k, 0] for k in range(nparams)))
        i = ijk_ref[0, p]
        j = ijk_ref[1, p]
        # GLOBAL indices: i/j are tile positions inside the (size,
        # size) output sub-square, which sits at ``offset`` in the
        # virtual matrix — the pad masks compare against nreal in
        # global coordinates
        rows = lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile + offset
        cols = lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile + offset
        # padding tail by GLOBAL index: the virtual matrix is exactly
        # blockdiag(K, I) — no far-point pad coordinates, hence no
        # profile-decay contract, and mixed real/pad tiles stay exact
        real = (rows < nreal) & (cols < nreal)
        t = jnp.where(real, t, 0.0)
        t = jnp.where((rows == cols) & (rows >= nreal), 1.0, t)
        if with_eps:
            # eps only on the REAL diagonal (pad pivots stay exactly 1)
            t = jnp.where((rows == cols) & (rows < nreal),
                          t + p_ref[nparams, 0], t)
        o_ref[...] = t.astype(o_ref.dtype)

    acc = _dot_prec(ai_ref[...], aj_ref[...], (((1,), (1,)), ((), ())),
                    precision, o_ref.dtype)
    o_ref[...] = o_ref[...] - acc


def schur_update_gram(profile, X, xn, A, *, params=(), eps=None,
                      nreal=None, size=None, offset=0, tile=512,
                      kchunk=512, precision=None, interpret=None):
    """Lower-trapezoid tiles of
    ``S = K[off:off+size, off:off+size] + eps I − A Aᵀ`` where
    ``K[i, j] = profile(‖X_i − X_j‖², *params)`` is COMPUTED inside the
    kernel from the (pre-padded) point matrix — the Gram block never
    hits HBM.  This is what lets the streaming factorization handle
    problem sizes whose dense Gram exceeds device memory.

    X : (npad, p) padded points; xn : (npad, 1) squared norms
    A : (size, h); size/offset multiples of ``tile``
    params : profile parameters (traced OK), passed positionally
    Same uninitialized-upper-tiles contract as `schur_update`.
    """
    m, h = A.shape
    if size is None:
        size = m
    if nreal is None:
        nreal = X.shape[0]
    assert size == m and size % tile == 0 and offset % tile == 0
    nt = size // tile
    ot = offset // tile
    dtype = A.dtype
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    emulate = interpret == 'pallas'
    pvec = [jnp.asarray(v, dtype).reshape(()) for v in params]
    pvec.append(jnp.asarray(0.0 if eps is None else eps,
                            dtype).reshape(()))
    pvec = jnp.stack(pvec).reshape(-1, 1)
    nparams = pvec.shape[0] - 1
    if interpret and not emulate:
        Xs = X[offset:offset + size]
        r2 = jnp.sum(
            (Xs[:, None, :] - Xs[None, :, :]) ** 2, axis=-1)
        S = profile(r2, *(pvec[k, 0] for k in range(nparams)))
        gi = offset + jnp.arange(size)
        real = (gi[:, None] < nreal) & (gi[None, :] < nreal)
        S = jnp.where(real, S, 0.0)
        S = jnp.where((gi[:, None] == gi[None, :])
                      & (gi[:, None] >= nreal), 1.0, S)
        if eps is not None:
            S = S + jnp.diag(jnp.where(gi < nreal, pvec[nparams, 0],
                                       0.0).astype(dtype))
        S = S - jnp.dot(A, A.T, precision=_as_precision(precision))
        keep = jnp.tril(jnp.ones((nt, nt), bool)) \
            .repeat(tile, 0).repeat(tile, 1)
        return jnp.where(keep, S, 0)

    if h % kchunk:
        kchunk = tile
    assert h % kchunk == 0, (h, kchunk, tile)
    nk = h // kchunk
    npairs = nt * (nt + 1) // 2
    from jax.experimental.pallas import tpu as pltpu
    npts = X.shape[1]
    if npairs * nk <= 50000:
        # flat (4, N) (i, j, k, first) table; 1-D grid (also the path
        # the CPU-emulated tests can run: the HLO interpreter supports
        # only program_id(0) with scalar prefetch)
        ijk = []
        for j in range(nt):
            for i in range(j, nt):
                for k in range(nk):
                    ijk.append((i, j, k, 1 if k == 0 else 0))
        ijk = numpy.array(ijk, numpy.int32).T.copy()
        kernel = functools.partial(
            _schur_gram_kernel, profile=profile, nparams=nparams,
            precision=_as_precision(precision), tile=tile,
            with_eps=eps is not None, nreal=nreal, offset=offset,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ijk.shape[1],),
            in_specs=[
                pl.BlockSpec(
                    (tile, npts), lambda p, ijk: (ot + ijk[0, p], 0)),
                pl.BlockSpec(
                    (tile, npts), lambda p, ijk: (ot + ijk[1, p], 0)),
                pl.BlockSpec(
                    (tile, 1), lambda p, ijk: (ot + ijk[0, p], 0)),
                pl.BlockSpec(
                    (tile, 1), lambda p, ijk: (ot + ijk[1, p], 0)),
                pl.BlockSpec((pvec.shape[0], 1), lambda p, ijk: (0, 0)),
                pl.BlockSpec(
                    (tile, kchunk),
                    lambda p, ijk: (ijk[0, p], ijk[2, p])),
                pl.BlockSpec(
                    (tile, kchunk),
                    lambda p, ijk: (ijk[1, p], ijk[2, p])),
            ],
            out_specs=pl.BlockSpec(
                (tile, tile), lambda p, ijk: (ijk[0, p], ijk[1, p])),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((size, size), dtype),
            grid_spec=grid_spec,
            interpret=emulate,
        )(jnp.asarray(ijk), X, X, xn, xn, pvec, A, A)
    # huge grids: (2, npairs) pair table + the k axis on the grid (the
    # flat table would exceed the 1 MB SMEM)
    ij = numpy.array(
        [(i, j) for j in range(nt) for i in range(j, nt)],
        numpy.int32).T.copy()
    kernel = functools.partial(
        _schur_gram_kernel2, profile=profile, nparams=nparams,
        precision=_as_precision(precision), tile=tile,
        with_eps=eps is not None, nreal=nreal, offset=offset,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ij.shape[1], nk),
        in_specs=[
            pl.BlockSpec(
                (tile, npts), lambda p, k, ij: (ot + ij[0, p], 0)),
            pl.BlockSpec(
                (tile, npts), lambda p, k, ij: (ot + ij[1, p], 0)),
            pl.BlockSpec(
                (tile, 1), lambda p, k, ij: (ot + ij[0, p], 0)),
            pl.BlockSpec(
                (tile, 1), lambda p, k, ij: (ot + ij[1, p], 0)),
            pl.BlockSpec((pvec.shape[0], 1), lambda p, k, ij: (0, 0)),
            pl.BlockSpec(
                (tile, kchunk), lambda p, k, ij: (ij[0, p], k)),
            pl.BlockSpec(
                (tile, kchunk), lambda p, k, ij: (ij[1, p], k)),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda p, k, ij: (ij[0, p], ij[1, p])),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((size, size), dtype),
        grid_spec=grid_spec,
        interpret=emulate,
    )(jnp.asarray(ij), X, X, xn, xn, pvec, A, A)


def _schur_gram_kernel2(ij_ref, xr_ref, xc_ref, xnr_ref, xnc_ref,
                        p_ref, ai_ref, aj_ref, o_ref, *, profile,
                        nparams, precision, tile, with_eps, nreal,
                        offset):
    """2-D-grid variant of `_schur_gram_kernel` (pairs x k-steps): the
    k index comes from the grid instead of the work table, so the
    prefetched table is (2, npairs) — at n=65536 the flat (4, N)
    (i, j, k, first) table is 2.1 MB > the 1 MB SMEM."""
    p = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def init():
        # per-tile-pair centering (see _schur_gram_kernel); p = 1 takes
        # the exact outer difference instead
        xt = xr_ref[...]
        yt = xc_ref[...]
        if xt.shape[1] == 1:
            d = xt - yt.T
            r2 = d * d
        else:
            c = 0.5 * (jnp.mean(xt, axis=0, keepdims=True)
                       + jnp.mean(yt, axis=0, keepdims=True))
            xt = xt - c
            yt = yt - c
            xn = jnp.sum(xt * xt, axis=1, keepdims=True)
            yn = jnp.sum(yt * yt, axis=1, keepdims=True)
            cross = lax.dot_general(
                xt, yt.T, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.promote_types(
                    xt.dtype, jnp.float32),
            )
            r2 = xn + yn.T - 2 * cross
            r2 = jnp.maximum(r2, 0.0)
        t = profile(r2, *(p_ref[q, 0] for q in range(nparams)))
        i = ij_ref[0, p]
        j = ij_ref[1, p]
        # global coordinates (see _schur_gram_kernel)
        rows = lax.broadcasted_iota(jnp.int32, (tile, tile), 0) \
            + i * tile + offset
        cols = lax.broadcasted_iota(jnp.int32, (tile, tile), 1) \
            + j * tile + offset
        real = (rows < nreal) & (cols < nreal)
        t = jnp.where(real, t, 0.0)
        t = jnp.where((rows == cols) & (rows >= nreal), 1.0, t)
        if with_eps:
            t = jnp.where((rows == cols) & (rows < nreal),
                          t + p_ref[nparams, 0], t)
        o_ref[...] = t.astype(o_ref.dtype)

    acc = _dot_prec(ai_ref[...], aj_ref[...], (((1,), (1,)), ((), ())),
                    precision, o_ref.dtype)
    o_ref[...] = o_ref[...] - acc
