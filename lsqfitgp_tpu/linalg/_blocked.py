"""Blocked right-looking Cholesky factorization and triangular solves,
designed for the TPU MXU.

Why this exists (measured on v5e, fp32, n=8192; see docs/perf.md):

- ``lax.linalg.cholesky`` runs at ~14 TFLOP/s (a sequential XLA While
  at fixed internal precision).
- MXU matmuls at ``Precision.HIGH`` (bf16_3x passes, ~1e-6 relative
  error — far below the ``n·eps``-scaled regularization Chol applies)
  run at ~63 TFLOP/s.

So the factorization is re-organized so ~all FLOPs are MXU matmuls:
a right-looking panel algorithm over *column strips* (each strip holds
only the lower trapezoid of one block column, so trailing updates touch
exactly the lower triangle and the functional updates never copy the
full matrix), with the small diagonal blocks factored by
``lax.linalg.cholesky`` at a size where it is cheap (~12 us at 128) and
their inverses assembled by block 2x2 inversion so panel solves become
matmuls.  Measured ~28 TFLOP/s at n=8192 (~2x XLA chol, ~58% of the
fp32-equivalent MXU peak).

Reference semantics counterpart: ``src/lsqfitgp/_linalg/_decomp.py:376-439``
(Chol); the blocked algorithm itself is the classic LAPACK/ScaLAPACK
right-looking scheme re-expressed for XLA (static shapes, unrolled
panels, functional buffers).

Everything here is plain JAX (works on any backend and dtype; the
``precision`` argument only affects TPU matmuls).  The factorization is
exposed through :func:`cholesky`, a ``custom_jvp`` whose tangent rule
``dL = L Phi(L^-1 dK L^-T)`` is linear in ``dK`` and built from
transposable ops, so both forward- and reverse-mode AD work without
saving the unrolled factorization graph.
"""

from __future__ import annotations

import functools

import jax
import numpy
from jax import lax
from jax import numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    'chol_factor', 'cholesky_blocked', 'diag_block_inverses',
    'solve_lower', 'solve_lower_t',
]


def _precision(precision):
    if precision is None:
        return lax.Precision.HIGH
    if isinstance(precision, str):
        return dict(
            default=lax.Precision.DEFAULT,
            high=lax.Precision.HIGH,
            highest=lax.Precision.HIGHEST,
        )[precision]
    return precision


_LIFT = 1024  # self-healing diagonal lift, in units of eps * matrix scale

# above this size the adaptive two-pass precision ladder (HIGH probe +
# HIGHEST refactorization under lax.cond) is replaced by a single
# HIGH-precision pass with self-healing lifts: the cond keeps BOTH
# branches' factor buffers live, and at n=32768 (f32) that is the
# difference between ~11 GB peak (fits a 16 GB chip with headroom) and
# OOM.  Degradations that the HIGHEST rung would have resolved are
# still detected by Chol's probe/conditioning diagnostics.
_ADAPTIVE_MAX = 24576


def _chol_lifted(D, bump):
    """Cholesky of a block with self-healing diagonal lifting.

    ``lax.linalg.cholesky`` returns NaNs when the block is (numerically)
    indefinite — which with a tiny global regularization can happen to a
    trailing block through accumulated roundoff.  Instead of paying a
    large *global* eps up front (which at fp32 distorts well-posed
    models: n*eps32 at n=1500 exceeds a 1% noise level ~9x and flips
    marginal-likelihood gradients, measured), the block refactors itself
    with a ``bump`` diagonal shift only when the first attempt failed.
    ``bump`` must be sized by the *original* matrix scale (trailing
    Schur complements of near-singular matrices have decayed row sums,
    so a block-local scale is too small to heal accumulated cross-block
    roundoff); ``bump is True`` derives it from this block (the
    unblocked/global case).  The result is a factorization of K + dD
    with dD a nonnegative diagonal supported only on the blocks that
    actually needed it — the XLA-static analog of LAPACK's pivoted
    perturbation strategies.  Cost: one extra cholesky of the same
    block (~12 us at 128), branch-free.
    """
    L = lax.linalg.cholesky(D)
    if bump is None:
        return L
    if bump is True:
        eps = jnp.finfo(D.dtype).eps
        bump = _LIFT * eps * jnp.max(jnp.sum(jnp.abs(D), axis=1))
    bad = jnp.any(jnp.isnan(L))
    D2 = D + jnp.where(bad, bump, 0) * jnp.eye(D.shape[0], dtype=D.dtype)
    return jnp.where(bad, lax.linalg.cholesky(D2), L)


def _factor_diag(D, b1, precision, bump=None):
    """Cholesky + inverse of a small PSD diagonal block.

    Recursive 2x2 block scheme: the base case (b1 x b1, default 128)
    uses ``lax.linalg.cholesky`` (with self-healing lifting, see
    ``_chol_lifted``) + ``solve_triangular`` (both cheap at this size);
    larger blocks are assembled with MXU matmuls.  Returns (L, Linv),
    both lower triangular.
    """
    b = D.shape[0]
    if b <= b1:
        L = _chol_lifted(D, bump)
        Linv = solve_triangular(L, jnp.eye(b, dtype=D.dtype), lower=True)
        return L, Linv
    h = b // 2
    L11, I11 = _factor_diag(D[:h, :h], b1, precision, bump)
    P = jnp.dot(D[h:, :h], I11.T, precision=precision)
    S = D[h:, h:] - jnp.dot(P, P.T, precision=precision)
    L22, I22 = _factor_diag(S, b1, precision, bump)
    Z = jnp.zeros((h, b - h), D.dtype)
    L = jnp.block([[L11, Z], [P, L22]])
    I21 = -jnp.dot(jnp.dot(I22, P, precision=precision), I11,
                   precision=precision)
    Linv = jnp.block([[I11, Z], [I21, I22]])
    return L, Linv


def _pad_spd(K, nb):
    """Pad K to (nb, nb) with an identity tail (block-diagonal, so the
    factor of the padded matrix is blockdiag(L, I))."""
    n = K.shape[0]
    if nb == n:
        return K
    p = nb - n
    Z = jnp.zeros((n, p), K.dtype)
    return jnp.block([[K, Z], [Z.T, jnp.eye(p, dtype=K.dtype)]])


def _make_read(K, s, eps, n):
    """Block-read closure over the UNMATERIALIZED scaled, regularized,
    identity-padded matrix: entry (i, j) is

        s_i K_ij s_j  +  eps·[i == j < n]  +  [i == j >= n]

    (``s=None`` skips scaling, ``eps=None`` skips regularization).  The
    recursive factorization first-touches every entry of K exactly once,
    so routing those touches through this closure fuses scaling + eps +
    padding into the reads — the scaled matrix never hits HBM."""

    def read(r0, c0, h, w):
        rr = max(0, min(h, n - r0))
        cc = max(0, min(w, n - c0))
        A = K[r0:r0 + rr, c0:c0 + cc]
        if s is not None:
            A = A * s[r0:r0 + rr, None] * s[None, c0:c0 + cc]
        if rr < h or cc < w:
            A = jnp.pad(A, ((0, h - rr), (0, w - cc)))
        if r0 == c0:
            gi = r0 + jnp.arange(h)
            e = jnp.asarray(0.0 if eps is None else eps, K.dtype)
            d = jnp.where(gi < n, e, jnp.asarray(1.0, K.dtype))
            A = A + jnp.diag(d)
        return A

    return read


def _chol_rec_tree(read, o, kb, block, b1, precision, bump):
    """Recursive (cache-oblivious) Cholesky over a kb x kb block grid
    starting at global offset ``o`` (in scalars).

    Splits the matrix 2x2 at the half-way block boundary: factor the
    leading half, solve the panel against it (one recursion of
    matmul-based substitutions), form the Schur complement with a single
    large matmul, recurse on it.  Unlike the unrolled strip scheme the
    program size is O(kb) leaves + O(kb log kb) matmuls — so n=32768
    compiles in seconds where the strip scheme's O(kb²) graph exceeds
    the compiler — while the FLOP count is exactly the optimal n³/3:
    each trailing update is computed once, at the unique recursion level
    where its rows and columns first split apart.  All heavy ops are
    half-size MXU matmuls.

    The factor is returned as a TREE, not a dense matrix: a leaf is the
    (block, block) diagonal factor, a node is ``(P, t11, t22)`` with
    ``P`` the (w, h) sub-diagonal panel.  The tree holds exactly the
    lower trapezoid (n²/2 floats) and skips the per-level ``jnp.block``
    copies (n² log nb extra HBM traffic, measured ~15% of the pipeline
    at n=16384); :func:`_tree_assemble` densifies it in one concat pass.

    Returns (tree, [leaf Dinv list in diagonal order]).
    """
    if kb == 1:
        L, Linv = _factor_diag(read(o, o, block, block), b1, precision,
                               bump)
        return L, [Linv]
    hb = (kb + 1) // 2
    h = hb * block
    w = (kb - hb) * block
    t11, d1 = _chol_rec_tree(read, o, hb, block, b1, precision, bump)
    A21 = read(o + h, o, w, h)
    P = _tree_solve_right_t(A21, t11, d1, block, precision)
    S = read(o + h, o + h, w, w) - jnp.dot(P, P.T, precision=precision)
    base = o + h
    readS = lambda r, c, hh, ww: \
        S[r - base:r - base + hh, c - base:c - base + ww]
    t22, d2 = _chol_rec_tree(readS, base, kb - hb, block, b1,
                             precision, bump)
    return (P, t11, t22), d1 + d2


def _tree_solve_right_t(B, tree, dinvs, block, precision):
    """X = B L^{-T} with L the factor tree (k x k) and B (m, k), by
    recursive halving; leaf = one matmul with the precomputed leaf-block
    inverse.  (A single-buffer dynamic_update_slice formulation was
    tried and measured SLOWER — 54.4 vs 52.3 ms in the n=16384
    pipeline — because the slice reads rematerialize instead of fusing
    into the dots; the concat chain is what XLA schedules best here.)"""
    if not isinstance(tree, tuple):
        return jnp.dot(B, dinvs[0].T, precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    hb = h // block
    X1 = _tree_solve_right_t(B[:, :h], t11, dinvs[:hb], block,
                             precision)
    B2 = B[:, h:] - jnp.dot(X1, P.T, precision=precision)
    X2 = _tree_solve_right_t(B2, t22, dinvs[hb:], block, precision)
    return jnp.concatenate([X1, X2], axis=1)


def _tree_assemble(tree, n, block):
    """Dense lower factor (cropped to (n, n)) from a factor tree.

    Each tree piece is written once into ONE zero-initialized buffer
    with ``dynamic_update_slice`` — XLA performs these as in-place
    writes on the unique live buffer.  The earlier concatenation
    formulation kept the per-level concat partials alive
    simultaneously (measured: a 4+2+1+0.5 GB temp chain at n=32768 —
    the difference between fitting in 16 GB HBM and OOM)."""
    if not isinstance(tree, tuple):
        return tree[:n, :n]
    P, _, _ = tree
    npad = P.shape[0] + P.shape[1]
    L = jnp.zeros((npad, npad), P.dtype)

    def place(L, tree, o):
        if not isinstance(tree, tuple):
            return lax.dynamic_update_slice(L, tree, (o, o))
        P, t11, t22 = tree
        h = P.shape[1]
        L = place(L, t11, o)
        L = lax.dynamic_update_slice(L, P, (o + h, o))
        return place(L, t22, o + h)

    return place(L, tree, 0)[:n, :n]


def _view_block(M, s, eps, base, r0, c0, h, w, nreal=None):
    """Materialize one (h, w) block of the virtual matrix
    ``diag(s) M diag(s) + eps I`` whose (0, 0) sits at global offset
    ``base`` inside M; (r0, c0) are global coordinates.  ``eps`` is
    applied only to diagonal entries with global index < ``nreal``
    (identity-pad pivots must stay exactly 1, so they contribute
    log 1 = 0 to the logdet — same semantics as ``_make_read``)."""
    A = M[r0 - base:r0 - base + h, c0 - base:c0 - base + w]
    if s is not None:
        A = A * s[r0:r0 + h, None] * s[None, c0:c0 + w]
    if eps is not None and r0 == c0:
        if nreal is None:
            d = jnp.full(h, eps, A.dtype)
        else:
            gi = r0 + jnp.arange(h)
            d = jnp.where(gi < nreal, eps, 0.0).astype(A.dtype)
        A = A + jnp.diag(d)
    return A


def _chol_rec_tree_pallas(M, s, eps, base, o, kb, block, b1, precision,
                          bump, interpret=False, nreal=None):
    """`_chol_rec_tree` with the Schur complement computed by the
    Pallas lower-trapezoid syrk kernel (:mod:`lsqfitgp_tpu.ops._syrk`)
    instead of a full-square ``jnp.dot(P, P.T)``.

    The recursion only ever reads diagonal blocks and sub-diagonal
    panels of each Schur complement, so computing just its i >= j tiles
    is sound — and cuts the factorization's total MAC count from ~n³/4
    (full-square trailing updates at every level) to the optimal n³/6.
    The scaling/eps fusion of `_make_read` moves into the kernel's
    k == 0 tile initialization; the strict-upper tiles of each S buffer
    are uninitialized memory that no reader touches.

    Requires M pre-padded to a block multiple (``s`` extended with
    ones); TPU only.
    """
    if kb == 1:
        D = _view_block(M, s, eps, base, o, o, block, block, nreal)
        L, Linv = _factor_diag(D, b1, precision, bump)
        return L, [Linv]
    hb = (kb + 1) // 2
    h = hb * block
    w = (kb - hb) * block
    t11, d1 = _chol_rec_tree_pallas(M, s, eps, base, o, hb, block, b1,
                                    precision, bump, interpret, nreal)
    A21 = _view_block(M, s, None, base, o + h, o, w, h)
    P = _tree_solve_right_t(A21, t11, d1, block, precision)
    if w < 4096 and interpret is False:
        # small trailing blocks: the full-square update wastes ~3% of
        # the total MACs at n=16384, and keeping every Pallas output
        # >= 64 MB (far above VMEM) avoids XLA stack-placing the
        # custom-call buffers in scoped vmem (observed: a (2048, 2048)
        # output inside a cond branch scoped-allocated at 20.2M > 16M)
        S = _view_block(M, s, eps, base, o + h, o + h, w, w, nreal) \
            - jnp.dot(P, P.T, precision=precision)
    else:
        from ..ops import _syrk
        # rows=1, kchunk=512 measured best at w=h=8192 on v5e: 51.8
        # TFLOP/s vs 48.8 for (rows=2, kchunk=256) macro-tiles — the
        # single-tile kernel already overlaps DMA with the bf16_3x
        # dots well enough that the higher arithmetic intensity of
        # macro-tiles doesn't pay for the halved k-chunks, and
        # (rows=2, kchunk=512) exceeds the 16M VMEM budget
        S = _syrk.schur_update(
            M, P, s=s, eps=eps, size=w, offset=o + h - base, tile=block,
            precision=precision, interpret=interpret,
            nreal=None if nreal is None else nreal - base)
    t22, d2 = _chol_rec_tree_pallas(S, None, None, o + h, o + h,
                                    kb - hb, block, b1, precision, bump,
                                    interpret,
                                    None if eps is None else nreal)
    return (P, t11, t22), d1 + d2


def _use_pallas_syrk(block):
    return jax.default_backend() == 'tpu' and block % 128 == 0


def _chol_tree_impl(K, s, eps, block, b1, prec, lift):
    """(tree, [Dinv list]) of diag(s) K diag(s) + eps I (``s``/``eps``
    None to skip), scaling/eps/padding fused into the first-touch reads."""
    precision_ = _precision(prec)
    n = K.shape[0]
    nb = -(-n // block)
    bump = None
    if lift:
        if s is None:
            bump = _LIFT * jnp.finfo(K.dtype).eps \
                * jnp.max(jnp.sum(jnp.abs(K), axis=1))
        else:
            bump = _LIFT * jnp.finfo(K.dtype).eps \
                * jnp.max(s * (jnp.abs(K) @ s))
    if _use_pallas_syrk(block):
        npad = nb * block
        Kp = _pad_spd(K, npad)
        sp = s
        if s is not None and npad != n:
            sp = jnp.concatenate(
                [s, jnp.ones(npad - n, K.dtype)])
        return _chol_rec_tree_pallas(Kp, sp, eps, 0, 0, nb, block, b1,
                                     precision_, bump, nreal=n)
    read = _make_read(K, s, eps, n)
    return _chol_rec_tree(read, 0, nb, block, b1, precision_, bump)


def _chol_factor_rec(K, s, eps, block, b1, precision, heal=True):
    """Recursive-scheme driver shared by `chol_factor` (s=eps=None) and
    `chol_factor_scaled`: adaptive-precision cond over the (compact)
    factor TREE, densification outside the cond — so the cond's live set
    is K + two lower trapezoids, not two dense factors.

    ``heal=False`` disables the self-healing diagonal lift in the
    HIGHEST fallback, so a genuinely singular matrix comes back
    non-finite instead of silently lift-bumped — the caller
    (``Chol``'s 'auto'-eps ladder) then escalates to a larger eps,
    which distorts ~30x less than the per-block lift bumps."""
    n = K.shape[0]
    if precision is not None:
        tree, dinvs = _chol_tree_impl(K, s, eps, block, b1, precision,
                                      heal)
        Dinv = jnp.stack(dinvs)
    else:
        t1, d1 = _chol_tree_impl(K, s, eps, block, b1, 'high', False)
        D1 = jnp.stack(d1)
        ok = jnp.all(jnp.isfinite(D1))

        def slow(_):
            t2, d2 = _chol_tree_impl(K, s, eps, block, b1, 'highest',
                                     heal)
            return t2, jnp.stack(d2)

        tree, Dinv = lax.cond(ok, lambda _: (t1, D1), slow, None)
    L = _tree_assemble(tree, n, block)
    return L, Dinv


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5))
def chol_factor_scaled_ladder(K, s, eps, eps2, block=512, b1=128):
    """The f32 'auto' three-rung factorization of
    ``diag(s) K diag(s) + eps I`` with ONE ``lax.cond`` on the common
    path (recursive scheme only):

    1. HIGH precision (bf16_3x), tiny ``eps``, no self-healing lift;
    2. on non-finite: HIGHEST (f32-grade), same ``eps``, no lift;
    3. on non-finite again: HIGHEST, bound-scaled ``eps2``, lift on.

    Rungs 2-3 are NESTED inside rung 1's fallback branch, so the
    well-posed common case pays a single cond.  The previous layout ran
    the rung-1/2 cond inside ``chol_factor_scaled`` and the rung-3 cond
    in ``Chol``, stacking two conds on every factorization — measured
    ~3 ms of branch-buffer traffic each at n=16384 on v5e.

    Returns ``(L, Dinv, eps_used, escalated)``; ``escalated`` is True
    when rung 3 (the large eps2) was used.

    A ``custom_jvp`` supplies the analytic tangent
    ``dL = L Φ(L⁻¹ dK_s L⁻ᵀ)`` computed from the FINAL (finite) factor,
    so AD never descends into the rung graph — without it, a failed
    rung's NaN primals poison reverse-mode cotangents even though the
    escalation ``lax.cond`` picked a finite branch (round-3 finding:
    ``jax.grad`` of the unfused f32 density returned NaN exactly when
    the ladder escalated, while the fused ``chol_nll`` — whose rule
    also reads only the final factor — stayed finite).
    """
    n = K.shape[0]
    eps = jnp.asarray(eps, K.dtype)
    eps2 = jnp.asarray(eps2, K.dtype)

    t1, d1 = _chol_tree_impl(K, s, eps, block, b1, 'high', False)
    D1 = jnp.stack(d1)
    ok1 = jnp.all(jnp.isfinite(D1))

    def fallback(_):
        t2, d2 = _chol_tree_impl(K, s, eps, block, b1, 'highest',
                                 False)
        D2 = jnp.stack(d2)
        ok2 = jnp.all(jnp.isfinite(D2))

        def rung3(_):
            t3, d3 = _chol_tree_impl(K, s, eps2, block, b1, 'highest',
                                     True)
            return t3, jnp.stack(d3), eps2, jnp.asarray(True)

        return lax.cond(
            ok2, lambda _: (t2, D2, eps, jnp.asarray(False)), rung3,
            None)

    tree, Dinv, eps_used, escalated = lax.cond(
        ok1, lambda _: (t1, D1, eps, jnp.asarray(False)), fallback,
        None)
    L = _tree_assemble(tree, n, block)
    return L, Dinv, eps_used, escalated


@chol_factor_scaled_ladder.defjvp
def _chol_factor_scaled_ladder_jvp(block, b1, primals, tangents):
    K, s, eps, eps2 = primals
    dK, ds, deps, deps2 = tangents
    L, Dinv, eps_used, escalated = chol_factor_scaled_ladder(
        K, s, eps, eps2, block, b1)
    # eps_used is literally eps or eps2, so its tangent follows the
    # same selection; the factored matrix's tangent uses it on the
    # diagonal
    deps_used = jnp.where(escalated, deps2, deps)
    dKs = dK * s[:, None] * s[None, :] \
        + K * (ds[:, None] * s[None, :] + s[:, None] * ds[None, :]) \
        + deps_used * jnp.eye(K.shape[0], dtype=K.dtype)
    dL, dDinv = _factor_tangent(L, Dinv, dKs, block, None)
    descalated = numpy.zeros(escalated.shape, jax.dtypes.float0)
    return (L, Dinv, eps_used, escalated), \
        (dL, dDinv, deps_used, descalated)


def _cholesky_impl(K, block, b1, precision, lift=True, scheme='square'):
    precision = _precision(precision)
    n = K.shape[0]
    nb = -(-n // block) * block
    Kp = _pad_spd(K, nb)
    nstrips = nb // block
    # global matrix scale for the self-healing lift (see _chol_lifted)
    bump = None
    if lift:
        bump = _LIFT * jnp.finfo(K.dtype).eps \
            * jnp.max(jnp.sum(jnp.abs(K), axis=1))
    if scheme == 'square':
        return _chol_square(Kp, n, nstrips, block, b1, precision, bump)
    return _chol_strips(Kp, n, nstrips, block, b1, precision, bump)


def _chol_square(Kp, n, nstrips, block, b1, precision, bump):
    """Right-looking with a FULL square trailing update per panel:
    one (m, B) @ (B, m) MXU matmul instead of the strip scheme's
    nstrips-k small ones.  2x the strictly-necessary trailing FLOPs
    (the upper half of the update is computed and discarded) against
    fewer, larger dispatches.  Measured SLOWER than strips on v5e
    (16.8 vs 19.2 TFLOP/s at n=8192): the strip matmuls already run at
    MXU rate, so the extra FLOPs dominate.  Kept as an option."""
    T = Kp
    cols = []
    Dinvs = []
    dtype = Kp.dtype
    nb = nstrips * block
    for k in range(nstrips):
        Lkk, Dinv = _factor_diag(T[:block, :block], b1, precision, bump)
        Dinvs.append(Dinv)
        panel = jnp.dot(T[block:, :block], Dinv.T, precision=precision)
        colk = jnp.concatenate(
            [jnp.zeros((k * block, block), dtype), Lkk, panel]
        ) if k else jnp.concatenate([Lkk, panel])
        cols.append(colk)
        if k + 1 < nstrips:
            T = T[block:, block:] - jnp.dot(panel, panel.T,
                                            precision=precision)
    L = jnp.concatenate(cols, axis=1)
    return L[:n, :n], jnp.stack(Dinvs)


def _chol_strips(Kp, n, nstrips, block, b1, precision, bump, sp=None,
                 eps=None):
    """Right-looking over lower-trapezoid column strips: touches only
    the lower triangle (half the trailing FLOPs of `_chol_square`, at
    the cost of many small update matmuls).  The default everywhere
    (see _pick_scheme).

    ``sp``/``eps``: optional diagonal scaling s (padded) and diagonal
    regularization applied LAZILY as each strip is first read — the
    scaled matrix ``s Kp s' + eps I`` is never materialized (a full
    extra HBM write+read pass, ~16% of the pipeline at n=8192)."""
    if sp is None:
        strips = [
            Kp[j * block:, j * block:(j + 1) * block]
            for j in range(nstrips)
        ]
    else:
        strips = [
            Kp[j * block:, j * block:(j + 1) * block]
            * sp[j * block:, None] * sp[None, j * block:(j + 1) * block]
            for j in range(nstrips)
        ]
    if eps is not None:
        # eps only on the REAL diagonal: the identity padding must stay
        # exactly 1 (it contributes log 1 = 0 to the logdet)
        idx = jnp.arange(block)
        strips = [
            S.at[:block, :block].add(eps * jnp.diag(
                (j * block + idx < n).astype(Kp.dtype)))
            for j, S in enumerate(strips)
        ]
    Dinvs = []
    for k in range(nstrips):
        S = strips[k]
        Lkk, Dinv = _factor_diag(S[:block], b1, precision, bump)
        Dinvs.append(Dinv)
        panel = jnp.dot(S[block:], Dinv.T, precision=precision)
        strips[k] = jnp.concatenate([Lkk, panel], axis=0) \
            if panel.shape[0] else Lkk
        for j in range(k + 1, nstrips):
            off = (j - k - 1) * block
            upd = jnp.dot(panel[off:], panel[off:off + block].T,
                          precision=precision)
            strips[j] = strips[j] - upd
    # assemble the full clean lower factor
    cols = []
    for j, S in enumerate(strips):
        top = jnp.zeros((j * block, block), Kp.dtype)
        cols.append(jnp.concatenate([top, S], axis=0))
    L = jnp.concatenate(cols, axis=1)
    # the diagonal blocks from lax.linalg.cholesky are already lower
    # triangular with exact zeros above, so no tril pass is needed
    return L[:n, :n], jnp.stack(Dinvs)


def diag_block_inverses(L, block):
    """Inverses of the (block, block) diagonal blocks of lower-triangular
    L, shape (ceil(n/block), block, block); the tail block is padded with
    identity.  Used to turn the blocked substitutions into matmuls."""
    n = L.shape[0]
    nb = -(-n // block) * block
    if nb != n:
        L = _pad_spd(L, nb)  # identity tail keeps blocks invertible
    nstrips = nb // block
    D = jnp.stack([
        L[j * block:(j + 1) * block, j * block:(j + 1) * block]
        for j in range(nstrips)
    ])
    eye = jnp.eye(block, dtype=L.dtype)
    return jax.vmap(
        lambda Lb: solve_triangular(Lb, eye, lower=True)
    )(D)


def trtri_blocked(L, Dinv, block=512, precision=None):
    """W = L⁻¹ of the blocked lower factor (dense lower-triangular
    result), by recursive halving over the block grid:

        W = [ W11        0   ]      W21 = -W22 (L21 W11)
            [ W21       W22  ]

    with the stored diagonal-block inverses ``Dinv`` as recursion
    leaves, so every step is an MXU matmul and the program size is
    O(kb log kb) like the factorization itself.  Total cost n³/3 MACs
    — the classic triangular-inverse recursion (LAPACK ``trtri``),
    written into a single zero-initialized buffer with
    ``dynamic_update_slice`` so no per-level concat chain stays live.

    Used by the fused marginal-likelihood reverse rule (the reference's
    hand-derived gradrev, ``_linalg/_decomp.py:441-586``, needs
    K⁻¹ = WᵀW explicitly).
    """
    precision = _precision(precision)
    n = L.shape[0]
    nb = -(-n // block)
    npad = nb * block
    Lp = _pad_spd(L, npad) if npad != n else L
    if Dinv is None:
        Dinv = diag_block_inverses(Lp, block)

    def rec(W, o, kb):
        if kb == 1:
            return lax.dynamic_update_slice(W, Dinv[o // block], (o, o))
        hb = (kb + 1) // 2
        h = hb * block
        w = (kb - hb) * block
        W = rec(W, o, hb)
        W = rec(W, o + h, kb - hb)
        W11 = lax.dynamic_slice(W, (o, o), (h, h))
        W22 = lax.dynamic_slice(W, (o + h, o + h), (w, w))
        L21 = lax.dynamic_slice(Lp, (o + h, o), (w, h))
        W21 = -jnp.dot(W22, jnp.dot(L21, W11, precision=precision),
                       precision=precision)
        return lax.dynamic_update_slice(W, W21, (o + h, o))

    W = rec(jnp.zeros((npad, npad), L.dtype), 0, nb)
    return W[:n, :n]


def _solve_lower_scan(L, B, Dinv, block, precision):
    """X = L^{-1} B as a ``lax.scan`` over block rows: step k reads one
    (block, n) row strip of L (fused into the matmul), subtracts its
    product with the partially-filled solution (unsolved rows are
    zero), and writes the solved block with ``dynamic_update_slice``.

    O(nb) program size with O(n·m) live state — the earlier
    recursive-halving formulation materialized its L sub-slices at
    every level (~n²/2 per level × log nb levels, the difference
    between n=32768 fitting in HBM and OOM).  Linear in ``B`` with L
    and Dinv as constants, so JAX's scan transposition gives the
    reverse-mode rule with the same memory profile."""
    nb2 = L.shape[0] // block
    n = L.shape[0]
    m = B.shape[1]
    # B rides the scan as xs (scan transposition requires the LINEAR
    # variable to be an explicit scan input, not a closure constant)
    Bb = B.reshape(nb2, block, m)

    def step(X, inp):
        k, bk = inp
        c0 = k * block
        row = lax.dynamic_slice(L, (c0, 0), (block, n))
        rhs = bk - jnp.dot(row, X, precision=precision)
        xk = jnp.dot(Dinv[k], rhs, precision=precision)
        return lax.dynamic_update_slice(X, xk, (c0, 0)), None

    X, _ = lax.scan(step, jnp.zeros((n, m), B.dtype),
                    (jnp.arange(nb2), Bb))
    return X


def _solve_lower_t_scan(L, B, Dinv, block, precision):
    """X = L^{-T} B by backward block substitution under ``lax.scan``
    (same memory profile as `_solve_lower_scan`); step k reads one
    (n, block) column strip of L."""
    nb2 = L.shape[0] // block
    n = L.shape[0]
    m = B.shape[1]
    Bb = B.reshape(nb2, block, m)

    def step(X, inp):
        k, bk = inp
        c0 = k * block
        col = lax.dynamic_slice(L, (0, c0), (n, block))
        rhs = bk - jnp.dot(col.T, X, precision=precision)
        xk = jnp.dot(Dinv[k].T, rhs, precision=precision)
        return lax.dynamic_update_slice(X, xk, (c0, 0)), None

    X, _ = lax.scan(step, jnp.zeros((n, m), B.dtype),
                    (jnp.arange(nb2 - 1, -1, -1), Bb[::-1]))
    return X


def _solve_prep(L, B, block, Dinv):
    n = L.shape[0]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    if Dinv is None:
        Dinv = diag_block_inverses(L, block)
    nb = Dinv.shape[0] * block
    if nb != n:
        B = jnp.concatenate(
            [B, jnp.zeros((nb - n, B.shape[1]), B.dtype)])
        L = _pad_spd(L, nb)
    return L, B, Dinv, vec


def _solve_lower_linear(L, B, Dinv, block, precision):
    """The B-linear solve with its transpose declared explicitly:
    transpose of B ↦ L⁻¹B is ct ↦ L⁻ᵀct, i.e. the forward and backward
    block substitutions are each other's transposes — so reverse mode
    never differentiates through the scan internals."""
    from jax.custom_derivatives import linear_call
    return linear_call(
        lambda res, b: _solve_lower_scan(
            res[0], b, res[1], block, precision),
        lambda res, ct: _solve_lower_t_scan(
            res[0], ct, res[1], block, precision),
        (L, Dinv), B)


def _solve_lower_t_linear(L, B, Dinv, block, precision):
    from jax.custom_derivatives import linear_call
    return linear_call(
        lambda res, b: _solve_lower_t_scan(
            res[0], b, res[1], block, precision),
        lambda res, ct: _solve_lower_scan(
            res[0], ct, res[1], block, precision),
        (L, Dinv), B)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def _solve_lower_cjvp(L, B, Dinv, block, precision):
    return _solve_lower_linear(L, B, Dinv, block, precision)


@_solve_lower_cjvp.defjvp
def _solve_lower_jvp(block, precision, primals, tangents):
    # analytic rule dX = L⁻¹(dB − dL X): keeps L/Dinv as pure (non-
    # tangent) constants inside the scan, so reverse mode only ever
    # transposes the B-linear scan (which JAX supports); dDinv is
    # mathematically determined by dL and drops out of the formula
    L, B, Dinv = primals
    dL, dB, _ = tangents
    X = _solve_lower_cjvp(L, B, Dinv, block, precision)
    rhs = dB - jnp.dot(dL, X, precision=precision)
    dX = _solve_lower_linear(L, rhs, Dinv, block, precision)
    return X, dX


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def _solve_lower_t_cjvp(L, B, Dinv, block, precision):
    return _solve_lower_t_linear(L, B, Dinv, block, precision)


@_solve_lower_t_cjvp.defjvp
def _solve_lower_t_jvp(block, precision, primals, tangents):
    L, B, Dinv = primals
    dL, dB, _ = tangents
    X = _solve_lower_t_cjvp(L, B, Dinv, block, precision)
    rhs = dB - jnp.dot(dL.T, X, precision=precision)
    dX = _solve_lower_t_linear(L, rhs, Dinv, block, precision)
    return X, dX


def solve_lower(L, B, *, block=512, Dinv=None, precision=None):
    """X = L^-1 B by blocked forward substitution (matmul-based).

    ``L``: (n, n) lower triangular; ``B``: (n,) or (n, m).  All steps
    are static-shape matmuls (at ``precision``, default HIGH on TPU),
    using the diagonal-block inverses, so this runs at MXU rate instead
    of XLA's sequential triangular-solve loop.  Expressed as a linear
    ``lax.scan`` (O(nb) program, O(n·m) state) under a ``custom_jvp``
    with the analytic rule dX = L⁻¹(dB − dL X), so both AD modes work
    without saving per-step residuals.
    """
    precision = _precision(precision)
    n = L.shape[0]
    Lp, Bp, Dinvp, vec = _solve_prep(L, B, block, Dinv)
    X = _solve_lower_cjvp(Lp, Bp, Dinvp, block, precision)[:n]
    return X[:, 0] if vec else X


def solve_lower_t(L, B, *, block=512, Dinv=None, precision=None):
    """X = L^-T B by blocked backward substitution (matmul-based)."""
    precision = _precision(precision)
    n = L.shape[0]
    Lp, Bp, Dinvp, vec = _solve_prep(L, B, block, Dinv)
    X = _solve_lower_t_cjvp(Lp, Bp, Dinvp, block, precision)[:n]
    return X[:, 0] if vec else X


# 'auto' scheme switchover: strips up to this many rows, recursive
# above.  Measured on v5e (f32, full Chol+solve+logdet pipeline,
# uncontended, round 4): strips 8.61/17.97 TFLOP/s at n=4096/8192 vs
# rec 7.56/16.39 (+14%/+10% — the strip panels touch each trailing
# column exactly once per step, where the recursion re-reads the
# trailing matrix at every level), while at n=16384+ the strip
# scheme's O(nb²) unrolled program exceeds the compiler budget
# (round-3 finding) and rec wins outright (28 TFLOP/s at 16384,
# 39 at 32768, seconds-level compile).
_STRIPS_MAX = 8192


def _pick_scheme(scheme, n=None):
    if scheme == 'auto':
        # 'rec' (recursive halving) has the same optimal n³/3 FLOPs as
        # 'strips' but an O(nb log nb) program instead of O(nb²): it
        # compiles in seconds at n=32768 where 'strips' exceeds the
        # compiler, with bigger matmuls and ~3x less update-write HBM
        # traffic; below _STRIPS_MAX the strip scheme's once-per-column
        # trailing updates win on runtime and its program is still
        # small.  'square' kept for experimentation.
        if n is not None and n <= _STRIPS_MAX:
            return 'strips'
        return 'rec'
    return scheme


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3, 4))
def chol_factor(K, block=512, b1=128, precision=None, scheme='auto'):
    """(L, Dinv): lower Cholesky factor of PSD K plus the inverses of its
    (block, block) diagonal blocks (byproducts of the factorization, used
    to run the blocked substitutions at MXU rate).  K may be any size;
    internally padded to a multiple of ``block`` (the returned Dinv keeps
    the padded block count, matching what the solvers expect).

    ``precision=None`` (the default) is adaptive: the factorization first
    runs with HIGH-precision (bf16_3x, ~75 TFLOP/s on v5e) trailing
    updates and *no* self-healing; if any non-finite value appears —
    which is how a precision blow-up manifests on near-singular input,
    since bf16_3x error amplifies as ~1e-5 x cond(K) through the
    recursion — a ``lax.cond`` branch refactorizes at HIGHEST
    (bf16_6x, f32-grade) with self-healing diagonal lifting enabled.
    Well-posed problems pay only the fast path; checking Dinv for
    finiteness is sound because the first non-finite value always
    originates at a failed diagonal-block cholesky, which poisons that
    block's inverse.  An explicit ``precision`` disables the fallback
    (single pass at that precision, lifting enabled).
    """
    scheme = _pick_scheme(scheme, K.shape[0])
    if precision is None and K.shape[0] > _ADAPTIVE_MAX:
        precision = 'high'  # single pass + lift (see _ADAPTIVE_MAX)
    if scheme == 'rec':
        return _chol_factor_rec(K, None, None, block, b1, precision)
    if precision is not None:
        return _cholesky_impl(K, block, b1, precision, lift=True,
                              scheme=scheme)
    L1, D1 = _cholesky_impl(K, block, b1, 'high', lift=False,
                            scheme=scheme)
    ok = jnp.all(jnp.isfinite(D1))
    return jax.lax.cond(
        ok,
        lambda _: (L1, D1),
        lambda _: _cholesky_impl(K, block, b1, 'highest', lift=True,
                                 scheme=scheme),
        None,
    )


def _factor_tangent(L, Dinv, dK, block, precision):
    """(dL, dDinv) from the symmetric tangent dK of the factored matrix:
    dL = L Phi(L^-1 dK L^-T), Phi = tril with halved diagonal
    (differential of K = L L'; same rule as XLA's, computed with the
    blocked matmul solves).  Linear + transposable in dK, so reverse
    mode falls out by transposition.  dK is symmetrized first, which
    makes the transposed (reverse-mode) cotangent symmetric — the same
    convention as lax.linalg.cholesky's gradient."""
    prec = _precision(precision)
    kw = dict(block=block, Dinv=Dinv, precision=precision)
    dK = 0.5 * (dK + dK.T)
    W = solve_lower(L, dK, **kw)
    A = solve_lower(L, W.T, **kw).T
    Phi = jnp.tril(A) - 0.5 * jnp.diag(jnp.diag(A))
    dL = jnp.dot(L, Phi, precision=prec)
    # dDinv_k = -Dinv_k dL_kk Dinv_k on each diagonal block
    n = L.shape[0]
    nstrips = Dinv.shape[0]
    dLkk = []
    for k in range(nstrips):
        s = k * block
        blk = dL[s:min(s + block, n), s:min(s + block, n)]
        if blk.shape[0] < block:  # padded tail: dL of identity pad is 0
            p = block - blk.shape[0]
            blk = jnp.block([
                [blk, jnp.zeros((blk.shape[0], p), blk.dtype)],
                [jnp.zeros((p, blk.shape[0]), blk.dtype),
                 jnp.zeros((p, p), blk.dtype)],
            ])
        dLkk.append(blk)
    dLkk = jnp.stack(dLkk)
    dDinv = -jnp.einsum(
        'kab,kbc,kcd->kad', Dinv, dLkk, Dinv, precision=prec)
    return dL, dDinv


@chol_factor.defjvp
def _chol_factor_jvp(block, b1, precision, scheme, primals, tangents):
    K, = primals
    dK, = tangents
    L, Dinv = chol_factor(K, block, b1, precision, scheme)
    dL, dDinv = _factor_tangent(L, Dinv, dK, block, precision)
    return (L, Dinv), (dL, dDinv)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6, 7))
def chol_factor_scaled(K, s, eps, block=512, b1=128, precision=None,
                       scheme='auto', heal=True):
    """(L, Dinv) of ``diag(s) K diag(s) + eps I`` WITHOUT materializing
    the scaled matrix: the scaling and the diagonal regularization are
    fused into each strip's first read (saving a full n² HBM write+read
    pass — ~16% of the chol+solve pipeline at n=8192).  Same contract
    as `chol_factor` otherwise; the fallback/lift pass recomputes the
    scaled Gershgorin bound it needs with one |K| matvec."""
    scheme = _pick_scheme(scheme, K.shape[0])
    if precision is None and K.shape[0] > _ADAPTIVE_MAX:
        precision = 'high'  # single pass + lift (see _ADAPTIVE_MAX)
    if scheme == 'rec':
        return _chol_factor_rec(K, s, eps, block, b1, precision, heal)
    n = K.shape[0]
    nb = -(-n // block) * block
    nstrips = nb // block

    def impl(prec, lift):
        precision_ = _precision(prec)
        Kp = _pad_spd(K, nb)
        sp = jnp.ones(nb, K.dtype).at[:n].set(s)
        bump = None
        if lift:
            bump = _LIFT * jnp.finfo(K.dtype).eps \
                * jnp.max(s * (jnp.abs(K) @ s))
        if scheme == 'square':
            Ks = Kp * sp[:, None] * sp[None, :] \
                + eps * jnp.eye(nb, dtype=K.dtype) \
                .at[jnp.arange(n, nb), jnp.arange(n, nb)].set(0.0)
            return _chol_square(Ks, n, nstrips, block, b1, precision_,
                                bump)
        return _chol_strips(Kp, n, nstrips, block, b1, precision_,
                            bump, sp=sp, eps=eps)

    if precision is not None:
        return impl(precision, heal)
    L1, D1 = impl('high', False)
    ok = jnp.all(jnp.isfinite(D1))
    return jax.lax.cond(
        ok,
        lambda _: (L1, D1),
        lambda _: impl('highest', heal),
        None,
    )


@chol_factor_scaled.defjvp
def _chol_factor_scaled_jvp(block, b1, precision, scheme, heal,
                            primals, tangents):
    K, s, eps = primals
    dK, ds, deps = tangents
    L, Dinv = chol_factor_scaled(K, s, eps, block, b1, precision,
                                 scheme, heal)
    # tangent of the scaled matrix (materialized only under AD)
    dKs = dK * s[:, None] * s[None, :] \
        + K * (ds[:, None] * s[None, :] + s[:, None] * ds[None, :]) \
        + deps * jnp.eye(K.shape[0], dtype=K.dtype)
    dL, dDinv = _factor_tangent(L, Dinv, dKs, block, precision)
    return (L, Dinv), (dL, dDinv)


def cholesky_blocked(K, block=512, b1=128, precision=None,
                     scheme='auto'):
    """Lower-triangular Cholesky factor of PSD K via the blocked
    right-looking MXU algorithm.  Drop-in for ``lax.linalg.cholesky``
    on symmetric PSD input (any size; internally padded to a multiple
    of ``block``)."""
    return chol_factor(K, block, b1, precision, scheme)[0]


def _gram_block(X, xn, profile, params, r0, c0, h, w, precision=None,
                nreal=None):
    """One (h, w) block of K[i, j] = profile(‖X_i − X_j‖², *params)
    from pre-padded points (plain XLA; used for the streaming
    factorization's leaves and panels, where the block is needed as a
    dense matmul operand anyway).  The two blocks' common mean is
    subtracted before the norm expansion so the r² error stays
    RELATIVE (see the gram-fused kernel's centering note); ``xn`` is
    unused but kept in the signature for symmetry."""
    Xr = X[r0:r0 + h]
    Xc = X[c0:c0 + w]
    if X.shape[1] == 1:
        # p = 1: the outer difference is EXACT in f32 (single
        # subtraction, relative error eps·|Δ|) — no norm-expansion
        # cancellation, so √r²-mode profiles (1-D stationary kernels)
        # keep full precision near the diagonal
        d = Xr[:, :1] - Xc[:, :1].T
        r2 = d * d
    else:
        c = 0.5 * (jnp.mean(Xr, axis=0, keepdims=True)
                   + jnp.mean(Xc, axis=0, keepdims=True))
        Xr = Xr - c
        Xc = Xc - c
        xnr = jnp.sum(Xr * Xr, axis=1, keepdims=True)
        xnc = jnp.sum(Xc * Xc, axis=1, keepdims=True)
        cross = jnp.dot(Xr, Xc.T, precision=lax.Precision.HIGHEST)
        r2 = jnp.maximum(xnr + xnc.T - 2 * cross, 0.0)
    t = profile(r2, *params)
    if nreal is not None:
        # exact blockdiag(K, I) padding tail by global index
        rows = r0 + jnp.arange(h)
        cols = c0 + jnp.arange(w)
        real = (rows[:, None] < nreal) & (cols[None, :] < nreal)
        t = jnp.where(real, t, 0.0)
        t = jnp.where((rows[:, None] == cols[None, :])
                      & (rows[:, None] >= nreal), 1.0, t)
    return t


def _chol_rec_tree_gram(X, xn, profile, params, eps, o, kb, block, b1,
                        precision, bump, interpret=False, nreal=None,
                        shard=None):
    """Streaming (matrix-free) recursive Cholesky: the virtual matrix is
    ``K + eps I`` with ``K[i, j] = profile(‖X_i − X_j‖²)`` COMPUTED on
    first touch — leaves and panels as plain fused XLA blocks, the
    big trailing updates inside the gram-fused Pallas Schur kernel
    (:func:`lsqfitgp_tpu.ops._syrk.schur_update_gram`) — so the dense
    Gram never exists in memory.  This is what takes the single-chip
    pipeline past the HBM wall (n = 65536 would need a 17 GB Gram; the
    factor TREE is n²/2).

    Same tree contract as `_chol_rec_tree_pallas`; deeper levels (whose
    trailing matrices are materialized Schur complements) reuse the
    dense-path recursion.

    ``eps`` may be a scalar (iid noise; fused into the Pallas Schur
    kernel) or a padded ``(npad,)`` vector (heteroskedastic per-row
    noise; the Schur kernel runs eps-free and the diagonal lands as an
    O(w) scatter on the materialized complement).
    """
    if nreal is None:
        nreal = X.shape[0]
    hetero = jnp.ndim(eps) == 1

    def epsdiag(o0, w0):
        # eps only on the REAL diagonal: identity-pad pivots stay
        # exactly 1 (log 1 = 0), matching _make_read's semantics
        gi = o0 + jnp.arange(w0)
        e = eps[o0:o0 + w0] if hetero else eps
        return jnp.diag(jnp.where(gi < nreal, e, 0.0).astype(X.dtype))

    if kb == 1:
        D = _gram_block(X, xn, profile, params, o, o, block, block,
                        nreal=nreal) \
            + epsdiag(o, block)
        L, Linv = _factor_diag(D, b1, precision, bump)
        return L, [Linv]
    hb = (kb + 1) // 2
    h = hb * block
    w = (kb - hb) * block
    t11, d1 = _chol_rec_tree_gram(X, xn, profile, params, eps, o, hb,
                                  block, b1, precision, bump, interpret,
                                  nreal, shard)
    A21 = _gram_block(X, xn, profile, params, o + h, o, w, h,
                      nreal=nreal)
    if shard is not None:
        # row-sharding constraint: GSPMD partitions the Gram strip
        # evaluation AND the (row-independent) panel solve to match
        A21 = shard(A21)
    P = _tree_solve_right_t(A21, t11, d1, block, precision)
    if shard is not None:
        P = shard(P)
        S = shard(
            _gram_block(X, xn, profile, params, o + h, o + h, w, w,
                        nreal=nreal)
            + epsdiag(o + h, w)
            - jnp.dot(P, P.T, precision=precision))
        t22, d2 = _chol_rec_tree_dense_sharded(
            S, o + h, o + h, kb - hb, block, b1, precision, bump,
            shard)
        return (P, t11, t22), d1 + d2
    if w < 4096 and interpret is False:
        S = _gram_block(X, xn, profile, params, o + h, o + h, w, w,
                        nreal=nreal) \
            + epsdiag(o + h, w) \
            - jnp.dot(P, P.T, precision=precision)
    else:
        from ..ops import _syrk
        S = _syrk.schur_update_gram(
            profile, X, xn, P, params=params,
            eps=None if hetero else eps, nreal=nreal,
            size=w, offset=o + h, tile=block, precision=precision,
            interpret=interpret)
        if hetero:
            # per-row noise cannot ride the kernel's scalar-eps slot:
            # add it as an O(w) diagonal scatter on the materialized
            # Schur complement (negligible next to the w³ factorize)
            gi = o + h + jnp.arange(w)
            d = jnp.where(gi < nreal, eps[o + h:o + h + w],
                          0.0).astype(S.dtype)
            S = S.at[jnp.arange(w), jnp.arange(w)].add(d)
    t22, d2 = _chol_rec_tree_pallas(S, None, None, o + h, o + h,
                                    kb - hb, block, b1, precision, bump,
                                    interpret)
    return (P, t11, t22), d1 + d2


def _chol_gram_leftlook(X, xn, profile, params, eps, block, b1,
                        precision, bump, nreal, sb_blocks=16):
    """LEFT-LOOKING streaming (matrix-free) Cholesky over wide column
    strips: the memory-lean companion of `_chol_rec_tree_gram` for
    sizes near the HBM wall.

    The right-looking recursion materializes each level's Schur
    complement — 4 GB + 1 GB + … of transient square buffers at
    n = 65536 — and its half-split panels give the TPU allocator a
    checkerboard of piece sizes (measured: 47% heap fragmentation on
    an 8.65 GB live set, the difference between the exact streaming
    gradient compiling at n = 65536 and OOM).  Here strip k instead
    reads its own virtual-Gram slab (one `_gram_block`, O(n·sb)),
    subtracts the accumulated updates with one plain MXU dot per
    PREVIOUS strip (left-looking: no Schur matrix ever exists), and
    factors its trapezoid with the balanced tree recursion.  Total
    MACs are the same optimal ~n³/6·2; peak memory is the factor tree
    + one slab + one update temp, in uniform (n−c, sb) shapes.

    Returns the standard ``(tree, dinvs)`` contract — the tree is
    right-deep (strip k's node wraps the remaining strips), which
    every tree consumer (solves, skip solves, logdiag, mv) already
    handles structurally.
    """
    npad = X.shape[0]
    dtype = X.dtype
    hetero = jnp.ndim(eps) == 1
    sb = sb_blocks * block

    def epsdiag(o0, w0):
        gi = o0 + jnp.arange(w0)
        e = eps[o0:o0 + w0] if hetero else eps
        return jnp.diag(jnp.where(gi < nreal, e, 0.0).astype(dtype))

    panels = []      # (P_k, c_k, sb_k): rows c_k+sb_k..npad, cols c_k..
    subtrees = []
    subdinvs = []
    c0 = 0
    while c0 < npad:
        w = min(sb, npad - c0)
        m = npad - c0
        A = _gram_block_strip(X, profile, params, c0, m, w, nreal)
        A = A + jnp.pad(epsdiag(c0, w), ((0, m - w), (0, 0)))
        for Pj, cj, wj in panels:
            off = c0 - (cj + wj)
            Rj = Pj[off:off + w]                       # (w, wj)
            A = A - jnp.dot(Pj[off:], Rj.T, precision=precision)
        readA = lambda r0, cc, h, ww, A=A, base=c0: \
            A[r0 - base:r0 - base + h, cc - base:cc - base + ww]
        t_d, d_d = _chol_rec_tree(readA, c0, w // block, block, b1,
                                  precision, bump)
        Pk = _tree_solve_right_t(A[w:], t_d, d_d, block, precision)
        panels.append((Pk, c0, w))
        subtrees.append(t_d)
        subdinvs.extend(d_d)
        c0 += w
    tree = subtrees[-1]
    for k in range(len(subtrees) - 2, -1, -1):
        tree = (panels[k][0], subtrees[k], tree)
    return tree, subdinvs


def _gram_block_strip(X, profile, params, c0, m, w, nreal):
    """(m, w) virtual-Gram slab starting at (c0, c0) with the exact
    identity-pad tail — `_gram_block` with per-pair centering."""
    return _gram_block(X, None, profile, params, c0, c0, m, w,
                       nreal=nreal)


def _chol_rec_tree_dense_sharded(M, base, o, kb, block, b1, precision,
                                 bump, shard):
    """Recursive tree factorization of a MATERIALIZED (Schur) matrix M
    with row-sharding constraints on every panel and trailing update —
    the multi-chip companion of `_chol_rec_tree_pallas` (plain XLA
    matmuls so GSPMD can partition them; the leaves are small and
    replicated).  Same tree contract."""
    if kb == 1:
        D = M[o - base:o - base + block, o - base:o - base + block]
        L, Linv = _factor_diag(D, b1, precision, bump)
        return L, [Linv]
    hb = (kb + 1) // 2
    h = hb * block
    w = (kb - hb) * block
    t11, d1 = _chol_rec_tree_dense_sharded(M, base, o, hb, block, b1,
                                           precision, bump, shard)
    A21 = M[o + h - base:o + h - base + w, o - base:o - base + h]
    P = shard(_tree_solve_right_t(A21, t11, d1, block, precision))
    S = shard(
        M[o + h - base:o + h - base + w, o + h - base:o + h - base + w]
        - jnp.dot(P, P.T, precision=precision))
    t22, d2 = _chol_rec_tree_dense_sharded(S, o + h, o + h, kb - hb,
                                           block, b1, precision, bump,
                                           shard)
    return (P, t11, t22), d1 + d2


def _tree_solve_right_t_skip(B, tree, dinvs, block, precision, o, c0):
    """X = B L⁻ᵀ for B whose columns < ``c0`` (global; the tree spans
    columns from ``o``) are identically zero.  Because L⁻ᵀ is upper
    triangular, X's columns < c0 are then exactly zero too, so any
    subtree entirely left of c0 is skipped (zeros emitted, no panel
    dot).  Used by the exact streaming-gradient pass, where B is an
    identity column strip: the skip turns the all-strips total from
    ~n³/2 into ~n³/6 MACs."""
    if not isinstance(tree, tuple):
        if o + block <= c0:
            return jnp.zeros_like(B)
        return jnp.dot(B, dinvs[0].T, precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    hb = h // block
    if o + h <= c0:
        X1 = jnp.zeros_like(B[:, :h])
        B2 = B[:, h:]
    else:
        X1 = _tree_solve_right_t_skip(B[:, :h], t11, dinvs[:hb], block,
                                      precision, o, c0)
        B2 = B[:, h:] - jnp.dot(X1, P.T, precision=precision)
    X2 = _tree_solve_right_t_skip(B2, t22, dinvs[hb:], block, precision,
                                  o + h, c0)
    return jnp.concatenate([X1, X2], axis=1)


def _tree_solve_right_skip(B, tree, dinvs, block, precision, o, c0):
    """X = B L⁻¹ for B whose columns < ``c0`` are zero, with output
    columns < c0 NOT needed by the caller (they are emitted as zeros
    without being computed — unlike the transposed case they are not
    mathematically zero).  Companion of `_tree_solve_right_t_skip` for
    the second (K⁻¹-strip) solve of the exact streaming gradient,
    where the skipped columns are recovered from symmetry."""
    if not isinstance(tree, tuple):
        if o + block <= c0:
            return jnp.zeros_like(B)
        return jnp.dot(B, dinvs[0], precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    hb = h // block
    X2 = _tree_solve_right_skip(B[:, h:], t22, dinvs[hb:], block,
                                precision, o + h, c0)
    if o + h <= c0:
        X1 = jnp.zeros_like(B[:, :h])
    else:
        B1 = B[:, :h] - jnp.dot(X2, P, precision=precision)
        X1 = _tree_solve_right_skip(B1, t11, dinvs[:hb], block,
                                    precision, o, c0)
    return jnp.concatenate([X1, X2], axis=1)


def _tree_mv(tree, v, precision):
    """y = L v with L the factor tree and v (k,) or (k, m)."""
    if not isinstance(tree, tuple):
        return jnp.dot(tree, v, precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    y1 = _tree_mv(t11, v[:h], precision)
    y2 = jnp.dot(P, v[:h], precision=precision) \
        + _tree_mv(t22, v[h:], precision)
    return jnp.concatenate([y1, y2], axis=0)


def _tree_mv_t(tree, v, precision):
    """y = Lᵀ v with L the factor tree."""
    if not isinstance(tree, tuple):
        return jnp.dot(tree.T, v, precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    y1 = _tree_mv_t(t11, v[:h], precision) \
        + jnp.dot(P.T, v[h:], precision=precision)
    y2 = _tree_mv_t(t22, v[h:], precision)
    return jnp.concatenate([y1, y2], axis=0)


def _tree_leaf_logdiag(tree):
    """log of the diagonal of the factor, leaf by leaf, in order."""
    if not isinstance(tree, tuple):
        return [jnp.log(jnp.diagonal(tree))]
    _, t11, t22 = tree
    return _tree_leaf_logdiag(t11) + _tree_leaf_logdiag(t22)


def _tree_solve_right(B, tree, dinvs, block, precision):
    """X = B L^{-1} with L the factor tree (k x k) and B (m, k):
    X2 = B2 L22^{-1}, X1 = (B1 − X2 P) L11^{-1} (the transpose-free
    companion of `_tree_solve_right_t`, used to apply K^{-1} = L^{-T}
    L^{-1} on the tree without densifying the factor)."""
    if not isinstance(tree, tuple):
        return jnp.dot(B, dinvs[0], precision=precision)
    P, t11, t22 = tree
    h = P.shape[1]
    hb = h // block
    X2 = _tree_solve_right(B[:, h:], t22, dinvs[hb:], block, precision)
    B1 = B[:, :h] - jnp.dot(X2, P, precision=precision)
    X1 = _tree_solve_right(B1, t11, dinvs[:hb], block, precision)
    return jnp.concatenate([X1, X2], axis=1)
