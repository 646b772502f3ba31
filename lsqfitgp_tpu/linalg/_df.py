"""Double-float (paired-f32) linear algebra: the accuracy-RECOVERING
final rung of the f32 regularization ladder.

TPUs have no native float64.  When a model's conditioning exceeds what
float32 can factor (cond(K) ≳ 1/(32·eps32) after regularization), the
eps-escalation ladder in :class:`.Chol` refactors with a bound-scaled
``eps2`` that may exceed the model's own noise floor — an honest but
*biased* result (measured: 33% NLL bias and 28% gradient bias on an
n=1536 smooth-kernel model with a 1e-4 nugget).  The reference library
never returns degraded results because it hard-requires float64
(reference ``_linalg/_decomp.py:245-278`` eps semantics are all
O(n·eps64), negligible).  This module restores that contract on TPU by
emulating ~double precision in software.

A *double-float* (Dekker/Knuth) number is an unevaluated sum
``hi + lo`` of two float32 with ``|lo| <= ulp(hi)/2``, giving an
effective ~49-bit mantissa (unit roundoff ~2^-49 ≈ 1.8e-15, i.e.
float64-grade for the conditioning range that matters here).  The
error-free transformations (``two_sum``, Dekker ``split`` +
``two_prod``) require only exact IEEE round-to-nearest float32 add /
sub / mul, which the TPU VPU provides for elementwise ops — the MXU's
bfloat16 passes are never involved.  No FMA is assumed.

The factorization/solves here are O(n³) *VPU* flops (a ``lax.fori_loop``
of vectorized rank-1 updates, ~40 f32 flops per double-float MAC), so
they run at ~1/100 of the MXU Cholesky's rate.  That is the right
trade: this path executes only inside the ``lax.cond`` escalation
branch, i.e. exactly when the alternative is a *wrong* answer, and only
up to ``DF_MAX`` (default 4096) points, where a rescue factorization
costs ~O(1 s).

Everything is straight-line traceable (static shapes, ``fori_loop``),
so the rescue compiles into the same jitted program as the fast path
and adds nothing to the well-posed case's runtime.

**Double-float Gram assembly.**  The rescue factors the matrix *as
given*.  A Gram assembled in-graph by the TPU's f32 transcendentals
carries ~30-ULP elementwise error (measured 3.5e-6 absolute for
``exp``), which makes models with cond ≳ 1e6 indefinite before the
factorization sees them (measured λmin = −9e-5 on an n=1024
smooth-kernel model whose true λmin is +1e-4).  For
profile-expressible kernels the Gram itself is therefore assembled in
double-float: exact pairwise r² from the f32 inputs via error-free
transforms (:func:`r2_pairs_df` — the coordinate differences and
squares are EXACT, distances being translation-invariant so no
loc/scale pre-rounding of the points is allowed), a ~1e-13-accurate
df ``exp`` (:func:`exp_df`, Cody-Waite reduction + degree-13 df
Horner), and df post-chains (:func:`gram profiles registered in
kernelalg._fastgram.DF_CORES`), handing ``chol_df`` a ``(Kh, Kl)``
pair so the rescue starts from the TRUE model instead of the
f32-corrupted one.
"""

from __future__ import annotations

import math

import numpy
import jax
from jax import lax
import jax.numpy as jnp

__all__ = [
    'chol_df', 'solve_lower_df', 'solve_lower_t_df', 'logdet_df',
    'exp_df', 'r2_pairs_df', 'gram_df', 'DF_MAX',
]

# size cap for the automatic rescue (O(n³) VPU work ≈ seconds at 4096)
DF_MAX = 4096

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for the 24-bit f32 mantissa


# The error-free transforms rely on EXACT IEEE rounding of specific
# intermediate expressions.  Compilers may rewrite them: measured on
# XLA:CPU under jit, the composed df pipeline loses to 5.9e-8 relative
# (plain f32) where eager op-by-op execution is exact — the optimized
# HLO keeps the arithmetic intact, so the corruption happens in the
# LLVM backend (FMA contraction of patterns like 4097·a − a and
# a·b + c, which breaks the Veltkamp split and the pair
# normalization); `--xla_backend_optimization_level=0` restores
# exactness, `optimization_barrier` does NOT (XLA:CPU deletes the
# barriers before the backend).  The barriers below still guard the
# HLO-level algebraic simplifier; :func:`eft_jit_exact` probes at
# runtime whether the ACTIVE backend preserves EFT semantics under
# jit, and the Chol rescue warning reports honestly when it does not.
def _opaque(x):
    return lax.optimization_barrier(x)


_EFT_PROBE_CACHE = {}


def eft_jit_exact():
    """True when the active backend preserves error-free-transform
    semantics under jit (probed once per backend with a composed
    two_sum→mul pair on cancellation-heavy inputs vs the exact f64
    result).  Eager execution is exact on every backend; under jit,
    XLA:CPU's LLVM backend contracts FMAs and degrades the pair to
    plain-f32 accuracy (measured 5.9e-8; see module comment)."""
    backend = jax.default_backend()
    hit = _EFT_PROBE_CACHE.get(backend)
    if hit is not None:
        return hit
    a = jnp.asarray(
        numpy.linspace(0.1, 37.2, 64, dtype=numpy.float32))
    b = jnp.asarray(
        numpy.linspace(0.100001, 31.6, 64, dtype=numpy.float32))

    def pair_sq(a, b):
        dh, dl = _two_sum(a, -b)
        return mul(dh, dl, dh, dl)

    sh, sl = jax.jit(pair_sq)(a, b)
    got = numpy.asarray(sh, numpy.float64) \
        + numpy.asarray(sl, numpy.float64)
    want = (numpy.asarray(a, numpy.float64)
            - numpy.asarray(b, numpy.float64)) ** 2
    ok = bool(numpy.max(numpy.abs(got - want)
                        / numpy.maximum(want, 1e-30)) < 1e-12)
    _EFT_PROBE_CACHE[backend] = ok
    return ok


def _two_sum(a, b):
    """Exact a + b = s + err (Knuth; no magnitude assumption)."""
    s = _opaque(a + b)
    bb = _opaque(s - a)
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):
    """Exact a + b = s + err, assuming |a| >= |b| (or a == 0)."""
    s = _opaque(a + b)
    err = b - _opaque(s - a)
    return s, err


def _split(a):
    """Dekker split: a = hi + lo with both mantissas <= 12 bits."""
    c = _opaque(_SPLIT * a)
    hi = _opaque(c - (c - a))
    return hi, a - hi


def _two_prod(a, b):
    """Exact a * b = p + err (Dekker; exact without FMA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(xh, xl, yh, yl):
    """Double-float addition (accurate variant)."""
    sh, sl = _two_sum(xh, yh)
    sl = sl + (xl + yl)
    return _fast_two_sum(sh, sl)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    """Double-float multiplication."""
    ph, pl = _two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    return _fast_two_sum(ph, pl)


def div(xh, xl, yh, yl):
    """Double-float division (long division with one correction)."""
    q1 = xh / yh
    # r = x - q1 * y, computed in double-float
    th, tl = _two_prod(yh, q1)
    tl = tl + yl * q1
    th, tl = _fast_two_sum(th, tl)
    rh, rl = add(xh, xl, -th, -tl)
    q2 = (rh + rl) / yh
    return _fast_two_sum(q1, q2)


def dfsqrt(xh, xl):
    """Double-float square root (one Newton correction on f32 sqrt).

    Nonpositive ``xh`` produces NaN, which deliberately propagates: a
    nonpositive pivot means the matrix is indefinite even at df
    precision, and the caller's degradation probes must see it.
    """
    q1 = jnp.sqrt(xh)
    th, tl = _two_prod(q1, q1)
    rh, rl = add(xh, xl, -th, -tl)
    q2 = (rh + rl) / (2 * q1)
    return _fast_two_sum(q1, q2)


# blocked-formulation tile sizes: _DF_BLOCK columns per panel step
# (sequential outer steps = n/_DF_BLOCK instead of n), _DF_CHUNK
# panel columns contracted per Schur accumulation (temporaries are
# (n, n, _DF_CHUNK) pairs — keep small)
_DF_BLOCK = 64
_DF_CHUNK = 8


def _reduce_df_last(ph, pl):
    """Pairwise df tree-sum over a static, power-of-two last axis."""
    k = ph.shape[-1]
    while k > 1:
        k //= 2
        ph, pl = add(ph[..., :k], pl[..., :k], ph[..., k:], pl[..., k:])
    return ph[..., 0], pl[..., 0]


@jax.custom_jvp
def chol_df(Ks, eps, Kl=None):
    """Double-float Cholesky of ``Ks [+ Kl] + eps I``.

    ``Ks``: (n, n) symmetric float32, treated as exact (the input's own
    representation is the data — same convention as float64 libraries
    reading a float32 array).  ``Kl``: optional low-order part making
    ``(Ks, Kl)`` a df pair — pass the output of :func:`gram_df` so the
    factorization starts from the TRUE model Gram instead of the
    f32-rounded one (the difference decides definiteness at
    cond ≳ 1e6).  ``eps``: scalar diagonal regularization added in
    double-float.  Returns ``(Lh, Ll)`` — the lower factor as a
    double-float pair; ``Lh`` alone is the correctly-rounded float32
    factor.

    Right-looking blocked formulation: each of the n/b outer steps
    factors a (n, b) panel with b narrow rank-1 iterations (O(n·b)
    work each), then applies ONE chunked compensated Schur update to
    the trailing matrix — per chunk of ``_DF_CHUNK`` panel columns,
    exact ``two_prod`` outer products materialized as (n, n, chunk)
    pairs and pairwise-reduced in df.  Same O(n³) VPU flops as the
    textbook rank-1 loop, but ~b× fewer sequential full-matrix passes,
    which is what dominates wall-clock on both CPU (dispatch) and TPU
    (HBM traffic).  Matrices smaller than one block fall back to the
    rank-1 formulation.
    """
    n = Ks.shape[0]
    b = _DF_BLOCK
    if n <= b:
        return _chol_df_rank1(Ks, eps, Kl)
    npad = -(-n // b) * b
    idx = jnp.arange(npad)
    eps = jnp.asarray(eps, Ks.dtype)
    if npad != n:
        # identity-pad the tail: pad pivots factor to exactly 1 and
        # never touch the real block (off-diagonal pad entries are 0)
        Ks = jnp.pad(Ks, ((0, npad - n), (0, npad - n)))
        Ks = Ks.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
        if Kl is not None:
            Kl = jnp.pad(Kl, ((0, npad - n), (0, npad - n)))
    Klo = jnp.zeros_like(Ks) if Kl is None else Kl
    dh, dl = add(jnp.diag(Ks), jnp.diag(Klo),
                 jnp.where(idx < n, eps, jnp.float32(0)),
                 jnp.zeros(npad, Ks.dtype))
    Ah = Ks.at[idx, idx].set(dh)
    Al = Klo.at[idx, idx].set(dl)

    cb = _DF_CHUNK

    def panel_col(j, c):
        """One rank-1 step restricted to the (npad, b) panel."""
        Ph, Pl, j0 = c
        gj = j0 + j
        ch = lax.dynamic_slice_in_dim(Ph, j, 1, axis=1)[:, 0]
        cl = lax.dynamic_slice_in_dim(Pl, j, 1, axis=1)[:, 0]
        ph = jnp.take(ch, gj)
        pl = jnp.take(cl, gj)
        sqh, sql = dfsqrt(ph, pl)
        ivh, ivl = div(jnp.float32(1), jnp.float32(0), sqh, sql)
        lh, ll = mul(ch, cl, ivh, ivl)
        below = idx > gj
        lh = jnp.where(below, lh, jnp.where(idx == gj, sqh, 0))
        ll = jnp.where(below, ll, jnp.where(idx == gj, sql, 0))
        Ph = lax.dynamic_update_slice(Ph, lh[:, None], (0, j))
        Pl = lax.dynamic_update_slice(Pl, ll[:, None], (0, j))
        # update the remaining panel columns k > j: col gk -= l * l[gk]
        rowh = lax.dynamic_slice(Ph, (j0, 0), (b, b))  # l rows j0:j0+b
        # panel-row slice of the new column j across panel columns:
        rh = lax.dynamic_slice(lh[:, None], (j0, 0), (b, 1))[:, 0]
        rl = lax.dynamic_slice(ll[:, None], (j0, 0), (b, 1))[:, 0]
        oh, ol = mul(lh[:, None], ll[:, None], rh[None, :], rl[None, :])
        colmask = (jnp.arange(b) > j)[None, :] & below[:, None]
        oh = jnp.where(colmask, oh, 0)
        ol = jnp.where(colmask, ol, 0)
        Ph, Pl = sub(Ph, Pl, oh, ol)
        return Ph, Pl, j0

    def step(p, c):
        Ah, Al = c
        j0 = p * b
        Ph = lax.dynamic_slice(Ah, (0, j0), (npad, b))
        Pl = lax.dynamic_slice(Al, (0, j0), (npad, b))
        Ph, Pl, _ = lax.fori_loop(0, b, panel_col, (Ph, Pl, j0))
        Ah = lax.dynamic_update_slice(Ah, Ph, (0, j0))
        Al = lax.dynamic_update_slice(Al, Pl, (0, j0))
        # Schur update of the trailing columns (global col >= j0 + b):
        # T -= Σ_k l_k ⊗ l_k, chunked compensated accumulation
        trail = idx >= j0 + b
        mask = trail[None, :] & (idx[:, None] >= idx[None, :])

        def chunk(q, c2):
            Ah, Al = c2
            Ch = lax.dynamic_slice(Ph, (0, q * cb), (npad, cb))
            Cl = lax.dynamic_slice(Pl, (0, q * cb), (npad, cb))
            oh, ol = mul(Ch[:, None, :], Cl[:, None, :],
                         Ch[None, :, :], Cl[None, :, :])
            sh, sl = _reduce_df_last(oh, ol)
            sh = jnp.where(mask, sh, 0)
            sl = jnp.where(mask, sl, 0)
            return sub(Ah, Al, sh, sl)

        return lax.fori_loop(0, b // cb, chunk, (Ah, Al))

    Ah, Al = lax.fori_loop(0, npad // b, step, (Ah, Al))
    return jnp.tril(Ah)[:n, :n], jnp.tril(Al)[:n, :n]


def _chol_df_rank1(Ks, eps, Kl=None):
    """Textbook left-looking rank-1 df Cholesky (small-n path)."""
    n = Ks.shape[0]
    idx = jnp.arange(n)
    eps = jnp.asarray(eps, Ks.dtype)
    Klo = jnp.zeros_like(Ks) if Kl is None else Kl
    dh, dl = add(jnp.diag(Ks), jnp.diag(Klo),
                 jnp.broadcast_to(eps, (n,)), jnp.zeros(n, Ks.dtype))
    Ah = Ks.at[idx, idx].set(dh)
    Al = Klo.at[idx, idx].set(dl)

    def body(j, c):
        Ah, Al = c
        ch = lax.dynamic_slice_in_dim(Ah, j, 1, axis=1)[:, 0]
        cl = lax.dynamic_slice_in_dim(Al, j, 1, axis=1)[:, 0]
        ph = jnp.take(ch, j)
        pl = jnp.take(cl, j)
        sqh, sql = dfsqrt(ph, pl)
        ivh, ivl = div(jnp.float32(1), jnp.float32(0), sqh, sql)
        lh, ll = mul(ch, cl, ivh, ivl)
        below = idx > j
        lh = jnp.where(below, lh, jnp.where(idx == j, sqh, 0))
        ll = jnp.where(below, ll, jnp.where(idx == j, sql, 0))
        Ah = lax.dynamic_update_slice(Ah, lh[:, None], (0, j))
        Al = lax.dynamic_update_slice(Al, ll[:, None], (0, j))
        mask = below[:, None] & below[None, :]
        oh, ol = mul(lh[:, None], ll[:, None], lh[None, :], ll[None, :])
        oh = jnp.where(mask, oh, 0)
        ol = jnp.where(mask, ol, 0)
        return sub(Ah, Al, oh, ol)

    Ah, Al = lax.fori_loop(0, n, body, (Ah, Al))
    return jnp.tril(Ah), jnp.tril(Al)


@chol_df.defjvp
def _chol_df_jvp(primals, tangents):
    """Analytic Cholesky differential ``dL = L Φ(L⁻¹ dA L⁻ᵀ)``.

    Without this rule, reverse AD through the rank-1 ``fori_loop``
    would store n iterations of the O(n²) nonlinear carry — O(n³)
    residual memory.  The two triangular solves are the
    conditioning-amplified steps and run in double-float; the final
    ``L @ Φ`` product is benign (no cond amplification; errors are
    relative to ``|L||Φ|``) and rides the f32 HIGHEST matmul, so the
    tangent inherits df accuracy where it matters.  The rule is linear
    in ``(dKs, deps)`` through linear scans, so JAX can transpose it
    for reverse mode.
    """
    Ks, eps, Kl = (primals if len(primals) == 3
                   else (*primals, None))
    dKs, deps, dKl = (tangents if len(tangents) == 3
                      else (*tangents, None))
    Lh, Ll = chol_df(Ks, eps, Kl)
    n = Ks.shape[0]
    idx = jnp.arange(n)
    dA = dKs if dKl is None else dKs + dKl
    dA = dA.at[idx, idx].add(jnp.broadcast_to(deps, (n,)))
    Wh, Wl = solve_lower_df(Lh, Ll, dA)                  # L⁻¹ dA
    Ah, Al = solve_lower_df(Lh, Ll, Wh.T, Wl.T)          # (L⁻¹ dA L⁻ᵀ)ᵀ
    # dA is symmetric in every caller, so the transpose equals the
    # symmetric product itself; Φ = tril with halved diagonal
    half = jnp.where(idx[:, None] == idx[None, :], 0.5, 1.0)
    Phi = jnp.tril((Ah + Al).T * half)
    dLh = jnp.dot(Lh, Phi, precision=lax.Precision.HIGHEST)
    return (Lh, Ll), (dLh, jnp.zeros_like(dLh))


def _as_pair(B, Bl):
    B = jnp.asarray(B)
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
        Bl = None if Bl is None else Bl[:, None]
    if Bl is None:
        Bl = jnp.zeros_like(B)
    return B, Bl, vec


def solve_lower_df(Lh, Ll, B, Bl=None):
    """Double-float forward substitution ``L⁻¹ B``.

    ``B``: (n,) or (n, m) float32 (or a df pair via ``Bl``).  Returns a
    df pair of the same shape.  O(n²m) VPU flops, n loop iterations.
    """
    Bh, Bl, vec = _as_pair(B, Bl)
    n = Lh.shape[0]
    idx = jnp.arange(n)

    def body(j, c):
        Bh, Bl = c
        rh = lax.dynamic_slice_in_dim(Bh, j, 1, axis=0)[0]
        rl = lax.dynamic_slice_in_dim(Bl, j, 1, axis=0)[0]
        ph = lax.dynamic_slice(Lh, (j, j), (1, 1))[0, 0]
        pl = lax.dynamic_slice(Ll, (j, j), (1, 1))[0, 0]
        xh, xl = div(rh, rl, ph, pl)
        Bh = lax.dynamic_update_slice(Bh, xh[None, :], (j, 0))
        Bl = lax.dynamic_update_slice(Bl, xl[None, :], (j, 0))
        colh = lax.dynamic_slice_in_dim(Lh, j, 1, axis=1)[:, 0]
        coll = lax.dynamic_slice_in_dim(Ll, j, 1, axis=1)[:, 0]
        below = (idx > j)[:, None]
        oh, ol = mul(colh[:, None], coll[:, None], xh[None, :], xl[None, :])
        oh = jnp.where(below, oh, 0)
        ol = jnp.where(below, ol, 0)
        return sub(Bh, Bl, oh, ol)

    Bh, Bl = lax.fori_loop(0, n, body, (Bh, Bl))
    if vec:
        return Bh[:, 0], Bl[:, 0]
    return Bh, Bl


def solve_lower_t_df(Lh, Ll, B, Bl=None):
    """Double-float backward substitution ``L⁻ᵀ B``."""
    Bh, Bl, vec = _as_pair(B, Bl)
    n = Lh.shape[0]
    idx = jnp.arange(n)

    def body(k, c):
        Bh, Bl = c
        j = n - 1 - k
        rh = lax.dynamic_slice_in_dim(Bh, j, 1, axis=0)[0]
        rl = lax.dynamic_slice_in_dim(Bl, j, 1, axis=0)[0]
        ph = lax.dynamic_slice(Lh, (j, j), (1, 1))[0, 0]
        pl = lax.dynamic_slice(Ll, (j, j), (1, 1))[0, 0]
        xh, xl = div(rh, rl, ph, pl)
        Bh = lax.dynamic_update_slice(Bh, xh[None, :], (j, 0))
        Bl = lax.dynamic_update_slice(Bl, xl[None, :], (j, 0))
        # row j of L = column j of Lᵀ drives the updates of rows < j
        rowh = lax.dynamic_slice_in_dim(Lh, j, 1, axis=0)[0]
        rowl = lax.dynamic_slice_in_dim(Ll, j, 1, axis=0)[0]
        above = (idx < j)[:, None]
        oh, ol = mul(rowh[:, None], rowl[:, None], xh[None, :], xl[None, :])
        oh = jnp.where(above, oh, 0)
        ol = jnp.where(above, ol, 0)
        return sub(Bh, Bl, oh, ol)

    Bh, Bl = lax.fori_loop(0, n, body, (Bh, Bl))
    if vec:
        return Bh[:, 0], Bl[:, 0]
    return Bh, Bl


def syrk_df(Wh, Wl):
    """``WᵀW`` in double-float: compensated accumulation over k.

    A plain f32 HIGHEST matmul loses ~n·eps32 relative accumulation
    error per entry — at cond-amplified ``|W|`` magnitudes that is the
    dominant error in K⁻¹ = WᵀW.  O(n³) VPU flops, n loop iterations
    over rank-1 df outer products; primal-side only (never
    differentiated), used by the fused NLL gradient's rescue branch.
    """
    n = Wh.shape[0]

    def body(k, c):
        Ch, Cl = c
        rh = lax.dynamic_slice_in_dim(Wh, k, 1, axis=0)[0]
        rl = lax.dynamic_slice_in_dim(Wl, k, 1, axis=0)[0]
        oh, ol = mul(rh[:, None], rl[:, None], rh[None, :], rl[None, :])
        return add(Ch, Cl, oh, ol)

    Z = jnp.zeros_like(Wh)
    return lax.fori_loop(0, n, body, (Z, Z))


def logdet_df(Lh, Ll):
    """2·Σ log diag(L) from the df factor.

    ``log(hi + lo) = log(hi) + log1p(lo/hi) ≈ log(hi) + lo/hi`` — the
    dropped term is O((lo/hi)²) = O(2^-98); the f32 ``log`` rounding
    (~1 ulp per pivot, uncorrelated) dominates at ~√n·1e-7 absolute,
    far below any statistical use of a log-likelihood.
    """
    dh = jnp.diag(Lh)
    dl = jnp.diag(Ll)
    return 2 * (jnp.sum(jnp.log(dh)) + jnp.sum(dl / dh))


def dfsum(xh, xl):
    """Collapse an elementwise df array to a scalar: f32 tree-sums of
    hi and lo parts (error ~log(n) ulps — sufficient for scalar
    likelihood terms; see logdet_df note)."""
    return jnp.sum(xh) + jnp.sum(xl)


# ---------------------------------------------------------------------------
# double-float Gram assembly (exact r², df transcendentals)

def _df_const(v):
    """A float64 constant as an (hi, lo) f32 pair."""
    hi = numpy.float32(v)
    lo = numpy.float32(numpy.float64(v) - numpy.float64(hi))
    return float(hi), float(lo)


# Cody-Waite splitting of ln2: _LN2_A has only 12 significant mantissa
# bits, so k * _LN2_A is EXACT in f32 for |k| <= 2^12; the residual
# rides df arithmetic (error ~|k| * 2^-48 * |rest| — negligible)
_LN2_A = float(numpy.float32(
    numpy.trunc(numpy.log(2.0) * 2.0 ** 12) / 2.0 ** 12))
_LN2_B_H, _LN2_B_L = _df_const(math.log(2.0) - _LN2_A)
_INVLN2 = float(numpy.float32(1.0 / math.log(2.0)))

# 1/k! as df pairs, k = 13..0 (Horner order).  Degree 13 puts the
# Taylor truncation at |r| <= ln2/2 below 2e-16 — under the df unit
# roundoff 2^-49
_EXP_COEF = [_df_const(1.0 / math.factorial(k)) for k in range(13, -1, -1)]

# exp underflow guard: exp(-88) ~ 6e-39 is at the f32 subnormal edge
# (TPU flushes subnormals); clamping the argument also keeps the
# range-reduction integer k small enough that k * _LN2_A stays exact
_EXP_MIN = -88.0
_EXP_MAX = 88.0


def exp_df(xh, xl=None):
    """Double-float ``exp``: ~1e-15 relative error (vs the TPU f32
    transcendental's measured ~30 ULP ≈ 3.5e-6 — the error that makes
    high-cond Grams indefinite before the factorization sees them).

    Cody-Waite range reduction ``x = k·ln2 + r`` (exact 12-bit leading
    product, df residual), degree-13 df Horner for ``exp(r)`` on
    ``|r| ≤ ln2/2``, exact ``ldexp`` scaling.  Arguments clamped to
    ±88 (the f32 exp range; the clamp changes only results that
    underflow/overflow anyway).  Returns a df pair.
    """
    if xl is None:
        xl = jnp.zeros_like(xh)
    xh = jnp.clip(xh, _EXP_MIN, _EXP_MAX)
    k = jnp.round(xh * _INVLN2)
    # r = x - k*ln2: leading product exact, residual in df
    r0h, r0l = _two_sum(xh, -k * _LN2_A)
    r0l = r0l + xl
    bh, bl = mul(k, jnp.zeros_like(k), _LN2_B_H, _LN2_B_L)
    rh, rl = add(r0h, r0l, -bh, -bl)
    ph = jnp.full_like(rh, _EXP_COEF[0][0])
    pl = jnp.full_like(rh, _EXP_COEF[0][1])
    for ch, cl in _EXP_COEF[1:]:
        ph, pl = mul(ph, pl, rh, rl)
        ph, pl = add(ph, pl, jnp.full_like(rh, ch), jnp.full_like(rh, cl))
    ki = k.astype(jnp.int32)
    return jnp.ldexp(ph, ki), jnp.ldexp(pl, ki)


def sqrt_df(xh, xl=None):
    """Double-float sqrt of an elementwise df array (clamped at the
    f32 tiny like the f32 fast path's ``abs`` mode, so r = 0 diagonals
    stay finite)."""
    if xl is None:
        xl = jnp.zeros_like(xh)
    tiny = jnp.float32(numpy.finfo(numpy.float32).tiny)
    xh = jnp.maximum(xh, tiny)
    return dfsqrt(xh, xl)


def r2_pairs_df(X, Y=None):
    """EXACT pairwise squared distances of f32 points as a df pair.

    ``X``: (n, p) float32 (RAW coordinates: distances are
    translation-invariant, so no loc centering — and no f32 lenscale
    pre-division, which would jitter the points by ~eps·|x| and
    reintroduce exactly the assembly error this module removes; fold
    the lenscale into r² in df via :func:`gram_df` instead).  Each
    coordinate difference is an exact ``two_sum``, each square an
    exact ``two_prod``, the dimension sum a df accumulation — the
    result is the correctly-rounded-df r², error ~2^-49 relative.
    """
    Y = X if Y is None else Y
    ah = al = None
    for d in range(X.shape[1]):
        dh, dl = _two_sum(X[:, d][:, None], -Y[:, d][None, :])
        sh, sl = mul(dh, dl, dh, dl)
        if ah is None:
            ah, al = sh, sl
        else:
            ah, al = add(ah, al, sh, sl)
    return ah, al


def gram_df(profile_df, X, params=(), lenscale=None, Y=None):
    """Assemble a covariance block in DOUBLE-FLOAT: exact pairwise r²
    (optionally divided by ``lenscale²`` in df), pushed through a df
    profile evaluator ``profile_df(r2h, r2l, *params) -> (Kh, Kl)``
    (see ``kernelalg._fastgram.build_profile_df``).  Returns the
    ``(Kh, Kl)`` pair that :func:`chol_df` factors — the TRUE model
    Gram, immune to the f32 transcendental assembly error.
    """
    r2h, r2l = r2_pairs_df(X, Y)
    if lenscale is not None:
        ls = jnp.asarray(lenscale, r2h.dtype)
        s2h, s2l = _two_prod(ls, ls)
        ih, il = div(jnp.ones_like(ls), jnp.zeros_like(ls), s2h, s2l)
        r2h, r2l = mul(r2h, r2l, ih, il)
    return profile_df(r2h, r2l, *params)


def sum_df(xh, xl):
    """Compensated reduction: df pairwise sum to a scalar df pair.

    For massively-cancelling sums (e.g. ⟨Kbar, dK⟩ whose terms are
    cond-amplified while the result is O(gradient)), a plain f32
    tree-sum loses ~mach·Σ|terms| — several percent of the result.
    Here each halving level uses the compensated :func:`add`, so the
    accumulated error is ~log₂(n)·2⁻⁴⁹ relative to the partials:
    fully vectorized, log₂(n) elementwise passes, O(n) total work.
    """
    xh = xh.ravel()
    xl = xl.ravel()
    n = xh.shape[0]
    # pad to a power of two with exact zeros
    p = 1 << max(0, (n - 1).bit_length())
    if p != n:
        xh = jnp.concatenate([xh, jnp.zeros(p - n, xh.dtype)])
        xl = jnp.concatenate([xl, jnp.zeros(p - n, xl.dtype)])
    while p > 1:
        p //= 2
        xh, xl = add(xh[:p], xl[:p], xh[p:], xl[p:])
    return xh[0], xl[0]
