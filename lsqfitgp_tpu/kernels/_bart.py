"""BART (Bayesian Additive Regression Trees) limit kernel.

Counterpart of reference ``src/lsqfitgp/_kernels/_bart.py`` (kernel at
``:33``, class methods at ``:205-810``): the covariance function of the
infinite-trees limit of the BART prior (Chipman, George & McCulloch
2010), with a depth cap ``maxd``, recursion resets, and a γ-interpolated
bound at the cap.

The recursion over split counts (see `BART` docstring) is computed here
as a *tile-vectorized* evaluation: every quantity carries a trailing
covariate axis ``p`` and broadcasts over the (x, y) Gram block, so one
call evaluates a whole tile with fused elementwise XLA ops — there is no
scalar core + vmap and no hashing of inputs (the reference's approach;
with tile vectorization the n⁰ vectors are available directly).

Depth brackets of ≤3 levels use closed forms derived from the identity
Σ_{k=0}^{m-1} 1/(k+a) = ψ(m+a) − ψ(a); deeper brackets enumerate the
split choices with a masked ``lax.scan`` over a static bound.
"""

from __future__ import annotations


import jax
from jax import lax
from jax import numpy as jnp
from jax.scipy import special as jspecial

from .. import _array, _jaxutil
from ..kernelalg import kernel

__all__ = ['BART']


def _flt(*args):
    return _jaxutil.float_type(*args)


def _structured_to_matrix(x):
    """Flatten a StructuredArray's fields into a trailing axis."""
    if isinstance(x, _array.StructuredArray):
        cols = []
        for name in x.fields:
            v = x[name]
            if isinstance(v, _array.StructuredArray):
                v = _structured_to_matrix(v)
                cols.append(v.reshape(x.shape + (-1,)))
            else:
                tail = v.shape[len(x.shape):]
                cols.append(v.reshape(x.shape + (-1,)) if tail
                            else v[..., None])
        return jnp.concatenate(cols, axis=-1)
    return jnp.asarray(x)


@kernel(derivable=False, batchbytes=10e6)
def _BARTBase(x, y,
              alpha=0.95, beta=2, maxd=2, gamma=1, splits=None, pnt=None,
              intercept=True, weights=None, reset=None, indices=False):
    """BART kernel; see class `BART` for the full parameter list.

    x, y may be structured (each leaf field a covariate) or plain
    (single covariate).  ``splits`` is the pair produced by
    `BART.splits_from_coord`.  Reference ``_kernels/_bart.py:33``.
    """
    length, spl = BART._check_splits(splits, indices)
    xm = _structured_to_matrix(x)
    ym = _structured_to_matrix(y)
    if not isinstance(x, _array.StructuredArray) and xm.shape == x.shape:
        xm = xm[..., None]
    if not isinstance(y, _array.StructuredArray) and ym.shape == y.shape:
        ym = ym[..., None]
    if indices:
        ix, iy = xm, ym
    else:
        ix = BART._searchsorted_cols(spl, xm)
        iy = BART._searchsorted_cols(spl, ym)
    return BART.correlation(
        length, ix, iy, alpha=alpha, beta=beta, gamma=gamma, maxd=maxd,
        pnt=pnt, intercept=intercept, weights=weights, reset=reset,
        altinput=True, kmax_hint=int(spl.shape[0]),
    )


class BART(_BARTBase):

    __doc__ = _BARTBase.__doc__

    # -- grid helpers --------------------------------------------------------

    @classmethod
    def splits_from_coord(cls, x):
        """Build the splitting grid (midpoints of observed values).

        Returns ``(length, splits)``: per-dimension split counts (p,) and
        a (n, p) matrix of sorted splitting points padded with +huge.
        Reference ``_kernels/_bart.py:210``.
        """
        xm = _structured_to_matrix(_array.asarray(x))
        if not isinstance(x, _array.StructuredArray) and \
                xm.ndim == jnp.ndim(x):
            xm = xm[..., None]
        return cls._splits_from_matrix(xm)

    @staticmethod
    @jax.jit
    def _splits_from_matrix(xm):
        p = xm.shape[-1]
        flat = xm.reshape(-1, p)
        fill = (
            jnp.finfo(flat.dtype).max
            if jnp.issubdtype(flat.dtype, jnp.inexact)
            else jnp.iinfo(flat.dtype).max
        )

        def percol(col):
            u = jnp.unique(col, size=col.size, fill_value=fill)
            mid = jnp.where(u[1:] < fill, (u[1:] + u[:-1]) / 2, fill)
            count = jnp.searchsorted(mid, fill)
            return count, mid

        counts, mids = jax.vmap(percol, in_axes=1, out_axes=(0, 1))(flat)
        return counts, mids

    @classmethod
    def indices_from_coord(cls, x, splits):
        """Map coordinates to indices in the splitting bins: 0 = before
        the first split, i = between split i-1 and split i.
        Reference ``_kernels/_bart.py:262``."""
        length, spl = cls._check_splits(splits, False)
        xm = _structured_to_matrix(_array.asarray(x))
        if not isinstance(x, _array.StructuredArray) and \
                xm.ndim == jnp.ndim(x):
            xm = xm[..., None]
        if xm.shape[-1] != length.size:
            raise ValueError(
                f'grid has {length.size} dimensions, x has {xm.shape[-1]}'
            )
        return cls._searchsorted_cols(spl, xm)

    @staticmethod
    def _check_splits(splits, indices):
        length, spl = splits
        length = jnp.asarray(length)
        assert length.ndim == 1
        spl = jnp.asarray(spl)
        if not indices:
            if spl.ndim == 1:
                spl = spl[:, None]
            assert length.size == spl.shape[-1]
        return length, spl

    @staticmethod
    @jax.jit
    def _searchsorted_cols(A, V):
        """searchsorted per column: A (n, p), V (..., p) -> (..., p)."""
        def percol(a, v):
            return jnp.searchsorted(a, v)
        return jax.vmap(percol, in_axes=(1, -1), out_axes=-1)(
            A, V
        )

    # -- correlation ----------------------------------------------------------

    @classmethod
    def correlation(cls, splitsbefore_or_totalsplits,
                    splitsbetween_or_index1, splitsafter_or_index2, *,
                    alpha=0.95, beta=2, gamma=1, maxd=2, debug=False,
                    pnt=None, intercept=True, weights=None, reset=None,
                    altinput=False, kmax_hint=None):
        """BART prior correlation between two points, vectorized over
        leading axes of the count/index arrays.

        With ``altinput=False`` the inputs are the per-dimension counts
        of splits (before, between, after) the two points; with
        ``altinput=True`` they are (total splits, index1, index2).
        Reference ``_kernels/_bart.py:302``.
        """
        a1 = jnp.asarray(splitsbefore_or_totalsplits)
        a2 = jnp.asarray(splitsbetween_or_index1)
        a3 = jnp.asarray(splitsafter_or_index2)

        if altinput:
            n = a1
            lo = jnp.minimum(a2, a3)
            hi = jnp.maximum(a2, a3)
            nminus = lo
            n0 = hi - lo
            nplus = n - hi
        else:
            nminus, n0, nplus = a1, a2, a3
            n = nminus + n0 + nplus

        # non-termination probabilities P_d, d = 0..maxd
        if pnt is None:
            assert int(maxd) == maxd and maxd >= 0
            d = jnp.arange(maxd + 1)
            pnt = jnp.asarray(alpha)[..., None] / (
                1 + d) ** jnp.asarray(beta)[..., None]
        else:
            pnt = jnp.asarray(pnt)
        D = pnt.shape[-1] - 1

        p = n.shape[-1]
        if weights is None:
            w = jnp.ones(p)
        else:
            w = jnp.asarray(weights)

        if isinstance(gamma, str):
            if gamma != 'auto':
                raise KeyError(gamma)
            gamma = cls._gamma_auto(p, pnt)
        gamma = jnp.asarray(gamma)

        if not intercept:
            pnt = pnt.at[..., 0].set(1)

        # reset depths -> brackets [t, b] with t, b consecutive resets
        if reset is None:
            reset = []
        elif not hasattr(reset, '__len__'):
            reset = [reset]
        edges = [0] + sorted(reset) + [D]
        brackets = [(t, b) for t, b in zip(edges, edges[1:]) if b > t]
        if not brackets:
            brackets = [(0, 0)]

        kmax = cls._static_kmax(nminus, nplus, kmax_hint)

        corr = gamma
        for t, b in reversed(brackets):
            probs = pnt[..., t:b + 1]
            if t > 0:
                probs = probs.at[..., 0].set(1)
            corr = cls._corr_bracket(
                probs, nminus, n0, nplus, n, w, corr, bool(debug), kmax
            )
        return corr

    @staticmethod
    def _gamma_auto(p, pnt):
        """Empirical interpolation coefficient calibrated on maxd 1..3
        (reference ``_kernels/_bart.py:393-399`` formula)."""
        gamma_0 = 0.611 + 0.021 * jnp.exp(-1.3 * (p - 1))
        gamma_d = -0.0034 + 0.084 * jnp.exp(-2.02 * (p - 1))
        s = 2.03 - 0.69 * jnp.exp(-0.72 * (p - 1))
        t = 4.01 - 1.49 * jnp.exp(-0.77 * (p - 1))
        maxd = pnt.shape[-1] - 1
        floor = jnp.clip(gamma_0 - gamma_d * maxd, 0, 1)
        P0 = pnt[..., 0]
        P1 = jnp.minimum(P0, pnt[..., 1])
        corner = jnp.where(P0, 1 - P0 ** (s - t) * P1 ** t, 1)
        return floor * corner

    # -- bracket evaluation ----------------------------------------------------

    @classmethod
    def _corr_bracket(cls, probs, nminus, n0, nplus, n, w, gamma, debug,
                      kmax=None):
        """Evaluate one depth bracket on the ORIGINAL counts, with the
        deeper brackets' result entering as the base value ``gamma``."""
        L = probs.shape[-1] - 1
        flt = _flt(probs, w, gamma)
        w = w.astype(flt)
        active = (w > 0) & (n > 0)
        anyn0 = jnp.any((n0 > 0) & active, axis=-1)

        if L == 0:
            return jnp.where(anyn0, 1 - (1 - gamma) * probs[..., 0], 1)

        W = jnp.sum(jnp.where(active, w, 0), axis=-1)
        S_frac = jnp.sum(
            jnp.where(active, w * n0 / jnp.where(n, n, 1), 0), axis=-1
        )  # Σ w_i n⁰_i / n_i

        if L == 1 and not debug:
            # k = 1 − P0 (1 − Q + (Q/W) Σ w n0/n),  Q = 1 − (1−γ)P1
            P0, P1 = probs[..., 0], probs[..., 1]
            Q = 1 - (1 - gamma) * P1
            val = 1 - P0 * (1 - Q + Q / W * S_frac)
            return jnp.where(anyn0, val, 1)

        if L == 2 and not debug:
            return cls._corr_two_levels(
                probs, nminus, n0, nplus, n, w, gamma, active, anyn0, W
            )

        # generic: enumerate split choices at the top level, recurse
        return cls._corr_enumerate(
            probs, nminus, n0, nplus, n, w, gamma, debug, active, anyn0, W,
            kmax,
        )

    @classmethod
    def _corr_two_levels(cls, probs, nminus, n0, nplus, n, w, gamma,
                         active, anyn0, W):
        r"""Closed form for a 3-prob bracket [P0, P1, P2].

        Derivation: at the middle level, splitting axis i at position k
        below x changes only axis i's counts; with
        S = Σ_j w_j nout_j/n_j and s_i = w_i nout_i/n_i the inner sums
        over k reduce via Σ_{k=0}^{m-1} 1/(k+a) = ψ(m+a) − ψ(a) to the
        digamma expressions below.  The only subtlety is the k = 0 term
        of the side whose complementary counts vanish, where axis i
        drops out of the active set and the weight normalization becomes
        W − w_i.
        """
        flt = _flt(probs, w, gamma)
        P0, P1, P2 = probs[..., 0], probs[..., 1], probs[..., 2]
        Q = 1 - (1 - gamma) * P2

        nsafe = jnp.where(n, n, 1)
        nout = nminus + nplus
        s = jnp.where(active, w * nout / nsafe, 0)
        S = jnp.sum(s, axis=-1, keepdims=True)          # (..., 1)
        Wk = W[..., None]
        Wmod = Wk - jnp.where(active, w, 0)

        # --- sum over k = 0..nminus_i-1 (shrink the left counts) ---
        # axis-i active unless k = 0 and n0_i + nplus_i = 0
        nm0 = n0 + nplus            # complementary when shrinking nminus
        np0 = n0 + nminus           # complementary when shrinking nplus

        def side(m, comp):
            # Σ_{k=0}^{m-1} k1(axis i -> k), with complementary count comp
            # k1 = 1 − P1 + P1 Q (S − s_i + w_i(k+comp−n0)/(k+comp)) / W'
            # where (k + comp − n0)/(k + comp) = 1 − n0/(k+comp)
            P1k = P1[..., None]
            Qk = Q[..., None]
            # number of k-terms with full active set / with axis dropped
            drop = (comp == 0)                     # axis drops at k=0
            m_full = jnp.where(drop, jnp.maximum(m - 1, 0), m)
            # Σ 1/(k+comp) for k=0..m-1, skipping k=0 when comp==0
            a = jnp.where(drop, 1, comp).astype(flt)
            mm = m_full.astype(flt)
            psi_sum = jspecial.digamma(a + mm) - jspecial.digamma(a)
            # contribution of the w_i-fraction term over k (axis active):
            # Σ (w_i − w_i n0/(k+comp)) = w_i m_full − w_i n0 ψ-sum
            wi_term = w * m_full - w * n0 * psi_sum
            # terms with the full active set (W' = W):
            full = (
                m_full * (1 - P1k)
                + P1k * Qk / Wk * (m_full * (S - s) + wi_term)
            )
            # the dropped-axis k=0 term (only when m > 0 and comp == 0):
            dropped = (
                (1 - P1k)
                + P1k * Qk * (S - s) / jnp.where(Wmod, Wmod, 1)
            )
            return full + jnp.where(drop & (m > 0), dropped, 0)

        inner = side(nminus, nm0) + side(nplus, np0)    # (..., p)
        sump = jnp.sum(
            jnp.where(active, w * inner / nsafe, 0), axis=-1
        )
        val = 1 - P0 * (1 - sump / W)
        return jnp.where(anyn0, val, 1)

    @classmethod
    def _corr_enumerate(cls, probs, nminus, n0, nplus, n, w, gamma,
                        debug, active, anyn0, W, kmax):
        """Generic level: enumerate (axis i, split position k) with a
        masked scan over a static bound, recursing on the level below."""
        p = n.shape[-1]
        P0 = probs[..., 0]
        sub = probs[..., 1:]

        sump = jnp.zeros(jnp.broadcast_shapes(
            P0.shape, W.shape, anyn0.shape))
        for i in range(p):
            def body(carry, k):
                acc = carry
                # shrink nminus_i -> k (valid for k < nminus_i)
                nm2 = nminus.at[..., i].set(k)
                v1 = cls._corr_bracket(
                    sub, nm2, n0, nplus, nm2 + n0 + nplus, w, gamma, debug,
                    kmax,
                )
                acc = acc + jnp.where(k < nminus[..., i], v1, 0)
                # shrink nplus_i -> k (valid for k < nplus_i)
                np2 = nplus.at[..., i].set(k)
                v2 = cls._corr_bracket(
                    sub, nminus, n0, np2, nminus + n0 + np2, w, gamma, debug,
                    kmax,
                )
                acc = acc + jnp.where(k < nplus[..., i], v2, 0)
                return acc, None

            sumn, _ = lax.scan(body, jnp.zeros_like(sump),
                               jnp.arange(kmax))
            ni = n[..., i]
            sump = sump + jnp.where(
                ni > 0, w[i] * sumn / jnp.where(ni, ni, 1), 0
            )

        val = 1 - P0 * (1 - sump / W)
        return jnp.where(anyn0, val, 1)

    @staticmethod
    def _static_kmax(nminus, nplus, hint=None):
        if hint is not None:
            return int(hint)
        with jax.ensure_compile_time_eval():
            try:
                return int(jnp.maximum(jnp.max(nminus), jnp.max(nplus)))
            except jax.errors.ConcretizationTypeError:
                raise ValueError(
                    'deep BART brackets under tracing need a static split '
                    'bound; pass splits to the kernel (sets kmax_hint) or '
                    'call correlation with kmax_hint'
                )
