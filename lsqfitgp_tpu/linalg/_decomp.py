"""PSD matrix decompositions.

TPU-native counterpart of reference ``src/lsqfitgp/_linalg/_decomp.py``.
The public contract (the :class:`Decomposition` operations and the
regularization semantics of :class:`Chol`) matches the reference
(``_decomp.py:126-278`` for the ABC, ``:349-439`` for Chol's
``diag_scale_pow2`` + Gershgorin-bound eps); the implementation is
re-designed for XLA/TPU:

- Everything is a pytree of device arrays (crosses ``jit`` freely).
- Gradients of the log-density: the fused :func:`chol_nll` carries the
  reference's hand-derived reverse formulas (``_decomp.py:441-586``) as
  a ``custom_jvp`` — value+grad ~2x the forward pass; plain
  AD through the factorization's tangent rule also works (the method
  path) at ~10-16x.  The Fisher matrix and Fisher-vector products use
  explicit batched triangular solves (the hand-derived formulas of
  reference ``_decomp.py:20-109``) because AD cannot produce them.
- There is no object-dtype (gvar) path: uncertainty propagation happens
  in :mod:`lsqfitgp_tpu.uncert` with dense Jacobians, which flow through
  the same device ops.
"""

from __future__ import annotations

import abc
import functools
import math

import jax
import numpy
from jax import lax
from jax import numpy as jnp
from jax.scipy.linalg import solve_triangular

from . import _blocked
from . import _df
from ._pytree import AutoPyTree
from .._jaxutil import skipifabstract

__all__ = ['Decomposition', 'Chol', 'chol_nll', 'chol_nll_stream',
           'chol_nll_stream_grad', 'chol_pred_stream',
           'chol_stream_fisher', 'solve_batched']


def _float_eps(dtype):
    return float(numpy.finfo(numpy.dtype(str(dtype))).eps)


class Decomposition(AutoPyTree, abc.ABC):
    """Abstract decomposition of a PSD matrix K, exposing regularized
    pseudo-inverse bilinear forms and Gaussian-density operations.

    Contract mirrors reference ``_decomp.py:126-278``.
    """

    @abc.abstractmethod
    def matrix(self):
        """The (regularized) matrix K."""

    @property
    @abc.abstractmethod
    def n(self):
        """Size of K."""

    @abc.abstractmethod
    def ginv_linear(self, X):
        """K⁺ X."""

    def ginv(self):
        return self.ginv_linear(jnp.eye(self.n, dtype=self.matrix().dtype))

    @abc.abstractmethod
    def pinv_bilinear(self, A, r):
        """A' K⁺ r."""

    @abc.abstractmethod
    def ginv_quad(self, A):
        """A' K⁺ A."""

    @abc.abstractmethod
    def ginv_diagquad(self, A):
        """diag(A' K⁺ A)."""

    @abc.abstractmethod
    def correlate(self, x):
        """M x with M M' = K (colored noise from white)."""

    @abc.abstractmethod
    def back_correlate(self, X):
        """M' X."""

    @abc.abstractmethod
    def pinv_correlate(self, x):
        """M⁻¹ x (whitening)."""

    @abc.abstractmethod
    def minus_log_normal_density(self, r):
        """-log N(r | 0, K) = (r'K⁺r + logdet K + n log 2π) / 2."""

    @abc.abstractmethod
    def logdet(self):
        """log det K (regularized)."""


def _parse_eps(epsrel, epsabs, n, dtype):
    """'auto' regularization scale.

    In float64, ``n * eps`` relative to the Gershgorin eigenvalue bound
    (reference ``_decomp.py:245`` parity — at f64 this is always
    negligible vs the data).

    In float32 — the dtype the framework actually ships on TPU — ANY
    bound-relative default over-regularizes catastrophically: on a
    smooth kernel the Gershgorin bound grows ~linearly with n, so even
    ``4 * eps32 * bound`` reaches ~2e-4 at n=1536 and exceeds a typical
    small noise level, which biases the marginal likelihood and was
    measured to flip hyperparameter gradient signs.  Models whose
    condition number is within f32 reach (cond « 1/eps32) need almost
    no regularization at all — a *diagonal-anchored* ``4 * eps32``
    (~5e-7 on the unit-scaled matrix) leaves the NLL gradient within
    0.1% of the f64 truth at a 1e-3 noise level (measured, n=1536
    ExpQuad).  Genuinely singular matrices (prior-only Grams) are
    instead handled by ESCALATION: if the small-eps factorization
    fails, :class:`Chol` refactors once with the classic bound-scaled
    eps (see ``Chol.__init__``), so sampling from noiseless priors
    still works without distorting well-posed fits.

    Returns ``(epsrel, epsabs, escalate)`` — floats (0 where the f32
    'auto' diagonal anchor, applied by the caller, replaces them) and
    whether the caller should enable the failure-escalation ladder.
    """
    mach = _float_eps(dtype)
    f32 = mach > 1e-10
    escalate = False
    if epsrel == 'auto':
        if f32:
            epsrel = 0.0
            escalate = True
        else:
            epsrel = n * mach
    if epsabs == 'auto':
        # absolute, diagonal-anchored also in f64 (harmlessly tiny)
        epsabs = 4 * mach
    return float(epsrel), float(epsabs), escalate


def diag_scale_pow2(K):
    """Power-of-2 diagonal scaling: s_i = 2^round(log2 K_ii)/2 such that
    the scaled matrix has ~unit diagonal but the scaling is exactly
    representable, so it introduces no rounding error.

    Counterpart of reference ``_decomp.py:356`` (``diag_scale_pow2``).
    """
    d = jnp.diag(K)
    safe = jnp.where(d > 0, d, 1)
    # s ≈ 1/sqrt(d), rounded to a power of 2
    ex = jnp.round(-0.5 * jnp.log2(safe))
    s = jnp.exp2(ex)
    return s


def eigval_bound(K):
    """Cheap upper bound on the max eigenvalue (Gershgorin).

    Counterpart of reference ``_decomp.py:349``.
    """
    return jnp.max(jnp.sum(jnp.abs(K), axis=1))


@functools.partial(jax.custom_jvp, nondiff_argnums=(4,))
def _small_factor_ladder(K, s, eps, eps2, escalate):
    """Unblocked (n < 1024) counterpart of
    :func:`._blocked.chol_factor_scaled_ladder`: factor
    ``diag(s) K diag(s) + eps I`` with ``lax.linalg.cholesky``,
    escalating once to ``eps2`` (with the self-healing lift) when the
    small-eps attempt comes back non-finite.  Returns
    ``(L, eps_used, escalated)``.

    The ``custom_jvp`` computes the tangent from the final finite
    factor (``dL = L Φ(L⁻¹ dK_s L⁻ᵀ)``), so a failed first rung's NaNs
    never reach reverse-mode cotangents — same rationale as the
    blocked ladder's rule.
    """
    n = K.shape[0]

    def small(e, heal):
        Ks = K * s[:, None] * s[None, :] + e * jnp.eye(n, dtype=K.dtype)
        # same self-healing lift as the blocked path's diagonal
        # blocks, applied globally (one extra small cholesky)
        return _blocked._chol_lifted(Ks, True if heal else None)

    L = small(eps, heal=not escalate)
    if not escalate:
        return L, eps, jnp.asarray(False)
    ok = jnp.all(jnp.isfinite(L))
    L = lax.cond(ok, lambda _: L, lambda _: small(eps2, True), None)
    return L, jnp.where(ok, eps, eps2), ~ok


@_small_factor_ladder.defjvp
def _small_factor_ladder_jvp(escalate, primals, tangents):
    K, s, eps, eps2 = primals
    dK, ds, deps, deps2 = tangents
    L, eps_used, escalated = _small_factor_ladder(K, s, eps, eps2,
                                                  escalate)
    deps_used = jnp.where(escalated, deps2, deps)
    dKs = dK * s[:, None] * s[None, :] \
        + K * (ds[:, None] * s[None, :] + s[:, None] * ds[None, :]) \
        + deps_used * jnp.eye(K.shape[0], dtype=K.dtype)
    # dL = L Φ(L⁻¹ dK_s L⁻ᵀ), Φ = tril with halved diagonal
    W = solve_triangular(L, dKs, lower=True)
    A = solve_triangular(L, W.T, lower=True).T
    Phi = jnp.tril(A) - 0.5 * jnp.diag(jnp.diag(A))
    dL = jnp.dot(L, Phi, precision=lax.Precision.HIGHEST)
    descalated = numpy.zeros(escalated.shape, jax.dtypes.float0)
    return (L, eps_used, escalated), (dL, deps_used, descalated)


class Chol(Decomposition):
    """Regularized Cholesky decomposition.

    K is scaled to near-unit diagonal with exact power-of-2 factors, a
    regularization ``eps = epsrel * maxeig_bound + epsabs`` is added to
    the scaled diagonal, and the Cholesky factor is taken.

    ``epsrel='auto'`` means ``n * finfo(dtype).eps`` in float64
    (reference ``_decomp.py:245`` ``_parseeps`` semantics).  In float32
    'auto' is a two-rung ladder instead: a tiny diagonal-anchored eps
    (``4 * eps32 *`` max scaled diagonal, ~5e-7 — measured to leave NLL
    gradients within 0.1% of the f64 truth on models f32 can represent
    at all), escalating to the classic bound-scaled eps in a single
    ``lax.cond`` refactorization only if the small-eps factorization
    produces non-finite values (genuinely singular Grams, e.g.
    noiseless priors being sampled).  See ``_parse_eps`` for the
    measurements behind this.

    ``self.accuracy_ratio`` estimates the factorization's backward
    error from a matvec probe: ``max|K̃v - L(L'v)|`` over a fixed ±1
    vector ``v``, in units of ``eps * bound`` roundoff.  O(1-100) is
    healthy; very large values (≫1e3) mean the matrix's conditioning
    exceeds the dtype (cond ≳ 1/eps) and results are unreliable — in
    eager mode a warning is raised.  f32 feasibility boundary and
    escape hatches (bigger noise, explicit ``epsabs``, x64) are
    documented in docs/perf.md.

    ``blocked='auto'`` (default) switches to the MXU blocked
    factorization + matmul-based blocked triangular solves
    (:mod:`._blocked`) for ``n >= 1024`` — ~2x faster than
    ``lax.linalg.cholesky`` on TPU at n=8192.  Pass ``True``/``False``
    to force either path.
    """

    _BLOCK = 512

    def __init__(self, K, *, epsrel='auto', epsabs=0, blocked='auto',
                 precision=None, block=None, df='auto', df_gram=None):
        K = jnp.asarray(K)
        n = K.shape[0]
        if df_gram is not None and not callable(df_gram):
            # closure-converted form (fn, consts): traced constants
            # hoisted so the fused-NLL rule can route them as operands
            _dfg_fn, _dfg_consts = df_gram
            df_gram = lambda: _dfg_fn(*_dfg_consts)
        epsrel, epsabs, escalate = _parse_eps(epsrel, epsabs, n, K.dtype)
        # double-float rescue eligibility: replaces the biased eps2
        # escalation outcome with an emulated-double-precision refactor
        # at the PRIMARY eps (see linalg._df).  'auto' = up to DF_MAX;
        # True forces it regardless of size; False disables.
        df_eligible = escalate and df is not False \
            and (df is True or n <= _df.DF_MAX)
        mach = _float_eps(K.dtype)
        s = diag_scale_pow2(K)
        # Gershgorin bound of the scaled matrix computed as a scaled
        # |K| matvec: one read pass, no |Ks| materialization.  The
        # bound (and dmax below) are held CONSTANT under AD: eps is a
        # numerical artifact, and the reference's hand-derived density
        # gradient holds it fixed (_linalg/_decomp.py:441-586) — the
        # fused chol_nll does the same, so without this the unfused
        # gradient would disagree with the fused one by d(NLL)/d(eps) ·
        # d(bound)/dK whenever the 'auto' ladder's bound-scaled rung is
        # live (an explicitly traced epsabs still carries gradient)
        bound = lax.stop_gradient(jnp.max(s * (jnp.abs(K) @ s)))
        eps = epsrel * bound + epsabs
        if escalate:
            # f32 'auto': tiny diagonal-anchored primary eps; the
            # bound-scaled fallback rung is sized so the REGULARIZED
            # condition number bound/eps2 = 1/(32*mach) ≈ 2.6e5 is
            # safely within f32 factorization reach — 4*mach*bound
            # leaves cond ≈ 2e6 at the f32 edge, and the per-block
            # lift then bumps diagonals by ~1e3*mach*bound (a 7%
            # distortion, measured on a singular n=1200 smooth Gram)
            dmax = lax.stop_gradient(jnp.max(jnp.diag(K) * s * s))
            eps = eps + 4 * mach * dmax
            eps2 = 32 * mach * bound + epsabs
            eps_primary = eps  # the small rung the df rescue refactors at
        if block is not None:
            # per-instance panel width (e.g. tuned per problem size);
            # the solvers read it back from _BLOCK
            self._BLOCK = int(block)
        if blocked == 'auto':
            blocked = n >= 1024
        escalated = jnp.asarray(False)
        if blocked:
            # precision=None → adaptive (fast bf16_3x pass, HIGHEST
            # refactorization with self-healing lifts on non-finite);
            # pass 'highest' to force single-pass f32-grade matmuls.
            # The diagonal scaling + eps are fused into the strip loads
            # (the scaled matrix is never materialized)
            if escalate and n > _blocked._ADAPTIVE_MAX:
                # the escalation lax.cond would double-buffer two full
                # factorizations — beyond the memory policy size run a
                # single lifted pass at the small eps; the degradation
                # probes still flag heavy healing
                escalate = False
            scheme = _blocked._pick_scheme('auto', n)
            if escalate and precision is None and scheme == 'rec':
                # single-cond three-rung ladder (high/eps →
                # highest/eps → highest/eps2+lift); the rare rungs are
                # nested inside the fallback branch, so the well-posed
                # common case pays ONE cond instead of the two stacked
                # ones (each measured ~3 ms of branch-buffer traffic
                # at n=16384)
                L, Dinv, eps, escalated = \
                    _blocked.chol_factor_scaled_ladder(
                        K, s, eps, eps2, self._BLOCK, 128)
                escalate = False  # ladder already applied eps2
            else:
                L, Dinv = _blocked.chol_factor_scaled(
                    K, s, eps, self._BLOCK, 128, precision,
                    'auto', not escalate)
            if escalate:
                # heal=False above: a singular matrix comes back
                # non-finite from the tiny-eps rung (instead of being
                # silently lift-bumped by ~7%) and is refactored here
                # with the bound-scaled eps2 (~0.2% distortion)
                ok = jnp.all(jnp.isfinite(Dinv))
                L, Dinv = lax.cond(
                    ok,
                    lambda _: (L, Dinv),
                    lambda _: _blocked.chol_factor_scaled(
                        K, s, eps2, self._BLOCK, 128, 'highest'),
                    None,
                )
                eps = jnp.where(ok, eps, eps2)
                escalated = ~ok
            # materialize the factor before downstream consumers: without
            # this XLA re-fuses strip computations into each solve's row
            # slices (measured +2.2 ms at n=8192 on v5e)
            L, Dinv = lax.optimization_barrier((L, Dinv))
        else:
            if not escalate:
                eps2 = eps
            L, eps, escalated = _small_factor_ladder(
                K, s, jnp.asarray(eps, K.dtype),
                jnp.asarray(eps2, K.dtype), escalate)
            Dinv = None
        self._L = L
        self._Dinv = Dinv
        self._s = s
        self._eps = eps
        # matvec-probe estimate of the factorization backward error, in
        # units of one rounding of the dominant eigenvalue (see class
        # docstring); O(sqrt(n)) is healthy, ≫1e3·sqrt(n) means the
        # conditioning exceeds the dtype
        v = jnp.where(jnp.arange(n) % 2 == 0, 1, -1).astype(K.dtype)
        hi = lax.Precision.HIGHEST
        Kv = s * jnp.dot(K, s * v, precision=hi) + eps * v
        LLtv = jnp.dot(L, jnp.dot(L.T, v, precision=hi), precision=hi)
        self._resid_ratio = jnp.max(jnp.abs(Kv - LLtv)) \
            / jnp.maximum(mach * bound, jnp.finfo(K.dtype).tiny)
        # pivot-based condition estimate: bound ≈ λmax (Gershgorin),
        # min pivot² ≈ λmin of the regularized scaled matrix
        self._cond_est = bound / jnp.maximum(
            jnp.min(jnp.diag(L)) ** 2, jnp.finfo(K.dtype).tiny)
        self._escalated = escalated
        # double-float rescue: when the small-eps rung failed, refactor
        # S K S + eps_primary·I in emulated double precision (lax.cond:
        # the well-posed case pays nothing at runtime).  Solves and the
        # log-density then route through the df factor, restoring the
        # reference's float64-grade accuracy contract instead of the
        # warned-but-biased eps2 result (see linalg._df module docs).
        self._Ldf_h = None
        self._Ldf_l = None
        self._df_rescued = jnp.asarray(False)
        self._df_failed = jnp.asarray(False)
        self._df_gram_used = df_gram is not None
        if df_eligible:
            # two triggers:
            # - escalation fired: the f32 result is biased by eps2;
            # - cond_est past 0.1/mach (~8.4e5 at f32): the factor
            #   succeeded but the fused-NLL gradient error crosses ~1%
            #   there.  Measured on an n=768 ExpQuad + nugget sweep
            #   (grad rel. error vs f64 truth): 1.0e-3 at cond 2.0e5,
            #   4.5e-3 at 5.9e5, 2.8e-2 at 2.0e6, with 18-65% errors
            #   at 3.6e6 in the round-3 probe.  A lower threshold
            #   (0.01/mach) was measured to fire on routine
            #   well-conditioned fits (ExpQuad, noise 1e-2, n=4096 →
            #   cond_est 1.0e5, error 5.7e-5), paying the O(100x) VPU
            #   path for accuracy f32 already delivers.
            rescue = escalated | (self._cond_est > 0.1 / mach)
            epsp = jnp.asarray(eps_primary, K.dtype)
            ss = s[:, None] * s[None, :]        # pow2 scaling: exact
            if df_gram is not None:
                # the df Gram is the TRUE model: regularize at the df
                # unit roundoff (the analog of the reference's
                # negligible n·eps64, reference _decomp.py:245), not
                # the f32-scale eps_primary — at cond ≈ 3e6 the
                # 4·eps32 anchor biases the NLL by eps·∂NLL/∂eps ≈
                # 0.08 (measured, n=700), 1000x the df pipeline's own
                # error.  A model singular even at this eps comes back
                # NaN → df_failed → the "MODEL itself is singular"
                # warning.
                epsp = jnp.asarray(
                    n * 2.0 ** -49, K.dtype) * lax.stop_gradient(
                        jnp.max(jnp.diag(K) * s * s))
                # the caller can assemble the TRUE Gram in double-float
                # (exact r² + df transcendentals, see _df module docs):
                # the rescue then starts from the real model instead of
                # the f32-assembled one, whose ~30-ULP transcendental
                # error makes cond ≳ 1e6 matrices indefinite before the
                # factorization sees them.  The assembly is traced
                # INSIDE the cond branch: the well-posed case never
                # runs it.
                def build(_):
                    Kh, Kl = df_gram()
                    return _df.chol_df(Kh * ss, epsp, Kl * ss)

                Lh, Ll = lax.cond(
                    rescue, build,
                    lambda _: (jnp.zeros_like(K), jnp.zeros_like(K)),
                    None,
                )
            else:
                Ks = K * ss
                Lh, Ll = lax.cond(
                    rescue,
                    lambda A: _df.chol_df(A, epsp),
                    lambda A: (jnp.zeros_like(A), jnp.zeros_like(A)),
                    Ks,
                )
            self._Ldf_h = Lh
            self._Ldf_l = Ll
            # a matrix indefinite even at eps_primary (only the healed/
            # escalated f32 factor exists) comes back NaN from the df
            # factorization: keep the f32 answer then
            df_ok = jnp.all(jnp.isfinite(jnp.diag(Lh)))
            self._df_rescued = rescue & df_ok
            self._df_failed = rescue & ~df_ok
            self._eps = jnp.where(self._df_rescued, epsp, self._eps)

    @property
    def n(self):
        return self._L.shape[0]

    # backward-compat alias used by sampling code
    @property
    def m(self):
        return self.n

    @property
    def eps(self):
        return self._eps

    @property
    def accuracy_ratio(self):
        """Matvec-probe backward-error estimate, in units of one
        rounding (``eps * maxeig_bound``).  O(1-10) is healthy; ~1e3
        means the self-healing diagonal lift engaged (the matrix was
        numerically singular at the working precision)."""
        return self._resid_ratio

    @property
    def cond_estimate(self):
        """Cheap condition-number estimate of the regularized scaled
        matrix: Gershgorin λmax bound over the smallest pivot²."""
        return self._cond_est

    def _warn_if_degraded(self, what):
        """Eager-mode numerical-reliability warning, evaluated lazily
        at inverse-using operations (solves, densities) — NOT at
        ``correlate``, so sampling from a numerically singular prior
        (where heavy regularization is expected and harmless) stays
        quiet.  Inside ``jit`` this compiles to nothing.

        Three degradation signals, each measured to track real
        gradient-accuracy loss (see docs/perf.md):
        - escalation to the bound-scaled fallback eps fired (matrix
          singular at the small-eps rung: the factor is of K + eps2·I
          with eps2 possibly exceeding the model's own noise);
        - probe residual ≫ healthy (self-healing lift engaged: some
          diagonal block was bumped by ~1e3 roundoffs);
        - pivot condition estimate beyond ~0.3/eps (forward error of
          solves ~ eps·cond approaches 100%).
        """
        mach = _float_eps(self._L.dtype)

        @skipifabstract
        def check():
            import warnings
            n = self.n
            if bool(self._df_rescued):
                # accuracy was RECOVERED: the escalation refactored in
                # emulated double precision at the primary eps.  Not a
                # reliability problem — surface the perf cliff only.
                warnings.warn(
                    f'Chol.{what}: conditioning exceeded the '
                    f'{self._L.dtype} factorization limit; rescued by '
                    f'an emulated-double-precision refactorization '
                    f'(accurate, but O(100x) slower per solve).  Add '
                    f'noise or pass epsabs to stay on the fast path.'
                )
            elif bool(self._df_failed):
                # the rescue RAN and the matrix was indefinite even in
                # emulated double precision — distinguish "the model
                # itself is singular" (df Gram) from "the f32 assembly
                # corrupted it before we saw it" (no df Gram)
                if self._df_gram_used:
                    why = ('the Gram was assembled in double-float, '
                           'so the MODEL itself is singular at this '
                           'eps — the result keeps the f32 fallback '
                           'regularization')
                else:
                    why = ('the f32-assembled Gram carries ~30-ULP '
                           'transcendental error that can fake '
                           'indefiniteness at cond ≳ 1e6; a '
                           'profile-expressible model (plain '
                           'isotropic kernel + noise) would get a '
                           'double-float Gram assembly and may still '
                           'be rescuable')
                warnings.warn(
                    f'Chol.{what}: the double-float rescue was '
                    f'attempted but the factorization found the '
                    f'matrix indefinite ({why}).  Results use '
                    f'eps={float(self._eps):.2e}; add noise, raise '
                    f'epsabs, or use float64.'
                )
            elif bool(self._escalated):
                warnings.warn(
                    f'Chol.{what}: the matrix was numerically singular '
                    f'at {self._L.dtype}; the factorization used the '
                    f'fallback regularization eps={float(self._eps):.2e} '
                    f'which may exceed the model noise.  Likelihoods '
                    f'and gradients are unreliable; add noise, pass '
                    f'epsabs explicitly, or use float64.'
                )
            elif float(self._resid_ratio) > 100 * max(1., n ** 0.5):
                warnings.warn(
                    f'Chol.{what}: factorization residual '
                    f'{float(self._resid_ratio):.1e} eps-units means '
                    f'self-healing regularization engaged: conditioning '
                    f'is at the {self._L.dtype} limit and results may '
                    f'be inaccurate.  Add noise or use float64.'
                )
            elif float(self._cond_est) > 0.3 / mach:
                warnings.warn(
                    f'Chol.{what}: condition number ~'
                    f'{float(self._cond_est):.1e} approaches the '
                    f'{self._L.dtype} resolution 1/eps={1 / mach:.1e}; '
                    f'solve and gradient accuracy degrades as '
                    f'eps*cond.  Add noise or use float64.'
                )

    def matrix(self):
        L, s = self._L, self._s
        return (L @ L.T) / (s[:, None] * s[None, :])

    # -- solves ------------------------------------------------------------

    def _solve_L(self, x):
        """L⁻¹ x"""
        def fast(x):
            if self._Dinv is not None:
                return _blocked.solve_lower(
                    self._L, x, block=self._BLOCK, Dinv=self._Dinv)
            return solve_triangular(self._L, x, lower=True)
        if self._Ldf_h is None:
            return fast(x)

        def dfpath(x):
            h, l = _df.solve_lower_df(self._Ldf_h, self._Ldf_l, x)
            return h + l
        return lax.cond(self._df_rescued, dfpath, fast, x)

    def _solve_Lt(self, x):
        """L'⁻¹ x"""
        def fast(x):
            if self._Dinv is not None:
                return _blocked.solve_lower_t(
                    self._L, x, block=self._BLOCK, Dinv=self._Dinv)
            return solve_triangular(self._L, x, lower=True, trans=1)
        if self._Ldf_h is None:
            return fast(x)

        def dfpath(x):
            h, l = _df.solve_lower_t_df(self._Ldf_h, self._Ldf_l, x)
            return h + l
        return lax.cond(self._df_rescued, dfpath, fast, x)

    def ginv_linear(self, X):
        self._warn_if_degraded('ginv_linear')
        s = self._s
        Xs = X * s[:, None] if X.ndim > 1 else X * s
        out = self._solve_Lt(self._solve_L(Xs))
        return out * s[:, None] if X.ndim > 1 else out * s

    def pinv_bilinear(self, A, r):
        # A' K⁻¹ r = (L⁻¹ S A)' (L⁻¹ S r)
        self._warn_if_degraded('pinv_bilinear')
        s = self._s
        ZA = self._solve_L(A * s[:, None])
        zr = self._solve_L(r * s)
        return ZA.T @ zr

    def ginv_quad(self, A):
        self._warn_if_degraded('ginv_quad')
        s = self._s
        ZA = self._solve_L(A * s[:, None])
        return ZA.T @ ZA

    def ginv_diagquad(self, A):
        s = self._s
        ZA = self._solve_L(A * s[:, None])
        return jnp.sum(ZA * ZA, axis=0)

    def correlate(self, x):
        """(S⁻¹ L) x, where (S⁻¹L)(S⁻¹L)' = K."""
        s = self._s
        out = self._L @ x
        return out / (s[:, None] if out.ndim > 1 else s)

    def back_correlate(self, X):
        s = self._s
        Xs = X / (s[:, None] if X.ndim > 1 else s)
        return self._L.T @ Xs

    def pinv_correlate(self, x):
        s = self._s
        return self._solve_L(x * (s[:, None] if x.ndim > 1 else s))

    # -- density ------------------------------------------------------------

    def logdet(self):
        def fast(_):
            if self._Dinv is not None:
                # diag(L) = 1/diag(Dinv blocks); the identity-padded
                # tail blocks contribute log 1 = 0.  40x less data than
                # a strided diag gather over the full factor.
                d = jnp.diagonal(self._Dinv, axis1=1, axis2=2)
                return -2 * jnp.sum(jnp.log(d))
            return 2 * jnp.sum(jnp.log(jnp.diag(self._L)))
        if self._Ldf_h is None:
            twologdiagL = fast(None)
        else:
            twologdiagL = lax.cond(
                self._df_rescued,
                lambda _: _df.logdet_df(self._Ldf_h, self._Ldf_l),
                fast, None)
        return twologdiagL - 2 * jnp.sum(jnp.log(self._s))

    def minus_log_normal_density(self, r):
        self._warn_if_degraded('minus_log_normal_density')
        z = self.pinv_correlate(r)
        n = self.n
        return 0.5 * (
            jnp.dot(z, z) + self.logdet() + n * math.log(2 * math.pi)
        )

    def fisher(self, dK, dr):
        """Fisher information matrix for parameters p of (K(p), r(p)):

        F_ij = tr(K⁻¹ dK_i K⁻¹ dK_j)/2 + dr_i' K⁻¹ dr_j

        ``dK``: (P, n, n); ``dr``: (P, n).  Batched triangular solves +
        einsum, the formula of reference ``_decomp.py:441-586``.

        Runs on the float32 factor even when the double-float rescue is
        live (the Fisher is a curvature ESTIMATE for Laplace
        covariances; df-accurate solves would cost O(P n³) VPU flops
        for accuracy the use case doesn't need).
        """
        s = self._s
        P = dK.shape[0]
        # W_i = L⁻¹ S dK_i S L⁻' ; F^K_ij = tr(W_i W_j)/2
        dKs = dK * s[None, :, None] * s[None, None, :]
        A = solve_batched_triangular(self._L, dKs)  # L⁻¹ S dK_i S
        # W_i = A_i L⁻'; tr(W_i W_j) = tr(A_i L⁻' A_j L⁻')... easier:
        # W_i = L⁻¹ (A_i)' would need symmetry; use B_i = L⁻¹ A_i' so
        # W_i = B_i' and tr(W_i W_j) = tr(B_i' B_j') = einsum
        B = solve_batched_triangular(self._L, jnp.swapaxes(A, -1, -2))
        FK = 0.5 * jnp.einsum('iab,jba->ij', B, B)
        zr = solve_triangular(self._L, (dr * s).T, lower=True)  # (n, P)
        Fr = zr.T @ zr
        return FK + Fr

    def fishvec_cotangent(self, dKv, drv):
        """Cotangents for a Fisher-vector product without materializing
        the (P, n, n) derivative stack (reference ``_decomp.py:20-109``
        ``fishvec`` design notes).

        Given the *directional* derivatives along a parameter direction
        ``v`` — ``dKv = Σ_i v_i ∂K/∂p_i`` (n, n) and ``drv = Σ_i v_i
        ∂r/∂p_i`` (n,) — returns ``(C_K, c_r)`` such that

            (F v)_i = <∂K/∂p_i, C_K> + <∂r/∂p_i, c_r>,

        i.e. pulling ``(C_K, c_r)`` back through ``jax.vjp`` of
        ``p -> (K(p), r(p))`` yields the full Fisher-vector product

            (F v)_i = tr(K⁻¹ ∂K_i K⁻¹ dKv)/2 + ∂r_i' K⁻¹ drv

        in O(n²) memory.  ``C_K = K⁻¹ dKv K⁻¹ / 2`` (symmetrized),
        ``c_r = K⁻¹ drv``.
        """
        M = self.ginv_linear(self.ginv_linear(dKv).T)
        M = 0.5 * (M + M.T)
        return 0.5 * M, self.ginv_linear(drv)


def chol_nll(K, r, **choleskykw):
    """Fused ``Chol(K, **kw).minus_log_normal_density(r)`` with the
    hand-derived gradient of the reference (``_linalg/_decomp.py:441-586``
    gradrev formulas) instead of AD through the factorization.

    The derivative rule forms the K-cotangent carrier explicitly,

        ∂V/∂K = ½ S (K_s⁻¹ − z̃ z̃') S,   z̃ = K_s⁻¹ S r,
        ∂V/∂r = S z̃,

    with ``K_s = S K S + eps·I = L L'`` the regularized scaled matrix
    (``S``, ``eps`` held constant: ``S`` is pow2-quantized — locally
    exactly constant — and the eps sensitivity is O(eps)).  ``K_s⁻¹`` is
    one blocked triangular inverse (n³/3 MACs of MXU matmuls,
    :func:`lsqfitgp_tpu.linalg._blocked.trtri_blocked`) plus one syrk —
    so value+gradient costs ~2x the forward pass (measured 2.1x at
    n=8192 on v5e with the Pallas triangular-skip WᵀW,
    :func:`lsqfitgp_tpu.ops.syrk_t_full`), where AD through the
    factorization's tangent rule pays two dense triangular solves with
    n right-hand sides (~10-16x, measured at n=8192-16384).
    Both AD modes work: the rule is linear in (dK, dr), so reverse mode
    transposes it to scaling the stored carrier by the cotangent.
    """
    dfg = choleskykw.pop('df_gram', None)
    opts = tuple(sorted(choleskykw.items()))
    if dfg is None:
        return _chol_nll_cjvp(K, jnp.asarray(r), (), (None, opts))
    if callable(dfg):
        # bare-closure form: must not capture tracers (it rides the
        # rule's static metadata); the GP layer always hands the
        # closure-converted (fn, consts) form instead
        return _chol_nll_cjvp(K, jnp.asarray(r), (), (dfg, opts))
    fn, consts = dfg
    return _chol_nll_cjvp(K, jnp.asarray(r), tuple(consts), (fn, opts))


def _df_gram_bind(fn, consts):
    return None if fn is None else (lambda: fn(*consts))


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _chol_nll_cjvp(K, r, dfconsts, meta):
    fn, opts = meta
    kw = dict(opts)
    dfg = _df_gram_bind(fn, dfconsts)
    if dfg is not None:
        kw['df_gram'] = dfg
    dec = Chol(K, **kw)
    return dec.minus_log_normal_density(r)


@_chol_nll_cjvp.defjvp
def _chol_nll_jvp(meta, primals, tangents):
    K, r, dfconsts = primals
    # dfconsts tangents are ignored: the df Gram's θ-sensitivity
    # duplicates dK's (the df rescue is primal-accurate with f32-grade
    # tangents, same convention as the rescue's Fisher)
    dK, dr = tangents[0], tangents[1]
    fn, opts = meta
    kw = dict(opts)
    dfg = _df_gram_bind(fn, dfconsts)
    if dfg is not None:
        kw['df_gram'] = dfg
    dec = Chol(K, **kw)
    s = dec._s
    val = dec.minus_log_normal_density(r)
    z = dec.pinv_correlate(r)             # L⁻¹ S r (CSEd with val's)
    zt = s * dec._solve_Lt(z)             # S K_s⁻¹ S r
    precision = _blocked._precision(kw.get('precision'))

    def fast_kinv(_):
        if dec._Dinv is not None:
            W = _blocked.trtri_blocked(dec._L, dec._Dinv, dec._BLOCK,
                                       precision)
            from ..ops import syrk_t_full
            # lower-tile-only Pallas syrk (half the MACs of the full
            # square; plain dot on non-TPU backends)
            return syrk_t_full(W, tile=dec._BLOCK, precision=precision)
        W = solve_triangular(
            dec._L, jnp.eye(dec.n, dtype=K.dtype), lower=True)
        return jnp.dot(W.T, W, precision=precision)

    if dec._Ldf_h is None:
        Kinv_s = fast_kinv(None)
        Kbar = 0.5 * (Kinv_s * (s[:, None] * s[None, :])
                      - zt[:, None] * zt[None, :])
        dval = jnp.vdot(Kbar, dK) + jnp.dot(zt, dr)
    else:
        # rescue branch: the gradient's Kbar = ½(K⁻¹ − ααᵀ) has
        # cond-amplified entries (|K⁻¹| ~ 1/eps) whose fine structure —
        # the part that survives the ⟨Kbar, dK⟩ cancellation — sits
        # below f32 resolution.  Assemble the WHOLE primal-side
        # pipeline in double-float: df triangular solves (W, α), a
        # compensated syrk for WᵀW, df outer product and subtraction,
        # exact pow2 rescaling, and a compensated contraction whose
        # only roundings are the two final f32 tree-sums.  All df work
        # is primal-only; dval stays linear in (dK, dr), so the rule
        # transposes for reverse mode.
        def df_kbar(_):
            eye = jnp.eye(dec.n, dtype=K.dtype)
            Wh, Wl = _df.solve_lower_df(dec._Ldf_h, dec._Ldf_l, eye)
            Kih, Kil = _df.syrk_df(Wh, Wl)
            zh, zl = _df.solve_lower_df(dec._Ldf_h, dec._Ldf_l, s * r)
            ah, al = _df.solve_lower_t_df(dec._Ldf_h, dec._Ldf_l, zh, zl)
            oh, ol = _df.mul(ah[:, None], al[:, None],
                             ah[None, :], al[None, :])
            bh, bl = _df.sub(Kih, Kil, oh, ol)
            ss = 0.5 * s[:, None] * s[None, :]   # pow2·pow2·2⁻¹: exact
            return bh * ss, bl * ss

        def fast_kbar(_):
            Kinv_s = fast_kinv(None)
            zt_s = zt / s
            Kb = 0.5 * (Kinv_s - zt_s[:, None] * zt_s[None, :])
            return Kb * (s[:, None] * s[None, :]), jnp.zeros_like(Kb)

        Kbarh, Kbarl = lax.cond(dec._df_rescued, df_kbar, fast_kbar,
                                None)
        ph, pl = _df.mul(Kbarh, Kbarl, dK, jnp.zeros_like(dK))
        sh, sl = _df.sum_df(ph, pl)
        dval = (sh + sl) + jnp.dot(zt, dr)
    return val, dval


def solve_batched_triangular(L, B):
    """solve L X = B with B of shape (..., n, m) or (n, m) or (P, n)."""
    if B.ndim == 2 and B.shape[0] == L.shape[0]:
        return solve_triangular(L, B, lower=True)
    if B.ndim == 2:
        # (P, n) rows: solve for each row vector
        return jax.vmap(lambda b: solve_triangular(L, b, lower=True))(B)
    return jax.vmap(lambda b: solve_triangular(L, b, lower=True))(B)


def solve_batched(decomp, B):
    return decomp.ginv_linear(B)


def _pad_eps(eps, n, npad, dtype):
    """Pad a per-row noise vector to the block-padded length (pad rows
    carry 0: their diagonal is the exact identity selected by index
    inside the kernels).  Scalars pass through untouched so the iid
    path keeps the Pallas-fused eps."""
    if jnp.ndim(eps) == 0:
        return eps
    return jnp.zeros(npad, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(eps, dtype), (n,)))


def _r2_pairs(Xr, Xc, c):
    """Squared distances between two point strips.  p = 1 (time series,
    1-D regression) takes the EXACT outer difference — a single
    subtraction with relative error eps·|Δ|, no norm-expansion
    cancellation, so √r²-mode profiles (1-D stationary kernels) keep
    full precision near the diagonal where the expansion's absolute
    ~eps·‖x−c‖² error would cost ~√eps·‖x‖ of distance.  p > 1 centers
    both strips on ``c`` and uses the MXU norm expansion."""
    if Xr.shape[1] == 1:
        d = Xr[:, :1] - Xc[:, :1].T
        return d * d
    Xr2 = Xr - c
    Xc2 = Xc - c
    xnr = jnp.sum(Xr2 * Xr2, axis=1, keepdims=True)
    xnc = jnp.sum(Xc2 * Xc2, axis=1, keepdims=True)
    cross = jnp.dot(Xr2, Xc2.T, precision=lax.Precision.HIGHEST)
    return jnp.maximum(xnr + xnc.T - 2 * cross, 0.0)


def _stream_probe_resid(tree, profile, params, Xp, n, eps, block, prec):
    """Closure computing the matvec-probe backward error of the
    streaming factorization: ``max|K̃v − L(Lᵀv)|`` for a fixed ±1
    vector over the real rows, with K̃ the virtual regularized padded
    matrix streamed strip by strip.  O(n²) — only evaluated eagerly
    inside the degradation check."""

    def resid():
        npad = Xp.shape[0]
        idx = jnp.arange(npad)
        v = jnp.where(idx % 2 == 0, 1.0, -1.0).astype(Xp.dtype)
        v = v * (idx < n).astype(Xp.dtype)

        def step(acc, j):
            r0 = j * block
            Xr = lax.dynamic_slice(Xp, (r0, 0), (block, Xp.shape[1]))
            r2 = _r2_pairs(Xr, Xp, jnp.mean(Xr, axis=0, keepdims=True))
            Kb = profile(r2, *params)
            rows = r0 + jnp.arange(block)
            real = (rows[:, None] < n) & (idx[None, :] < n)
            Kb = jnp.where(real, Kb, 0.0)
            ondiag = rows[:, None] == idx[None, :]
            er = (lax.dynamic_slice(eps, (r0,), (block,))[:, None]
                  if jnp.ndim(eps) == 1 else eps)
            Kb = jnp.where(ondiag & (rows[:, None] < n), Kb + er, Kb)
            Kb = jnp.where(ondiag & (rows[:, None] >= n), 1.0, Kb)
            kv = jnp.dot(Kb, v, precision=prec)
            return acc, kv

        _, Kv = lax.scan(step, 0.0, jnp.arange(npad // block))
        Kv = Kv.reshape(-1)
        LLtv = _blocked._tree_mv(
            tree, _blocked._tree_mv_t(tree, v, prec), prec)
        return jnp.max(jnp.abs(Kv - LLtv))

    return resid


def _stream_warn_if_degraded(dinvs, eps, k0, n, what, bump=None,
                             resid=None):
    """Eager-mode degradation warning for the streaming factorization —
    the same contract as ``Chol._warn_if_degraded`` (the round-3 gap:
    an infeasible streaming model came back silently NaN or silently
    lift-distorted).  Signals:

    - non-finite leaf inverses: the factorization failed outright at
      this dtype/eps (results are NaN);
    - a pivot above the PSD diagonal bound sqrt(k0 + eps): pivots of a
      PSD matrix with unit-profile diagonal cannot exceed the diagonal,
      so an oversized pivot is the unambiguous signature of the
      self-healing diagonal lift (whose bump is ~1024·mach·n·k0 ≫ the
      diagonal) having engaged — the model is numerically singular and
      the factored matrix is visibly distorted;
    - pivot-based condition estimate beyond ~0.3/mach: solve and
      gradient accuracy degrade as eps·cond.

    Inside ``jit`` this compiles to nothing (``skipifabstract``).
    """
    mach = _float_eps(dinvs[0].dtype)

    @skipifabstract
    def check():
        import warnings
        D = jnp.stack(dinvs)
        # for heteroskedastic (vector, zero-padded) eps report the
        # weakest REAL-row regularization — it decides feasibility
        epsmin = (float(jnp.min(eps[:n])) if jnp.ndim(eps) == 1
                  else float(eps))
        if not bool(jnp.all(jnp.isfinite(D))):
            warnings.warn(
                f'{what}: the streaming factorization produced '
                f'non-finite values: the model is numerically singular '
                f'at {D.dtype} with eps={epsmin:.2e}.  Results are '
                f'NaN; raise epsabs (it should be at least the model '
                f'noise floor), reduce the correlation length, or use '
                f'float64.'
            )
            return
        ddiag = jnp.stack([jnp.diagonal(d) for d in dinvs])
        pivmin2 = float(1.0 / jnp.max(ddiag) ** 2)
        if resid is not None:
            # the streamed matvec probe (eager mode only — under jit
            # this whole check vanishes): a residual at the lift-bump
            # scale means self-healing engaged and the factored matrix
            # is visibly distorted; plain roundoff sits ~1024x lower
            r = float(resid())
            if bump is not None and r > 0.25 * float(bump):
                warnings.warn(
                    f'{what}: the self-healing diagonal lift engaged '
                    f'(matvec probe residual {r:.2e} ~ the lift bump '
                    f'{float(bump):.2e}): the model is numerically '
                    f'singular at {D.dtype} and the result is '
                    f'distorted by the lift.  Raise epsabs (it should '
                    f'be at least the model noise floor) or use '
                    f'float64.'
                )
                return
        if n * float(k0) > 0.3 / mach * pivmin2:
            warnings.warn(
                f'{what}: condition number ~'
                f'{n * float(k0) / pivmin2:.1e} approaches the '
                f'{D.dtype} resolution 1/eps={1 / mach:.1e}; solve and '
                f'gradient accuracy degrades as eps*cond.  Raise '
                f'epsabs or use float64.'
            )

    return None


def chol_nll_stream(profile, x, y, *, params=(), epsabs=None,
                    block=512, b1=128, precision='high',
                    interpret=None):
    """-log N(y | 0, K + eps I) for an ISOTROPIC kernel WITHOUT ever
    materializing the Gram matrix:
    ``K[i, j] = profile(‖x_i − x_j‖², *params)`` is computed on first
    touch inside the streaming blocked factorization — leaves/panels as
    fused XLA blocks, trailing updates inside the gram-fused Pallas
    Schur kernel — and the factor lives as a lower-trapezoid TREE
    (n²/2 floats) that is never densified.  The solve runs directly on
    the tree; the log-determinant comes from the leaf diagonals.

    This takes the single-chip dense-equivalent pipeline past the HBM
    wall: at n = 65536 (f32) the Gram alone is 17 GB > HBM, while the
    tree peak is ~13 GB.  Value-only at that scale (the hand-derived
    gradient carrier K⁻¹ is itself a dense n² object; use the
    distributed layer for gradients beyond single-chip memory).

    The padding tail is an exact identity selected by index (any
    profile works); r² tiles are computed with per-tile-pair centering
    so the MXU norm expansion stays accurate on wide coordinate
    ranges.

    ``epsabs`` defaults to the f32 'auto' diagonal anchor
    ``4 * eps * profile(0)``; it may also be a per-point noise-variance
    VECTOR (heteroskedastic diagonal — it rides the factorization's
    diagonal exactly like the scalar).  Unlike :class:`Chol` there is no
    eps-escalation ladder (the escalation ``lax.cond`` would keep two
    factor trees live — the difference between n=65536 fitting one
    chip and OOM); instead the same degradation DIAGNOSTICS run
    eagerly: an infeasible model warns (non-finite factorization /
    condition number at the dtype limit) instead of returning an
    undiagnosed NaN — raise ``epsabs`` (it should be at least the
    model's real noise floor) or reduce the correlation length.
    """
    from ..ops import _gram as _og

    X, dtype = _og._prep(x)
    n = X.shape[0]
    y = jnp.asarray(y, dtype)
    npad = -(-n // block) * block
    # the padding tail is an EXACT identity block selected by global
    # index inside the kernels (no far-point coordinates, so no
    # profile-decay contract).  Each r² tile is computed after
    # subtracting the two tiles' common mean, which keeps the MXU
    # norm-expansion error RELATIVE (~eps) for every pair geometry;
    # to support that, the coordinates are globally centered and the
    # (masked-out) pad rows REPEAT the last real point so the mixed
    # real/pad tile stays geometrically tight instead of dragging its
    # center toward an artificial origin.
    X = (X - jnp.mean(X, axis=0, keepdims=True)).astype(dtype)
    Xp = jnp.zeros((npad, X.shape[1]), dtype).at[:n].set(X)
    if npad != n:
        Xp = Xp.at[n:].set(X[n - 1])
    xn = jnp.sum(Xp * Xp, axis=-1, keepdims=True)
    params = tuple(jnp.asarray(v, dtype) for v in params)
    k0 = profile(jnp.zeros((1, 1), dtype), *params)[0, 0]
    mach = _float_eps(dtype)
    eps = _pad_eps((0.0 if epsabs is None else epsabs) + 4 * mach * k0,
                   n, npad, dtype)
    # trace upper bound on the max eigenvalue (PSD, ~constant diag):
    # sizes the self-healing lift without a full |K| matvec
    bump = _blocked._LIFT * mach * n * k0
    prec = _blocked._precision(precision)
    if interpret is None:
        # non-TPU backends take the kernels' interpret/XLA reference
        # paths instead of building a real Mosaic call
        interpret = jax.default_backend() != 'tpu'
    tree, dinvs = _blocked._chol_rec_tree_gram(
        Xp, xn, profile, params, jnp.asarray(eps, dtype), 0,
        npad // block, block, b1, prec, bump, interpret, n)
    _stream_warn_if_degraded(
        dinvs, eps, k0, n, 'chol_nll_stream', bump=bump,
        resid=_stream_probe_resid(tree, profile, params, Xp, n, eps,
                                  block, prec))
    ypad = jnp.concatenate([y, jnp.zeros(npad - n, dtype)])
    zt = _blocked._tree_solve_right_t(
        ypad[None, :], tree, dinvs, block, prec)
    quad = jnp.sum(jnp.square(zt))
    logdiag = jnp.concatenate(_blocked._tree_leaf_logdiag(tree))[:n]
    return 0.5 * (quad + 2 * jnp.sum(logdiag)
                  + n * jnp.log(2 * jnp.pi))


def chol_pred_stream(profile, x, y, xstar, *, params=(), epsabs=None,
                     block=512, b1=128, precision='high',
                     interpret=None, return_nll=False,
                     return_var=False, return_cov=False, shard=None):
    """Streaming GP posterior MEAN at ``xstar`` (plus optionally the
    training NLL) with the same never-materialized-Gram machinery as
    :func:`chol_nll_stream`:

        mean* = K(x*, x) (K(x, x) + eps I)^{-1} y

    The weight vector ``alpha = K^{-1} y`` is computed with two tree
    solves (forward and transposed) on the factor tree, and the
    cross-covariance matvec streams over column strips of ``x`` — so
    memory stays O(n·block + n*·block) at any training size.
    With ``return_var=True`` the posterior variances are computed too:
    one tree solve with the (npad, n*) cross-covariance as right-hand
    side, so memory grows by O(n·n*) — fine for n* up to a few
    thousand at n = 65536 (268 MB at n* = 1024); use the distributed
    layer beyond that.  ``return_cov=True`` returns the FULL (n*, n*)
    posterior covariance instead (same O(n·n*) intermediate, plus the
    small dense output block) — this is what the GP object's
    streaming ``pred`` packages into a UArray.
    """
    from ..ops import _gram as _og

    X, dtype = _og._prep(x)
    Xs, _ = _og._prep(xstar)
    n = X.shape[0]
    ns = Xs.shape[0]
    y = jnp.asarray(y, dtype)
    npad = -(-n // block) * block
    center = jnp.mean(X, axis=0, keepdims=True)
    X = (X - center).astype(dtype)
    Xs = (Xs - center).astype(dtype)
    Xp = jnp.zeros((npad, X.shape[1]), dtype).at[:n].set(X)
    if npad != n:
        Xp = Xp.at[n:].set(X[n - 1])
    xn = jnp.sum(Xp * Xp, axis=-1, keepdims=True)
    params = tuple(jnp.asarray(v, dtype) for v in params)
    k0 = profile(jnp.zeros((1, 1), dtype), *params)[0, 0]
    mach = _float_eps(dtype)
    eps = _pad_eps((0.0 if epsabs is None else epsabs) + 4 * mach * k0,
                   n, npad, dtype)
    bump = _blocked._LIFT * mach * n * k0
    prec = _blocked._precision(precision)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    # shard: optional row-sharding-constraint callable (see
    # parallel._dstream._row_shard) — the factor tree then lives
    # row-sharded across the mesh and GSPMD partitions the Gram strip
    # evaluation; the tree solves below ride GSPMD's propagation
    tree, dinvs = _blocked._chol_rec_tree_gram(
        Xp, xn, profile, params, jnp.asarray(eps, dtype), 0,
        npad // block, block, b1, prec, bump, interpret, n, shard)
    _stream_warn_if_degraded(
        dinvs, eps, k0, n, 'chol_pred_stream', bump=bump,
        resid=_stream_probe_resid(tree, profile, params, Xp, n, eps,
                                  block, prec))
    ypad = jnp.concatenate([y, jnp.zeros(npad - n, dtype)])
    zt = _blocked._tree_solve_right_t(
        ypad[None, :], tree, dinvs, block, prec)       # (1, npad) = (L^-1 y)'
    at = _blocked._tree_solve_right(
        zt, tree, dinvs, block, prec)                  # (1, npad) = (K^-1 y)'
    alpha = at[0]

    # cross-covariance matvec streamed over column strips of x
    nstrips = npad // block
    Xsq = Xs
    xsn = jnp.sum(Xsq * Xsq, axis=-1, keepdims=True)

    def step(acc, j):
        c0 = j * block
        Xc = lax.dynamic_slice(Xp, (c0, 0), (block, Xp.shape[1]))
        ac = lax.dynamic_slice(alpha, (c0,), (block,))
        # center on the COLUMN STRIP's mean only: |x - c| is then the
        # distance to the strip, so the r² error is relative for every
        # (prediction point, strip) pair — centering on the whole
        # prediction set's mean breaks near pairs on wide ranges
        r2 = _r2_pairs(Xsq, Xc, jnp.mean(Xc, axis=0, keepdims=True))
        Kb = profile(r2, *params)
        # pad columns carry alpha = 0 (zero-padded rhs solves), but
        # mask anyway for exactness
        gi = c0 + jnp.arange(block)
        Kb = jnp.where((gi < n)[None, :], Kb, 0.0)
        return acc + jnp.dot(Kb, ac, precision=prec), None

    mean, _ = lax.scan(step, jnp.zeros(ns, dtype), jnp.arange(nstrips))

    out = (mean,)
    if return_var or return_cov:
        # var*_i = k(x*_i, x*_i) - ||L^-1 k*_i||²: build the (npad, n*)
        # cross-covariance (strip-centered like the matvec) and run ONE
        # matrix-RHS tree solve on its transpose
        def cross_strip(j):
            c0 = j * block
            Xc = lax.dynamic_slice(Xp, (c0, 0), (block, Xp.shape[1]))
            r2 = _r2_pairs(Xsq, Xc,
                           jnp.mean(Xc, axis=0, keepdims=True))
            Kb = profile(r2, *params)
            gi = c0 + jnp.arange(block)
            return jnp.where((gi < n)[None, :], Kb, 0.0)  # (ns, block)

        Kst = jnp.concatenate(
            [cross_strip(j) for j in range(nstrips)], axis=1)
        W = _blocked._tree_solve_right_t(
            Kst, tree, dinvs, block, prec)        # (ns, npad) = (L^-1 k*)'
        if return_cov:
            # small dense output prior block (mean-centered norm
            # expansion; ns is small by contract)
            r2s = _r2_pairs(Xsq, Xsq,
                            jnp.mean(Xsq, axis=0, keepdims=True))
            Kss = profile(r2s, *params)
            cov = Kss - jnp.dot(W, W.T, precision=prec)
            cov = 0.5 * (cov + cov.T)
            out = out + (cov,)
        else:
            var = k0 - jnp.sum(jnp.square(W), axis=1)
            var = jnp.maximum(var, 0.0)
            out = out + (var,)
    if return_nll:
        quad = jnp.sum(jnp.square(zt))
        logdiag = jnp.concatenate(
            _blocked._tree_leaf_logdiag(tree))[:n]
        nll = 0.5 * (quad + 2 * jnp.sum(logdiag)
                     + n * jnp.log(2 * jnp.pi))
        out = out + (nll,)
    return out[0] if len(out) == 1 else out


def _quad_forms_stream(profile, pvec, lenscale, eps, Xp, n, U, V,
                       block, precision):
    """sum_p u_p' (K(theta) + eps I) v_p over the COLUMNS of U and V
    ((npad, m) each), with K computed strip by strip from the padded
    points — differentiable in (pvec, lenscale, eps), one scan for all
    probes, memory O(n*(block + m)).  Pad rows/cols masked exactly."""
    npad = Xp.shape[0]
    nstrips = npad // block
    Xs = Xp / lenscale
    mask = (jnp.arange(npad) < n).astype(Xp.dtype)
    Um = U * mask[:, None]
    Vm = V * mask[:, None]

    # remat: differentiating through the scan would otherwise SAVE
    # every strip's (block, npad) Gram for the backward pass — at
    # n=65536 that is tens of GB (measured OOM); recomputing strips
    # costs one extra O(n²·m/block) pass
    @jax.checkpoint
    def step(acc, j):
        r0 = j * block
        Xr = lax.dynamic_slice(Xs, (r0, 0), (block, Xs.shape[1]))
        r2 = _r2_pairs(Xr, Xs, jnp.mean(Xr, axis=0, keepdims=True))
        Kb = profile(r2, *pvec)                      # (block, npad)
        Urow = lax.dynamic_slice(Um, (r0, 0), (block, Um.shape[1]))
        KV = jnp.dot(Kb, Vm, precision=precision)    # (block, m)
        return acc + jnp.sum(Urow * KV), None

    qf, _ = lax.scan(step, jnp.zeros((), Xp.dtype), jnp.arange(nstrips))
    rowdot = jnp.sum(Um * Vm, axis=1)
    if jnp.ndim(eps) == 1:   # heteroskedastic diagonal (length n)
        return qf + jnp.sum(jnp.broadcast_to(eps, (n,)) * rowdot[:n])
    return qf + eps * jnp.sum(rowdot)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _nll_stream_core(pvec, lenscale, eps, X, y, profile, nprobes,
                     seed, block, b1, precision):
    """Scalar streaming NLL over centered points X; the custom VJP
    estimates the trace term with ``nprobes`` Rademacher probes."""
    val, _ = _nll_stream_fwd(pvec, lenscale, eps, X, y, profile,
                             nprobes, seed, block, b1, precision)
    return val


def _nll_stream_fwd(pvec, lenscale, eps, X, y, profile, nprobes, seed,
                    block, b1, precision):
    dtype = X.dtype
    n = X.shape[0]
    npad = -(-n // block) * block
    Xp = jnp.zeros((npad, X.shape[1]), dtype).at[:n].set(X)
    if npad != n:
        Xp = Xp.at[n:].set(X[n - 1])
    Xs = Xp / lenscale
    xn = jnp.sum(Xs * Xs, axis=-1, keepdims=True)
    params = tuple(pvec)
    k0 = profile(jnp.zeros((1, 1), dtype), *params)[0, 0]
    mach = _float_eps(dtype)
    bump = _blocked._LIFT * mach * n * k0
    prec = _blocked._precision(precision)
    tree, dinvs = _blocked._chol_rec_tree_gram(
        Xs, xn, profile, params,
        _pad_eps(eps + 4 * mach * k0, n, npad, dtype), 0,
        npad // block, block, b1, prec, bump,
        jax.default_backend() != 'tpu', n)
    ypad = jnp.concatenate([y, jnp.zeros(npad - n, dtype)])
    zt = _blocked._tree_solve_right_t(ypad[None, :], tree, dinvs,
                                      block, prec)
    at = _blocked._tree_solve_right(zt, tree, dinvs, block, prec)
    alpha = at[0]
    quad = jnp.sum(jnp.square(zt))
    logdiag = jnp.concatenate(_blocked._tree_leaf_logdiag(tree))[:n]
    val = 0.5 * (quad + 2 * jnp.sum(logdiag)
                 + n * jnp.log(2 * jnp.pi))
    # Rademacher probes, masked to the real rows
    key = jax.random.PRNGKey(seed)
    V = jax.random.rademacher(
        key, (npad, nprobes), dtype=dtype)
    V = V * (jnp.arange(npad) < n).astype(dtype)[:, None]
    Zt = _blocked._tree_solve_right_t(V.T, tree, dinvs, block, prec)
    Wt = _blocked._tree_solve_right(Zt, tree, dinvs, block, prec)
    W = Wt.T                                  # (npad, m) = K^-1 V
    res = (pvec, lenscale, eps, Xp, n, y, alpha, V, W)
    return val, res


def _nll_stream_bwd(profile, nprobes, seed, block, b1, precision,
                    res, ct):
    pvec, lenscale, eps, Xp, n, y, alpha, V, W = res
    prec = _blocked._precision(precision)

    def surrogate(pv, ls, ep):
        # d/dtheta [ 1/2 tr(K^-1 dK) - 1/2 a' dK a ] with a, V, W
        # held fixed: 1/2 mean_p w_p' K(theta) v_p - 1/2 a' K(theta) a
        tr = _quad_forms_stream(profile, pv, ls, ep, Xp, n, W, V,
                                block, prec) / nprobes
        qa = _quad_forms_stream(profile, pv, ls, ep, Xp, n,
                                alpha[:, None], alpha[:, None], block,
                                prec)
        return 0.5 * (tr - qa)

    gp_, gl_, ge_ = jax.grad(surrogate, argnums=(0, 1, 2))(
        pvec, lenscale, eps)
    ga = ct * alpha[:n]
    return (jax.tree_util.tree_map(lambda g: ct * g, gp_),
            ct * gl_, ct * ge_, jnp.zeros_like(Xp[:n]), ga)


_nll_stream_core.defvjp(_nll_stream_fwd, _nll_stream_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _nll_stream_core_exact(pvec, lenscale, eps, X, y, profile, block,
                           b1, gradblock, precision, shard,
                           gradgroups=None):
    """Scalar streaming NLL with an EXACT custom VJP: the gradient's
    trace term tr(K⁻¹ dK) is contracted against strips of K⁻¹ computed
    by skip-aware tree solves on the stored factor tree — no
    stochastic estimate, no materialized K⁻¹ (peak extra memory is
    three (gradblock, npad) strips, ~n³/3 extra MACs total)."""
    val, _ = _nll_stream_fwd_exact(pvec, lenscale, eps, X, y, profile,
                                   block, b1, gradblock, precision,
                                   shard, gradgroups)
    return val


def _nll_stream_fwd_exact(pvec, lenscale, eps, X, y, profile, block,
                          b1, gradblock, precision, shard=None,
                          gradgroups=None):
    dtype = X.dtype
    n = X.shape[0]
    npad = -(-n // block) * block
    Xp = jnp.zeros((npad, X.shape[1]), dtype).at[:n].set(X)
    if npad != n:
        Xp = Xp.at[n:].set(X[n - 1])
    Xs = Xp / lenscale
    xn = jnp.sum(Xs * Xs, axis=-1, keepdims=True)
    params = tuple(pvec)
    k0 = profile(jnp.zeros((1, 1), dtype), *params)[0, 0]
    mach = _float_eps(dtype)
    bump = _blocked._LIFT * mach * n * k0
    prec = _blocked._precision(precision)
    interpret = jax.default_backend() != 'tpu'
    epsk = _pad_eps(eps + 4 * mach * k0, n, npad, dtype)
    if shard is None and npad > _LEFTLOOK_MIN:
        # near the HBM wall the right-looking recursion's Schur
        # buffers + half-split panels drive the TPU allocator to ~47%
        # heap fragmentation and the exact-gradient program OOMs at
        # n = 65536 (measured); the left-looking strip factorization
        # materializes nothing square and keeps piece sizes uniform
        tree, dinvs = _blocked._chol_gram_leftlook(
            Xs, xn, profile, params, epsk, block, b1, prec, bump, n)
    else:
        tree, dinvs = _blocked._chol_rec_tree_gram(
            Xs, xn, profile, params, epsk, 0, npad // block,
            block, b1, prec, bump, interpret, n, shard)
    _stream_warn_if_degraded(
        dinvs, epsk, k0, n, 'chol_nll_stream_grad',
        bump=bump,
        resid=_stream_probe_resid(tree, profile, params, Xs, n,
                                  epsk, block, prec))
    ypad = jnp.concatenate([y, jnp.zeros(npad - n, dtype)])
    zt = _blocked._tree_solve_right_t(ypad[None, :], tree, dinvs,
                                      block, prec)
    at = _blocked._tree_solve_right(zt, tree, dinvs, block, prec)
    alpha = at[0]
    quad = jnp.sum(jnp.square(zt))
    logdiag = jnp.concatenate(_blocked._tree_leaf_logdiag(tree))[:n]
    val = 0.5 * (quad + 2 * jnp.sum(logdiag)
                 + n * jnp.log(2 * jnp.pi))
    res = (pvec, lenscale, eps, Xp, y, alpha, tree, dinvs)
    return val, res


def _kstrip_weighted_sum(carrier, Xp, n, c0, profile, mach, pvec,
                         lenscale, eps):
    """sum(carrier * K(θ)[c0:c0+w, :]) over the row strip of the
    virtual regularized padded matrix, differentiable in
    (pvec, lenscale, eps).  Pad entries are θ-independent constants
    (masked), so they contribute nothing to the gradient.  ``c0`` may
    be a traced strip offset (the strips ride a ``lax.scan``)."""
    wk = carrier.shape[0]
    npad = Xp.shape[0]
    Xs = Xp / lenscale
    Xr = lax.dynamic_slice(Xs, (c0, 0), (wk, Xs.shape[1]))
    # strip-centered norm expansion (same accuracy rationale as the
    # factorization's per-tile-pair centering); exact diff at p = 1
    r2 = _r2_pairs(Xr, Xs, jnp.mean(Xr, axis=0, keepdims=True))
    Kb = profile(r2, *pvec)
    rows = c0 + jnp.arange(wk)
    cols = jnp.arange(npad)
    real = (rows[:, None] < n) & (cols[None, :] < n)
    Kb = jnp.where(real, Kb, 0.0)
    # the factorization regularizes with eps + 4*mach*profile(0); both
    # terms are θ-dependent, so both enter the exact gradient
    # (heteroskedastic eps enters per row: d/d eps_i picks up
    # carrier[i−c0, i] through the padded-vector gather)
    k0 = profile(jnp.zeros((1, 1), Xp.dtype), *pvec)[0, 0]
    etp = _pad_eps(eps + 4 * mach * k0, n, npad, Xp.dtype)
    et = (lax.dynamic_slice(etp, (c0,), (wk,))[:, None]
          if jnp.ndim(etp) == 1 else etp)
    ondiag = (rows[:, None] == cols[None, :]) & (rows[:, None] < n)
    Kb = jnp.where(ondiag, Kb + et, Kb)
    return jnp.sum(carrier * Kb)


# static skip-boundary groups in the scanned exact backward: strips
# within a group ride ONE lax.scan (a single reused strip workspace,
# program size independent of n) and share the group START column as
# the tree solves' static skip bound.  Total solve MACs are
# n³·(1/3 + 1/(2G)) vs the perfect per-strip skip's n³/3 — +19% at
# G = 8 — but the per-strip-unrolled program it replaces overlapped
# every strip's workspace against the live factor tree (measured:
# compile-time OOM at n = 65536 even with an optimization_barrier
# serialization band-aid, and compile time growing with n/gradblock).
_EXACT_GRAD_GROUPS = 8

# above this padded size the exact-gradient forward switches from the
# right-looking recursive factorization to the left-looking strip
# scheme (`_blocked._chol_gram_leftlook`): same MACs and tree
# contract, no materialized Schur complements, allocator-friendly
# uniform buffer shapes (see that function's docstring)
_LEFTLOOK_MIN = 49152


def _nll_stream_bwd_exact(profile, block, b1, gradblock, precision,
                          shard, gradgroups, res, ct):
    """Exact reverse rule: dV = <½(K⁻¹ − ααᵀ), dK> + αᵀ dy with the
    K⁻¹ contraction streamed over row strips.  For each strip
    [c0, c0+w): two skip-aware tree solves give C = K⁻¹[c0:c0+w, :]
    valid on columns ≥ the strip's GROUP start; symmetry recovers the
    skipped columns via the weight mask (1 on the strip's own diagonal
    block, 2 beyond it, 0 below), so the full contraction is exact
    while only ~the upper block triangle of K⁻¹ is ever computed
    (n³·(1/3 + 1/16) MACs for the solves at the default 8 groups),
    matching the reference's exact-gradient contract at sizes where
    the dense carrier cannot exist (reference
    ``_linalg/_decomp.py:441-586``).  The strips within a group are
    scan-carried: one strip workspace alive at a time, so peak memory
    is the factor tree + a single strip chain at every n."""
    pvec, lenscale, eps, Xp, y, alpha, tree, dinvs = res
    n = y.shape[0]
    npad = Xp.shape[0]
    dtype = Xp.dtype
    mach = _float_eps(dtype)
    prec = _blocked._precision(precision)
    cols = jnp.arange(npad)

    wk = min(int(gradblock), npad)
    S = npad // wk
    leftover = npad - S * wk            # multiple of block, < wk

    def strip_grads(c0, w, cskip):
        """(d/dθ) of the strip's weighted contraction; ``c0`` may be
        traced (scan offset), ``w``/``cskip`` are static."""
        E = jnp.zeros((w, npad), dtype)
        E = lax.dynamic_update_slice(E, jnp.eye(w, dtype=dtype),
                                     (0, c0))
        if shard is not None:
            # strip rows are independent through both skip solves, so
            # a row constraint on E partitions the whole strip chain
            E = shard(E)
        Zt = _blocked._tree_solve_right_t_skip(
            E, tree, dinvs, block, prec, 0, cskip)
        C = _blocked._tree_solve_right_skip(
            Zt, tree, dinvs, block, prec, 0, cskip)
        a_r = lax.dynamic_slice(alpha, (c0,), (w,))
        carrier = 0.5 * (C - a_r[:, None] * alpha[None, :])
        weight = jnp.where(cols < c0, 0.0,
                           jnp.where(cols < c0 + w, 1.0, 2.0))
        carrier = carrier * weight[None, :].astype(dtype)
        return jax.grad(
            lambda pv, ls, ep: _kstrip_weighted_sum(
                carrier, Xp, n, c0, profile, mach, pv, ls, ep),
            argnums=(0, 1, 2),
        )(pvec, lenscale, eps)

    gp = tuple(jnp.zeros((), dtype) for _ in pvec)
    gl = jnp.zeros((), dtype)
    ge = jnp.zeros(jnp.shape(eps), dtype)

    G = (min(_EXACT_GRAD_GROUPS, S) if gradgroups is None
         else min(int(gradgroups), S)) if S else 0
    for g in range(G):
        s0 = (g * S) // G
        s1 = ((g + 1) * S) // G
        if s1 == s0:
            continue
        cskip = s0 * wk                 # static per-group skip bound

        def step(carry, s, cskip=cskip):
            cgp, cgl, cge = carry
            g_p, g_l, g_e = strip_grads(s * wk, wk, cskip)
            return (tuple(a + b for a, b in zip(cgp, g_p)),
                    cgl + g_l, cge + g_e), None

        (gp, gl, ge), _ = lax.scan(step, (gp, gl, ge),
                                   jnp.arange(s0, s1))

    if leftover:
        g_p, g_l, g_e = strip_grads(S * wk, leftover, S * wk)
        gp = tuple(a + b for a, b in zip(gp, g_p))
        gl = gl + g_l
        ge = ge + g_e

    ga = ct * alpha[:n]
    return (jax.tree_util.tree_map(lambda g: ct * g, gp),
            ct * gl, ct * ge, jnp.zeros_like(Xp[:n]), ga)


_nll_stream_core_exact.defvjp(_nll_stream_fwd_exact,
                              _nll_stream_bwd_exact)


def chol_nll_stream_grad(profile, x, y, *, params=(), lenscale=None,
                         epsabs=1e-4, exact=True, nprobes=16, seed=0,
                         block=512, b1=128, gradblock=None,
                         precision='high', gradgroups=None):
    """Differentiable streaming NLL: same never-materialized-Gram value
    as :func:`chol_nll_stream`, plus a custom VJP.

    With ``exact=True`` (default) the reverse rule is EXACT — the
    reference's hand-derived gradient contract
    (``_linalg/_decomp.py:441-586``) at sizes where the dense carrier
    K⁻¹ cannot exist:

        dV = <½(K⁻¹ − ααᵀ), dK> + αᵀ dy,   α = K⁻¹ y,

    with K⁻¹ produced in row strips of width ``gradblock`` (default
    ``4·block``) by two skip-aware solves per strip on the stored
    factor tree (~n³/3 extra MACs, ~3 strip buffers of extra memory)
    and contracted against the streamed dK strips, so value+gradient
    costs ~3x the forward pass and nothing n² is ever materialized.
    "Exact" is the FORMULA (vs the Hutchinson estimate's ~35% noise at
    the default 16 probes): floating-point error still scales with
    conditioning, and the trace term ½ tr(K⁻¹dK) amplifies it most —
    measured on TPU at n=2048, cond ≈ 3e5: the eps-gradient is ~19%
    off f64 truth at ``precision='high'`` (bf16_3x) and ~4% (dense-
    path parity) at ``precision='highest'`` (bf16_6x, ~2x slower);
    the amp/lenscale gradients are at dense-path accuracy already at
    'high'.  Raise ``precision`` when the noise floor is tiny
    relative to the signal variance.

    With ``exact=False`` the trace term falls back to a Hutchinson
    estimate with ``nprobes`` fixed Rademacher probes (``seed``) —
    ~sqrt(2/nprobes) relative noise, cheaper when many probes-worth of
    accuracy is not needed:

        dV ≈ 1/2 E_v[(K⁻¹ v)' dK v] - 1/2 α' dK α.

    Differentiable arguments: ``params`` (profile parameters),
    ``lenscale`` (an isotropic input length scale applied as
    x/lenscale — coordinates themselves carry no gradient), and
    ``epsabs`` (the noise-floor nugget: a scalar for iid noise, or a
    per-point variance VECTOR for heteroskedastic noise — the exact
    rule then returns per-element gradients, each picking up the
    matching diagonal entry of ½(K⁻¹ − ααᵀ)).  This is what
    gradient-based `empbayes_fit` evaluates at sizes whose dense Gram
    exceeds memory.  Single-chip limit (v5e, 16 GB): the exact pass
    keeps the whole factor tree (n²/2) live through the strip loop and
    TPU static buffer placement roughly doubles it, so exact tops out
    near n ≈ 49152; past that use the row-sharded multi-chip rule
    (``parallel.stream_nll_distributed_grad``) or ``exact=False``
    (Hutchinson matvecs hold only probe vectors live).
    """
    from ..ops import _gram as _og

    X, dtype = _og._prep(x)
    X = (X - jnp.mean(X, axis=0, keepdims=True)).astype(dtype)
    y = jnp.asarray(y, dtype)
    pvec = tuple(jnp.asarray(v, dtype) for v in params)
    ls = jnp.asarray(1.0 if lenscale is None else lenscale, dtype)
    ep = jnp.asarray(epsabs, dtype)
    if exact:
        if gradblock is None:
            gradblock = 4 * int(block)
        return _nll_stream_core_exact(pvec, ls, ep, X, y, profile,
                                      int(block), int(b1),
                                      int(gradblock), precision, None,
                                      gradgroups)
    return _nll_stream_core(pvec, ls, ep, X, y, profile, int(nprobes),
                            int(seed), int(block), int(b1), precision)


def _kmat_stream(profile, pvec, lenscale, eps, Xp, n, T, block, prec,
                 mach):
    """(K̃(θ) T) over the padded points, streamed over row strips:
    K̃ = mask(K) + diag(ε̃) with the pad rows/cols masked to zero and
    ε̃ the factorization's regularized diagonal (eps + 4·mach·k(0),
    zero on the pad tail) — the SAME virtual matrix the factor tree
    decomposes, so forward-mode derivatives of this map are exactly
    dK̃_a T.  Memory: one (block, npad) Gram strip transient."""
    npad = Xp.shape[0]
    nstrips = npad // block
    dtype = Xp.dtype
    Xs = Xp / lenscale
    cols = jnp.arange(npad)
    Tm = T * (cols < n).astype(dtype)[:, None]
    k0 = profile(jnp.zeros((1, 1), dtype), *pvec)[0, 0]
    etp = _pad_eps(eps + 4 * mach * k0, n, npad, dtype)

    def step(j):
        r0 = j * block
        Xr = lax.dynamic_slice(Xs, (r0, 0), (block, Xs.shape[1]))
        r2 = _r2_pairs(Xr, Xs, jnp.mean(Xr, axis=0, keepdims=True))
        Kb = profile(r2, *pvec)                       # (block, npad)
        rows = r0 + jnp.arange(block)
        real = (rows[:, None] < n) & (cols[None, :] < n)
        Kb = jnp.where(real, Kb, 0.0)
        out = jnp.dot(Kb, Tm, precision=prec)         # (block, w)
        er = (lax.dynamic_slice(etp, (r0,), (block,))
              if jnp.ndim(etp) == 1
              else jnp.where(rows < n, etp, 0.0))
        Trow = lax.dynamic_slice(Tm, (r0, 0), (block, Tm.shape[1]))
        return out + er[:, None] * Trow

    out = lax.map(step, jnp.arange(nstrips))          # (nstrips, b, w)
    return out.reshape(npad, T.shape[1])


def chol_stream_fisher(profile, x, *, params=(), lenscale=None,
                       epsabs=1e-4, tangents, dr=None, block=512,
                       b1=128, fisherblock=None, precision='high',
                       shard=None):
    """EXACT expected-information (Fisher) matrix of the streaming
    Gaussian NLL in arbitrary hyperparameter directions, with the Gram
    never materialized — the streaming analog of ``Chol.fisher``
    (reference exact-information contract,
    ``/root/reference/src/lsqfitgp/_linalg/_decomp.py:509-547``):

        F_ab = ½ tr(K⁻¹ dK_a K⁻¹ dK_b)  [+ dr_a' K⁻¹ dr_b]

    ``tangents`` is a sequence of P directions, each a triple
    ``(params_t, lenscale_t, eps_t)`` matching the structure of
    ``(params, lenscale, epsabs)`` (``eps_t`` a scalar or a per-point
    vector for heteroskedastic noise — the chain rule happens HERE, so
    an n-dimensional noise parametrization never produces an n×n
    Fisher block).  ``dr`` is an optional (n, P) matrix of data-mean
    sensitivities contributing the ``dr' K⁻¹ dr`` term.

    Algorithm: factor once into the Gram-fused tree, then for each
    column strip S of width ``fisherblock`` compute T = L⁻ᵀ E_S by one
    tree solve, push each tangent through the streamed matmul
    U_a = dK̃_a T with ``jax.jvp`` (forward mode: no stored strips),
    solve V_a = L⁻¹ U_a, and accumulate F_ab += ½⟨V_a, V_b⟩ — this is
    ⟨B_a, B_b⟩_F/2 for B_a = L⁻¹ dK_a L⁻ᵀ, summed exactly over strips.
    Cost ~(1+3P)/3 · n³ extra MACs past the factorization; memory four
    (fisherblock, npad) strip buffers, nothing n².

    Returns the (P, P) Fisher matrix (likelihood term only — add the
    prior's information yourself).
    """
    from ..ops import _gram as _og

    X, dtype = _og._prep(x)
    X = (X - jnp.mean(X, axis=0, keepdims=True)).astype(dtype)
    pvec = tuple(jnp.asarray(v, dtype) for v in params)
    ls = jnp.asarray(1.0 if lenscale is None else lenscale, dtype)
    ep = jnp.asarray(epsabs, dtype)
    tangents = [
        (tuple(jnp.asarray(t, dtype) for t in tp),
         jnp.asarray(0.0 if tl is None else tl, dtype),
         jnp.asarray(te, dtype) if jnp.ndim(te) or jnp.ndim(ep) == 0
         else jnp.broadcast_to(jnp.asarray(te, dtype), ep.shape))
        for tp, tl, te in tangents
    ]
    P = len(tangents)
    block = int(block)
    if fisherblock is None:
        fisherblock = 2 * block
    n = X.shape[0]
    npad = -(-n // block) * block
    Xp = jnp.zeros((npad, X.shape[1]), dtype).at[:n].set(X)
    if npad != n:
        Xp = Xp.at[n:].set(X[n - 1])
    Xs = Xp / ls
    xn = jnp.sum(Xs * Xs, axis=-1, keepdims=True)
    k0 = profile(jnp.zeros((1, 1), dtype), *pvec)[0, 0]
    mach = _float_eps(dtype)
    bump = _blocked._LIFT * mach * n * k0
    prec = _blocked._precision(precision)
    interpret = jax.default_backend() != 'tpu'
    epsk = _pad_eps(ep + 4 * mach * k0, n, npad, dtype)
    tree, dinvs = _blocked._chol_rec_tree_gram(
        Xs, xn, profile, pvec, epsk, 0, npad // block,
        block, int(b1), prec, bump, interpret, n, shard)

    def kmat(pv, l, e, T):
        return _kmat_stream(profile, pv, l, e, Xp, n, T, block, prec,
                            mach)

    F = jnp.zeros((P, P), dtype)
    c0 = 0
    while c0 < npad:
        wk = min(int(fisherblock), npad - c0)
        E = jnp.zeros((wk, npad), dtype) \
            .at[:, c0:c0 + wk].set(jnp.eye(wk, dtype=dtype))
        Tt = _blocked._tree_solve_right(E, tree, dinvs, block, prec)
        T = Tt.T                                     # L⁻ᵀ E_S' (npad, w)
        Vts = []
        for tp, tl, te in tangents:
            _, U = jax.jvp(kmat, (pvec, ls, ep, T),
                           (tp, tl, te, jnp.zeros_like(T)))
            Vts.append(_blocked._tree_solve_right_t(
                U.T, tree, dinvs, block, prec))      # (w, npad) = V_a'
        Vs = jnp.stack(Vts)                          # (P, w, npad)
        F = F + 0.5 * jnp.einsum('awn,bwn->ab', Vs, Vs,
                                 precision=prec)
        c0 += wk

    if dr is not None:
        dr = jnp.asarray(dr, dtype)
        drp = jnp.zeros((npad, P), dtype).at[:n].set(dr)
        Zt = _blocked._tree_solve_right_t(drp.T, tree, dinvs, block,
                                          prec)     # (P, npad) = (L⁻¹dr)'
        F = F + jnp.dot(Zt, Zt.T, precision=prec)

    return 0.5 * (F + F.T)
