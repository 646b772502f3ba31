"""PSD matrix decompositions.

TPU-native counterpart of reference ``src/lsqfitgp/_linalg/_decomp.py``.
The public contract (the :class:`Decomposition` operations and the
regularization semantics of :class:`Chol`) matches the reference
(``_decomp.py:126-278`` for the ABC, ``:349-439`` for Chol's
``diag_scale_pow2`` + Gershgorin-bound eps); the implementation is
re-designed for XLA/TPU:

- Everything is a pytree of device arrays (crosses ``jit`` freely).
- Gradients of the log-density flow through ``lax.linalg.cholesky``'s
  native XLA differentiation rule instead of hand-written VJPs; the
  Fisher matrix and Fisher-vector products use explicit batched
  triangular solves (the hand-derived formulas of reference
  ``_decomp.py:20-109``) because AD cannot produce them.
- There is no object-dtype (gvar) path: uncertainty propagation happens
  in :mod:`lsqfitgp_tpu.uncert` with dense Jacobians, which flow through
  the same device ops.
"""

from __future__ import annotations

import abc
import math

import jax
import numpy
from jax import lax
from jax import numpy as jnp
from jax.scipy.linalg import solve_triangular

from . import _blocked
from ._pytree import AutoPyTree

__all__ = ['Decomposition', 'Chol', 'solve_batched']


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

    In float64, ``n * eps`` (reference ``_decomp.py:245`` parity — at
    f64 this is always negligible vs the data).  In float32 — the dtype
    the framework actually ships on TPU — ``n * eps32`` over-regularizes
    catastrophically (at n=1500 it exceeds a typical 1% noise level
    ~9x and shifts the marginal likelihood by O(1000) nats, measured);
    the blocked HIGH-precision factorization is empirically stable on
    fully singular smooth Grams down to ``sqrt(n) * eps32``, so 'auto'
    uses ``8 * sqrt(n) * eps32`` — still a safety factor ~8 above the
    observed stability edge, but 10-40x less destructive than n-scaling.
    """
    mach = _float_eps(dtype)
    if mach > 1e-10:  # float32 or below
        # n-free: the factorization self-heals locally (see
        # _blocked._chol_lifted), so the global eps only needs to absorb
        # entrywise assembly roundoff, not worst-case n-growth
        auto = 4 * mach
    else:
        auto = n * mach
    if epsrel == 'auto':
        epsrel = auto
    if epsabs == 'auto':
        epsabs = auto
    return float(epsrel), float(epsabs)


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


class Chol(Decomposition):
    """Regularized Cholesky decomposition.

    K is scaled to near-unit diagonal with exact power-of-2 factors, a
    regularization ``eps = epsrel * maxeig_bound + epsabs`` is added to
    the scaled diagonal, and the Cholesky factor is taken.  ``epsrel
    ='auto'`` means ``n * finfo(dtype).eps`` (reference ``_decomp.py:245``
    ``_parseeps`` semantics).

    ``blocked='auto'`` (default) switches to the MXU blocked
    factorization + matmul-based blocked triangular solves
    (:mod:`._blocked`) for ``n >= 1024`` — ~2x faster than
    ``lax.linalg.cholesky`` on TPU at n=8192.  Pass ``True``/``False``
    to force either path.
    """

    _BLOCK = 512

    def __init__(self, K, *, epsrel='auto', epsabs=0, blocked='auto',
                 precision=None, block=None):
        K = jnp.asarray(K)
        n = K.shape[0]
        epsrel, epsabs = _parse_eps(epsrel, epsabs, n, K.dtype)
        s = diag_scale_pow2(K)
        # Gershgorin bound of the scaled matrix computed as a scaled
        # |K| matvec: one read pass, no |Ks| materialization
        bound = jnp.max(s * (jnp.abs(K) @ s))
        eps = epsrel * bound + epsabs
        if block is not None:
            # per-instance panel width (e.g. tuned per problem size);
            # the solvers read it back from _BLOCK
            self._BLOCK = int(block)
        if blocked == 'auto':
            blocked = n >= 1024
        if blocked:
            # precision=None → adaptive (fast bf16_3x pass, HIGHEST
            # refactorization with self-healing lifts on non-finite);
            # pass 'highest' to force single-pass f32-grade matmuls.
            # The diagonal scaling + eps are fused into the strip loads
            # (the scaled matrix is never materialized)
            L, Dinv = _blocked.chol_factor_scaled(
                K, s, eps, self._BLOCK, 128, precision)
            # materialize the factor before downstream consumers: without
            # this XLA re-fuses strip computations into each solve's row
            # slices (measured +2.2 ms at n=8192 on v5e)
            L, Dinv = lax.optimization_barrier((L, Dinv))
        else:
            Ks = K * s[:, None] * s[None, :] \
                + eps * jnp.eye(n, dtype=K.dtype)
            # same self-healing lift as the blocked path's diagonal
            # blocks, applied globally (one extra small cholesky)
            L = _blocked._chol_lifted(Ks, True)
            Dinv = None
        self._L = L
        self._Dinv = Dinv
        self._s = s
        self._eps = eps

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

    def matrix(self):
        L, s = self._L, self._s
        return (L @ L.T) / (s[:, None] * s[None, :])

    # -- solves ------------------------------------------------------------

    def _solve_L(self, x):
        """L⁻¹ x"""
        if self._Dinv is not None:
            return _blocked.solve_lower(
                self._L, x, block=self._BLOCK, Dinv=self._Dinv)
        return solve_triangular(self._L, x, lower=True)

    def _solve_Lt(self, x):
        """L'⁻¹ x"""
        if self._Dinv is not None:
            return _blocked.solve_lower_t(
                self._L, x, block=self._BLOCK, Dinv=self._Dinv)
        return solve_triangular(self._L, x, lower=True, trans=1)

    def ginv_linear(self, X):
        s = self._s
        Xs = X * s[:, None] if X.ndim > 1 else X * s
        out = self._solve_Lt(self._solve_L(Xs))
        return out * s[:, None] if X.ndim > 1 else out * s

    def pinv_bilinear(self, A, r):
        # A' K⁻¹ r = (L⁻¹ S A)' (L⁻¹ S r)
        s = self._s
        ZA = self._solve_L(A * s[:, None])
        zr = self._solve_L(r * s)
        return ZA.T @ zr

    def ginv_quad(self, A):
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
        if self._Dinv is not None:
            # diag(L) = 1/diag(Dinv blocks); the identity-padded tail
            # blocks contribute log 1 = 0.  40x less data than a strided
            # diag gather over the full factor.
            d = jnp.diagonal(self._Dinv, axis1=1, axis2=2)
            logdiagL = -jnp.sum(jnp.log(d))
        else:
            logdiagL = jnp.sum(jnp.log(jnp.diag(self._L)))
        return 2 * logdiagL - 2 * jnp.sum(jnp.log(self._s))

    def minus_log_normal_density(self, r):
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
