"""Mesh-distributed Cholesky decomposition with the full
:class:`lsqfitgp_tpu.linalg.Decomposition` contract.

This is the piece that distributes the GP OBJECT rather than a raw
kernel core: ``GP(solver='chol-distributed', mesh=mesh)`` routes every
posterior / likelihood computation — for any model the element layer
can express (multi-output processes, derivative elements, ``addcov``
noise, ``addlintransf`` functionals) — through this class, so the
covariance matrix only ever exists row-sharded over the mesh:

- the assembled K enters as a (logically global, physically
  ``P(axis, None)``-sharded) array; GSPMD partitions the assembly
  computation to match, so each device evaluates only its row strip of
  the kernel;
- scaling + regularization (same ``diag_scale_pow2`` + 'auto'-eps
  semantics as the single-chip :class:`~lsqfitgp_tpu.linalg.Chol`,
  including the f32 small-eps→bound-eps escalation ladder) are
  elementwise/sharded;
- the factorization is the block-panel ``shard_map`` Cholesky of
  :mod:`._pchol` (all-gather one n×B panel per step — Σ n² comm);
- triangular solves are the distributed accumulator substitutions
  (O(n·m·log D) comm), so the O(n²)-work contract operations
  (``pinv_bilinear``, ``ginv_quad``, densities) never gather the
  factor.

Reference surface covered: ``src/lsqfitgp/_GP/_compute.py:45-94,
138-330`` (the solver-facing half) at pod scale.  The reference has no
distributed analog — its decompositions are single-host
(``_linalg/_decomp.py:126``).
"""

from __future__ import annotations

import math

import jax
from jax import lax
from jax import numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..linalg import _blocked, _pytree
from ..linalg._decomp import (
    Decomposition, _parse_eps, _float_eps, diag_scale_pow2,
)
from . import _pchol

__all__ = ['CholDistributed']


class CholDistributed(Decomposition):
    """Distributed regularized Cholesky decomposition of a PSD matrix
    row-sharded over one axis of a device mesh.

    Parameters
    ----------
    K : (n, n) array
        The matrix, in global row order.  May carry any sharding; a
        ``P(axis, None)`` constraint is applied (which also steers XLA
        to partition the producing computation).
    mesh : jax.sharding.Mesh
        Device mesh.
    axis : str
        Mesh axis name to shard rows over (default 'r').
    block : int
        Panel width of the factorization and solves.  ``n`` is padded
        internally to a multiple of ``devices * block`` with an
        identity tail, so any size works.
    epsrel, epsabs : 'auto' or float
        Same regularization semantics as :class:`lsqfitgp_tpu.linalg.Chol`
        (f64: reference-parity bound-scaled ``n*eps``; f32: tiny
        diagonal-anchored eps with a one-shot escalation to the
        bound-scaled rung if the factorization comes back non-finite).
    """

    def __init__(self, K, *, mesh, axis='r', block=128, epsrel='auto',
                 epsabs=0):
        K = jnp.asarray(K)
        n = K.shape[0]
        ndev = mesh.shape[axis]
        quantum = ndev * block
        npad = -(-max(n, 1) // quantum) * quantum
        epsrel, epsabs, escalate = _parse_eps(epsrel, epsabs, n, K.dtype)
        mach = _float_eps(K.dtype)
        shard = NamedSharding(mesh, P(axis, None))
        # pad with an identity tail FIRST (sharding needs divisible
        # rows), then everything downstream is elementwise/sharded
        Kp = lax.with_sharding_constraint(
            _blocked._pad_spd(K, npad), shard)
        s = diag_scale_pow2(Kp)                    # tail: s = 1
        bound = jnp.max(s * (jnp.abs(Kp) @ s))
        eps = epsrel * bound + epsabs
        if escalate:
            dmax = jnp.max(jnp.diagonal(Kp) * s * s)
            eps = eps + 4 * mach * dmax
            eps2 = 32 * mach * bound + epsabs
        # eps only on the real diagonal: the identity tail must stay
        # exactly 1 (it contributes log 1 = 0 to the logdet)
        real = (jnp.arange(npad) < n).astype(K.dtype)

        def factor(e):
            Ks = Kp * s[:, None] * s[None, :] + jnp.diag(e * real)
            Ks = lax.with_sharding_constraint(Ks, shard)
            return _pchol.block_cholesky(
                Ks, mesh, axis=axis, block=block, layout='contiguous')

        L = factor(eps)
        escalated = jnp.asarray(False)
        if escalate:
            # the shard_map factorization has no internal precision /
            # lift ladder: non-finite output IS the singularity signal
            ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
            L = lax.cond(ok, lambda _: L, lambda _: factor(eps2), None)
            eps = jnp.where(ok, eps, eps2)
            escalated = ~ok
        self._L = L
        self._s = s[:n]
        self._eps = eps
        self._escalated = escalated
        self._n = n
        self._mesh = mesh
        self._axis = axis
        self._block = block

    # mesh objects are hashable aux data for the pytree flattening;
    # everything array-valued crosses jit as leaves (AutoPyTree)

    @property
    def n(self):
        return self._n

    @property
    def m(self):
        return self._n

    @property
    def eps(self):
        return self._eps

    def matrix(self):
        n = self._n
        L = self._L[:n, :n]
        s = self._s
        return jnp.dot(L, L.T, precision=lax.Precision.HIGHEST) \
            / (s[:, None] * s[None, :])

    # -- padded distributed solves ----------------------------------------

    def _pad(self, x):
        npad = self._L.shape[0]
        n = self._n
        if npad == n:
            return x
        pad = [(0, npad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    def _solve_L(self, x):
        """L⁻¹ x (padded rows solve to 0 against the identity tail)."""
        out = _pchol.block_solve_lower(
            self._L, self._pad(x), self._mesh, axis=self._axis,
            block=self._block)
        return out[:self._n]

    def _solve_Lt(self, x):
        out = _pchol.block_solve_lower_t(
            self._L, self._pad(x), self._mesh, axis=self._axis,
            block=self._block)
        return out[:self._n]

    # -- contract ---------------------------------------------------------

    def ginv_linear(self, X):
        s = self._s
        Xs = X * (s[:, None] if X.ndim > 1 else s)
        out = self._solve_Lt(self._solve_L(Xs))
        return out * (s[:, None] if X.ndim > 1 else s)

    def pinv_bilinear(self, A, r):
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
        """(S⁻¹ L) x; the local-row matmul shards over the mesh."""
        n = self._n
        L = self._L
        xp = self._pad(x)
        out = jnp.dot(L, xp)[:n]
        s = self._s
        return out / (s[:, None] if out.ndim > 1 else s)

    def back_correlate(self, X):
        n = self._n
        s = self._s
        Xs = X / (s[:, None] if X.ndim > 1 else s)
        return jnp.dot(self._L[:n, :n].T, Xs)

    def pinv_correlate(self, x):
        s = self._s
        return self._solve_L(x * (s[:, None] if x.ndim > 1 else s))

    def logdet(self):
        # identity padding contributes log 1 = 0
        d = jnp.diagonal(self._L)
        return 2 * jnp.sum(jnp.log(d)) - 2 * jnp.sum(jnp.log(self._s))

    def minus_log_normal_density(self, r):
        z = self.pinv_correlate(r)
        return 0.5 * (
            jnp.dot(z, z) + self.logdet()
            + self._n * math.log(2 * math.pi)
        )

    def fisher(self, dK, dr):
        """Fisher matrix from the explicit (P, n, n) derivative stack.
        The solves run one parameter at a time (``lax.map``) to bound
        the solve WORKSPACE at O(n²), but the A and B result stacks are
        (P, n, n) each — the explicit-Fisher formula needs every B_i
        simultaneously for the pairwise trace contraction.  For large P
        use ``fishvec_cotangent`` (true O(n²) memory per product)."""
        s = self._s

        def one(dKi):
            dKs = dKi * s[:, None] * s[None, :]
            return self._solve_L(dKs)

        A = lax.map(one, dK)                      # (P, n, n) = L⁻¹ S dK_i S
        B = lax.map(lambda Ai: self._solve_L(Ai.T), A)
        FK = 0.5 * jnp.einsum('iab,jba->ij', B, B)
        zr = lax.map(lambda dri: self._solve_L(dri * s), dr)  # (P, n)
        Fr = zr @ zr.T
        return FK + Fr

    def fishvec_cotangent(self, dKv, drv):
        """Same contract as ``Chol.fishvec_cotangent`` (O(n²) memory
        Fisher-vector products), on the distributed solves."""
        M = self.ginv_linear(self.ginv_linear(dKv).T)
        M = 0.5 * (M + M.T)
        return 0.5 * M, self.ginv_linear(drv)
