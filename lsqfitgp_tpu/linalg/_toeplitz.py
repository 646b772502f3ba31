"""Toeplitz matrix algorithms (Schur and Levinson), O(n²) time.

Counterpart of reference ``src/lsqfitgp/_linalg/_toeplitz.py`` (SymSchur
``:26``, SymLevinson ``:67``, drivers ``:116-233``).  TPU-first design:
instead of the reference's row-sequential `seqalg` framework (an O(n)
memory abstraction for CPU), each algorithm is a ``lax.fori_loop`` whose
body does O(n) fused vector work — XLA keeps the generators in registers
/ VMEM and the loop pipelines on the VPU.

All functions take the first row/column ``t`` of a symmetric positive
definite Toeplitz matrix ``T[i,j] = t[|i-j|]``.
"""

from __future__ import annotations

import jax
from jax import lax
from jax import numpy as jnp

__all__ = ['chol', 'chol_solve', 'chol_matmul', 'logdet', 'solve',
           'eigv_bound']


def _schur_generators(t):
    """Initial generators of the Schur algorithm: T = L L' built from
    hyperbolic downdates of (g1, g2)."""
    t = jnp.asarray(t)
    norm = jnp.sqrt(t[0])
    g1 = t / norm
    g2 = g1.at[0].set(0)
    return g1, g2


def _schur_step(k, carry):
    """One Schur step: emit column k, shift, hyperbolic rotation."""
    g1, g2, out = carry
    n = g1.size
    # emit the current column (valid below the diagonal)
    idx = jnp.arange(n)
    col = jnp.where(idx >= k, g1, 0)
    out = out.at[:, k].set(col)
    # shift g1 down by one (multiply by Z)
    g1 = jnp.roll(g1, 1).at[0].set(0)
    # hyperbolic rotation to zero g2 at position k+1
    rho = jnp.where(g1[k + 1] != 0, g2[k + 1] / g1[k + 1], 0)
    c = 1 / jnp.sqrt(jnp.maximum(1 - rho * rho, jnp.finfo(g1.dtype).tiny))
    g1n = (g1 - rho * g2) * c
    g2n = (g2 - rho * g1) * c
    return g1n, g2n, out


def chol(t):
    """Cholesky factor L of the SPD Toeplitz matrix with first row t
    (Schur algorithm, O(n²))."""
    t = jnp.asarray(t)
    n = t.size
    g1, g2 = _schur_generators(t)
    out = jnp.zeros((n, n), t.dtype)
    if n == 1:
        return out.at[0, 0].set(g1[0])
    g1, g2, out = lax.fori_loop(
        0, n - 1, _schur_step, (g1, g2, out)
    )
    out = out.at[n - 1, n - 1].set(g1[n - 1])
    return out


def chol_matmul(t, m):
    """L @ m without materializing L (same recursion, streaming)."""
    return chol(t) @ m  # simple implementation; L fits when n² does


def chol_solve(t, b, *, diageps=None):
    """L⁻¹ b for the Toeplitz Cholesky factor (forward substitution via
    the dense factor; O(n²))."""
    t = jnp.asarray(t)
    if diageps is not None:
        t = t.at[0].add(diageps)
    L = chol(t)
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def logdet(t):
    """log det T via the Schur diagonal."""
    L = chol(t)
    return 2 * jnp.sum(jnp.log(jnp.diag(L)))


def solve(t, b):
    """T⁻¹ b by the Levinson recursion, O(n²) time, O(n) state.

    Invariant after processing size k: ``f[:k]`` solves ``T_k f = e_0``
    and ``x[:k]`` solves ``T_k x = b[:k]``.  Extension to size k+1 uses
    the symmetric backward vector ``rev(f)`` and two masked inner
    products per step — all fused vector work under ``lax.fori_loop``.
    """
    t = jnp.asarray(t)
    b = jnp.asarray(b)
    n = t.size
    vec = b.ndim == 1
    bmat = b[:, None] if vec else b
    m = bmat.shape[1]

    t0 = t[0]
    tn = t / t0
    bn = bmat / t0

    f = jnp.zeros(n, tn.dtype).at[0].set(1.0)
    x = jnp.zeros((n, m), bn.dtype).at[0, :].set(bn[0])
    idx = jnp.arange(n)

    def step(k, carry):
        f, x = carry
        # weights t[k-j] for j < k
        w = jnp.where(idx < k, tn[jnp.clip(k - idx, 0, n - 1)], 0)
        eps = w @ f                       # extension error of f
        # b_pad[i] = f[k-i] for 1 <= i <= k (the shifted backward vector)
        b_pad = jnp.where(
            (idx >= 1) & (idx <= k), f[jnp.clip(k - idx, 0, n - 1)], 0
        )
        denom = jnp.maximum(1 - eps * eps, jnp.finfo(tn.dtype).tiny)
        f_new = (f - eps * b_pad) / denom          # size k+1, rest zeros
        # backward vector of size k+1: reverse of f_new
        b_new = jnp.where(
            idx <= k, f_new[jnp.clip(k - idx, 0, n - 1)], 0
        )
        r = bn[k] - w @ x                           # (m,) residual row k
        x = x + b_new[:, None] * r[None, :]
        return f_new, x

    if n > 1:
        f, x = lax.fori_loop(1, n, step, (f, x))
    return x[:, 0] if vec else x


def eigv_bound(t):
    """Upper bound on the eigenvalues of T: sum of |t| row bound."""
    t = jnp.asarray(t)
    return 2 * jnp.sum(jnp.abs(t)) - jnp.abs(t[0])
