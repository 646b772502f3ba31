"""Distributed blocked Cholesky over a device mesh (shard_map).

The scale-out solver of SURVEY §7.11: the Gram matrix is row-sharded
over a 1D mesh axis; the factorization proceeds right-looking over
column panels of width ``block``:

1. every device contributes its local strip of panel k to an
   ``all_gather`` (the only communication: n·B floats per step, Σ = n²);
2. every device redundantly factorizes the B×B diagonal block and
   triangular-solves the gathered panel (redundant FLOPs: a 3B/n
   fraction of the total n³/3 — negligible for B ≪ n);
3. each device applies the trailing update to its own rows with one
   batched matmul on the MXU.

This keeps the O(n²) matrix memory and the O(n³) update FLOPs fully
distributed, so n is limited by the *pod's* aggregate HBM rather than
one chip's.  Row sharding is contiguous (simple, slight tail imbalance);
block-cyclic layout is a planned refinement.
"""

from __future__ import annotations

import functools

from jax import lax
from jax import numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ['block_cholesky', 'block_solve_lower']


def _pchol_local(A_local, *, axis, block, n, ndev):
    """shard_map body: A_local is the device's (n/D, n) row strip."""
    rows_per = n // ndev
    me = lax.axis_index(axis)
    row0 = (me * rows_per).astype(jnp.int32)  # global index of first row
    nb = n // block

    def step(k, L_local):
        c0 = (k * block).astype(jnp.int32) if hasattr(k, 'astype') \
            else jnp.int32(k * block)
        zero = jnp.int32(0)
        # 1) gather panel column k: local strip (rows_per, B) -> (n, B)
        strip = lax.dynamic_slice(
            L_local, (zero, c0), (rows_per, block)
        )
        panel = lax.all_gather(strip, axis, tiled=True)      # (n, B)
        # 2) redundant diagonal factorization + panel solve
        diag = lax.dynamic_slice(panel, (c0, zero), (block, block))
        Lkk = lax.linalg.cholesky(diag)
        # L[:, k] = A[:, k] Lkk^{-T} for rows below the diagonal block
        sol = lax.linalg.triangular_solve(
            Lkk, panel, left_side=False, lower=True,
            transpose_a=True,
        )                                                     # (n, B)
        # assemble the final panel: rows below the diagonal block get the
        # solve, the diagonal block gets Lkk, rows above get zero
        gidx = jnp.arange(n)
        below = gidx >= c0 + block
        Lpanel = jnp.where(below[:, None], sol, 0.0)
        Lpanel = lax.dynamic_update_slice(Lpanel, Lkk, (c0, zero))

        # write the panel into the local strip
        local_rows = row0 + jnp.arange(rows_per)
        L_local = lax.dynamic_update_slice(
            L_local,
            lax.dynamic_slice(Lpanel, (row0, zero), (rows_per, block)),
            (zero, c0),
        )

        # 3) trailing update of local rows, columns > k:
        #    A[i, j] -= L[i, k] L[j, k]^T  (mask j <= k columns away)
        Lik = lax.dynamic_slice(L_local, (zero, c0), (rows_per, block))
        # zero the contribution for local rows that are not below the
        # panel (they are already final)
        row_below = (local_rows >= c0 + block)[:, None]
        Lik_masked = jnp.where(row_below, Lik, 0.0)
        update = Lik_masked @ Lpanel.T                        # (rows_per, n)
        col_after = (gidx >= c0 + block)[None, :]
        L_local = L_local - jnp.where(col_after, update, 0.0)
        return L_local

    L_local = lax.fori_loop(0, nb, step, A_local)
    # zero strict upper triangle of the local strip
    gidx = jnp.arange(n)[None, :]
    lidx = (row0 + jnp.arange(rows_per))[:, None]
    return jnp.where(gidx <= lidx, L_local, 0.0)


def block_cholesky(A, mesh, *, axis='r', block=256):
    """Cholesky factor of SPD ``A`` (n×n), row-sharded over mesh axis
    ``axis``; returns L with the same sharding.  Requires n divisible by
    both the device count and ``block``."""
    n = A.shape[0]
    ndev = mesh.shape[axis]
    if n % ndev or n % block:
        raise ValueError(
            f'n={n} must be divisible by devices={ndev} and block={block}'
        )
    fn = shard_map(
        functools.partial(
            _pchol_local, axis=axis, block=block, n=n, ndev=ndev
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    return fn(A)


def _psolve_local(L_local, b, *, axis, block, n, ndev):
    """Forward substitution L x = b with row-sharded L (b replicated)."""
    rows_per = n // ndev
    nb = n // block

    def step(k, x):
        c0 = (k * block).astype(jnp.int32) if hasattr(k, 'astype') \
            else jnp.int32(k * block)
        zero = jnp.int32(0)
        # gather the k-th block row chunk owned by whoever holds it:
        # all devices have b and x replicated; they need L[kblock, :c0+B]
        # strip: local rows' columns [0, c0+B) are needed only for the
        # owner; gather the k-th block of rows
        strip = L_local
        allrows = lax.all_gather(strip, axis, tiled=True)   # (n, n) gather!
        Lrow = lax.dynamic_slice(allrows, (c0, zero), (block, n))
        Lkk = lax.dynamic_slice(Lrow, (zero, c0), (block, block))
        rhs = lax.dynamic_slice(b, (c0,), (block,)) - Lrow @ jnp.where(
            jnp.arange(n) < c0, x, 0.0
        )
        xk = lax.linalg.triangular_solve(
            Lkk, rhs[:, None], left_side=True, lower=True
        )[:, 0]
        return lax.dynamic_update_slice(x, xk, (c0,))

    x0 = jnp.zeros_like(b)
    # the loop carry becomes device-varying (it is derived from the
    # gathered local strips); mark the initial carry accordingly
    try:
        x0 = lax.pcast(x0, (axis,), to='varying')
    except (AttributeError, TypeError):  # older jax
        x0 = lax.pvary(x0, (axis,))
    x = lax.fori_loop(0, nb, step, x0)
    # every device holds the same x; pmean re-marks it as replicated so
    # it can leave the shard_map with out_specs P()
    return lax.pmean(x, axis)


def block_solve_lower(L, b, mesh, *, axis='r', block=256):
    """Solve L x = b with L row-sharded (reference implementation;
    gathers rows per step — optimize with point-to-point later)."""
    n = L.shape[0]
    ndev = mesh.shape[axis]
    fn = shard_map(
        functools.partial(
            _psolve_local, axis=axis, block=block, n=n, ndev=ndev
        ),
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
    )
    return fn(L, b)
