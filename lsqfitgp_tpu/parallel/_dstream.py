"""Multi-chip streaming: the never-materialized-Gram factorization
distributed over a device mesh.

The single-chip streaming pipeline (``linalg.chol_nll_stream_grad``)
holds the factor TREE (n²/2 floats) on one chip; this module runs the
same recursion with row-sharding constraints on every Gram strip,
panel, and Schur complement, so

- each device EVALUATES only its row strip of each Gram block (GSPMD
  propagates the output constraint back into the profile evaluation),
- the factor tree lives row-sharded (n²/2/D floats per device), which
  extends the streaming size past one chip's HBM (n = 65536 needs
  ~8.6 GB of tree; a v5p-8 slice holds n ≈ 185k),
- the panel solves are row-independent, so they partition with no
  communication; the trailing updates all-gather one panel per
  recursion node (Σ ≈ n²·log(n/block) words over ICI, ≪ the n³/3
  compute),
- the EXACT gradient's strip solves shard by strip rows the same way.

No reference analog (the reference is single-host); this is the
round-4 scale-out frontier on top of round 3's single-chip streaming.
"""

from __future__ import annotations

import jax
from jax import lax
from jax import numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ['stream_nll_distributed_grad']


def _row_shard(mesh, axis):
    sh = NamedSharding(mesh, PartitionSpec(axis, None))

    def shard(a):
        return lax.with_sharding_constraint(a, sh)

    return shard


def stream_nll_distributed_grad(profile, x, y, *, params=(),
                                lenscale=None, epsabs=0.0, mesh,
                                axis='r', block=512, b1=128,
                                gradblock=None, precision='high'):
    """-log N(y | 0, K + eps I) with the Gram computed inside a
    row-sharded streaming factorization over ``mesh`` — differentiable
    (EXACT custom VJP) in ``params``, ``lenscale``, and ``epsabs``,
    like :func:`lsqfitgp_tpu.linalg.chol_nll_stream_grad`.

    ``block`` should be a multiple of the mesh axis size so every
    panel row-shards evenly (the constraint is applied per tree node;
    uneven shapes still work but pad internally).
    """
    from ..linalg import _decomp
    from ..ops import _gram as _og

    X, dtype = _og._prep(x)
    X = (X - jnp.mean(X, axis=0, keepdims=True)).astype(dtype)
    y = jnp.asarray(y, dtype)
    pvec = tuple(jnp.asarray(v, dtype) for v in params)
    ls = jnp.asarray(1.0 if lenscale is None else lenscale, dtype)
    ep = jnp.asarray(epsabs, dtype)
    if gradblock is None:
        gradblock = 4 * int(block)
    shard = _row_shard(mesh, axis)
    return _decomp._nll_stream_core_exact(
        pvec, ls, ep, X, y, profile, int(block), int(b1),
        int(gradblock), precision, shard, None)
