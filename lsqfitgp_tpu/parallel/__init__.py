"""Multi-chip scale-out layer (the genuinely new part vs the reference).

The reference is single-device (SURVEY §2.8: no pmap/pjit/collectives
anywhere).  Here the O(n²) Gram assembly and the O(n³) solve path are
expressed over a `jax.sharding.Mesh`:

- :func:`make_mesh` — build a 1D/2D device mesh;
- :func:`sharded_gram` — Gram assembly with block-sharded output, so
  each device computes only its (row-block, col-block) tiles;
- :func:`sharded_nll` / :func:`sharded_train_step` — end-to-end
  marginal-likelihood (+gradient) with sharding constraints, the
  building block for multi-chip `empbayes_fit`.
"""

from ._mesh import (
    make_mesh, sharded_gram, sharded_nll, sharded_nll_distributed,
    sharded_posterior, sharded_train_step,
)
from ._pchol import (
    block_cholesky, block_solve_lower, block_solve_lower_t,
    cyclic_permutation,
)
from ._dchol import CholDistributed
from ._dstream import stream_nll_distributed_grad
