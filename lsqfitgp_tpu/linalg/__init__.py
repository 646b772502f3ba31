"""Linear algebra layer: regularized decompositions and structured solvers."""

from ._pytree import AutoPyTree
from ._decomp import (Decomposition, Chol, chol_nll,
                      chol_nll_stream, chol_nll_stream_grad,
                      chol_pred_stream, chol_stream_fisher,
                      solve_batched)
from ._blocked import (
    chol_factor, cholesky_blocked, solve_lower, solve_lower_t,
    diag_block_inverses, trtri_blocked,
)
from . import _toeplitz as toeplitz
from . import _seqalg as seqalg
