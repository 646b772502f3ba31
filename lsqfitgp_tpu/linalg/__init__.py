"""Linear algebra layer: regularized decompositions and structured solvers."""

from ._pytree import AutoPyTree
from ._decomp import Decomposition, Chol, solve_batched
from . import _toeplitz as toeplitz
from . import _seqalg as seqalg
