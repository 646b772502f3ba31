"""Hand-written Pallas (Mosaic TPU) kernels for the hot compute paths."""

from ._gram import gram, gram_sym, gram_xla
from ._syrk import schur_update, syrk_t_full
