"""Native uncertainty propagation (the reference's gvar interop,
re-designed as device-resident dense Jacobians)."""

from ._uarray import (
    UArray, from_cov, from_jacobian, normal, ufunc, mean, sdev, var,
    evalcov, cov, corr, sample, uconcatenate, next_block_id,
)
from ._bufferdict import BufferDict, add_distribution, has_distribution
