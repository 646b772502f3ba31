"""lsqfitgp_tpu — a TPU-native Gaussian-process inference framework.

A from-scratch rebuild of the capabilities of `lsqfitgp
<https://github.com/Gattocrucco/lsqfitgp>`_, designed TPU-first:

- Gram matrices assemble as tiled kernels on the MXU (Pallas) or fused
  XLA broadcasts, sharded over device meshes via ``jax.sharding``.
- The decomposition layer (Cholesky + fused Gaussian-density ops) runs
  in fp32 with eps-scaled regularization (fp64 parity mode on CPU).
- Hyperparameter fitting (`empbayes_fit`) jit-compiles end-to-end,
  including the optimizer loop where possible.
- Error propagation (the reference's `gvar` dependency) is a native
  subsystem, :mod:`lsqfitgp_tpu.uncert`, built on dense JAX Jacobians.
"""

__version__ = '0.1.0'

from ._array import (
    StructuredArray, asarray, broadcast_to, broadcast_arrays,
    broadcast_shapes, concatenate, unstructured_to_structured,
)
from ._deriv import Deriv
from ._config import default_float, disable_checks, set_checks
from ._jaxutil import (
    elementwise_grad, batchufunc, fasthash64, fasthash32,
)

from . import linalg
from . import special
from . import uncert

from .kernelalg import (
    CrossKernel, Kernel, AffineSpan, PreservedBySwap,
    CrossStationaryKernel, StationaryKernel,
    CrossIsotropicKernel, IsotropicKernel, CrossConstant, Zero,
    crosskernel, kernel,
    crossstationarykernel, stationarykernel,
    crossisotropickernel, isotropickernel,
)

# the kernel zoo, re-exported at top level like the reference
from .kernels import *  # noqa: F401,F403
from .kernels import __all__ as _zoo_all

from .gp import GP, DefaultProcess
from .fit import empbayes_fit
from .raniter import raniter, sample
from .uncert import BufferDict, add_distribution

__all__ = [
    'StructuredArray', 'asarray', 'Deriv', 'GP', 'DefaultProcess',
    'CrossKernel', 'Kernel', 'StationaryKernel', 'IsotropicKernel',
    'kernel', 'crosskernel', 'stationarykernel', 'isotropickernel',
    'crossstationarykernel', 'crossisotropickernel',
    *_zoo_all,
]
