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
    structured_to_unstructured, append_fields, ix_, swapaxes, empty,
    empty_like,
)
from ._deriv import Deriv
from ._config import (
    default_float, disable_checks, set_checks, enable_compile_cache,
)
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

from .gp import (GP, DefaultProcess, stream_marginal_likelihood,
                 stream_pred)
from .fit import empbayes_fit
from .raniter import raniter, sample
from .uncert import BufferDict, add_distribution

from . import copula
from . import models
from . import ops
from . import parallel
from . import utils

# reference-compatible aliases (lsqfitgp top-level surface)
bayestree = models


def broadcast(*arrays):
    """Broadcast arrays (incl. StructuredArray) to a common shape and
    return the first; reference ``_array.broadcast`` usage is
    ``broadcast(x, y).shape``."""
    return broadcast_arrays(*arrays)[0]


def jacobian(u):
    """(mean, dense jacobian wrt the concatenated primary Normals) of a
    UArray — reference ``_gvarext/_jacobian.py:44``."""
    import jax.numpy as _jnp
    keys = sorted(u.jac)
    jacs = [u.jac[k].reshape(u.size, -1) for k in keys]
    J = _jnp.concatenate(jacs, axis=-1) if jacs else _jnp.zeros((u.size, 0))
    return u.mean, J.reshape(u.shape + (-1,))


def from_jacobian(mean, jac):
    """UArray from (mean, jacobian) — reference ``_jacobian.py:77``."""
    from . import uncert as _u
    import jax.numpy as _jnp
    jac = _jnp.asarray(jac)
    return _u.UArray(mean, {_u.next_block_id(): jac})


def gvar_gufunc(fn, *, signature=None):
    """Wrap a jax function so it accepts UArray inputs with first-order
    propagation — reference ``_gvarext/_ufunc.py:32``."""
    from . import uncert as _u

    def wrapper(x, *args, **kw):
        if isinstance(x, _u.UArray):
            return _u.ufunc(lambda v: fn(v, *args, **kw), x)
        return fn(x, *args, **kw)

    return wrapper


import contextlib as _contextlib


@_contextlib.contextmanager
def switchgvar():
    """No-op context manager kept for reference API compatibility: gvar
    switches primary-variable memory pools; UArray blocks are garbage
    collected per-object, so there is no pool to switch."""
    yield


from .utils import uformat, tabulate_together
from .utils._format import format_uarray as gvar_format


def fmtspec_kwargs(spec):
    """Parse a format spec 'errdig:style' into uformat kwargs
    (simplified counterpart of reference ``_format.py:198``)."""
    out = {}
    if not spec:
        return out
    parts = spec.split(':')
    if parts[0]:
        out['errdig'] = float(parts[0])
    if len(parts) > 1 and parts[1]:
        out['style'] = parts[1]
    return out

__all__ = [
    'StructuredArray', 'asarray', 'Deriv', 'GP', 'DefaultProcess',
    'structured_to_unstructured', 'unstructured_to_structured',
    'append_fields', 'ix_', 'swapaxes', 'empty', 'empty_like',
    'CrossKernel', 'Kernel', 'StationaryKernel', 'IsotropicKernel',
    'kernel', 'crosskernel', 'stationarykernel', 'isotropickernel',
    'crossstationarykernel', 'crossisotropickernel',
    *_zoo_all,
]
