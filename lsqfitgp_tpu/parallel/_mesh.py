"""Mesh construction and sharded GP inference steps.

Strategy (cf. the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives):

- mesh axes ('r', 'c'): the Gram matrix K ∈ R^{n×n} is block-sharded
  P('r', 'c'); the input points are sharded P('r') (and replicated along
  'c'), so each device evaluates only its tile of the kernel — the
  O(n²·d) assembly work and the O(n²) memory are both distributed.
- the Cholesky factorization is left to XLA's SPMD partitioner; on
  current backends it gathers the operand, so for n beyond per-chip HBM
  use the blocked factorization in :mod:`lsqfitgp_tpu.parallel` (future:
  Pallas panel factorization + ppermute trailing updates).
"""

from __future__ import annotations

import math

import jax
import numpy
from jax import numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'sharded_gram', 'sharded_nll', 'sharded_train_step']


def make_mesh(n_devices=None, *, axes=('r', 'c')):
    """A 2D mesh over the available devices, as square as possible."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    # factor n = a*b with a <= b, a maximal
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    b = n // a
    arr = numpy.array(devices).reshape(a, b)
    return Mesh(arr, axes)


def sharded_gram(kernel, x, y=None, *, mesh):
    """Evaluate the Gram matrix with output block-sharded over the mesh.

    ``x`` sharded along rows ('r'), ``y`` along columns ('c'); the
    elementwise kernel core then computes each (r, c) tile on the device
    that owns it with no communication.
    """
    if y is None:
        y = x
    cr = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P('r'))
    )
    cc = jax.lax.with_sharding_constraint(
        y, NamedSharding(mesh, P('c'))
    )
    K = kernel(cr[:, None], cc[None, :])
    return jax.lax.with_sharding_constraint(
        K, NamedSharding(mesh, P('r', 'c'))
    )


def sharded_nll(kernel_fn, x, y, noise_var, *, mesh):
    """-log marginal likelihood with distributed Gram assembly.

    ``kernel_fn(hp=None)`` must already be a closed kernel callable.
    The density uses the same regularized-Cholesky semantics as
    :class:`lsqfitgp_tpu.linalg.Chol`.
    """
    from ..linalg import Chol

    K = sharded_gram(kernel_fn, x, mesh=mesh)
    n = K.shape[0]
    K = K + noise_var * jnp.eye(n, dtype=K.dtype)
    dec = Chol(K)
    return dec.minus_log_normal_density(y)


def sharded_nll_distributed(kernel_fn, x, y, noise_var, *, mesh,
                            axis='r', block=128):
    """-log marginal likelihood where BOTH the Gram assembly and the
    Cholesky factorization + solve are distributed (no single-device
    gather of the n×n matrix): row-sharded assembly, blocked-panel
    shard_map Cholesky (`parallel.block_cholesky`), distributed forward
    substitution, local log-diagonal reduction."""
    import math as _math
    from ._pchol import block_cholesky, block_solve_lower

    n = y.shape[0]
    rows = NamedSharding(mesh, P(axis))
    xr = jax.lax.with_sharding_constraint(x, rows)
    K = kernel_fn(xr[:, None], x[None, :])
    K = K + noise_var * jnp.eye(n, dtype=K.dtype)
    K = jax.lax.with_sharding_constraint(
        K, NamedSharding(mesh, P(axis, None))
    )
    L = block_cholesky(K, mesh, axis=axis, block=block)
    z = block_solve_lower(L, y, mesh, axis=axis, block=block)
    logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return 0.5 * (z @ z + logdet + n * _math.log(2 * _math.pi))


def sharded_train_step(kernel_family, *, mesh):
    """Build a jittable training step ``step(params, x, y) -> (loss,
    grads)`` where the Gram assembly is sharded over the mesh.

    ``kernel_family(params)`` returns a kernel callable; ``params`` is a
    pytree of scalars (replicated).
    """

    def loss(params, x, y):
        k = kernel_family(params)
        noise = params['noise_var'] if 'noise_var' in params else 1e-4
        return sharded_nll(k, x, y, noise, mesh=mesh)

    grad = jax.value_and_grad(loss)

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P('r'))

    @jax.jit
    def step(params, x, y):
        x = jax.lax.with_sharding_constraint(x, rows)
        value, g = grad(params, x, y)
        return value, g

    return step
