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
                            axis='r', block=128, layout='cyclic'):
    """-log marginal likelihood where the Gram assembly, the Cholesky
    factorization, the forward substitution, and the log-determinant
    are ALL distributed — one fused ``shard_map``:

    - each device assembles only its own row strip of K (rows picked by
      the block-cyclic layout, so late factorization panels still have
      work on every device);
    - blocked-panel right-looking Cholesky (per-panel all_gather of the
      n×B panel — Σ n² communication);
    - accumulator forward substitution (one masked psum of B entries
      per panel — Σ n·log D communication; the round-1 version
      all-gathered the full n×n factor per step);
    - local log-diagonal partial sums + psum.

    No device ever materializes more than its (n/D, n) strip, so n is
    limited by the pod's aggregate HBM rather than one chip's."""
    import math as _math
    import functools
    from jax import lax
    from . import _pchol

    n = y.shape[0]
    ndev = mesh.shape[axis]
    if n % ndev:
        raise ValueError(f'n={n} must be divisible by devices={ndev}')
    rows_per = n // ndev
    # panel width must divide the per-device row count so each block's
    # owner is a single device; shrink to the largest divisor
    block = min(block, rows_per)
    while rows_per % block:
        block -= 1

    def body(x, y, noise_var):
        me = lax.axis_index(axis)
        g_rows = _pchol._global_rows(me, rows_per, block, ndev, layout)
        xl = jnp.take(x, g_rows)
        K_local = kernel_fn(xl[:, None], x[None, :])
        K_local = K_local.at[
            jnp.arange(rows_per), g_rows
        ].add(jnp.asarray(noise_var, K_local.dtype))
        L_local = _pchol._chol_local(
            K_local, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        )
        z = _pchol._solve_lower_local(
            L_local, y, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        )
        diag = L_local[jnp.arange(rows_per), g_rows]
        logdet = 2 * lax.psum(jnp.sum(jnp.log(diag)), axis)
        return 0.5 * (z @ z + logdet + n * _math.log(2 * _math.pi))

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
    )
    return fn(x, y, jnp.asarray(noise_var))


def sharded_posterior(kernel_fn, x, y, xs, noise_var, *, mesh,
                      axis='r', block=128, layout='cyclic', cov=False):
    """Distributed GP posterior (mean, variance) at prediction points
    ``xs`` given data (x, y): assembly, factorization, and both solves
    in ONE fused ``shard_map``, no device ever holding more than its
    (n/D, n) training strip and an (n/D, ns) cross strip.

    mean = Kxs' (Kxx+noise)⁻¹ y,  var = diag(Kss) − colsums((L⁻¹Kxs)²),
    computed by folding each solved block row of W = L⁻¹Kxs into the
    running mean/variance statistics instead of materializing W.

    ``cov=True`` returns ``(mean, covariance)`` instead: the full
    (ns, ns) posterior covariance Kss − W'W, accumulated per solved
    block row (adds one (B, ns)²-matmul per panel; the (ns, ns)
    accumulator is replicated, so keep ns per-chip-sized).
    """
    import functools
    from jax import lax
    from . import _pchol

    n = y.shape[0]
    ns = xs.shape[0]
    ndev = mesh.shape[axis]
    if n % ndev:
        raise ValueError(f'n={n} must be divisible by devices={ndev}')
    rows_per = n // ndev
    block = min(block, rows_per)
    while rows_per % block:
        block -= 1
    nb = n // block

    def body(x, y, xs, noise_var):
        me = lax.axis_index(axis)
        g_rows = _pchol._global_rows(me, rows_per, block, ndev, layout)
        xl = jnp.take(x, g_rows)
        K_local = kernel_fn(xl[:, None], x[None, :])
        K_local = K_local.at[
            jnp.arange(rows_per), g_rows
        ].add(jnp.asarray(noise_var, K_local.dtype))
        L_local = _pchol._chol_local(
            K_local, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        )
        z = _pchol._solve_lower_local(
            L_local, y, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        )
        Ks_local = kernel_fn(xl[:, None], xs[None, :])  # (rows_per, ns)

        # forward substitution on W = L⁻¹ Kxs, folding each solved
        # block row into the posterior statistics
        def step(k, carry):
            acc, mean, var = carry
            c0 = (jnp.int32(k) * block).astype(jnp.int32)
            zero = jnp.int32(0)
            owner, slot0 = _pchol._owner_slot(
                k, block, rows_per, ndev, layout)
            is_owner = me == owner
            rhs = lax.dynamic_slice(Ks_local, (slot0, zero),
                                    (block, ns)) \
                - lax.dynamic_slice(acc, (slot0, zero), (block, ns))
            Lkk = lax.dynamic_slice(L_local, (slot0, c0),
                                    (block, block))
            Lkk = jnp.where(is_owner, Lkk,
                            jnp.eye(block, dtype=Lkk.dtype))
            Wk = lax.linalg.triangular_solve(
                Lkk, rhs, left_side=True, lower=True)
            Wk = _pchol._masked_psum(Wk, is_owner, axis)
            cols = lax.dynamic_slice(L_local, (zero, c0),
                                     (rows_per, block))
            acc = acc + cols @ Wk
            zk = lax.dynamic_slice(z, (c0,), (block,))
            mean = mean + Wk.T @ zk
            if cov:
                var = var - Wk.T @ Wk
            else:
                var = var - jnp.sum(Wk * Wk, axis=0)
            return acc, mean, var

        if cov:
            kss = kernel_fn(xs[:, None], xs[None, :])      # (ns, ns)
        else:
            kss = jax.vmap(lambda p: kernel_fn(p, p))(xs)  # diag only
        acc0 = jnp.zeros((rows_per, ns), K_local.dtype)
        mean0 = jnp.zeros(ns, K_local.dtype)
        acc0, mean0, kss = _pchol._pvary((acc0, mean0, kss), axis)
        _, mean, var = lax.fori_loop(0, nb, step, (acc0, mean0, kss))
        return lax.pmean(mean, axis), lax.pmean(var, axis)

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
    )
    return fn(x, y, xs, jnp.asarray(noise_var))


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
