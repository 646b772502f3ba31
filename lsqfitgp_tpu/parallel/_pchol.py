"""Distributed blocked Cholesky + triangular solves over a device mesh.

The scale-out solver of SURVEY §7.11: the Gram matrix is row-sharded
over a 1D mesh axis; the factorization proceeds right-looking over
column panels of width ``block``:

1. every device contributes its local strip of panel k to an
   ``all_gather`` (n·B floats per step, Σ = n² total communication);
2. every device redundantly factorizes the B×B diagonal block and
   triangular-solves the gathered panel (redundant FLOPs: a 3B/n
   fraction of the total n³/3 — negligible for B ≪ n);
3. each device applies the trailing update to its own rows with one
   batched matmul on the MXU.

Row layouts
-----------
``layout='cyclic'`` (used by the fused drivers in `_mesh`): device d
owns the row blocks
{k : k ≡ d (mod D)} — the ScaLAPACK block-cyclic 1D layout.  Every
device keeps owning rows in every trailing suffix, so the per-panel
update work stays balanced to the end (with contiguous rows, device 0
goes idle after the first n/D columns are factored).
``layout='contiguous'`` (the default of the standalone functions):
device d owns rows [d·n/D, (d+1)·n/D) — the plain jax.sharding
convention, matching a P(axis, None)-sharded global array directly.

In the cyclic layout the "global" array entering/leaving ``shard_map``
is the *layout-ordered* matrix: global row j of it is matrix row
``((j // B) % D)``-th device's ``(j // (B·D))``-th local block.  Use
the fused drivers (`sharded_nll_distributed`) or `cyclic_permutation`
to map user order to layout order.

Triangular solves are fully distributed too (the round-1 version
all-gathered the whole factor per step): forward substitution keeps a
local partial-sum accumulator per device, so each step costs one
masked-psum broadcast of the B solved entries — O(n log D) total
communication — and the (rows_per × B) accumulator matmuls spread the
O(n²) substitution FLOPs evenly over the devices.
"""

from __future__ import annotations

import functools

import numpy
from jax import lax
from jax import numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

__all__ = [
    'block_cholesky', 'block_solve_lower', 'block_solve_lower_t',
    'cyclic_permutation',
]


def cyclic_permutation(n, ndev, block):
    """Permutation p with p[j] = user-order row of layout-order row j:
    layout row j lives on device (j // B) mod D... inverse mapping such
    that ``A_layout = A[p][:, p]``."""
    if n % (ndev * block):
        raise ValueError(
            f'cyclic layout needs n={n} divisible by devices*block='
            f'{ndev}*{block}'
        )
    s = numpy.arange(n)
    dev = (s // block) % ndev          # owning device of user block
    lblk = (s // block) // ndev        # local block index on that device
    layout_pos = (dev * (n // ndev) + lblk * block + s % block)
    p = numpy.empty(n, numpy.int64)
    p[layout_pos] = s
    return p


def _global_rows(me, rows_per, block, ndev, layout):
    """Map local slot -> global (layout-independent matrix) row index."""
    s = jnp.arange(rows_per)
    if layout == 'cyclic':
        return ((s // block) * ndev + me) * block + (s % block)
    return me * rows_per + s


def _gather_panel(strip, axis, rows_per, block, ndev, layout):
    """all_gather local (rows_per, B) strips into the global (n, B)
    panel in matrix row order."""
    g = lax.all_gather(strip, axis)          # (D, rows_per, B)
    if layout == 'cyclic':
        nlb = rows_per // block
        g = g.reshape(ndev, nlb, block, block)
        g = jnp.transpose(g, (1, 0, 2, 3))   # (nlb, D, B, B)
        return g.reshape(ndev * rows_per, block)
    return g.reshape(ndev * rows_per, block)


def _owner_slot(k, block, rows_per, ndev, layout):
    """(owner device, local slot of the first row) of global block k."""
    k = jnp.asarray(k, jnp.int32)
    nlb = rows_per // block
    if layout == 'cyclic':
        return k % ndev, (k // ndev) * block
    return k // nlb, (k % nlb) * block


def _chol_local(A_local, *, axis, block, n, ndev, layout):
    """shard_map body: A_local is the device's (n/D, n) strip of rows
    ``_global_rows(...)``."""
    rows_per = n // ndev
    me = lax.axis_index(axis)
    g_rows = _global_rows(me, rows_per, block, ndev, layout)
    nb = n // block
    gidx = jnp.arange(n)
    # self-healing diagonal lift sized by the GLOBAL matrix scale
    # (pmax over the row strips), same strategy as the single-chip
    # blocked factorization (_blocked._chol_lifted): a near-singular
    # trailing block refactors itself with a small bump instead of
    # poisoning the whole factor with NaNs — essential in float32
    from ..linalg import _blocked
    local_scale = lax.stop_gradient(
        jnp.max(jnp.sum(jnp.abs(A_local), axis=1)))
    # all_gather + max instead of lax.pmax: pmax has no AD rule, and
    # the lift scale must not carry gradients anyway
    bump = _blocked._LIFT * jnp.finfo(A_local.dtype).eps \
        * jnp.max(lax.all_gather(local_scale, axis))

    def step(k, L_local):
        c0 = (jnp.int32(k) * block).astype(jnp.int32)
        zero = jnp.int32(0)
        # 1) gather panel column k: local strips -> (n, B) global panel
        strip = lax.dynamic_slice(L_local, (zero, c0), (rows_per, block))
        panel = _gather_panel(strip, axis, rows_per, block, ndev, layout)
        # 2) redundant diagonal factorization + panel solve
        diag = lax.dynamic_slice(panel, (c0, zero), (block, block))
        Lkk = _blocked._chol_lifted(diag, bump)
        sol = lax.linalg.triangular_solve(
            Lkk, panel, left_side=False, lower=True, transpose_a=True,
        )                                                     # (n, B)
        below = gidx >= c0 + block
        Lpanel = jnp.where(below[:, None], sol, 0.0)
        Lpanel = lax.dynamic_update_slice(Lpanel, Lkk, (c0, zero))

        # write the panel rows this device owns back into its strip
        L_local = lax.dynamic_update_slice(
            L_local, jnp.take(Lpanel, g_rows, axis=0), (zero, c0),
        )

        # 3) trailing update of local rows, columns > k
        Lik = lax.dynamic_slice(L_local, (zero, c0), (rows_per, block))
        row_below = (g_rows >= c0 + block)[:, None]
        Lik_masked = jnp.where(row_below, Lik, 0.0)
        update = Lik_masked @ Lpanel.T                        # (rows_per, n)
        col_after = (gidx >= c0 + block)[None, :]
        return L_local - jnp.where(col_after, update, 0.0)

    L_local = lax.fori_loop(0, nb, step, A_local)
    # zero the strict upper triangle of the local rows
    return jnp.where(gidx[None, :] <= g_rows[:, None], L_local, 0.0)


def block_cholesky(A, mesh, *, axis='r', block=256,
                   layout='contiguous'):
    """Cholesky factor of SPD ``A`` (n×n) given in LAYOUT row order
    (= plain matrix order for the default contiguous layout),
    row-sharded over mesh axis ``axis``; returns L in the same layout
    and sharding.  Requires n divisible by the device count and by
    ``block``; the cyclic layout additionally requires ``block`` to
    divide n/devices."""
    n = A.shape[0]
    ndev = mesh.shape[axis]
    if n % ndev or n % block:
        raise ValueError(
            f'n={n} must be divisible by devices={ndev} and '
            f'block={block}'
        )
    if layout == 'cyclic' and (n // ndev) % block:
        raise ValueError(
            f'cyclic layout needs block={block} to divide '
            f'rows-per-device={n // ndev}'
        )
    fn = shard_map(
        functools.partial(
            _chol_local, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        ),
        mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None),
    )
    return fn(A)


def _masked_psum(v, cond, axis):
    return lax.psum(jnp.where(cond, v, 0.0), axis)


def _solve_lower_local(L_local, b, *, axis, block, n, ndev, layout):
    """Forward substitution L X = B, distributed (B: (n,) or (n, m)):

    each device keeps ``acc = Σ_solved L_local[:, j] x_j`` for its own
    rows, so the owner of block k reads its rhs straight from ``acc``,
    solves the B×B system, and one masked psum broadcasts the solved
    block.  Comm O(n·m·log D) total; substitution FLOPs distributed as
    (rows_per × B) matmuls per step."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    m = b.shape[1]
    rows_per = n // ndev
    me = lax.axis_index(axis)
    g_rows = _global_rows(me, rows_per, block, ndev, layout)
    bl = jnp.take(b, g_rows, axis=0)     # local rows' rhs entries
    nb = n // block

    def step(k, carry):
        x, acc = carry
        c0 = (jnp.int32(k) * block).astype(jnp.int32)
        zero = jnp.int32(0)
        owner, slot0 = _owner_slot(k, block, rows_per, ndev, layout)
        is_owner = me == owner
        rhs = lax.dynamic_slice(bl, (slot0, zero), (block, m)) \
            - lax.dynamic_slice(acc, (slot0, zero), (block, m))
        Lkk = lax.dynamic_slice(L_local, (slot0, c0), (block, block))
        # non-owners hold garbage here; solving against it would create
        # NaNs whose *zero cotangents* still poison reverse mode (0·NaN)
        Lkk = jnp.where(is_owner, Lkk, jnp.eye(block, dtype=Lkk.dtype))
        xk = lax.linalg.triangular_solve(
            Lkk, rhs, left_side=True, lower=True
        )
        xk = _masked_psum(xk, is_owner, axis)
        x = lax.dynamic_update_slice(x, xk, (c0, zero))
        cols = lax.dynamic_slice(L_local, (zero, c0), (rows_per, block))
        acc = acc + cols @ xk
        return x, acc

    x0 = jnp.zeros((n, m), b.dtype)
    acc0 = jnp.zeros((rows_per, m), b.dtype)
    x0, acc0 = _pvary((x0, acc0), axis)
    x, _ = lax.fori_loop(0, nb, step, (x0, acc0))
    x = lax.pmean(x, axis)
    return x[:, 0] if vec else x


def _solve_lower_t_local(L_local, b, *, axis, block, n, ndev, layout):
    """Backward substitution L' X = B, distributed (B: (n,) or (n, m)):
    the column block of L holding L[j>k, k] is spread over the devices'
    rows, so each step psums the per-device partials of
    Σ_{j>k} L[j,k]' x_j, then the owner solves Lkk' xk and a second
    masked psum broadcasts the solved block."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    m = b.shape[1]
    rows_per = n // ndev
    me = lax.axis_index(axis)
    g_rows = _global_rows(me, rows_per, block, ndev, layout)
    nb = n // block

    def step(i, carry):
        x, xl = carry                # x: (n, m); xl: x at local rows
        k = nb - 1 - i
        c0 = (jnp.int32(k) * block).astype(jnp.int32)
        zero = jnp.int32(0)
        owner, slot0 = _owner_slot(k, block, rows_per, ndev, layout)
        is_owner = me == owner
        # partial_k = Σ_{local j > k-block} L_local[j, k-block]' x_j
        cols = lax.dynamic_slice(L_local, (zero, c0), (rows_per, block))
        solved = (g_rows >= c0 + block)[:, None]
        partial = cols.T @ jnp.where(solved, xl, 0.0)
        partial = lax.psum(partial, axis)
        rhs = lax.dynamic_slice(b, (c0, zero), (block, m)) - partial
        Lkk = lax.dynamic_slice(L_local, (slot0, c0), (block, block))
        Lkk = jnp.where(is_owner, Lkk, jnp.eye(block, dtype=Lkk.dtype))
        xk = lax.linalg.triangular_solve(
            Lkk, rhs, left_side=True, lower=True, transpose_a=True,
        )
        xk = _masked_psum(xk, is_owner, axis)
        x = lax.dynamic_update_slice(x, xk, (c0, zero))
        xl = jnp.where(
            ((g_rows >= c0) & (g_rows < c0 + block))[:, None],
            jnp.take(x, g_rows, axis=0), xl)
        return x, xl

    x0 = jnp.zeros((n, m), b.dtype)
    xl0 = jnp.zeros((rows_per, m), b.dtype)
    x0, xl0 = _pvary((x0, xl0), axis)
    x, _ = lax.fori_loop(0, nb, step, (x0, xl0))
    x = lax.pmean(x, axis)
    return x[:, 0] if vec else x


def _pvary(tree, axis):
    """Mark replicated values as device-varying so they can seed a
    shard_map loop carry that becomes varying."""
    import jax

    def one(v):
        # pcast is the current API; pvary is its deprecated alias
        try:
            return lax.pcast(v, (axis,), to='varying')
        except (AttributeError, TypeError):  # pragma: no cover
            return lax.pvary(v, (axis,))

    return jax.tree.map(one, tree)


def _check_solve_sizes(n, ndev, block):
    if n % (ndev * block):
        raise ValueError(
            f'distributed solves need n={n} divisible by '
            f'devices*block={ndev}*{block} (block ownership must be '
            f'local to one device)'
        )


def block_solve_lower(L, b, mesh, *, axis='r', block=256,
                      layout='contiguous'):
    """Solve L x = b with L the layout-ordered row-sharded factor from
    `block_cholesky`; b and x in matrix row order, replicated."""
    n = L.shape[0]
    ndev = mesh.shape[axis]
    _check_solve_sizes(n, ndev, block)
    fn = shard_map(
        functools.partial(
            _solve_lower_local, axis=axis, block=block, n=n, ndev=ndev,
            layout=layout,
        ),
        mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(),
    )
    return fn(L, b)


def block_solve_lower_t(L, b, mesh, *, axis='r', block=256,
                        layout='contiguous'):
    """Solve L' x = b (transposed factor), same conventions as
    `block_solve_lower`."""
    n = L.shape[0]
    ndev = mesh.shape[axis]
    _check_solve_sizes(n, ndev, block)
    fn = shard_map(
        functools.partial(
            _solve_lower_t_local, axis=axis, block=block, n=n,
            ndev=ndev, layout=layout,
        ),
        mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(),
    )
    return fn(L, b)
