"""Row-sequential O(n)-memory algorithm framework.

Counterpart of reference ``src/lsqfitgp/_linalg/_seqalg.py:28-241``: a
mini-framework composing operations that consume a matrix one row at a
time under ``lax.fori_loop``, bounding memory to O(n) per operation.
On TPU the loop body is one fused vector program; use this for
structured matrices whose rows are generated on the fly (e.g. Toeplitz)
when the dense O(n²) form does not fit in HBM.
"""

from __future__ import annotations

import abc

from jax import lax
from jax import numpy as jnp

__all__ = [
    'SequentialOperation', 'Producer', 'Consumer',
    'Rows', 'ToeplitzRows', 'MatMulRowByFull', 'SolveTriLowerColByFull',
    'SumLogDiag', 'Stack', 'sequential_algorithm',
]


class SequentialOperation(abc.ABC):
    """One step of a row-sequential computation.

    Subclasses define ``init(n) -> state``, ``iter(i, state, *inputs) ->
    state`` and ``finalize(state) -> value``; ``inputs`` indexes other
    operations in the pipeline via the ``inputs`` attribute.
    """

    inputs = ()

    @abc.abstractmethod
    def init(self, n):
        ...

    @abc.abstractmethod
    def iter(self, i, state, *inputs):
        ...

    def output(self, state):
        """Per-row output visible to downstream operations."""
        return None

    def finalize(self, state):
        return None


class Producer(SequentialOperation):
    """Operation producing a row per iteration, no final output."""


class Consumer(SequentialOperation):
    """Operation consuming rows and producing a final value."""


class Rows(Producer):
    """Produce the rows of a dense matrix."""

    def __init__(self, m):
        self.m = jnp.asarray(m)

    def init(self, n):
        return jnp.zeros(self.m.shape[1], self.m.dtype)

    def iter(self, i, state):
        return self.m[i]

    def output(self, state):
        return state


class ToeplitzRows(Producer):
    """Produce the rows of a symmetric Toeplitz matrix from its first
    row, without materializing it."""

    def __init__(self, t):
        self.t = jnp.asarray(t)

    def init(self, n):
        return jnp.zeros(self.t.size, self.t.dtype)

    def iter(self, i, state):
        idx = jnp.abs(jnp.arange(self.t.size) - i)
        return self.t[idx]

    def output(self, state):
        return state


class MatMulRowByFull(Consumer):
    """Accumulate A @ B consuming A row by row (A from input op)."""

    def __init__(self, input_op, b):
        self.inputs = (input_op,)
        self.b = jnp.asarray(b)

    def init(self, n):
        return jnp.zeros((n, self.b.shape[1]), self.b.dtype)

    def iter(self, i, state, row):
        return state.at[i].set(row @ self.b)

    def finalize(self, state):
        return state


class SolveTriLowerColByFull(Consumer):
    """Forward substitution L⁻¹ B with L produced row by row."""

    def __init__(self, input_op, b):
        self.inputs = (input_op,)
        self.b = jnp.asarray(b)

    def init(self, n):
        return jnp.zeros_like(self.b)

    def iter(self, i, state, row):
        # x_i = (b_i - L[i,:i] x[:i]) / L[i,i]
        partial = row @ state
        xi = (self.b[i] - partial + row[i] * state[i]) / row[i]
        return state.at[i].set(xi)

    def finalize(self, state):
        return state


class SumLogDiag(Consumer):
    """Σ log diag of the input rows (e.g. log det of a Cholesky)."""

    def __init__(self, input_op):
        self.inputs = (input_op,)

    def init(self, n):
        return jnp.zeros(())

    def iter(self, i, state, row):
        return state + jnp.log(row[i])

    def finalize(self, state):
        return state


class Stack(Consumer):
    """Collect the input rows into a dense matrix."""

    def __init__(self, input_op):
        self.inputs = (input_op,)

    def init(self, n):
        self._n = n
        return None

    def iter(self, i, state, row):
        if state is None:
            state = jnp.zeros((self._n,) + row.shape, row.dtype)
        return state.at[i].set(row)

    def finalize(self, state):
        return state


def sequential_algorithm(n, ops):
    """Run a pipeline of sequential operations for n rows under one
    ``lax.fori_loop``; returns the tuple of finalized values."""
    ops = list(ops)
    idx = {id(op): k for k, op in enumerate(ops)}

    states = []
    for op in ops:
        states.append(op.init(n))

    # ops whose state shape depends on the first row (Stack) start with
    # state None; running iteration 0 eagerly fixes the carry structure
    # before entering the fori_loop
    def body(i, states):
        states = list(states)
        outputs = {}
        for k, op in enumerate(ops):
            ins = [outputs[id(o)] for o in op.inputs]
            states[k] = op.iter(i, states[k], *ins)
            outputs[id(op)] = op.output(states[k])
        return tuple(states)

    states = body(0, tuple(states))
    states = lax.fori_loop(1, n, body, states)
    return tuple(op.finalize(s) for op, s in zip(ops, states))
