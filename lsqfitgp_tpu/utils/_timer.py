"""In-jit phase timing by threading values through host callbacks.

Counterpart of reference ``_fit.py:41-77`` (``_Timer``): host-side
wall-clock timestamps are recorded *inside* the compiled program by
marking phase boundaries with identity ``pure_callback``s.  The marked
value is threaded through the callback, so the data dependence forces
XLA to execute the callbacks in program order at the points where the
surrounding phases complete — unlike host-side timing around the whole
call, which under async dispatch attributes everything to whatever op
materializes first.

A ``custom_jvp`` identity rule makes the marks transparent to forward
and reverse AD (tangents bypass the callback).
"""

from __future__ import annotations

import collections
import time

import jax
import numpy
from jax import numpy as jnp

__all__ = ['PhaseTimer', 'callbacks_supported']


def callbacks_supported(_cache={}):
    """Whether the current default backend can run host callbacks
    (e.g. the axon TPU PJRT plugin cannot: 'UNIMPLEMENTED: ... does not
    support host send/recv callbacks').  Probed once per backend."""
    backend = jax.default_backend()
    if backend not in _cache:
        try:
            out = jax.jit(lambda x: jax.pure_callback(
                lambda v: v, jax.ShapeDtypeStruct((), jnp.float32), x,
            ))(jnp.float32(0))
            jax.block_until_ready(out)
            _cache[backend] = True
        except Exception:
            _cache[backend] = False
    return _cache[backend]


class PhaseTimer:
    """Record wall-clock spans between in-graph phase marks.

    Use: ``x = timer.mark(x, 'phase-name')`` at each phase *end*; the
    recorded span for that name is the time since the previous mark in
    the same execution (the first mark of an execution records the
    span since the host-side call start, see `begin`).

    Attributes
    ----------
    records : dict phase -> list of seconds
    """

    def __init__(self):
        self.records = collections.defaultdict(list)
        self._last = None

    def begin(self):
        """Reset the reference timestamp (call right before dispatching
        the jitted function)."""
        self._last = time.perf_counter()

    def _stamp(self, phase):
        t = time.perf_counter()
        if self._last is not None:
            self.records[phase].append(t - self._last)
        self._last = t

    def mark(self, x, phase):
        """Identity on ``x`` that records the end of ``phase`` when the
        compiled program reaches this point."""

        @jax.custom_jvp
        def marked(x):
            def cb(v):
                self._stamp(phase)
                return v
            return jax.pure_callback(
                cb, jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
                x, vmap_method='sequential',
            )

        @marked.defjvp
        def marked_jvp(primals, tangents):
            (x,), (dx,) = primals, tangents
            return marked(x), dx

        return marked(x)

    def totals(self):
        """dict phase -> total seconds."""
        return {k: float(numpy.sum(v)) for k, v in self.records.items()}

    def counts(self):
        return {k: len(v) for k, v in self.records.items()}
