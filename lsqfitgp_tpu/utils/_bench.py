"""Timing utilities.

Counterpart of reference ``src/lsqfitgp/_linalg/_stdcplx.py`` (the
``benchmark`` timing helper at ``:33`` and the operation-cost model
``predtime`` at ``:107``, used there to choose real-vs-complex algebra
strategies).
"""

from __future__ import annotations

import time

import jax
from jax import numpy as jnp

__all__ = ['benchmark', 'predtime']


def benchmark(fn, *args, repeats=5, warmup=1, sync=True):
    """Best-of-``repeats`` wall-clock of ``fn(*args)``.

    Forces completion by materializing a scalar on the host (reliable
    also through remote-tunneled backends where ``block_until_ready``
    can return early).
    """
    def run():
        out = fn(*args)
        if sync:
            leaf = jax.tree.leaves(out)[0]
            float(jnp.asarray(leaf).ravel()[0])
        return out

    for _ in range(warmup):
        run()
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


# rough per-element costs relative to an fp32 multiply-add, used to
# predict whether a real-decomposed complex algebra beats native complex
_OP_COST = {
    'add': 1.0, 'mul': 1.0, 'fma': 1.0,
    'div': 4.0, 'sqrt': 4.0, 'exp': 8.0, 'log': 8.0,
    'sin': 8.0, 'cos': 8.0,
    'cadd': 2.0, 'cmul': 6.0, 'cdiv': 16.0,
}


def predtime(ops, n, *, throughput=1e12):
    """Predict the time of ``ops`` (dict op-name -> count per element)
    applied to n elements at the given scalar throughput."""
    cost = sum(_OP_COST[k] * v for k, v in ops.items())
    return cost * n / throughput
