"""Global configuration for lsqfitgp_tpu.

TPU-first dtype policy: the reference library (lsqfitgp) hard-requires
``jax_enable_x64`` (see reference ``docs/userguide`` and
``src/lsqfitgp/_jaxext/_fasthash.py:66``).  TPUs do not execute float64
natively, so this framework is dtype-polymorphic instead:

- ``default_float()`` returns float64 iff x64 is enabled (CPU testing /
  parity mode), else float32 (TPU production mode).
- Numerical tolerances (Cholesky regularization epsilons etc.) scale with
  the machine epsilon of the working dtype, so fp32 on TPU gets a larger,
  still-correct regularization than fp64 on CPU.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

__all__ = [
    'default_float',
    'default_int',
    'checks_enabled',
    'disable_checks',
    'set_checks',
]


def default_float():
    """The working float dtype: float64 under x64, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


class _State(threading.local):
    def __init__(self):
        self.checks = True


_state = _State()


def checks_enabled():
    """Whether eager sanity checks (finite/symmetric/posdef/linear) run.

    Mirrors the reference's per-call ``checkfinite``/``checksym``/
    ``checkpos``/``checklin`` flags (reference ``_GP/_gp.py:114-129``) with
    a global escape hatch for production paths.
    """
    return _state.checks


@contextlib.contextmanager
def disable_checks():
    old = _state.checks
    _state.checks = False
    try:
        yield
    finally:
        _state.checks = old


def set_checks(value):
    _state.checks = bool(value)
