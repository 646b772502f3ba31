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
    'enable_compile_cache',
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


def enable_compile_cache(path=None, min_compile_secs=0.5):
    """Point XLA's persistent compilation cache at ``path`` (default
    ``$LSQFITGP_TPU_CACHE`` or ``~/.cache/lsqfitgp_tpu/xla``).

    Called automatically on import (round-3 finding: fit wallclock was
    ~99.7% XLA compilation on repeat runs — a 6-iteration n=4096 fit
    spent 84 s compiling a 30 ms optimization).  Warm processes skip
    every previously-seen compilation.  Opt out with
    ``LSQFITGP_TPU_NO_CACHE=1`` or by pointing the config elsewhere;
    harmless no-op if the jax version lacks the options.
    """
    import os

    if path is None:
        path = os.environ.get('LSQFITGP_TPU_CACHE') or os.path.join(
            os.path.expanduser('~'), '.cache', 'lsqfitgp_tpu', 'xla')
    try:
        os.makedirs(path, exist_ok=True)
        # respect an existing user-set cache dir
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update('jax_compilation_cache_dir', str(path))
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs',
                float(min_compile_secs))
    except Exception:
        pass


import os as _os  # noqa: E402

if _os.environ.get('LSQFITGP_TPU_NO_CACHE', '') in ('', '0'):
    enable_compile_cache()
