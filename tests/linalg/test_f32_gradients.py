"""f32 gradient-reliability regressions (round-3 VERDICT items):

- ``jax.grad`` through the UNFUSED density (``Chol(K).minus_log_
  normal_density``) must be finite and agree with the fused
  ``chol_nll`` even when the f32 'auto' eps ladder escalates — the
  pre-fix behavior was NaN (a failed rung's NaN primals leaked into
  reverse-mode cotangents through the escalation ``lax.cond``).
- the streaming NLL must WARN on a numerically infeasible model
  instead of returning an undiagnosed NaN/lift-distorted value.
"""

import warnings

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from lsqfitgp_tpu.linalg import Chol, chol_nll, chol_nll_stream


def _probe_model(n, rng, nugget):
    x = np.sort(rng.uniform(-5, 5, n))
    y = np.sin(1.5 * x) + 1e-2 * rng.standard_normal(n)
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)

    def K(w):
        d2 = (xf[:, None] - xf[None, :]) ** 2
        return w[0] * jnp.exp(-0.5 * d2 / w[1] ** 2) \
            + nugget * jnp.eye(n, dtype=jnp.float32)

    return K, yf


@pytest.mark.parametrize('n,nugget,gradtol', [
    # blocked path, ill-conditioned (the round-3 NaN repro, resized
    # from 1536 for CPU-lane wallclock): the df rescue fires; the
    # unfused path's cotangents still flow through the ladder's f32
    # dL rule (~mach·cond floor) while the fused rule assembles Kbar
    # in double-float, so they agree only to ~10% here — the
    # regression being pinned is FINITENESS and sign, not parity
    (768, 1e-4, 1.5e-1),
    (768, 1e-2, 5e-3),   # blocked path, well-posed
    (300, 1e-2, 5e-3),   # unblocked (small) path
])
def test_unfused_f32_grad_matches_fused(rng, n, nugget, gradtol):
    K, yf = _probe_model(n, rng, nugget)
    w0 = jnp.asarray([1.3, 1.7], jnp.float32)

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        v1, g1 = jax.value_and_grad(
            lambda w: Chol(K(w)).minus_log_normal_density(yf))(w0)
        v2, g2 = jax.value_and_grad(lambda w: chol_nll(K(w), yf))(w0)

    assert np.all(np.isfinite(np.asarray(g1))), g1
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    assert np.all(np.sign(np.asarray(g1)) == np.sign(np.asarray(g2)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=gradtol, atol=1e-4 * abs(float(v2)))


def test_stream_infeasible_model_warns(rng):
    """An f32-infeasible streaming model (smooth kernel, no nugget,
    long correlation length: true lambda_min ~ 1e-7) must warn about
    the self-healing lift engaging, not return a silently distorted
    value."""
    n = 300
    x = np.sort(rng.uniform(-5, 5, n))
    y = rng.standard_normal(n)
    profile = lambda r2: jnp.exp(-0.5 * r2 / 100.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        chol_nll_stream(profile, jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32), epsabs=0.0,
                        block=128, b1=128)
    assert any('lift' in str(wi.message) or 'singular' in str(wi.message)
               for wi in w), [str(wi.message) for wi in w]

    # a healthy model (honest noise floor) must stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        chol_nll_stream(profile, jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32), epsabs=0.05,
                        block=128, b1=128)
    assert not w, [str(wi.message) for wi in w]
