"""Kernel-object front end for the streaming (never-materialized-Gram)
pipeline.

The low-level entry points (:func:`lsqfitgp_tpu.linalg.chol_nll_stream`,
``chol_nll_stream_grad``, ``chol_pred_stream``) take a raw scalar
profile; these wrappers accept a KERNEL OBJECT carrying a fast-Gram
spec (any isotropic constructor, optionally wrapped in the universal
``amp * k(scale=...) + c`` scalar chains and ``+ sigma2 * White()``
noise sums — the same dispatch the tiled Gram evaluator uses) plus
structured or plain inputs, and route to the streaming machinery.

These predate the first-class streaming GP solver
(``GP(solver='chol-stream')``, which serves the same models through
the standard ``marginal_likelihood``/``predfromdata`` surface and is
the recommended entry point); they remain as thin functional forms.
"""

from __future__ import annotations

from jax import numpy as jnp

from .. import _array
from ..kernelalg import _fastgram as _fg

__all__ = ['stream_marginal_likelihood', 'stream_pred']


def _extract(kernel, x):
    spec = getattr(kernel, '_fastgram', None)
    if spec is None or (spec.core is None and spec.terms is None):
        raise ValueError(
            'kernel carries no fast-Gram spec: the streaming pipeline '
            'needs an isotropic or 1-D stationary constructor kernel '
            '(optionally inside scalar mul/add chains, kernel sums, '
            'and White sums), e.g. amp * ExpQuad(scale=s) + n * White()'
        )
    cols = _fg.leaf_columns(_array.asarray(x))
    if cols is None:
        raise ValueError('inputs outside the fast path (non-numeric '
                         'leaves)')
    profile, params = _fg.build_profile(spec)
    # loc folds here, scale stays a separate (differentiable) lenscale
    X = _fg.transform_points(spec._replace(scale=None), cols)
    lenscale = None if spec.scale is None else spec.scale
    return profile, params, X, lenscale, spec.noise


def stream_marginal_likelihood(kernel, x, y, *, noisevar=None,
                               nprobes=None, **kw):
    """log p(y | x, kernel, noisevar) for ``y ~ N(0, k(x, x) +
    diag(noisevar))`` with the Gram computed inside the factorization
    (never materialized), differentiable in the kernel's traced scalar
    hyperparameters, its ``scale``, any White-kernel noise amplitude,
    and ``noisevar`` (a scalar iid variance or a per-point
    heteroskedastic vector) — with the EXACT streaming gradient rule by
    default (pass ``nprobes`` to use the cheaper Hutchinson trace
    estimate instead).  A White component of the kernel adds to
    ``noisevar``.  Same sign convention as ``GP.marginal_likelihood``
    (a LOG density, to maximize)."""
    from ..linalg import chol_nll_stream_grad

    profile, params, X, lenscale, knoise = _extract(kernel, x)
    noise = jnp.zeros(())
    if noisevar is not None:
        noise = noise + noisevar
    if knoise is not None:
        noise = noise + knoise
    nll = chol_nll_stream_grad(
        profile, X, y, params=params, lenscale=lenscale,
        epsabs=noise, exact=nprobes is None,
        nprobes=16 if nprobes is None else nprobes, **kw)
    return -nll


def stream_pred(kernel, x, y, xstar, *, noisevar=None,
                return_var=False, return_cov=False, **kw):
    """Streaming posterior mean (and optionally variances or the full
    small output covariance) of the process at ``xstar`` given ``y =
    f(x) + N(0, noisevar)`` observations — `GP.predfromdata` for the
    one-process + iid-noise model at never-materialized-Gram sizes.
    A White component of the kernel counts as part of the process, so
    it enters the data diagonal AND the output prior variance."""
    from ..linalg import chol_pred_stream

    profile, params, X, lenscale, knoise = _extract(kernel, x)
    spec = getattr(kernel, '_fastgram')
    Xs = _fg.transform_points(
        spec._replace(scale=None),
        _fg.leaf_columns(_array.asarray(xstar)))
    if lenscale is not None:
        X = X / lenscale
        Xs = Xs / lenscale
    noise = jnp.zeros(())
    if noisevar is not None:
        noise = noise + noisevar
    if knoise is not None:
        noise = noise + knoise
    out = chol_pred_stream(profile, X, y, Xs, params=params,
                           epsabs=noise, return_var=return_var,
                           return_cov=return_cov, **kw)
    if knoise is not None and (return_var or return_cov):
        parts = list(out) if isinstance(out, tuple) else [out]
        if return_cov:
            parts[1] = parts[1] + knoise * jnp.eye(
                parts[1].shape[0], dtype=parts[1].dtype)
        else:
            parts[1] = parts[1] + knoise
        out = tuple(parts) if len(parts) > 1 else parts[0]
    return out
