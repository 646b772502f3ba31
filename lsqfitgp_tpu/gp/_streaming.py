"""Kernel-object front end for the streaming (never-materialized-Gram)
pipeline.

The low-level entry points (:func:`lsqfitgp_tpu.linalg.chol_nll_stream`,
``chol_nll_stream_grad``, ``chol_pred_stream``) take a raw scalar
profile; these wrappers accept a KERNEL OBJECT carrying a fast-Gram
spec (any isotropic constructor, optionally wrapped in the universal
``amp * k(scale=...) + c`` scalar chains — the same dispatch the tiled
Gram evaluator uses) plus structured or plain inputs, and route to the
streaming machinery.  This is the single-chip big-n companion of
``GP.marginal_likelihood``/``predfromdata`` for models of the form
"one isotropic process + iid noise":

    K_obs = k(x, x) + noisevar I

at sizes where the dense Gram cannot exist (n = 65536 on 16 GB).
"""

from __future__ import annotations

from jax import numpy as jnp

from .. import _array
from ..kernelalg import _fastgram as _fg

__all__ = ['stream_marginal_likelihood', 'stream_pred']


def _extract(kernel, x):
    spec = getattr(kernel, '_fastgram', None)
    if spec is None:
        raise ValueError(
            'kernel carries no fast-Gram spec: the streaming pipeline '
            'needs an isotropic constructor kernel (optionally inside '
            'scalar mul/add chains), e.g. amp * ExpQuad(scale=s)'
        )
    cols = _fg.leaf_columns(_array.asarray(x))
    if cols is None:
        raise ValueError('inputs outside the fast path (non-numeric '
                         'leaves)')
    profile, params = _fg.build_profile(spec)
    X = _fg.transform_points(spec._replace(scale=None), cols)
    if spec.loc is not None:
        X = X - spec.loc
    lenscale = None if spec.scale is None else spec.scale
    return profile, params, X, lenscale


def stream_marginal_likelihood(kernel, x, y, *, noisevar, nprobes=None,
                               **kw):
    """log p(y | x, kernel, noisevar) for ``y ~ N(0, k(x, x) +
    noisevar I)`` with the Gram computed inside the factorization
    (never materialized).  With ``nprobes`` set, the result carries the
    Hutchinson-gradient custom VJP (differentiable in the kernel's
    traced scalar hyperparameters, its ``scale``, and ``noisevar``);
    without it, value-only.  Same sign convention as
    ``GP.marginal_likelihood`` (a LOG density, to maximize)."""
    from ..linalg import chol_nll_stream, chol_nll_stream_grad

    profile, params, X, lenscale = _extract(kernel, x)
    if nprobes is None:
        Xs = X if lenscale is None else X / lenscale
        nll = chol_nll_stream(profile, Xs, y, params=params,
                              epsabs=noisevar, **kw)
    else:
        nll = chol_nll_stream_grad(
            profile, X, y, params=params, lenscale=lenscale,
            epsabs=noisevar, nprobes=nprobes, **kw)
    return -nll


def stream_pred(kernel, x, y, xstar, *, noisevar, return_var=False,
                **kw):
    """Streaming posterior mean (and optionally variances) of the
    latent process at ``xstar`` given ``y = f(x) + N(0, noisevar)``
    observations — `GP.predfromdata` for the one-process + iid-noise
    model at never-materialized-Gram sizes."""
    from ..linalg import chol_pred_stream

    profile, params, X, lenscale = _extract(kernel, x)
    Xs = _fg.transform_points(
        getattr(kernel, '_fastgram')._replace(scale=None),
        _fg.leaf_columns(_array.asarray(xstar)))
    if getattr(kernel, '_fastgram').loc is not None:
        Xs = Xs - getattr(kernel, '_fastgram').loc
    if lenscale is not None:
        X = X / lenscale
        Xs = Xs / lenscale
    return chol_pred_stream(profile, X, y, Xs, params=params,
                            epsabs=noisevar, return_var=return_var,
                            **kw)
