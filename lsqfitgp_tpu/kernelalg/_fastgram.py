"""Fast-Gram dispatch specs for isotropic kernels.

A freshly constructed :class:`CrossIsotropicKernel` knows its scalar
profile g(r², **initkw) and the distance preprocessing mode; that is
exactly the information the tiled Pallas Gram evaluator
(:mod:`lsqfitgp_tpu.ops`) needs to assemble the covariance block with
the MXU computing r² = ‖x‖² + ‖y‖² − 2xy' instead of broadcasting the
core over x[:, None], y[None, :] (which materializes the (n, m, p)
difference tensor for multi-field inputs).

The spec is attached to the kernel instance at construction and
deliberately DROPPED by every transformation that changes the kernel's
values (`_clone` with a new core): a transformed kernel falls back to
the broadcast path.  The constructor-level ``scale``/``loc`` arguments
— the common case, e.g. ``ExpQuad(scale=3)`` — are *folded into the
spec* (points are pre-shifted/scaled before the distance), because
`CrossKernel.__new__` applies them as generic linops which would
otherwise hide the profile.

Counterpart of the reference's ``halfmatrix``/batched assembly
machinery (reference ``_GP/_elements.py:554-580``), re-designed for
TPU (SURVEY §7.4).
"""

from __future__ import annotations

import collections

import jax
from jax import numpy as jnp

from .. import _array

__all__ = ['FastGramSpec', 'make_spec', 'leaf_columns', 'build_profile',
           'build_profile_df', 'DF_CORES']


FastGramSpec = collections.namedtuple(
    'FastGramSpec',
    ['core', 'mode', 'static_kw', 'dyn_names', 'dyn_values', 'scale',
     'loc', 'maxdim', 'post', 'noise', 'terms'],
    defaults=(None, None),
)
# post: ordered chain of ('mul'|'add', scalar) applied OUTSIDE the
# profile, accumulated by the `mul`/`add` algops so the universal fit
# parameterizations ``amp * ExpQuad(...)`` and ``k + const`` keep the
# tiled-Gram dispatch (round-2 finding: any transformation dropped the
# spec, so the Pallas engine never engaged inside empbayes_fit models).
# The scalars (traced or not) ride the positional parameter vector of
# ops.gram alongside dyn_values, so hyperparameter gradients flow.
#
# noise: scalar coefficient of an additive White (δ_xy) component, or
# None for exactly zero.  Accumulated when a White kernel is summed in
# (``k + sigma2 * White()``, the universal regression observation
# model) so the streaming GP solver can factor the model into
# "profile + iid noise" — the profile/post chain NEVER includes it.
# ``core=None`` (with terms=None) means a zero base profile (a
# pure-noise spec, e.g. a bare White), with the post chain still
# applying on top of 0.
#
# terms: tuple of sub-specs whose PROFILES SUM — the representation of
# ``a1*k1(scale=s1) + a2*k2(scale=s2)`` (e.g. short+long lengthscale
# mixtures, the classic multi-scale GP regression model).  A term-sum
# spec has core=None, scale=None, loc=None; each term carries its own
# core/mode/scale/post, with the scale applied to r² INSIDE the
# profile (isotropic kernels depend only on ‖x−y‖, so per-term scales
# cannot ride the points, and loc cancels in the distance outright).
# The top-level post chain applies to the whole sum, so
# ``amp * (k1 + k2) + c`` composes.  Terms nest (a summed spec with an
# outer post chain becomes one term of a wider sum).

# constructor arguments consumed by CrossKernel.__new__ itself
_RESERVED = {
    'scale', 'loc', 'derivable', 'maxdim', 'dim', 'forcekron',
    'batchbytes', 'dynkw',
}


def _is_scalar_value(v):
    try:
        return jnp.ndim(v) == 0 or getattr(v, 'size', None) == 1
    except TypeError:
        return False


def _is_dynamic(v):
    """Traced or device values go through the parameter vector; concrete
    Python values are baked into the profile closure (so e.g. integer
    parameters used in Python-level unrolling keep working)."""
    return isinstance(v, jax.Array) or isinstance(v, jax.core.Tracer)


def make_spec(core, mode, kw):
    """Build a FastGramSpec for an isotropic core, or None if the
    construction arguments put it outside the fast path's semantics."""
    if mode not in ('squared', 'abs', 'posabs'):
        return None
    if kw.get('dim') is not None:
        # field selection changes which coordinates enter the distance
        return None
    if kw.get('forcekron'):
        # forcekron rewraps the core as a per-field PRODUCT; the
        # isotropic sum-over-fields profile no longer describes it
        return None
    if kw.get('dynkw'):
        return None
    initkw = {k: v for k, v in kw.items() if k not in _RESERVED}

    def resolve(name):
        v = kw.get(name)
        if callable(v):
            v = v(**initkw)
        return v

    scale = resolve('scale')
    loc = resolve('loc')
    maxdim = resolve('maxdim')
    if isinstance(maxdim, tuple):
        return None  # per-side maxdim: stay on the broadcast path
    for v in (scale, loc):
        if v is not None and not _is_scalar_value(v):
            return None

    static_kw, dyn_names, dyn_values = {}, [], []
    for k in sorted(initkw):
        v = initkw[k]
        if _is_dynamic(v):
            if not _is_scalar_value(v):
                return None
            dyn_names.append(k)
            dyn_values.append(jnp.reshape(v, ()))
        else:
            try:
                import numpy as _np
                if not isinstance(v, (str, bytes, type(None))) \
                        and _np.ndim(v) > 0:
                    # non-scalar static argument (e.g. MA's weight
                    # vector): the profile closure would bake it into
                    # an ARRAY CONSTANT, which Pallas kernels cannot
                    # capture — stay on the broadcast path
                    return None
            except TypeError:
                pass
            static_kw[k] = v
    return FastGramSpec(
        core=core, mode=mode, static_kw=static_kw,
        dyn_names=tuple(dyn_names), dyn_values=tuple(dyn_values),
        scale=scale, loc=loc, maxdim=maxdim, post=(), noise=None,
    )


# identity cores of δ-noise kernels (the White kernel registers its
# wrapped core here so the constructor can attach a pure-noise spec)
NOISE_CORES = []


def make_noise_spec(kw):
    """Spec of a bare White kernel (pure δ-noise), or None when the
    construction arguments change its semantics.  ``scale``/``loc``
    are irrelevant for discrete equality (x == y ⇔ (x−l)/s == (y−l)/s
    for scalar s ≠ 0), so they are accepted and dropped."""
    if kw.get('dim') is not None or kw.get('forcekron') \
            or kw.get('dynkw'):
        return None
    maxdim = kw.get('maxdim')
    if isinstance(maxdim, tuple):
        return None
    return FastGramSpec(
        core=None, mode='squared', static_kw={}, dyn_names=(),
        dyn_values=(), scale=None, loc=None, maxdim=maxdim, post=(),
        noise=jnp.ones(()),
    )


def post_spec(spec, op, value):
    """Spec of ``op(kernel, scalar)`` for op in 'mul'/'add', or None.
    The chain is ordered, so ``(k + c) * a`` and ``k * a + c`` stay
    distinct.  A scalar 'mul' scales the noise component too
    (a·(k + nδ) = a·k + a·n·δ); a scalar 'add' leaves it alone."""
    if spec is None or not _is_scalar_value(value):
        return None
    try:
        v = jnp.reshape(jnp.asarray(value), ())
    except TypeError:
        return None
    noise = spec.noise
    if op == 'mul' and noise is not None:
        noise = noise * v
    return spec._replace(post=spec.post + ((op, v),), noise=noise)


def _chain_const(spec):
    """The constant profile of a core-less spec: its post chain applied
    to a zero base."""
    out = jnp.zeros(())
    for op, v in spec.post:
        out = out * v if op == 'mul' else out + v
    return out


def _is_flat(s):
    """Profile-less spec: pure noise and/or a constant post chain."""
    return s.core is None and s.terms is None


def add_specs(sa, sb):
    """Spec of the SUM of two kernels, or None when the combination
    leaves the fast path.  A core-less side (pure noise / constant
    chains) folds its constant into the other side's post chain as one
    'add', and the noises add.  Two PROFILED kernels become a
    ``terms`` sum: each keeps its own core/mode/scale/post, with the
    scale applied to r² inside the summed profile (loc cancels in the
    distance, so it is dropped) — this is what keeps multi-lengthscale
    mixtures like ``a1*ExpQuad(scale=s1) + a2*Matern(scale=s2)`` on
    the tiled/streaming dispatch."""
    if sa is None or sb is None:
        return None
    if _is_flat(sa) or _is_flat(sb):
        if _is_flat(sb):
            base, flat = sa, sb
        else:
            base, flat = sb, sa
        noise = base.noise
        if flat.noise is not None:
            noise = flat.noise if noise is None else noise + flat.noise
        post = base.post
        if flat.post:
            post = post + (('add', _chain_const(flat)),)
        return base._replace(post=post, noise=noise)

    def terms_of(s):
        if s.terms is not None and not s.post:
            return s.terms
        return (s._replace(loc=None, noise=None),)

    noise = sa.noise
    if sb.noise is not None:
        noise = sb.noise if noise is None else noise + sb.noise
    md = None
    for m in (sa.maxdim, sb.maxdim):
        if m is None:
            continue
        md = m if md is None else min(md, m)
    return FastGramSpec(
        core=None, mode='squared', static_kw={}, dyn_names=(),
        dyn_values=(), scale=None, loc=None, maxdim=md, post=(),
        noise=noise, terms=terms_of(sa) + terms_of(sb),
    )


def leaf_columns(x):
    """Flatten the coordinates of ``x`` into a list of 1-D float
    columns, or None if ``x`` is outside the fast path (non-numeric
    leaves).  Subarray tails become one column per component, matching
    ``sum_recurse_fields`` summing tail axes into the distance."""
    cols = []

    def visit(v):
        if isinstance(v, _array.StructuredArray):
            return all(visit(v[name]) for name in v.fields)
        v = jnp.asarray(v)
        if not (jnp.issubdtype(v.dtype, jnp.floating)
                or jnp.issubdtype(v.dtype, jnp.integer)):
            return False
        flat = v.reshape((x.size, -1))
        for k in range(flat.shape[1]):
            cols.append(flat[:, k])
        return True

    if isinstance(x, _array.StructuredArray):
        if not visit(x):
            return None
    else:
        x = jnp.asarray(x)
        if not (jnp.issubdtype(x.dtype, jnp.floating)
                or jnp.issubdtype(x.dtype, jnp.integer)):
            return None
        cols.append(x.reshape(-1))
    return cols


def _single_profile(spec, with_scale):
    """(fn, params) for a single-core spec; ``fn(r2, *params)``.  With
    ``with_scale`` the spec's constructor scale is applied to r² inside
    the profile (a SUM term, whose scale cannot ride the points)
    instead of being the caller's responsibility."""
    core = spec.core
    mode = spec.mode
    static_kw = spec.static_kw
    dyn_names = spec.dyn_names
    nd = len(dyn_names)
    post_ops = tuple(op for op, _ in spec.post)
    scaled = with_scale and spec.scale is not None
    params = spec.dyn_values + tuple(v for _, v in spec.post)
    if scaled:
        params = (jnp.reshape(jnp.asarray(spec.scale), ()),) + params

    def profile(r2, *params):
        if scaled:
            s, params = params[0], params[1:]
            r2 = r2 / (s * s)
        dyn = params[:nd]
        postv = params[nd:]
        if core is None:
            # pure-noise / constant spec: zero base profile, the post
            # chain (if any) applies on top
            out = jnp.zeros_like(r2)
            for op, v in zip(post_ops, postv):
                out = out * v if op == 'mul' else out + v
            return out
        kwargs = dict(static_kw)
        kwargs.update(zip(dyn_names, dyn))
        if mode == 'squared':
            t = r2
        elif mode == 'abs':
            # clamped away from 0: sqrt'(0) = inf would otherwise turn
            # into NaN derivative weights on the Gram diagonal (the
            # broadcast path's per-field sign(0) = 0 likewise yields a
            # zero diagonal derivative)
            t = jnp.sqrt(jnp.maximum(r2, jnp.finfo(r2.dtype).tiny))
        else:  # posabs: |.| shifted away from zero (values differ from
            # the per-field softabs of the broadcast path by O(eps));
            # sqrt(r2 + eps²) keeps the r2-derivative finite at 0,
            # unlike sqrt(r2) + eps
            eps = jnp.finfo(r2.dtype).eps
            t = jnp.sqrt(r2 + eps * eps)
        out = core(t, **kwargs)
        for op, v in zip(post_ops, postv):
            out = out * v if op == 'mul' else out + v
        return out

    return profile, params


def _term_profile(spec):
    """(fn, params) for one SUM TERM (scale folded into the profile);
    recurses on nested term sums."""
    if spec.terms is None:
        return _single_profile(spec, with_scale=True)
    subs = [_term_profile(t) for t in spec.terms]
    sizes = [len(p) for _, p in subs]
    post_ops = tuple(op for op, _ in spec.post)
    params = tuple(v for _, p in subs for v in p) \
        + tuple(v for _, v in spec.post)

    def profile(r2, *params):
        out = jnp.zeros_like(r2)
        i = 0
        for (fn, _), m in zip(subs, sizes):
            out = out + fn(r2, *params[i:i + m])
            i += m
        for op, v in zip(post_ops, params[i:]):
            out = out * v if op == 'mul' else out + v
        return out

    return profile, params


def build_profile(spec):
    """(profile, params): a pure ``profile(r2, *params)`` suitable for
    :func:`lsqfitgp_tpu.ops.gram`, with the dynamic (traced) init
    arguments passed positionally.  For a term-sum spec the profile is
    the sum of the term profiles (each term's scale applied to r²
    inside); the TOP-LEVEL scale (single-core specs only) remains the
    caller's job via :func:`transform_points` / ``lenscale``."""
    if spec.terms is not None:
        return _term_profile(spec)
    return _single_profile(spec, with_scale=False)


# core function -> double-float evaluator ``fn(th, tl, **kwargs) ->
# (h, l)`` where (th, tl) is the df distance argument in the core's own
# mode (squared: r², abs/posabs: r) and kwargs are the core's
# static+dynamic init arguments.  Registered next to the kernels that
# support it (kernels/_basic.py); consulted by the conditioning-rescue
# double-float Gram assembly (linalg._df module docs).
DF_CORES = {}


def _profile_df_single(spec, with_scale):
    """df evaluator for a single-core spec (or None): the df analog of
    `_single_profile`, with the scale folded into r² IN DF (an f32
    point pre-division would jitter the coordinates by ~eps·|x| and
    reintroduce the assembly error the df path removes)."""
    from ..linalg import _df

    core = spec.core
    fn = None
    if core is not None:
        fn = DF_CORES.get(core)
        if fn is None:
            return None
    kwargs = dict(spec.static_kw or {})
    kwargs.update(zip(spec.dyn_names, spec.dyn_values))
    post = tuple(spec.post)
    mode = spec.mode
    scale = spec.scale if with_scale else None

    def profile(r2h, r2l):
        h, l = r2h, r2l
        if scale is not None:
            s = jnp.reshape(jnp.asarray(scale, r2h.dtype), ())
            s2h, s2l = _df._two_prod(s, s)
            ih, il = _df.div(jnp.ones_like(s), jnp.zeros_like(s),
                             s2h, s2l)
            h, l = _df.mul(h, l, ih, il)
        if core is None:
            h = jnp.zeros_like(r2h)
            l = jnp.zeros_like(r2h)
        else:
            if mode in ('abs', 'posabs'):
                h, l = _df.sqrt_df(h, l)
            h, l = fn(h, l, **kwargs)
        for op, v in post:
            v = jnp.reshape(jnp.asarray(v, r2h.dtype), ())
            z = jnp.zeros_like(v)
            h, l = (_df.mul(h, l, v, z) if op == 'mul'
                    else _df.add(h, l, v, z))
        return h, l

    return profile


def _profile_df_term(spec):
    from ..linalg import _df

    if spec.terms is None:
        return _profile_df_single(spec, with_scale=True)
    subs = [_profile_df_term(t) for t in spec.terms]
    if any(s is None for s in subs):
        return None
    post = tuple(spec.post)

    def profile(r2h, r2l):
        h = jnp.zeros_like(r2h)
        l = jnp.zeros_like(r2h)
        for sub in subs:
            th, tl = sub(r2h, r2l)
            h, l = _df.add(h, l, th, tl)
        for op, v in post:
            v = jnp.reshape(jnp.asarray(v, r2h.dtype), ())
            z = jnp.zeros_like(v)
            h, l = (_df.mul(h, l, v, z) if op == 'mul'
                    else _df.add(h, l, v, z))
        return h, l

    return profile


def build_profile_df(spec):
    """Double-float profile evaluator ``profile(r2h, r2l) -> (Kh, Kl)``
    for the spec (every scalar folded in as a closure constant —
    traced hyperparameters keep their gradients), or None when some
    core has no :data:`DF_CORES` entry.  The TOP-LEVEL scale
    (single-core specs) remains the caller's job via
    :func:`lsqfitgp_tpu.linalg._df.gram_df`'s ``lenscale`` (in df —
    never by pre-dividing the points); term scales are folded into r²
    here, matching :func:`build_profile`'s conventions."""
    if spec.terms is not None:
        return _profile_df_term(spec)
    return _profile_df_single(spec, with_scale=False)


def transform_points(spec, cols):
    """Stack columns to (n, p) and fold the constructor-level loc/scale
    (x → (x − loc)/scale) into the coordinates."""
    X = jnp.stack([jnp.asarray(c, jnp.result_type(c.dtype, jnp.float32))
                   for c in cols], axis=-1)
    if spec.loc is not None:
        X = X - spec.loc
    if spec.scale is not None:
        X = X / spec.scale
    return X
