"""MAP hyperparameter fitting.

TPU-native counterpart of reference ``src/lsqfitgp/_fit.py:145``
(``empbayes_fit``).  Same workflow:

1. flatten + *whiten* the (possibly correlated, possibly transformed)
   hyperprior, so the optimizer works on iid-standard-normal coordinates
   (reference ``_fit.py:444-489``);
2. build the negative log joint: GP marginal likelihood (via the fused
   decomposition density) + standard-normal prior on the whitened
   parameters (+ optional additional loss);
3. minimize; estimate the posterior covariance from the Fisher
   information or the minimizer's Hessian estimate
   (reference ``_fit.py:756-853``);
4. return hyperparameters as correlated :class:`uncert.UArray`.

Re-designs for TPU:

- the objective and its gradient jit-compile to a single XLA program;
  gradients flow through ``lax.linalg.cholesky``'s native XLA
  differentiation rule instead of hand-written VJPs;
- the Fisher matrix uses batched triangular solves
  (``linalg.Chol.fisher``) with ``jax.jacfwd`` of (K(p), r(p));
- two optimizer drivers: ``scipy`` (host loop, parity with the
  reference) and ``jax`` (on-device BFGS via
  ``jax.scipy.optimize.minimize`` — the whole fit is one XLA program).
"""

from __future__ import annotations

import dataclasses
import time
import warnings

import jax
import numpy
from jax import numpy as jnp

from .uncert import BufferDict, UArray, from_cov
from . import uncert
from .linalg import Chol

__all__ = ['empbayes_fit']


class Logger:
    """Verbosity-leveled logger with indentation contexts
    (reference ``_fit.py:79-143``)."""

    def __init__(self, verbosity=0):
        self.verbosity = verbosity
        self._indent = 0
        self.records = []

    def log(self, message, level=1):
        self.records.append((level, message))
        if self.verbosity >= level:
            print('    ' * self._indent + message)

    class _Indent:
        def __init__(self, logger):
            self.logger = logger

        def __enter__(self):
            self.logger._indent += 1

        def __exit__(self, *exc):
            self.logger._indent -= 1

    def indent(self):
        return self._Indent(self)


@dataclasses.dataclass
class _Timed:
    """Wall-clock accounting per phase (the reference threads a token
    through pure_callback inside jit, ``_fit.py:41-77``; on TPU we time
    host-side around block_until_ready boundaries instead)."""
    calls: int = 0
    seconds: float = 0.0

    def time(self, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        out = jax.block_until_ready(out)
        self.seconds += time.perf_counter() - t0
        self.calls += 1
        return out


def _parse_hyperprior(hyperprior):
    """Accepts: BufferDict of UArray, dict key -> UArray | (mean, sdev) |
    scalar mean (sdev 1).  Returns (BufferDict layout, mean vector,
    whitening Chol of the cov)."""
    if not isinstance(hyperprior, BufferDict):
        conv = {}
        for k, v in hyperprior.items():
            if isinstance(v, UArray):
                conv[k] = v
            elif isinstance(v, tuple) and len(v) == 2:
                conv[k] = uncert.normal(*v)
            else:
                conv[k] = uncert.normal(v, 1.0)
        hyperprior = BufferDict(conv)
    buf = hyperprior.buf
    if not isinstance(buf, UArray):
        buf = uncert.normal(buf, jnp.ones(buf.shape))
        hyperprior = hyperprior.replace_buf(buf)
    mean = buf.mean
    cov = buf.cov()
    dec = Chol(cov)
    return hyperprior, mean, dec


def _parse_data(data):
    """data: dict given | (given, givencov) | callable(hp) -> either."""
    if callable(data):
        return data, None, True
    if isinstance(data, tuple):
        given, givencov = data
        return given, givencov, False
    return data, None, False


class empbayes_fit:
    """Maximum-a-posteriori fit of GP hyperparameters.

    Parameters
    ----------
    hyperprior : dict or BufferDict
        Prior for the hyperparameters: values may be `uncert.UArray`,
        ``(mean, sdev)`` tuples, or bare means (sdev 1).  Keys may use
        transformation names, e.g. ``'log(sigma)'``.
    gpfactory : callable
        ``gpfactory(hp, **gpfactorykw) -> GP`` where hp is a BufferDict.
    data : dict, (dict, cov), or callable
        Observed data per element key; optionally with covariance, or a
        callable of the hyperparameters.
    method : {'gradient', 'nograd', 'fisher'}
        Minimizer: BFGS with gradient (default), Nelder-Mead, or
        trust-region with Fisher hessian.
    optimizer : {'scipy', 'jax', 'optax'}
        Host scipy loop (parity mode), on-device
        ``jax.scipy.optimize.minimize`` BFGS, or on-device optax L-BFGS
        with linesearch under ``lax.while_loop`` — with the latter two
        the whole fit is one XLA program (method='gradient' only).
    initial : 'priormean' or array
        Starting point (whitened space starts at 0 for 'priormean').
    covariance : {'auto', 'fisher', 'hess', 'minhess', 'none', 'prior'}
        Posterior covariance estimator: expected Fisher information via
        the explicit decomposition formula ('fisher', guaranteed PSD),
        AD Hessian of the objective ('hess'), the minimizer's inverse
        Hessian estimate ('minhess'), zero ('none'), or the unchanged
        hyperprior covariance ('prior').  Custom-VJP likelihoods (the
        streaming ``GP(solver='chol-stream')`` and ``custom_nll``)
        support no second-order AD: 'auto' then picks 'minhess' when
        the minimizer provides one (scipy BFGS) and falls back to
        'prior' with a warning otherwise; 'hess' raises.  For the
        streaming solver, 'fisher' IS available — the EXACT expected
        information computed by ``linalg.chol_stream_fisher`` in
        strips on the factor tree (nothing n² materialized, ~3–10x
        one NLL evaluation, run once after the minimum) — and is the
        recommended estimator at streaming sizes; with ``custom_nll``
        'fisher' raises (no model access).
    fix : dict, optional
        Map key -> bool (or array of bool) freezing hyperparameters at
        their initial values.
    additional_loss : callable, optional
        Extra loss term ``loss(hp) -> scalar`` added to the objective.
    jit : bool
        jit-compile the objective (default True).
    raises : bool
        Raise on minimizer failure (else warn and keep last iterate).
    verbosity : int
        0 silent .. 5 chatty.
    timing : bool
        Record in-jit phase wall-clock spans (gp-build+decomposition
        vs likelihood) via host-callback marks threaded through the
        compiled objective; read them from ``.phase_timer.totals()``.
        Adds callback latency — leave off in production fits.
    profile_dir : str, optional
        Capture a ``jax.profiler`` trace of the whole minimization into
        this directory (viewable in TensorBoard / Perfetto).  The fit
        phases appear as named scopes inside the compiled objective
        (``empbayes_fit.gpbuild`` / ``.decomp`` / ``.likelihood``), and
        each objective evaluation is wrapped in a host-side
        ``TraceAnnotation`` so minimizer overhead separates from XLA
        time — the ``jax.profiler`` arm of the tracing subsystem
        (SURVEY §5), composing with the ``timing`` callbacks.
    custom_nll : callable, optional
        ``custom_nll(hp) -> scalar`` replaces the GP-built marginal
        likelihood entirely (``gpfactory``/``data`` may be omitted):
        the whitened-prior term, whitening, optimizers, fix masks, and
        covariance estimation all still apply.  This is the bridge to
        multi-chip fits: pass a closure over
        ``parallel.sharded_nll_distributed`` and the whole MAP fit runs
        against the device mesh.  ``method='fisher'`` and
        ``covariance='fisher'`` are unavailable (they need the (K, r)
        assembly).

    Attributes
    ----------
    p : BufferDict of UArray
        Hyperparameter posterior (MAP with Laplace covariance).
    pmean : BufferDict of posterior means (``fit.pmean['key']`` applies
        the key's transformation; flat stored-space vector is
        ``fit.pmean.buf``). pcov : flat posterior covariance
        (stored space).
    prior : the parsed hyperprior BufferDict.
    minresult : scipy OptimizeResult (scipy optimizer only).
    minargs : dict of arguments passed to the minimizer.
    """

    def __init__(self, hyperprior, gpfactory=None, data=None, *,
                 method='gradient', optimizer='scipy', initial='priormean',
                 covariance='auto', fix=None, additional_loss=None,
                 jit=True, raises=True, verbosity=0, minkw={}, mlkw={},
                 gpfactorykw={}, forward=False, seed=0, timing=False,
                 custom_nll=None, profile_dir=None):
        log = Logger(verbosity)
        self.log = log
        if custom_nll is None and (gpfactory is None or data is None):
            raise TypeError(
                'provide gpfactory and data, or custom_nll'
            )
        if custom_nll is not None:
            if method == 'fisher' or covariance == 'fisher':
                raise ValueError(
                    "method/covariance='fisher' need the (K, r) assembly "
                    "and are unavailable with custom_nll; use "
                    "covariance='hess'"
                )
            # stub data plumbing: the custom objective owns the data
            gpfactory = gpfactory or (lambda hp, **kw: None)
            data = {} if data is None else data
        prior, pmean_prior, pdec = _parse_hyperprior(hyperprior)
        self.prior = prior
        given, givencov, data_callable = _parse_data(data)

        nparam = pmean_prior.size

        # fixed-parameter mask (whitened coords share the layout only when
        # the prior is diagonal; fix in stored space, translate via mask)
        fixmask = numpy.zeros(nparam, bool)
        if fix is not None:
            for k, v in fix.items():
                sl, shape = prior._slices[k]
                fixmask[sl] = numpy.broadcast_to(v, shape).reshape(-1)
        fixmask = jnp.asarray(fixmask)
        self.fix = fixmask

        def unwhiten(w):
            # p = mean + L w ; frozen coordinates stay at the prior mean
            w = jnp.where(fixmask, 0.0, w)
            return pmean_prior + pdec.correlate(w)

        def make_hp(w):
            return prior.replace_buf(unwhiten(w))

        timer = {'gpbuild': _Timed(), 'fun': _Timed()}
        self._timer = timer
        if timing:
            # in-jit phase attribution: host timestamps recorded where
            # the compiled program reaches each mark (reference
            # _fit.py:41-77 token-threading design)
            from .utils._timer import PhaseTimer, callbacks_supported
            if callbacks_supported():
                self.phase_timer = PhaseTimer()
            else:
                warnings.warn(
                    'host callbacks unsupported on this backend; '
                    'in-jit phase timing disabled'
                )
                self.phase_timer = None
        else:
            self.phase_timer = None

        # dtype the LIKELIHOOD part is computed in (recorded at trace
        # time): an f32 model under an x64 session sets the gradient
        # noise floor at the f32 eps even though the whitened-prior
        # term promotes the total objective to f64
        nll_dtype = [None]
        # whether the objective goes through a custom-VJP likelihood
        # (streaming solver or custom_nll): second-order AD is then
        # unavailable, which constrains the Laplace covariance source
        is_custom_vjp_obj = [custom_nll is not None]
        # whether the objective is specifically the STREAMING GP
        # solver: the exact streamed Fisher (linalg.chol_stream_fisher)
        # is then available for covariance='fisher' even though
        # second-order AD is not
        is_stream_obj = [False]

        def nll(w):
            # jax.profiler annotations mark the fit phases in TPU traces
            # in addition to the optional PhaseTimer callbacks
            pt = self.phase_timer
            if custom_nll is not None:
                # user-supplied objective of the hyperparameters (e.g.
                # parallel.sharded_nll_distributed over a device mesh)
                hp = make_hp(w)
                with jax.named_scope('empbayes_fit.custom_nll'):
                    out = custom_nll(hp)
                    if pt is not None:
                        out = pt.mark(out, 'gpbuild+decomp')
            else:
                with jax.named_scope('empbayes_fit.gpbuild'):
                    hp = make_hp(w)
                    if data_callable:
                        d = given(hp, **gpfactorykw)
                        g, gcov = (d if isinstance(d, tuple)
                                   else (d, None))
                    else:
                        g, gcov = given, givencov
                    gp = gpfactory(hp, **gpfactorykw)
                if getattr(gp, '_solver', None) == 'chol-stream':
                    is_custom_vjp_obj[0] = True
                    is_stream_obj[0] = True
                    # never-materialized-Gram pipeline with the exact
                    # streaming gradient: the fit objective at sizes
                    # whose dense Gram cannot exist (n = 65536/chip)
                    with jax.named_scope('empbayes_fit.stream_nll'):
                        out = gp._prior_nll(g, gcov, **mlkw)
                        if pt is not None:
                            out = pt.mark(out, 'gpbuild+decomp')
                    with jax.named_scope('empbayes_fit.prior'):
                        nll_dtype[0] = getattr(out, 'dtype', None)
                        wfree = jnp.where(fixmask, 0.0, w)
                        out = out + 0.5 * jnp.dot(wfree, wfree)
                        if additional_loss is not None:
                            out = out + additional_loss(hp)
                        if pt is not None:
                            out = pt.mark(out, 'likelihood')
                    return out
                with jax.named_scope('empbayes_fit.decomp'):
                    # fused factorization+density (linalg.chol_nll)
                    # when the model allows: the hand-derived reverse
                    # rule makes value+grad ~4x the forward pass
                    # instead of AD-through-the-factorization's ~10-16x
                    parts = gp._prior_nll_parts(g, gcov, **mlkw)
                    if parts is not None:
                        K, r, nllkw = parts
                        if pt is not None:
                            # with the fused path the 'gpbuild+decomp'
                            # span covers build+assembly and
                            # 'likelihood' covers factorize+density
                            K = pt.mark(K, 'gpbuild+decomp')
                    else:
                        dec, r = gp._prior_decomp(g, gcov, **mlkw)
                        if pt is not None:
                            # mark on the factor itself: r is only the
                            # data vector, not a factorization consumer
                            dec._L = pt.mark(dec._L, 'gpbuild+decomp')
                with jax.named_scope('empbayes_fit.likelihood'):
                    from . import linalg as _linalg
                    if parts is not None:
                        out = _linalg.chol_nll(K, r, **nllkw)
                    else:
                        out = dec.minus_log_normal_density(r)
            with jax.named_scope('empbayes_fit.prior'):
                nll_dtype[0] = getattr(out, 'dtype', None)
                wfree = jnp.where(fixmask, 0.0, w)
                out = out + 0.5 * jnp.dot(wfree, wfree)
                if additional_loss is not None:
                    out = out + additional_loss(hp)
                if pt is not None:
                    out = pt.mark(out, 'likelihood')
            return out

        self._nll = nll

        def make_Kr(w):
            """(K(w), r(w)) without decomposing — the raw assembly whose
            jvp/vjp drive Fisher-vector products."""
            hp = make_hp(w)
            if data_callable:
                d = given(hp, **gpfactorykw)
                g, gcov = (d if isinstance(d, tuple) else (d, None))
            else:
                g, gcov = given, givencov
            gp = gpfactory(hp, **gpfactorykw)
            return gp._prior_kr(g, gcov)

        self._make_Kr = make_Kr
        if forward:
            # forward-mode gradients: faster when the kernel evaluation
            # dominates and P is small (e.g. BART; reference _fit.py
            # `forward` option)
            def value_and_grad(w):
                return nll(w), jax.jacfwd(nll)(w)
        else:
            value_and_grad = jax.value_and_grad(nll)
        if jit:
            nll_c = jax.jit(nll)
            value_and_grad = jax.jit(value_and_grad)
        else:
            nll_c = nll

        if isinstance(initial, str) and initial == 'priormean':
            w0 = jnp.zeros(nparam)
        elif isinstance(initial, str) and initial == 'priorsample':
            w0 = jnp.asarray(
                numpy.random.default_rng(seed).standard_normal(nparam)
            )
        elif isinstance(initial, str):
            raise KeyError(f'unknown initial {initial!r}')
        else:
            p0 = jnp.asarray(initial)
            w0 = pdec.pinv_correlate(p0 - pmean_prior)

        if optimizer not in ('scipy', 'jax', 'optax'):
            raise KeyError(f'unknown optimizer {optimizer!r}, must be '
                           "'scipy', 'jax' or 'optax'")

        log.log(f'empbayes_fit: {nparam} hyperparameters, '
                f'method={method!r}, optimizer={optimizer!r}', 1)

        # jax.profiler trace of the whole minimization (SURVEY §5's
        # TPU tracing arm); stopped right after the optimizer returns
        trace_active = False
        if profile_dir is not None:
            jax.profiler.start_trace(str(profile_dir))
            trace_active = True

        t0 = time.perf_counter()
        if optimizer == 'jax':
            if method != 'gradient':
                raise ValueError("optimizer='jax' requires method='gradient'")
            from jax.scipy.optimize import minimize as jax_minimize
            res = jax_minimize(nll_c, w0, method='BFGS', tol=1e-9)
            wmin = res.x
            success = bool(res.success)
            self.minresult = res
            hess_inv = None
            nit = int(res.nit)
        elif optimizer == 'optax':
            # fully on-device L-BFGS with linesearch: the whole
            # optimization loop is one XLA program (lax.while_loop)
            if method != 'gradient':
                raise ValueError(
                    "optimizer='optax' requires method='gradient'"
                )
            import optax

            maxiter = dict(minkw).get('maxiter', 200)
            tol = dict(minkw).get('tol', 1e-8)
            solver = optax.lbfgs()
            vg = optax.value_and_grad_from_state(nll)

            @jax.jit
            def run(w0):
                state0 = solver.init(w0)

                def cond(carry):
                    w, state, it = carry
                    g = optax.tree.get(state, 'grad')
                    return (it < maxiter) & (
                        jnp.linalg.norm(g) > tol if g is not None else True
                    )

                def body(carry):
                    w, state, it = carry
                    value, grad = vg(w, state=state)
                    updates, state = solver.update(
                        grad, state, w, value=value, grad=grad,
                        value_fn=nll,
                    )
                    w = optax.apply_updates(w, updates)
                    return w, state, it + 1

                state0 = solver.init(w0)
                # one bootstrap step so state carries value/grad
                w, state, it = body((w0, state0, 0))
                w, state, it = jax.lax.while_loop(
                    cond, body, (w, state, it)
                )
                return w, it

            wmin, nit = run(w0)
            nit = int(nit)
            gnorm = float(jnp.linalg.norm(
                jax.grad(nll)(wmin) if not jit else jax.jit(
                    jax.grad(nll))(wmin)
            ))
            vmin = float(nll_c(wmin))
            # success requires an actually-small recomputed gradient at the
            # final point; an early exit alone is not evidence of
            # convergence (the linesearch can stall on a diverged run)
            success = (
                numpy.isfinite(vmin) and numpy.isfinite(gnorm)
                and gnorm <= max(1e-3, 10 * tol)
            )
            self.minresult = dict(x=wmin, nit=nit, gnorm=gnorm,
                                  success=success)
            res = self.minresult
            hess_inv = None
        else:
            import scipy.optimize
            kw = dict(minkw)
            counts = {'fun': 0, 'jac': 0}
            itercount = [0]
            # per-iteration wall clock (reference _Callback,
            # _fit.py:855-964): time between successive minimizer
            # callbacks attributes line searches to their iteration
            self.itertimes = []
            _lastiter = [time.perf_counter()]

            objective_dtype = [None]

            def callback(xk):
                itercount[0] += 1
                now = time.perf_counter()
                self.itertimes.append(now - _lastiter[0])
                _lastiter[0] = now
                if verbosity >= 3:
                    v = float(nll_c(jnp.asarray(xk)))
                    log.log(
                        f'iter {itercount[0]}: nll = {v:.6g} '
                        f'({self.itertimes[-1] * 1e3:.1f} ms)', 3)

            cb = callback

            _seen_finite = [False]

            def _finite(v, g=None):
                """Map non-finite objective values (overflowed kernels,
                NaN factorizations at extreme trial points) to a large
                finite value with zero gradient: scipy's line searches
                then backtrack instead of compounding NaN steps into a
                runaway iterate.  A non-finite FIRST evaluation raises
                instead — returning the zero-gradient sentinel there
                would make BFGS terminate 'successfully' at the garbage
                start point (``raises=False`` downgrades this to a
                warning and keeps the start point, consistent with the
                other minimizer-failure handling)."""
                ok = numpy.isfinite(v) and (
                    g is None or numpy.all(numpy.isfinite(g)))
                if ok:
                    _seen_finite[0] = True
                    return v if g is None else (v, g)
                if not _seen_finite[0]:
                    msg = ('the objective (or its gradient) is '
                           'non-finite at the starting point; check '
                           'the model/hyperprior (or pass a different '
                           'initial=)')
                    if raises:
                        raise FloatingPointError(msg)
                    _seen_finite[0] = True  # warn once
                    warnings.warn(msg)
                big = 1e30
                return big if g is None else (big, numpy.zeros_like(g))

            if method == 'nograd':
                def f(w):
                    counts['fun'] += 1
                    if self.phase_timer is not None:
                        self.phase_timer.begin()
                    return _finite(
                        float(timer['fun'].time(nll_c, jnp.asarray(w))))
                res = scipy.optimize.minimize(
                    f, numpy.asarray(w0), method='Nelder-Mead',
                    callback=cb, **kw
                )
            elif method == 'gradient':
                def f(w):
                    counts['fun'] += 1
                    counts['jac'] += 1
                    if self.phase_timer is not None:
                        self.phase_timer.begin()
                    # host-side span: separates objective evaluations
                    # from minimizer overhead in a jax.profiler trace
                    # (free no-op when no trace is active)
                    with jax.profiler.TraceAnnotation(
                            'empbayes_fit.value_and_grad'):
                        v, g = timer['fun'].time(
                            value_and_grad, jnp.asarray(w))
                    objective_dtype[0] = getattr(v, 'dtype', None)
                    return _finite(float(v), numpy.asarray(g, float))
                scipy_method = kw.pop('method', 'BFGS')
                res = scipy.optimize.minimize(
                    f, numpy.asarray(w0), jac=True, method=scipy_method,
                    callback=cb, **kw
                )
            elif method == 'fisher':
                def f(w):
                    v, g = value_and_grad(jnp.asarray(w))
                    return _finite(float(v), numpy.asarray(g, float))
                use_fishvec = kw.pop('fishvec', nparam > 20)
                if use_fishvec:
                    # Fisher-vector products: O(n²) memory per product
                    # instead of the (P, n, n) derivative stack — the
                    # large-P path (reference ``_decomp.py:20-109``
                    # fishvec design)
                    fvec = self._make_fishvec(make_Kr, fixmask)
                    if jit:
                        fvec = jax.jit(fvec)
                    res = scipy.optimize.minimize(
                        f, numpy.asarray(w0), jac=True, method='trust-ncg',
                        hessp=lambda w, v: numpy.asarray(
                            fvec(jnp.asarray(w), jnp.asarray(v))),
                        **kw,
                    )
                else:
                    fisher_w = self._make_fisher(nll, fixmask)
                    res = scipy.optimize.minimize(
                        f, numpy.asarray(w0), jac=True, method='trust-ncg',
                        hess=lambda w: numpy.asarray(
                            fisher_w(jnp.asarray(w))),
                        **kw,
                    )
            else:
                raise KeyError(f'unknown method {method!r}')
            wmin = jnp.asarray(res.x)
            success = bool(res.success)
            if not success and 'precision loss' in \
                    str(getattr(res, 'message', '')).lower():
                # scipy's line-search tolerances assume float64
                # gradients; at float32 the gradient noise floor is
                # above its defaults, so a 'precision loss' exit with
                # the gradient at the dtype noise level IS convergence
                g = getattr(res, 'jac', None)
                if g is not None:
                    # the gradient noise floor is set by the dtype the
                    # LIKELIHOOD was computed in (an f32 model under an
                    # x64 session must use the f32 eps, even though the
                    # prior term promotes the total to f64)
                    dt = nll_dtype[0] or objective_dtype[0]
                    eps = float(jnp.finfo(
                        dt if dt is not None else jnp.empty(0).dtype
                    ).eps)
                    gnorm = float(numpy.max(numpy.abs(numpy.asarray(g))))
                    scale = max(1.0, abs(float(res.fun)))
                    success = gnorm <= 10 * (eps ** 0.5) * scale
                if not success and g is not None:
                    # the plain gradient criterion is blind to the
                    # objective's curvature (e.g. a stiff
                    # additional_loss raises the f32 gradient noise
                    # floor by its curvature); the Newton decrement
                    # g' H^-1 g — the remaining decrease to the local
                    # optimum — is scale-invariant, and scipy's BFGS
                    # inverse-Hessian approximation is good enough for
                    # a convergence heuristic
                    Hinv = getattr(res, 'hess_inv', None)
                    if Hinv is not None:
                        if hasattr(Hinv, 'todense'):
                            Hinv = Hinv.todense()
                        try:
                            gv = numpy.asarray(g, float)
                            lam2 = float(
                                gv @ (numpy.asarray(Hinv, float) @ gv))
                            success = 0 <= lam2 <= 100 * eps * scale
                        except Exception:
                            pass
            self.minresult = res
            hess_inv = getattr(res, 'hess_inv', None)
            if hess_inv is not None and hasattr(hess_inv, 'todense'):
                hess_inv = hess_inv.todense()  # L-BFGS LinearOperator
            nit = int(res.nit)
        self.elapsed = time.perf_counter() - t0
        if trace_active:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        its = getattr(self, 'itertimes', [])
        if len(its) >= 3:
            # the first iteration carries the XLA compile; its excess
            # over the steady-state median estimates the jit overhead
            # (reference _Callback jit-overhead estimation)
            steady = sorted(its[1:])[len(its[1:]) // 2]
            self.jit_overhead = max(0.0, its[0] - steady)
            log.log(
                f'per-iteration median {steady * 1e3:.1f} ms, '
                f'estimated jit overhead {self.jit_overhead:.2f} s', 2)
        else:
            self.itertimes = its
            self.jit_overhead = None
        log.log(f'minimization done in {self.elapsed:.2f}s, {nit} iters, '
                f'success={success}', 1)

        if not success:
            msg = f'minimization failed: {getattr(res, "message", "?")}'
            if raises:
                raise RuntimeError(msg)
            warnings.warn(msg)

        # posterior covariance in whitened space
        if covariance == 'auto':
            if is_custom_vjp_obj[0]:
                # streaming/custom_nll objectives: the likelihood is a
                # custom_vjp, so second-order AD ('hess') and the
                # explicit-K Fisher are unavailable; the quasi-Newton
                # inverse-hessian estimate is the Laplace covariance
                # source at never-materialized-Gram sizes
                if hess_inv is not None:
                    covariance = 'minhess'
                else:
                    warnings.warn(
                        "the objective is a custom-VJP likelihood "
                        "(streaming solver or custom_nll) and the "
                        "minimizer provides no hessian estimate: "
                        "posterior covariance set to the prior's "
                        "(covariance='none' + unit whitened cov).  Use "
                        "optimizer='scipy' method='gradient' (BFGS) "
                        "for a Laplace estimate, or "
                        "covariance='fisher' on a streaming-GP fit "
                        "for the exact expected information."
                    )
                    covariance = 'prior'
            else:
                covariance = 'hess' if method == 'fisher' \
                    or hess_inv is None else 'minhess'
        if covariance in ('hess', 'fisher') and is_custom_vjp_obj[0] \
                and not (covariance == 'fisher' and is_stream_obj[0]):
            raise ValueError(
                f"covariance={covariance!r} needs second-order AD or "
                "the materialized K(p), neither of which exists for a "
                "custom-VJP likelihood (streaming solver / "
                "custom_nll); use covariance='minhess' with "
                "optimizer='scipy' method='gradient' (BFGS), or "
                "'none'/'prior' (the streaming GP solver additionally "
                "supports the exact covariance='fisher')"
            )
        if covariance == 'hess':
            # observed information: AD hessian of the objective
            fisher_w = self._make_fisher(nll, fixmask)
            F = fisher_w(wmin)
            cov_w = Chol(F).ginv()
        elif covariance == 'fisher' and is_stream_obj[0]:
            # exact expected information at never-materialized-Gram
            # sizes: re-extract the streaming model at the MAP, push
            # each free whitened direction through the hyperparameter
            # map with jax.jvp (chain rule down to P dims even for an
            # n-dimensional heteroskedastic noise), and contract with
            # linalg.chol_stream_fisher's strip-streamed
            # ½ tr(K⁻¹dK_a K⁻¹dK_b); + unit whitened prior
            cov_w = self._stream_fisher_cov(
                gpfactory, gpfactorykw, make_hp, given, givencov,
                data_callable, wmin, fixmask, nparam)
        elif covariance == 'fisher':
            # expected information via the explicit decomposition formula
            # tr(K⁻¹ dK_i K⁻¹ dK_j)/2 + dr_i' K⁻¹ dr_j  (+ unit prior),
            # the reference's approach (reference _fit.py:711-743 with
            # _decomp.py:441-586); guaranteed PSD unlike the AD hessian
            if nparam > 20:
                # assemble F one Fisher-vector product at a time
                # (lax.map, NOT vmap: vmap would rebatch the directional
                # derivative into the very (P, n, n) stack this path
                # exists to avoid)
                K0, r0 = make_Kr(wmin)
                dec0 = Chol(K0)
                _, vjpK = jax.vjp(make_Kr, wmin)

                def fcol(v):
                    vfree = jnp.where(fixmask, 0.0, v)
                    _, (dKv, drv) = jax.jvp(make_Kr, (wmin,), (vfree,))
                    CK, cr = dec0.fishvec_cotangent(dKv, drv)
                    (Fv,) = vjpK((CK, cr))
                    return jnp.where(fixmask, v, Fv + v)

                F = jax.lax.map(fcol, jnp.eye(nparam))
            else:
                K0, r0 = make_Kr(wmin)
                dK, dr = jax.jacfwd(make_Kr)(wmin)   # (n,n,P), (n,P)
                Flik = Chol(K0).fisher(
                    jnp.moveaxis(dK, -1, 0), dr.T
                )
                F = Flik + jnp.eye(nparam)           # standard-normal prior
                eye = jnp.eye(nparam)
                mask2d = fixmask[:, None] | fixmask[None, :]
                F = jnp.where(mask2d, eye, F)
            cov_w = Chol(F).ginv()
        elif covariance == 'minhess':
            if hess_inv is None:
                raise ValueError('minimizer provides no hessian estimate')
            cov_w = jnp.asarray(hess_inv)
        elif covariance == 'none':
            cov_w = jnp.zeros((nparam, nparam))
        elif covariance == 'prior':
            # no curvature information: report the (whitened) prior
            # uncertainty unchanged rather than a false zero
            cov_w = jnp.eye(nparam)
        else:
            raise KeyError(f'unknown covariance {covariance!r}')

        # frozen coordinates carry no posterior uncertainty
        freeze2d = fixmask[:, None] | fixmask[None, :]
        cov_w = jnp.where(freeze2d, 0.0, cov_w)

        # transform back to stored-parameter space: p = mean + L w
        L = pdec.correlate(jnp.eye(nparam))
        pmean = pmean_prior + pdec.correlate(
            jnp.where(fixmask, 0.0, wmin)
        )
        pcov = L @ cov_w @ L.T
        # pmean mirrors the reference contract (_fit.py:359): a
        # BufferDict of posterior means, so fit.pmean['key'] applies the
        # key's transformation; the flat vector is pmean.buf
        self.pmean = prior.replace_buf(pmean)
        self.pcov = pcov
        u = from_cov(pmean, pcov)
        self.p = prior.replace_buf(u)
        self.w = wmin
        self.minargs = dict(method=method, optimizer=optimizer, minkw=minkw)
        self.counts = counts if optimizer == 'scipy' else {}
        self.timings = {k: (t.calls, t.seconds) for k, t in timer.items()}
        self.gpfactory = gpfactory
        self.gpfactorykw = gpfactorykw
        # the GP at the MAP point, for downstream predictions
        hp_map = prior.replace_buf(pmean)
        self.pmap = hp_map
        if data_callable:
            d = given(hp_map, **gpfactorykw)
            self.data = d if isinstance(d, tuple) else (d, None)
        else:
            self.data = (given, givencov)

    def _make_fishvec(self, make_Kr, fixmask):
        """Expected-Fisher-vector product F @ v in O(n²) memory.

        One jvp of ``p -> (K, r)`` along v gives the directional
        derivatives; the decomposition turns them into cotangents
        (``Chol.fishvec_cotangent``); one vjp pulls them back to
        parameter space.  The standard-normal prior on the whitened
        parameters adds the identity; ``additional_loss`` curvature is
        NOT included (this is a Newton *preconditioner* — the gradient
        still drives the optimum).  Formulas: reference
        ``_decomp.py:20-109``."""
        def fishvec(w, v):
            vfree = jnp.where(fixmask, 0.0, v)
            (K, r), (dKv, drv) = jax.jvp(make_Kr, (w,), (vfree,))
            dec = Chol(K)
            CK, cr = dec.fishvec_cotangent(dKv, drv)
            _, vjp = jax.vjp(make_Kr, w)
            (Fv,) = vjp((CK, cr))
            return jnp.where(fixmask, v, Fv + v)
        return fishvec

    def _stream_fisher_cov(self, gpfactory, gpfactorykw, make_hp,
                           given, givencov, data_callable, wmin,
                           fixmask, nparam):
        """Whitened posterior covariance from the EXACT streamed Fisher
        information of a ``solver='chol-stream'`` objective.

        The streaming NLL's hyperparameter dependence factors through
        θ(w) = (profile params, lenscale, noise) and, for callable
        data, y(w).  ``jax.jvp`` of that map along each free whitened
        basis direction yields the tangent directions; the strip-
        streamed ``linalg.chol_stream_fisher`` contracts them against
        ½ tr(K⁻¹dK_a K⁻¹dK_b) (+ dy' K⁻¹ dy) without materializing
        anything n².  Mirrors the dense branch's contract (expected
        information + unit whitened prior, fixed coordinates frozen)."""
        from .linalg import chol_stream_fisher

        def model_of(w):
            hp = make_hp(w)
            gp = gpfactory(hp, **gpfactorykw)
            if data_callable:
                d = given(hp, **gpfactorykw)
                g, gcov = d if isinstance(d, tuple) else (d, None)
            else:
                g, gcov = given, givencov
            inkeys, yv = gp._stream_flat(g)
            profile, prm, X, lsc, _, noise = \
                gp._stream_model(inkeys, gcov)
            ep = jnp.zeros(()) if noise is None else jnp.asarray(noise)
            diff = (tuple(prm),
                    jnp.asarray(1.0 if lsc is None else lsc),
                    ep, yv)
            return diff, (profile, X, gp)

        def theta(w):
            return model_of(w)[0]

        diff0, (profile0, X0, gp0) = model_of(wmin)
        free = numpy.where(~numpy.asarray(fixmask))[0]
        tangents = []
        dys = []
        for a in free:
            e = jnp.zeros_like(wmin).at[int(a)].set(1.0)
            _, (tp, tl, te, ty) = jax.jvp(theta, (wmin,), (e,))
            tangents.append((tp, tl, te))
            dys.append(ty)
        dr = None
        if data_callable:
            dr = jnp.stack(dys, axis=1)             # (n, Pfree)
        F = chol_stream_fisher(
            profile0, X0, params=diff0[0], lenscale=diff0[1],
            epsabs=diff0[2], tangents=tangents, dr=dr,
            shard=gp0._stream_shard(), **gp0._stream_kw())
        F_full = jnp.eye(nparam, dtype=F.dtype)
        if free.size:
            fi = jnp.asarray(free)
            F_full = F_full.at[jnp.ix_(fi, fi)].add(F)
        return Chol(F_full).ginv()

    def _make_fisher(self, nll, fixmask):
        """Fisher matrix ≈ Hessian via forward-over-reverse AD of the
        objective (exact for the Gaussian part at the optimum)."""
        def fisher(w):
            H = jax.jacfwd(jax.grad(nll))(w)
            # freeze fixed coordinates: unit diagonal so the inverse is
            # well defined and those coordinates get zero variance from
            # the prior row/col structure
            n = H.shape[0]
            eye = jnp.eye(n, dtype=H.dtype)
            mask = fixmask[:, None] | fixmask[None, :]
            return jnp.where(mask, eye, H)
        return fisher

    def gp(self):
        """The GP built at the MAP hyperparameters."""
        gp = self.gpfactory(self.pmap, **self.gpfactorykw)
        if gp is None:
            raise TypeError(
                'no gpfactory: this fit used custom_nll; build the '
                'model from .pmap yourself'
            )
        return gp

    # -- checkpoint / resume (new vs the reference, SURVEY §5: the
    # reference never persists fit state) --------------------------------

    def save(self, path):
        """Persist the fit state (layout, posterior mean/cov, whitened
        minimum) to an .npz file.  The layout is stored as a JSON string
        (no object arrays, no pickling)."""
        import json
        layout = json.dumps({
            'keys': list(self.prior.keys()),
            'shapes': [list(self.prior._slices[k][1])
                       for k in self.prior.keys()],
        })
        numpy.savez(
            path,
            layout=numpy.asarray(layout),
            pmean=numpy.asarray(self.pmean.buf),
            pcov=numpy.asarray(self.pcov),
            w=numpy.asarray(self.w),
        )

    @staticmethod
    def load(path):
        """Load a saved fit state: returns a dict with 'p' (BufferDict of
        UArray posterior), 'pmean', 'pcov', 'w'."""
        import json
        dat = numpy.load(path)
        layout = json.loads(str(dat['layout']))
        keys = list(layout['keys'])
        shapes = [tuple(s) for s in layout['shapes']]
        pmean = jnp.asarray(dat['pmean'])
        pcov = jnp.asarray(dat['pcov'])
        u = from_cov(pmean, pcov)
        bd = BufferDict(keys=keys, shapes=shapes, buf=u)
        return dict(
            p=bd, pmean=pmean, pcov=pcov, w=jnp.asarray(dat['w'])
        )
