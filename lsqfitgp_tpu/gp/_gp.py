"""The GP object: processes, elements, covariance assembly, inference.

TPU-native counterpart of reference ``src/lsqfitgp/_GP/`` (``_base.py``,
``_processes.py``, ``_elements.py``, ``_compute.py``).  Same public
surface:

- immutable builder pattern: every ``def*``/``add*`` method returns a new
  GP (reference ``_base.py:86-104``),
- a *process* registry (infinite-dimensional Gaussian variables: kernels,
  linear transformations of other processes, operator transforms) with a
  cross-kernel derivation engine (reference ``_processes.py:343-434``),
- an *element* registry (finite evaluations / linear maps / explicit
  covariance blocks) with cached covariance-block assembly (reference
  ``_elements.py:554-680``),
- ``prior`` / ``pred`` / ``predfromdata`` / ``predfromfit`` /
  ``marginal_likelihood`` (reference ``_compute.py:138-430``).

Re-designed for XLA: covariance assembly happens in one traceable
function-of-hyperparameters; posteriors are returned as
:class:`lsqfitgp_tpu.uncert.UArray` (device-resident dense Jacobians)
instead of host-side gvar object arrays, so the whole inference path
jit-compiles, shards, and differentiates.
"""

from __future__ import annotations

import collections
import math

import jax
import numpy
from jax import numpy as jnp

from .. import _array, _config, _jaxutil
from ..kernelalg import CrossKernel, Kernel, Zero
from .. import linalg
from ..linalg import Chol
from .. import uncert

__all__ = ['GP', 'DefaultProcess']


class _DefaultProcess:
    def __repr__(self):
        return 'DefaultProcess'


DefaultProcess = _DefaultProcess()

# -- process kinds -----------------------------------------------------------

_ProcKernel = collections.namedtuple('_ProcKernel', ['kernel'])
_ProcLinTransf = collections.namedtuple('_ProcLinTransf', ['transf', 'keys'])
_ProcKernelTransf = collections.namedtuple(
    '_ProcKernelTransf', ['proc', 'transfname', 'arg']
)

# -- element kinds -----------------------------------------------------------

_Points = collections.namedtuple('_Points', ['x', 'proc', 'deriv', 'shape'])
_LinTransfEl = collections.namedtuple(
    '_LinTransfEl', ['transf', 'keys', 'shape']
)
_CovEl = collections.namedtuple('_CovEl', ['shape'])


def _size(shape):
    return math.prod(shape) if shape else 1


class GP:
    """A Gaussian process model: a dictionary of processes and a
    dictionary of finite elements built from them.

    Parameters
    ----------
    covfun : Kernel, optional
        Kernel of the default process.
    solver : str
        Decomposition used for posteriors: 'chol' (single-chip blocked
        MXU Cholesky), 'chol-distributed' (mesh-distributed
        factorization + solves; pass ``mesh=`` and optionally
        ``axis=``/``block=`` as extra keywords — the covariance lives
        row-sharded over the mesh and no device materializes more than
        its strip), or 'chol-stream' (the never-materialized-Gram
        streaming pipeline: the Gram matrix is computed inside the
        factorization and never exists in memory, extending one chip
        to n = 65536; `marginal_likelihood` carries the EXACT
        hand-derived gradient, `pred` returns means/variances/small
        dense output covariances.  The model must reduce to "one
        isotropic process + diagonal noise": a single ``addx`` data
        element whose process kernel is an isotropic constructor —
        or a SUM of them at different length scales, e.g.
        ``a1*ExpQuad(scale=s1) + a2*Matern(scale=s2)`` — optionally
        inside scalar ``amp * k + c`` chains and an additive
        ``sigma2 * White()`` term, plus optionally a ``givencov``
        that is a scalar (iid) or a per-point variance VECTOR
        (heteroskedastic diagonal, with exact per-element
        gradients).  Anything else raises with a diagnostic.  Extra
        keywords: ``block``, ``b1``, ``gradblock``.)
    checkpos, checksym, checkfinite, checklin : bool
        Eager sanity checks (run at trace time, compile away).
    posepsfac : float
        Tolerance factor for the positivity check.
    halfmatrix : bool
        Evaluate symmetric point blocks on the upper-triangle tiles only
        (via the Pallas ``gram_sym`` path; worth it for expensive
        kernels).  Counterpart of reference ``_elements.py:567-573``.
    gram : {'auto', 'tiled', 'broadcast'}
        Point-block assembly engine.  'tiled' routes isotropic kernels
        through the Pallas tiled evaluator (r² on the MXU, profile fused
        in VMEM); 'broadcast' always uses the XLA broadcast of the
        kernel core; 'auto' (default) tiles on TPU for large blocks.
    """

    _SOLVERS = ('chol', 'chol-distributed', 'chol-stream')

    def __init__(self, covfun=None, *, solver='chol', checkpos=True,
                 checksym=True, checkfinite=True, checklin=True,
                 posepsfac=1, halfmatrix=False, gram='auto', **kw):
        self._procs = {}
        self._elements = {}
        self._kernel_cache = {}
        self._covblock_cache = {}
        self._decomp_cache = {}
        self._user_decomps = {}
        if solver not in self._SOLVERS:
            raise KeyError(f'unknown solver {solver!r}, must be one '
                           f'of {self._SOLVERS}')
        self._solverkw = dict(kw)
        self._solver = solver
        if gram not in ('auto', 'tiled', 'broadcast'):
            raise KeyError(f'unknown gram mode {gram!r}')
        self._gram_mode = gram
        self._halfmatrix = bool(halfmatrix)
        self._checks = dict(
            pos=checkpos, sym=checksym, finite=checkfinite, lin=checklin,
            posepsfac=posepsfac,
        )
        if covfun is not None:
            if not isinstance(covfun, Kernel):
                raise TypeError('covfun must be a (symmetric) Kernel')
            self._procs[DefaultProcess] = _ProcKernel(covfun)

    # -- builder infrastructure ----------------------------------------------

    def _clone(self):
        new = object.__new__(GP)
        new._procs = dict(self._procs)
        new._elements = dict(self._elements)
        # Caches are COPIED, not shared.  Within one lineage keys are never
        # redefined, so inherited entries stay valid; but two sibling clones
        # of a common ancestor may define the *same* key differently, so a
        # shared dict would let one sibling read the other's blocks
        # (silently wrong covariances).  Each clone owns its dict; later
        # memoization on the parent is simply not visible to earlier clones.
        new._kernel_cache = dict(self._kernel_cache)
        new._covblock_cache = dict(self._covblock_cache)
        new._decomp_cache = dict(self._decomp_cache)
        new._user_decomps = dict(self._user_decomps)
        new._solverkw = self._solverkw
        new._solver = self._solver
        new._checks = self._checks
        new._gram_mode = self._gram_mode
        new._halfmatrix = self._halfmatrix
        return new

    def _checkprockey(self, key, new=True):
        if new and key in self._procs:
            raise KeyError(f'process key {key!r} already defined')
        if not new and key not in self._procs:
            raise KeyError(f'process {key!r} not defined')

    def _checkelkey(self, key, new=True):
        if key is None:
            raise KeyError('key cannot be None')
        if new and key in self._elements:
            raise KeyError(f'element key {key!r} already used')
        if not new and key not in self._elements:
            raise KeyError(f'element {key!r} not defined')

    # -- process definition ----------------------------------------------------

    def defproc(self, key, kernel=None, *, deriv=0):
        """Define a new independent process with the given kernel
        (reference ``_processes.py:92``)."""
        self._checkprockey(key)
        if kernel is None:
            kernel = self._procs[DefaultProcess].kernel
        if not isinstance(kernel, Kernel):
            raise TypeError('kernel must be a symmetric Kernel')
        new = self._clone()
        from .._deriv import Deriv
        deriv = Deriv(deriv)
        if deriv:
            # derivative process built on top of an anonymous plain process
            base = object()
            new._procs[base] = _ProcKernel(kernel)
            new._procs[key] = _ProcKernelTransf(base, 'diff', deriv)
        else:
            new._procs[key] = _ProcKernel(kernel)
        return new

    def deftransf(self, key, ops, *, deriv=0):
        """Define a process as a linear combination of other processes:
        f_key = Σ_i c_i f_i, ops = {prockey: coefficient}
        (reference ``_processes.py:122``)."""
        self._checkprockey(key)
        keys = list(ops)
        coefs = [ops[k] for k in keys]
        for k in keys:
            self._checkprockey(k, new=False)
        for c in coefs:
            if not (callable(c) or _iskernel_scalar(c)):
                raise TypeError(f'invalid coefficient {c!r}')

        def transf(*fns):
            def combo(x):
                out = None
                for c, f in zip(coefs, fns):
                    cx = c(x) if callable(c) else c
                    term = cx * f(x)
                    out = term if out is None else out + term
                return out
            return combo

        new = self.deflintransf(key, transf, keys, deriv=deriv)
        return new

    def deflintransf(self, key, transf, procs, *, deriv=0, checklin=False):
        """Define a process as a generic linear map of other processes:
        f_key = T(f_1, ..., f_k) (reference ``_processes.py:178``)."""
        self._checkprockey(key)
        for k in procs:
            self._checkprockey(k, new=False)
        new = self._clone()
        from .._deriv import Deriv
        deriv = Deriv(deriv)
        new._procs[key] = _ProcLinTransf(transf, list(procs))
        if deriv:
            inner = object()
            new._procs[inner] = new._procs.pop(key)
            new._procs[key] = _ProcKernelTransf(inner, 'diff', deriv)
        return new

    def deflinop(self, key, transfname, arg, proc):
        """Define a process by applying a kernel linop to another process
        (reference ``_processes.py:239``)."""
        self._checkprockey(key)
        self._checkprockey(proc, new=False)
        new = self._clone()
        new._procs[key] = _ProcKernelTransf(proc, transfname, arg)
        return new

    def defderiv(self, key, deriv, proc):
        """f_key = d^deriv f_proc (reference ``_processes.py:264``)."""
        from .._deriv import Deriv
        return self.deflinop(key, 'diff', Deriv(deriv), proc)

    def defxtransf(self, key, transf, proc):
        """f_key(x) = f_proc(transf(x)) (reference ``_processes.py:290``)."""
        if not callable(transf):
            raise TypeError('transf must be callable')
        return self.deflinop(key, 'xtransf', transf, proc)

    def defrescale(self, key, fun, proc):
        """f_key(x) = fun(x) f_proc(x) (reference ``_processes.py:317``)."""
        if not callable(fun):
            raise TypeError('fun must be callable')
        return self.deflinop(key, 'rescale', fun, proc)

    # -- cross-kernel derivation -----------------------------------------------

    def _crosskernel(self, pa, pb):
        key = (pa, pb)
        cache = self._kernel_cache
        if key in cache:
            return cache[key]
        swapped = (pb, pa)
        if swapped in cache:
            k = cache[swapped]._swap()
            cache[key] = k
            return k
        a = self._procs[pa]
        b = self._procs[pb]
        if isinstance(a, _ProcKernel) and isinstance(b, _ProcKernel):
            k = a.kernel if pa is pb or pa == pb else Zero()
        elif isinstance(a, _ProcKernelTransf):
            base = self._crosskernel(a.proc, pb)
            k = base if isinstance(base, Zero) else base.linop(
                a.transfname, a.arg, None
            )
        elif isinstance(b, _ProcKernelTransf):
            base = self._crosskernel(pa, b.proc)
            k = base if isinstance(base, Zero) else base.linop(
                b.transfname, None, b.arg
            )
        elif isinstance(a, _ProcLinTransf):
            kernels = [self._crosskernel(p, pb) for p in a.keys]
            if all(isinstance(k0, Zero) for k0 in kernels):
                k = Zero()
            else:
                k = CrossKernel._nary(
                    a.transf, kernels, CrossKernel._side.LEFT
                )
        elif isinstance(b, _ProcLinTransf):
            kernels = [self._crosskernel(pa, p) for p in b.keys]
            if all(isinstance(k0, Zero) for k0 in kernels):
                k = Zero()
            else:
                k = CrossKernel._nary(
                    b.transf, kernels, CrossKernel._side.RIGHT
                )
        else:  # pragma: no cover
            raise TypeError(f'unknown process kinds {a!r}, {b!r}')
        cache[key] = k
        return k

    # -- element definition ------------------------------------------------------

    def addx(self, x, key=None, *, deriv=0, proc=DefaultProcess):
        """Add points where the process is evaluated
        (reference ``_elements.py:159``)."""
        if not isinstance(x, dict):
            if key is None:
                raise ValueError('key required when x is not a dict')
            x = {key: x}
        elif key is not None:
            raise ValueError('key not allowed when x is a dict')
        self._checkprockey(proc, new=False)
        from .._deriv import Deriv
        deriv = Deriv(deriv)
        new = self._clone()
        for k, xk in x.items():
            new._checkelkey(k)
            xk = _array.asarray(xk)
            if not isinstance(xk, _array.StructuredArray):
                if getattr(xk, 'dtype', None) is not None \
                        and xk.dtype.kind not in 'USO':
                    # strings/objects stay host-side numpy (text
                    # kernels like BagOfWords); numeric goes on device
                    xk = jnp.asarray(xk)
                if not deriv.implicit:
                    raise ValueError(
                        'named derivative with non-structured x'
                    )
            else:
                for dim in deriv:
                    if dim is not None and dim not in xk.fields:
                        raise ValueError(
                            f'derivative along missing field {dim!r}'
                        )
            if self._checks['finite'] and not isinstance(
                    xk, _array.StructuredArray) \
                    and xk.dtype.kind not in 'USO':
                def check(xk=xk):
                    assert jnp.all(jnp.isfinite(xk)), 'non-finite x'
                _jaxutil.skipifabstract(check)
            new._elements[k] = _Points(xk, proc, deriv, tuple(xk.shape))
        return new

    def addlintransf(self, transf, keys, key, *, checklin=None):
        """Add a finite linear transformation of other elements
        (reference ``_elements.py:349``)."""
        self._checkelkey(key)
        for k in keys:
            self._checkelkey(k, new=False)
        shapes = [self._elements[k].shape for k in keys]
        dtype = _config.default_float()
        specs = [jax.ShapeDtypeStruct(s, dtype) for s in shapes]
        out = jax.eval_shape(transf, *specs)
        if checklin is None:
            checklin = self._checks['lin']
        if checklin:
            self._checklinear(transf, shapes)
        new = self._clone()
        new._elements[key] = _LinTransfEl(transf, list(keys), tuple(out.shape))
        return new

    def _checklinear(self, transf, shapes):
        """Verify transf is linear via a jvp identity probe
        (reference ``_base.py:54-84``).  Skipped silently when the
        transformation closes over traced values (inside jit) — the
        same eager-check seam as every other sanity check."""
        dtype = _config.default_float()
        rng = numpy.random.default_rng(0)
        xs = [jnp.asarray(rng.standard_normal(s), dtype) for s in shapes]
        zeros = [jnp.zeros(s, dtype) for s in shapes]

        def check():
            y0 = transf(*zeros)
            direct = transf(*xs)
            _, tangent = jax.jvp(transf, zeros, xs)
            if not (
                jnp.allclose(y0, 0, atol=1e-10)
                and jnp.allclose(direct, tangent, rtol=1e-6, atol=1e-10)
            ):
                raise RuntimeError(
                    'the transformation is not linear; pass checklin=False '
                    'to skip this check'
                )

        _jaxutil.skipifabstract(check)

    def addtransf(self, tensors, key, *, axes=1):
        """Add a tensor-contraction linear transformation:
        out = Σ_k tensordot(tensors[k], element_k, axes), with scalar
        entries broadcasting-multiplied and the per-key results summed
        under numpy broadcasting (reference ``_elements.py:248-347``).

        ``axes`` counts contracted dimensions: the trailing axes of
        each tensor against the leading axes of its element.
        """
        if not (isinstance(axes, int) and axes >= 0):
            raise ValueError(f'axes must be a nonneg integer, got {axes!r}')
        self._checkelkey(key)
        if not tensors:
            raise ValueError('empty tensors, undetermined output shape')
        keys = list(tensors)
        tens = []
        shapes = []
        for k in keys:
            self._checkelkey(k, new=False)
            t = jnp.asarray(tensors[k])
            eshape = self._elements[k].shape
            if t.shape and t.shape[t.ndim - axes:] != eshape[:axes]:
                raise ValueError(
                    f'tensors[{k!r}].shape = {t.shape} cannot contract '
                    f'{axes} axes against element shape {eshape}'
                )
            if self._checks['finite']:
                def check(t=t, k=k):
                    assert jnp.all(jnp.isfinite(t)), \
                        f'tensors[{k!r}] contains infs/nans'
                _jaxutil.skipifabstract(check)
            tens.append(t)
            shapes.append(
                t.shape[:t.ndim - axes] + eshape[axes:] if t.shape
                else eshape
            )
        try:
            jnp.broadcast_shapes(*shapes)
        except ValueError:
            raise ValueError(
                f'per-key results of shapes {shapes} do not broadcast '
                f'together'
            ) from None

        def transf(*vals):
            out = None
            for t, v in zip(tens, vals):
                if t.ndim == 0:
                    term = t * v
                else:
                    term = jnp.tensordot(t, v, axes=axes)
                out = term if out is None else out + term
            return out

        return self.addlintransf(transf, keys, key, checklin=False)

    def addcov(self, covblocks, key=None, *, decomps=None):
        """Add finite variables with explicit covariance blocks
        (reference ``_elements.py:409``).

        ``decomps``: optional pre-computed :class:`Decomposition` of a
        diagonal block (or dict key -> decomposition).  When an
        inference call's data covers exactly one such key (and adds no
        extra covariance), the stored decomposition is used directly,
        skipping the refactorization — the reference's use of user
        decompositions (``_elements.py:409``, ``_compute.py:45-94``).
        """
        if not isinstance(covblocks, dict):
            if key is None:
                raise ValueError('key required when covblocks is not a dict')
            covblocks = {(key, key): covblocks}
            if decomps is not None and not isinstance(decomps, dict):
                decomps = {key: decomps}
        elif key is not None:
            raise ValueError('key not allowed when covblocks is a dict')

        # collect keys and shapes from diagonal blocks
        pairs = {}
        elkeys = []
        for (k1, k2), block in covblocks.items():
            block = jnp.asarray(block)
            pairs[k1, k2] = block
            for k in (k1, k2):
                if k not in elkeys:
                    elkeys.append(k)
        shapes = {}
        for k in elkeys:
            self._checkelkey(k)
            diag = pairs.get((k, k))
            if diag is None:
                raise ValueError(f'missing diagonal block for key {k!r}')
            if diag.ndim % 2:
                raise ValueError(f'diagonal block {k!r} has odd ndim')
            half = diag.ndim // 2
            shapes[k] = diag.shape[:half]
            if diag.shape[half:] != shapes[k]:
                raise ValueError(f'diagonal block {k!r} not square')

        if self._checks['sym']:
            def check():
                for (k1, k2), block in pairs.items():
                    if k1 == k2:
                        n = _size(shapes[k1])
                        b = block.reshape(n, n)
                        assert jnp.allclose(b, b.T), \
                            f'non-symmetric diagonal block {k1!r}'
                    elif (k2, k1) in pairs:
                        n1, n2 = _size(shapes[k1]), _size(shapes[k2])
                        b = block.reshape(n1, n2)
                        bt = pairs[k2, k1].reshape(n2, n1)
                        assert jnp.allclose(b, bt.T), \
                            f'blocks ({k1!r},{k2!r}) not transposes'
            _jaxutil.skipifabstract(check)
        if self._checks['finite']:
            def checkf():
                for block in pairs.values():
                    assert jnp.all(jnp.isfinite(block)), \
                        'non-finite covariance block'
            _jaxutil.skipifabstract(checkf)

        if decomps is not None:
            from ..linalg import Decomposition
            if not isinstance(decomps, dict):
                raise TypeError(
                    'decomps must be a dict key -> Decomposition when '
                    'covblocks is a dict'
                )
            for k, d in decomps.items():
                if k not in elkeys:
                    raise KeyError(
                        f'decomps key {k!r} not among covblocks keys'
                    )
                if not isinstance(d, Decomposition):
                    raise TypeError(
                        f'decomps[{k!r}] is not a Decomposition'
                    )
                if d.n != _size(shapes[k]):
                    raise ValueError(
                        f'decomps[{k!r}].n = {d.n} != block size '
                        f'{_size(shapes[k])}'
                    )

        new = self._clone()
        for k in elkeys:
            new._elements[k] = _CovEl(shapes[k])
        for k1 in elkeys:
            for k2 in elkeys:
                n1, n2 = _size(shapes[k1]), _size(shapes[k2])
                if (k1, k2) in pairs:
                    blk = pairs[k1, k2].reshape(n1, n2)
                elif (k2, k1) in pairs:
                    blk = pairs[k2, k1].reshape(n2, n1).T
                else:
                    blk = jnp.zeros((n1, n2))
                new._covblock_cache[k1, k2] = blk
        if decomps is not None:
            for k, d in decomps.items():
                new._user_decomps[k] = d
        return new

    # -- covariance assembly -------------------------------------------------

    def _covblock(self, a, b):
        cache = self._covblock_cache
        if (a, b) in cache:
            return cache[a, b]
        if (b, a) in cache:
            blk = cache[b, a].T
            cache[a, b] = blk
            return blk
        ea, eb = self._elements[a], self._elements[b]
        if isinstance(ea, _Points) and isinstance(eb, _Points):
            blk = self._block_points(ea, eb)
        elif isinstance(ea, _LinTransfEl):
            blk = self._block_lintransf_left(ea, b)
        elif isinstance(eb, _LinTransfEl):
            blk = self._block_lintransf_left(eb, a).T
        elif isinstance(ea, _CovEl) or isinstance(eb, _CovEl):
            # independent of everything not specified in addcov
            blk = jnp.zeros((_size(ea.shape), _size(eb.shape)))
        else:  # pragma: no cover
            raise TypeError('unknown element kinds')
        cache[a, b] = blk
        return blk

    def _block_points(self, ea, eb):
        kernel = self._crosskernel(ea.proc, eb.proc)
        if isinstance(kernel, Zero):
            return jnp.zeros((_size(ea.shape), _size(eb.shape)))
        if ea.deriv or eb.deriv:
            kernel = kernel.linop('diff', ea.deriv, eb.deriv)
        blk = self._block_points_tiled(kernel, ea, eb)
        if blk is not None:
            return blk
        xa = ea.x.reshape(-1) if ea.x.ndim != 1 else ea.x
        xb = eb.x.reshape(-1) if eb.x.ndim != 1 else eb.x
        sym = ea is eb or (eb.x is ea.x and eb.proc == ea.proc
                           and eb.deriv == ea.deriv)
        if sym and self._halfmatrix:
            return self._block_points_half(kernel, xa)
        blk = kernel(xa[:, None], xb[None, :])
        return blk

    def _block_points_half(self, kernel, x):
        """Symmetric point block evaluated only on the packed upper
        triangle: the kernel core runs on two GATHERED 1-D vectors of
        n(n+1)/2 point pairs instead of the full (n, n) broadcast —
        half the evaluations, which is the win for expensive cores
        (BART's per-entry scan, fractional Matérn quadrature).
        Counterpart of reference ``_elements.py:567-573``
        (``halfmatrix``), which the round-2 build only offered for
        isotropic fast-path kernels."""
        n = x.shape[0]
        iu, ju = jnp.triu_indices(n)
        ka = kernel(x[iu], x[ju])
        K = jnp.zeros((n, n), dtype=ka.dtype).at[iu, ju].set(ka)
        return K + K.T - jnp.diag(jnp.diag(K))

    def _block_points_tiled(self, kernel, ea, eb):
        """Pallas tiled Gram assembly for isotropic kernels: r² via the
        MXU, the profile fused in VMEM (SURVEY §7.4; the counterpart of
        reference ``_elements.py:554-580``).  Returns None when the
        kernel or the inputs fall outside the fast path — the caller
        falls back to the broadcast core evaluation."""
        mode = self._gram_mode
        if mode == 'broadcast':
            return None
        spec = getattr(kernel, '_fastgram', None)
        if spec is None:
            return None
        if spec.noise is not None \
                or (spec.core is None and spec.terms is None):
            # δ-noise components need the exact x==y comparison of the
            # broadcast core (duplicate points, cross blocks); the
            # tiled r² engine cannot represent them
            return None
        from ..kernelalg import _fastgram as fg
        cols_a = fg.leaf_columns(ea.x)
        cols_b = cols_a if eb is ea else fg.leaf_columns(eb.x)
        if cols_a is None or cols_b is None \
                or len(cols_a) != len(cols_b):
            return None
        p = len(cols_a)
        if spec.maxdim is not None and not (
                isinstance(spec.maxdim, float) and math.isinf(spec.maxdim)
        ) and p > spec.maxdim:
            return None  # let the broadcast path raise the guard error
        na, nb = _size(ea.shape), _size(eb.shape)
        if mode == 'auto':
            # measured on v5e (n=8192, f32, in-situ through the GP,
            # round 3): the XLA broadcast stays fully fused and runs at
            # the profile-evaluation floor up to ~p=8 (0.5-1.0 ms vs
            # tiled 0.9-1.2 ms), because the kernel's r² cross term
            # pays a K=p-padded-to-128 MXU matmul at HIGHEST precision.
            # The broadcast's per-column VPU cost (~3 ops/entry/column)
            # overtakes that fixed cost around p ≈ 16-20; 'auto' is
            # conservative at 16.  Force gram='tiled' below that when
            # the profile itself is expensive (the broadcast and the
            # kernel pay it equally, but the tiled path never
            # materializes the (n, m, p) difference tensor).
            import jax as _jax
            if _jax.default_backend() != 'tpu':
                return None
            if p < 16 or na * nb < (1 << 20):
                return None
        from .. import ops
        profile, params = fg.build_profile(spec)
        X = fg.transform_points(spec, cols_a)
        sym = ea is eb or (eb.x is ea.x and eb.proc == ea.proc
                           and eb.deriv == ea.deriv)
        if sym and self._halfmatrix:
            return ops.gram_sym(profile, X, params=params)
        Y = X if sym else fg.transform_points(spec, cols_b)
        return ops.gram(profile, X, Y, params=params)

    def _block_lintransf_left(self, ea, b):
        eb = self._elements[b]
        nb = _size(eb.shape)
        cols = []
        for k in ea.keys:
            ek = self._elements[k]
            blk = self._covblock(k, b)  # (size_k, nb)
            cols.append(blk.reshape(ek.shape + (nb,)))
        vm = jax.vmap(ea.transf, in_axes=(-1,) * len(cols), out_axes=-1)
        out = vm(*cols)  # ea.shape + (nb,)
        return out.reshape(_size(ea.shape), nb)

    def _assemble(self, rowkeys, colkeys):
        rows = []
        for a in rowkeys:
            row = [self._covblock(a, b) for b in colkeys]
            rows.append(row)
        return jnp.block(rows) if (len(rows) > 1 or len(rows[0]) > 1) \
            else rows[0][0]

    def _checkpos(self, K):
        if not self._checks['pos']:
            return

        def check():
            n = K.shape[0]
            eps = jnp.finfo(K.dtype).eps
            if n <= 512:
                eigs = jnp.linalg.eigvalsh(K)
                mineig = jnp.min(eigs)
                mx = jnp.max(jnp.abs(eigs))
            else:
                # large n: LOBPCG extremal eigenvalue estimate, the
                # reference's approach (reference _elements.py:651-668)
                from jax.experimental.sparse.linalg import lobpcg_standard
                mx = jnp.max(jnp.sum(jnp.abs(K), axis=1))  # Gershgorin
                X = jnp.sin(
                    jnp.arange(n, dtype=K.dtype)[:, None]
                    * (1.0 + jnp.arange(8, dtype=K.dtype))[None, :]
                )
                shifted = mx * jnp.eye(n, dtype=K.dtype) - K
                w, _, _ = lobpcg_standard(shifted, X, m=32)
                mineig = mx - jnp.max(w)
            bound = -K.shape[0] * eps * mx * self._checks['posepsfac'] * 64
            assert mineig >= bound, \
                f'covariance matrix not positive definite ' \
                f'(min eig {mineig:.3g} < {bound:.3g})'

        _jaxutil.skipifabstract(check)

    # -- solvers ---------------------------------------------------------------

    def _solver_for(self, inkeys, extracov=None, **decompkw):
        cachekey = (tuple(inkeys), extracov is None)
        cacheable = extracov is None and not decompkw
        if cacheable and cachekey in self._decomp_cache:
            return self._decomp_cache[cachekey]
        if (
            len(inkeys) == 1 and extracov is None and not decompkw
            and inkeys[0] in self._user_decomps
        ):
            # the data covariance IS a user-decomposed addcov block:
            # use the stored decomposition, skip refactorization
            return self._user_decomps[inkeys[0]]
        Kxx = self._assemble(inkeys, inkeys)
        if extracov is not None:
            Kxx = Kxx + extracov
        else:
            self._checkpos(Kxx)
        dfg = self._df_gram_maker(inkeys, extracov)
        if dfg is not None:
            decompkw = {**decompkw, 'df_gram': dfg}
        dec = self._make_decomp(Kxx, **decompkw)
        if cacheable:
            self._decomp_cache[cachekey] = dec
        return dec

    def _df_gram_maker(self, inkeys, extracov):
        """Closure ``() -> (Kh, Kl)`` assembling the data-block Gram in
        DOUBLE-FLOAT (exact pairwise r² + df transcendentals, see
        :mod:`lsqfitgp_tpu.linalg._df`), or None when the model is not
        df-profile-expressible.  Handed to :class:`Chol`, which traces
        it only inside its conditioning-rescue ``lax.cond`` branch —
        well-posed models never execute it.  This closes the f32
        accuracy hole where a cond ≳ 1e6 Gram is made indefinite by
        the assembly's ~30-ULP transcendental error before any
        factorization sees it (the reference never has this failure
        mode: everything is f64, reference
        ``_linalg/_decomp.py:245-278``)."""
        if self._solver != 'chol':
            return None
        from ..kernelalg import _fastgram as fg
        from ..linalg import _df
        if len(inkeys) != 1:
            return None
        el = self._elements[inkeys[0]]
        if not isinstance(el, _Points) or el.deriv:
            return None
        proc = self._procs.get(el.proc)
        if not isinstance(proc, _ProcKernel):
            return None
        spec = getattr(proc.kernel, '_fastgram', None)
        if spec is None or (spec.core is None and spec.terms is None):
            return None
        profile_df = fg.build_profile_df(spec)
        if profile_df is None:
            return None
        cols = fg.leaf_columns(el.x)
        if cols is None:
            return None
        p = len(cols)
        if spec.maxdim is not None and not (
            isinstance(spec.maxdim, float) and math.isinf(spec.maxdim)
        ) and p > spec.maxdim:
            return None
        if spec.scale is not None and jnp.ndim(spec.scale) != 0:
            return None  # per-dim scales: gram_df folds a SCALAR only
        # RAW points: distances are translation-invariant, so loc is
        # dropped, and the lenscale is folded into r² in df by gram_df
        # (an f32 point pre-division would jitter the coordinates and
        # reintroduce the assembly error)
        X = fg.transform_points(
            spec._replace(scale=None, loc=None), cols)
        noise = spec.noise
        n = X.shape[0]

        def df_gram():
            Kh, Kl = _df.gram_df(profile_df, X, lenscale=spec.scale)
            if noise is not None:
                ii = jnp.arange(n)
                dh, dl = _df.add(
                    jnp.diag(Kh), jnp.diag(Kl),
                    jnp.broadcast_to(jnp.asarray(noise, Kh.dtype), (n,)),
                    jnp.zeros(n, Kh.dtype))
                Kh = Kh.at[ii, ii].set(dh)
                Kl = Kl.at[ii, ii].set(dl)
            if extracov is not None:
                # data covariance: f32 values ARE the data (exact)
                Kh, Kl = _df.add(
                    Kh, Kl, jnp.asarray(extracov, Kh.dtype),
                    jnp.zeros_like(Kh))
            return Kh, Kl

        # closure-convert: under a fit, the spec's post chain / dyn
        # values / noise are TRACED hyperparameters; the fused-NLL
        # custom_jvp carries df_gram in its static opts, so the traced
        # constants must ride as explicit operands or they leak out of
        # their trace (observed: UnexpectedTracerError under jax.grad)
        fn, consts = jax.closure_convert(df_gram)
        return fn, tuple(consts)

    def _make_decomp(self, K, **decompkw):
        kw = {**self._solverkw, **decompkw}
        if self._solver == 'chol':
            return Chol(K, **kw)
        if self._solver == 'chol-stream':
            raise RuntimeError(
                "solver='chol-stream' never materializes the Gram "
                "matrix, so there is no dense decomposition; use "
                "marginal_likelihood/predfromdata (which stream), or "
                "solver='chol'"
            )
        if self._solver == 'chol-distributed':
            # the mesh-distributed Decomposition: K enters row-sharded
            # (the constraint also makes XLA partition the assembly),
            # the factorization and every solve stay distributed — so
            # ANY model the element layer can express runs at pod
            # scale, not just raw-kernel regressions
            from ..parallel import CholDistributed
            return CholDistributed(K, **kw)
        raise KeyError(f'unknown solver {self._solver!r}')

    @classmethod
    def decompose(cls, posdefmatrix, solver='chol', **kw):
        """Decompose a PSD matrix with the GP solver machinery
        (reference ``_compute.py:431``)."""
        if solver == 'chol':
            return Chol(jnp.asarray(posdefmatrix), **kw)
        if solver == 'chol-distributed':
            from ..parallel import CholDistributed
            return CholDistributed(jnp.asarray(posdefmatrix), **kw)
        raise KeyError(f'unknown solver {solver!r}')

    # -- streaming solver (never-materialized Gram) ----------------------------

    def _stream_kw(self):
        kw = self._solverkw
        out = dict(block=kw.get('block', 512), b1=kw.get('b1', 128))
        if 'precision' in kw:
            out['precision'] = kw['precision']
        return out

    def _stream_shard(self):
        """Row-sharding-constraint callable from the solver kwargs
        (``GP(solver='chol-stream', mesh=..., mesh_axis=...)``), or
        None single-chip.  With a mesh, the streaming factor tree
        lives row-sharded across the devices (n²/2/D floats each) and
        the Gram strips are evaluated where their rows live — the
        same model/API, scaled past one chip's HBM (SURVEY §2.8
        tensor-parallel plan; no reference analog, the reference is
        single-host)."""
        mesh = self._solverkw.get('mesh')
        if mesh is None:
            return None
        from ..parallel._dstream import _row_shard
        axis = self._solverkw.get('mesh_axis', mesh.axis_names[0])
        return _row_shard(mesh, axis)

    def _stream_model(self, inkeys, givencov):
        """Reduce the model to (profile, params, X, lenscale,
        noise_kernel, noise_total) for the streaming pipeline, or raise
        a diagnostic ValueError naming the constraint that failed."""
        from ..kernelalg import _fastgram as fg

        def bail(msg):
            raise ValueError(
                "solver='chol-stream' needs a model of the form 'one "
                "isotropic-kernel (or 1-D stationary-kernel) process "
                "+ diagonal noise' (a single addx element, kernel = "
                "isotropic or 1-D stationary constructor optionally "
                "inside scalar amp*k + c chains and + sigma2*White() "
                "sums, givencov a scalar or a per-point variance "
                f"vector): {msg}"
            )

        if len(inkeys) != 1:
            bail(f'got {len(inkeys)} data elements, need exactly 1')
        el = self._elements[inkeys[0]]
        if not isinstance(el, _Points):
            bail('the data element must come from addx')
        if el.deriv:
            bail('derivative elements are not streamable')
        proc = self._procs[el.proc]
        if not isinstance(proc, _ProcKernel):
            bail('the data process must be a plain kernel process')
        spec = getattr(proc.kernel, '_fastgram', None)
        if spec is None:
            bail('the kernel carries no fast-Gram spec (use an '
                 'isotropic constructor kernel; transformations other '
                 'than scalar mul/add and White sums drop it)')
        if spec.core is None and spec.terms is None:
            bail('the kernel has no isotropic profile (pure noise)')
        cols = fg.leaf_columns(el.x)
        if cols is None:
            bail('inputs outside the fast path (non-numeric leaves)')
        p = len(cols)
        if spec.maxdim is not None and not (
            isinstance(spec.maxdim, float) and math.isinf(spec.maxdim)
        ) and p > spec.maxdim:
            bail(f'{p} input dims exceed the kernel maxdim '
                 f'{spec.maxdim}')
        profile, params = fg.build_profile(spec)
        X = fg.transform_points(spec._replace(scale=None), cols)
        noise_kernel = spec.noise
        noise_total = noise_kernel
        if givencov is not None:
            gcov = jnp.asarray(givencov)
            if gcov.ndim == 0:
                noise_total = gcov if noise_total is None \
                    else noise_total + gcov
            elif gcov.ndim == 1:
                # heteroskedastic diagonal noise: a per-point variance
                # vector rides the factorization's diagonal the same
                # way iid eps does (vectorized through the streaming
                # kernels), with exact per-element gradients
                nel = _size(el.shape)
                if gcov.shape[0] != nel:
                    bail(f'givencov vector length {gcov.shape[0]} != '
                         f'{nel} data points')
                noise_total = gcov if noise_total is None \
                    else noise_total + gcov
            else:
                bail('givencov must be a scalar iid variance or a '
                     'per-point variance VECTOR on the streaming '
                     'solver (a full matrix would materialize n²) — '
                     "or use solver='chol'")
        return profile, params, X, spec.scale, noise_kernel, \
            noise_total

    def _stream_flat(self, given):
        if not isinstance(given, dict):
            raise TypeError('given must be a dict')
        inkeys = list(given)
        for k in inkeys:
            self._checkelkey(k, new=False)
        vals = []
        for k in inkeys:
            v = given[k]
            if isinstance(v, uncert.UArray):
                raise ValueError(
                    "solver='chol-stream' takes plain-array data + a "
                    "scalar givencov noise variance (UArray data "
                    "would materialize its n² covariance)"
                )
            vals.append(jnp.asarray(v).reshape(-1))
        return inkeys, (vals[0] if len(vals) == 1
                        else jnp.concatenate(vals))

    def _stream_nll(self, given, givencov):
        """-log marginal likelihood through the streaming pipeline with
        the EXACT gradient custom VJP (the fit objective at sizes whose
        dense Gram cannot exist)."""
        from ..linalg import chol_nll_stream_grad

        inkeys, y = self._stream_flat(given)
        profile, params, X, lenscale, _, noise = \
            self._stream_model(inkeys, givencov)
        if self._checks['finite']:
            def check():
                assert jnp.all(jnp.isfinite(y)), 'non-finite data'
            _jaxutil.skipifabstract(check)
        kw = self._stream_kw()
        kw['gradblock'] = self._solverkw.get('gradblock')
        mesh = self._solverkw.get('mesh')
        if mesh is not None:
            # mesh-distributed streaming through the SAME surface: the
            # row-sharded factorization + exact strip-sharded gradient
            from ..parallel import stream_nll_distributed_grad
            return stream_nll_distributed_grad(
                profile, X, y, params=params, lenscale=lenscale,
                epsabs=0.0 if noise is None else noise, mesh=mesh,
                axis=self._solverkw.get('mesh_axis',
                                        mesh.axis_names[0]),
                block=kw['block'], b1=kw['b1'],
                gradblock=kw['gradblock'],
                precision=kw.get('precision', 'high'))
        return chol_nll_stream_grad(
            profile, X, y, params=params, lenscale=lenscale,
            epsabs=0.0 if noise is None else noise, exact=True, **kw)

    def _stream_pred(self, given, key, givencov, *, fromdata, raw,
                     keepcorr):
        from ..linalg import chol_pred_stream

        if fromdata is not True:
            raise ValueError(
                "solver='chol-stream' supports predfromdata only "
                "(fromfit's A' ycov A correction needs the dense "
                "posterior operator)"
            )
        if keepcorr:
            raise ValueError(
                "keepcorr=True joint priors would materialize n²; use "
                "keepcorr=False on the streaming solver"
            )
        single = key is not None and not isinstance(key, (list, tuple))
        if key is None:
            outkeys = [k for k in self._elements if k not in given]
        elif single:
            outkeys = [key]
        else:
            outkeys = list(key)
        inkeys, y = self._stream_flat(given)
        profile, params, X, lenscale, noise_kernel, noise = \
            self._stream_model(inkeys, givencov)
        from ..kernelalg import _fastgram as fg
        proc = self._elements[inkeys[0]].proc
        spec = getattr(self._procs[proc].kernel, '_fastgram')
        cols = []
        shapes = []
        for k in outkeys:
            self._checkelkey(k, new=False)
            el = self._elements[k]
            if not isinstance(el, _Points) or el.deriv \
                    or el.proc != proc:
                raise ValueError(
                    "streaming pred outputs must be plain addx points "
                    "of the SAME process as the data"
                )
            ck = fg.leaf_columns(el.x)
            if ck is None:
                raise ValueError('output inputs outside the fast path')
            cols.append(ck)
            shapes.append(el.shape)
        Xs = jnp.concatenate(
            [fg.transform_points(spec._replace(scale=None), ck)
             for ck in cols], axis=0)
        if lenscale is not None:
            X = X / lenscale
            Xs = Xs / lenscale
        kw = self._stream_kw()
        mean, cov = chol_pred_stream(
            profile, X, y, Xs, params=params,
            epsabs=0.0 if noise is None else noise, return_cov=True,
            shard=self._stream_shard(), **kw)
        if noise_kernel is not None:
            # the process kernel's White component contributes to the
            # OUTPUT prior variance too (same semantics as the dense
            # GP: K(x*, x*) has the δ on its diagonal)
            cov = cov + noise_kernel \
                * jnp.eye(cov.shape[0], dtype=cov.dtype)
        if raw:
            if single:
                return mean.reshape(shapes[0]), cov
            means = {}
            i = 0
            for k, sh in zip(outkeys, shapes):
                m = _size(sh)
                means[k] = mean[i:i + m].reshape(sh)
                i += m
            covs = {}
            offs = numpy.cumsum(
                [0] + [_size(sh) for sh in shapes]).tolist()
            for i, k1 in enumerate(outkeys):
                for j, k2 in enumerate(outkeys):
                    covs[k1, k2] = cov[
                        offs[i]:offs[i + 1], offs[j]:offs[j + 1]
                    ].reshape(shapes[i] + shapes[j])
            return means, covs
        u = uncert.from_cov(mean, cov)
        out = {}
        i = 0
        for k, sh in zip(outkeys, shapes):
            m = _size(sh)
            out[k] = u[i:i + m].reshape(sh)
            i += m
        return out[outkeys[0]] if single else out

    # -- data flattening ---------------------------------------------------------

    def _flatgiven(self, given, givencov=None):
        """Flatten a dict key->data into (inkeys, ymean, ycov, yuarr)."""
        if not isinstance(given, dict):
            raise TypeError('given must be a dict')
        inkeys = list(given)
        means = []
        uarrs = []
        any_u = False
        for k in inkeys:
            self._checkelkey(k, new=False)
            v = given[k]
            shape = self._elements[k].shape
            if isinstance(v, uncert.UArray):
                any_u = True
                uarrs.append(v.reshape(-1))
                means.append(v.mean.reshape(-1))
            else:
                v = jnp.asarray(v)
                if tuple(v.shape) != shape:
                    raise ValueError(
                        f'data for key {k!r} has shape {tuple(v.shape)}, '
                        f'element has shape {shape}'
                    )
                uarrs.append(None)
                means.append(v.reshape(-1))
        ymean = jnp.concatenate(means) if means else jnp.zeros(0)
        if self._checks['finite']:
            def check():
                assert jnp.all(jnp.isfinite(ymean)), 'non-finite data'
            _jaxutil.skipifabstract(check)

        n = ymean.size
        ycov = None
        yu = None
        if givencov is not None:
            if isinstance(givencov, dict):
                blocks = []
                sizes = [m.size for m in means]
                offs = numpy.cumsum([0] + sizes)
                ycov = jnp.zeros((n, n))
                for (k1, k2), blk in givencov.items():
                    i, j = inkeys.index(k1), inkeys.index(k2)
                    blk = jnp.asarray(blk).reshape(sizes[i], sizes[j])
                    ycov = ycov.at[offs[i]:offs[i+1], offs[j]:offs[j+1]].set(blk)
                    if k1 != k2:
                        ycov = ycov.at[offs[j]:offs[j+1], offs[i]:offs[i+1]] \
                            .set(blk.T)
            else:
                ycov = jnp.asarray(givencov).reshape(n, n)
        elif any_u:
            # assemble the UArray data into one joint vector
            parts = [
                u if u is not None else uncert.UArray(m)
                for u, m in zip(uarrs, means)
            ]
            yu = uncert.uconcatenate(parts)
            ycov = yu.cov()
        return inkeys, ymean, ycov, yu

    # -- prior ---------------------------------------------------------------

    def prior(self, key=None, *, raw=False):
        """Prior distribution of the elements (mean zero), correlated
        across keys (reference ``_elements.py:758``)."""
        if key is None:
            keys = list(self._elements)
        elif isinstance(key, (list, tuple)):
            keys = list(key)
        else:
            keys = [key]
        for k in keys:
            self._checkelkey(k, new=False)
        K = self._assemble(keys, keys)
        self._checkpos(K)
        single = key is not None and not isinstance(key, (list, tuple))
        if raw:
            return K if single else self._unflatten_cov(K, keys)
        n = K.shape[0]
        u = uncert.from_cov(jnp.zeros(n), K)
        out = self._split_uarray(u, keys)
        return out[key] if single else out

    def _split_uarray(self, u, keys):
        out = {}
        i = 0
        for k in keys:
            shape = self._elements[k].shape
            m = _size(shape)
            out[k] = u[i:i + m].reshape(shape)
            i += m
        return out

    def _unflatten_cov(self, K, keys):
        out = {}
        offs = [0]
        for k in keys:
            offs.append(offs[-1] + _size(self._elements[k].shape))
        for i, k1 in enumerate(keys):
            for j, k2 in enumerate(keys):
                blk = K[offs[i]:offs[i+1], offs[j]:offs[j+1]]
                out[k1, k2] = blk.reshape(
                    self._elements[k1].shape + self._elements[k2].shape
                )
        return out

    # -- posterior -----------------------------------------------------------

    def pred(self, given, key=None, givencov=None, *, fromdata=None,
             raw=False, keepcorr=None):
        """Posterior distribution on elements ``key`` given data
        (reference ``_compute.py:138``).

        ``fromdata=True``: data = process + independent noise whose
        covariance is ``givencov`` (or the data UArray covariance).
        ``fromdata=False`` ('fromfit'): data is an estimate of the process
        itself with uncertainty ``givencov``.
        """
        if fromdata is None:
            raise ValueError('specify fromdata=True/False, or use '
                             'predfromdata/predfromfit')
        if self._solver == 'chol-stream':
            return self._stream_pred(given, key, givencov,
                                     fromdata=fromdata, raw=raw,
                                     keepcorr=keepcorr)
        single = key is not None and not isinstance(key, (list, tuple))
        if key is None:
            outkeys = [k for k in self._elements if k not in given]
        elif single:
            outkeys = [key]
        else:
            outkeys = list(key)
        for k in outkeys:
            self._checkelkey(k, new=False)

        inkeys, ymean, ycov, yu = self._flatgiven(given, givencov)
        if keepcorr is None:
            keepcorr = yu is not None and not raw
        if keepcorr and yu is None:
            yu = uncert.UArray(ymean)

        solver = self._solver_for(
            inkeys, extracov=ycov if fromdata else None
        )
        Kxxs = self._assemble(inkeys, outkeys)
        Kxsxs = self._assemble(outkeys, outkeys)

        A = solver.ginv_linear(Kxxs)          # (n, ns)
        mean = A.T @ ymean
        cov_post = Kxsxs - solver.ginv_quad(Kxxs)
        if not fromdata and ycov is not None:
            extra = A.T @ ycov @ A
        else:
            extra = None

        if raw:
            cov = cov_post if extra is None else cov_post + extra
            if single:
                return mean.reshape(self._elements[outkeys[0]].shape), cov
            means = self._split_plain(mean, outkeys)
            covs = self._unflatten_cov(cov, outkeys)
            return means, covs

        if keepcorr:
            # exact joint representation (reference ``_compute.py:271-284``):
            # posterior = prior_out + A'(data - prior_in), with prior_in/out
            # drawn jointly from the GP prior so posterior marginals equal
            # the standard formula and cross-covariance with the data is
            # preserved
            allkeys = list(inkeys)
            for k in outkeys:
                if k not in allkeys:
                    allkeys.append(k)
            Kall = self._assemble(allkeys, allkeys)
            up = uncert.from_cov(jnp.zeros(Kall.shape[0]), Kall)
            parts = self._split_uarray(up, allkeys)
            yp = uncert.uconcatenate(
                [parts[k].reshape(-1) for k in inkeys]
            )
            ysp = uncert.uconcatenate(
                [parts[k].reshape(-1) for k in outkeys]
            )
            u = ysp + (A.T @ (yu - yp))
        else:
            cov = cov_post if extra is None else cov_post + extra
            u = uncert.from_cov(mean, cov)
        out = self._split_uarray(u, outkeys)
        if single:
            return out[outkeys[0]]
        return out

    def _split_plain(self, v, keys):
        out = {}
        i = 0
        for k in keys:
            shape = self._elements[k].shape
            m = _size(shape)
            out[k] = v[i:i + m].reshape(shape)
            i += m
        return out

    def predfromdata(self, given, key=None, givencov=None, **kw):
        """Posterior given noisy data (reference ``_compute.py:330``)."""
        return self.pred(given, key, givencov, fromdata=True, **kw)

    def predfromfit(self, given, key=None, givencov=None, **kw):
        """Posterior given a fit result (reference ``_compute.py:330``)."""
        return self.pred(given, key, givencov, fromdata=False, **kw)

    # -- likelihood -----------------------------------------------------------

    def marginal_likelihood(self, given, givencov=None):
        """Log marginal likelihood of the data under the prior
        (reference ``_compute.py:383``)."""
        return -self._prior_nll(given, givencov)

    def _prior_nll_parts(self, given, givencov=None, **decompkw):
        """(K, residuals, choleskykw) for the fused NLL when the model
        is eligible (plain 'chol' solver, no user-supplied addcov
        decompositions), else None.  Split out so the fit driver can
        insert phase-timing marks between assembly and factorization."""
        inkeys, ymean, ycov, _ = self._flatgiven(given, givencov)
        if (
            self._solver != 'chol'
            or any(k in self._user_decomps for k in inkeys)
        ):
            return None
        K = self._assemble(inkeys, inkeys)
        if ycov is not None:
            K = K + ycov
        else:
            self._checkpos(K)
        kw = {**self._solverkw, **decompkw}
        dfg = self._df_gram_maker(inkeys, ycov)
        if dfg is not None:
            kw['df_gram'] = dfg
        return K, ymean, kw

    def _prior_nll(self, given, givencov=None, **decompkw):
        """-log marginal density of the data; the fit objective.

        On the plain 'chol' solver this routes through
        :func:`linalg.chol_nll`, whose hand-derived reverse rule makes
        ``jax.grad`` cost ~4x the forward pass instead of AD-through-
        the-factorization's ~10-16x (reference gradrev counterpart:
        ``_linalg/_decomp.py:441-586``).  On 'chol-stream' it goes
        through the never-materialized-Gram pipeline with the exact
        streaming gradient."""
        if self._solver == 'chol-stream':
            return self._stream_nll(given, givencov)
        parts = self._prior_nll_parts(given, givencov, **decompkw)
        if parts is not None:
            K, ymean, kw = parts
            return linalg.chol_nll(K, ymean, **kw)
        inkeys, ymean, ycov, _ = self._flatgiven(given, givencov)
        solver = self._solver_for(inkeys, extracov=ycov, **decompkw)
        return solver.minus_log_normal_density(ymean)

    def _prior_decomp(self, given, givencov=None, **decompkw):
        """(decomposition of the data covariance, residuals); used by the
        fit driver (reference ``_compute.py:336``).  ``decompkw`` (e.g.
        epsrel/epsabs) overrides the GP-level solver options."""
        inkeys, ymean, ycov, _ = self._flatgiven(given, givencov)
        solver = self._solver_for(inkeys, extracov=ycov, **decompkw)
        return solver, ymean

    def _prior_kr(self, given, givencov=None):
        """(data covariance matrix, residuals) WITHOUT decomposing.

        Used by the fit driver's Fisher-vector products, where
        derivatives of K(p) must not flow through a Cholesky
        (reference ``_fit.py:604-643`` ``make_decomp`` analog)."""
        if self._solver == 'chol-stream':
            raise RuntimeError(
                "method/covariance='fisher' assemble the dense (K, r) "
                "and are unavailable with solver='chol-stream'; use "
                "covariance='minhess' or 'hess'"
            )
        inkeys, ymean, ycov, _ = self._flatgiven(given, givencov)
        K = self._assemble(inkeys, inkeys)
        if ycov is not None:
            K = K + ycov
        return K, ymean


def _iskernel_scalar(c):
    from ..kernelalg import _util
    return _util.is_numerical_scalar(c)
