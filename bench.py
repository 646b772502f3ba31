"""Headline benchmark: GP marginal-likelihood pipeline (Gram assembly +
regularized Cholesky + solve) throughput.

Metric (per BASELINE.json): Cholesky+solve TFLOP/s at large N.

- main measurement: this framework on the default backend (TPU, fp32)
  at N=16384;
- baseline: the reference-equivalent pipeline — lsqfitgp is a pure
  jax-CPU/float64 library, so the baseline is the same computation run
  on CPU in float64 (measured in a subprocess at N=4096 and scaled by
  the n³ work ratio, since CPU f64 Cholesky throughput is essentially
  size-independent at these sizes).

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import subprocess
import sys
import time


def _enable_compile_cache():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache')
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def pipeline_flops(n, nrhs=1):
    # cholesky n^3/3 + triangular solves 2 n^2 nrhs + logdet n
    return n ** 3 / 3 + 2 * n ** 2 * nrhs


def run_pipeline(n, dtype, repeats=2, inner=8):
    """Time the Gram assembly and the Cholesky+solve density separately.

    Each measured quantity runs chained iterations inside one jitted
    ``lax.scan`` (inputs perturbed per step so nothing folds away), then
    materializes one scalar on the host.  The per-iteration time is the
    *difference* between an ``inner``- and a ``4``-iteration loop divided
    by ``inner - 4``, which cancels the per-call remote-tunnel sync
    latency (~28 ms measured) exactly instead of merely amortizing it.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy
    from lsqfitgp_tpu.linalg import Chol
    import lsqfitgp_tpu as lgp

    x = jnp.linspace(-10, 10, n, dtype=dtype)
    rng = numpy.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(n), dtype)
    k = lgp.ExpQuad(scale=2.0)

    def gram(x):
        K = k.core(x[:, None], x[None, :])
        return K + jnp.asarray(0.01, dtype) * jnp.eye(n, dtype=dtype)

    def chol_solve(K, y):
        return Chol(K).minus_log_normal_density(y)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def gram_loop(x, length):
        def body(c, _):
            K = gram(x + c * jnp.asarray(1e-20, dtype))
            return jnp.sum(K[:1, :1]) * jnp.asarray(1e-30, dtype), None
        c, _ = lax.scan(body, jnp.asarray(0, dtype), None, length=length)
        return c

    K0 = jax.jit(gram)(x)

    @functools.partial(jax.jit, static_argnums=2)
    def chol_loop(K, y, length):
        def body(c, _):
            v = chol_solve(K + c * jnp.asarray(1e-30, dtype), y)
            return v * jnp.asarray(1e-30, dtype), None
        c, _ = lax.scan(body, jnp.asarray(0, dtype), None, length=length)
        return c

    base = 4
    t0 = time.perf_counter()
    float(gram_loop(x, inner)); float(gram_loop(x, base))
    _log(f'[bench] gram compile n={n}: {time.perf_counter()-t0:.1f}s')
    t0 = time.perf_counter()
    out = float(chol_loop(K0, y, inner)); float(chol_loop(K0, y, base))
    _log(f'[bench] chol compile n={n}: {time.perf_counter()-t0:.1f}s')
    assert numpy.isfinite(out)

    def per_iter(loop, *args):
        tb = min(_timed(lambda: float(loop(*args, base)))
                 for _ in range(repeats))
        ti = min(_timed(lambda: float(loop(*args, inner)))
                 for _ in range(repeats))
        return max(ti - tb, 1e-9) / (inner - base)

    t_gram = per_iter(gram_loop, x)
    t_chol = per_iter(chol_loop, K0, y)
    return t_gram, t_chol


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def baseline_worker(n):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    _enable_compile_cache()
    import jax.numpy as jnp
    _, t_chol = run_pipeline(n, jnp.float64, repeats=2)
    print(json.dumps({'t_chol': t_chol, 'n': n}))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--baseline-worker':
        baseline_worker(int(sys.argv[2]))
        return

    import jax
    import jax.numpy as jnp
    _enable_compile_cache()

    # note: XLA-TPU Cholesky *compile* time grows with n (~65 s at 8k);
    # runtime is milliseconds. 8192 keeps the whole bench under ~3 min
    # cold; the persistent compile cache makes later runs fast.
    n = 8192
    backend = jax.default_backend()
    if backend == 'cpu':
        n = 4096  # CI/dev fallback
    t_gram, t_chol = run_pipeline(n, jnp.float32, inner=16)
    tflops = pipeline_flops(n) / t_chol / 1e12

    # reference-equivalent CPU/f64 baseline
    nb = 4096
    try:
        out = subprocess.run(
            [sys.executable, __file__, '--baseline-worker', str(nb)],
            capture_output=True, text=True, timeout=900, check=True,
        )
        base = json.loads(out.stdout.strip().splitlines()[-1])
        base_tflops = pipeline_flops(nb) / base['t_chol'] / 1e12
        vs = tflops / base_tflops
    except Exception:
        vs = float('nan')

    print(json.dumps({
        'metric': f'gp_cholesky_solve_tflops_n{n}_{backend}',
        'value': round(tflops, 4),
        'unit': 'TFLOP/s',
        'vs_baseline': round(vs, 2) if vs == vs else None,
    }))


if __name__ == '__main__':
    main()
