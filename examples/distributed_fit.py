"""Multi-device marginal-likelihood fit: the Gram assembly, blocked
Cholesky, solve, and log-determinant all distributed over a device mesh
(one fused shard_map; block-cyclic row layout).

Runs on an 8-virtual-device CPU mesh so it works anywhere; on real
hardware the same code spans the TPU slice.
"""

import os

# 8 virtual CPU devices BEFORE jax initializes (ignored if already set)
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax

# this demo targets the virtual CPU mesh: single-chip TPU has no mesh
# to distribute over, and the un-regularized panel factorization needs
# f64 for this conditioning (on a real multi-chip slice, use a larger
# nugget or the adaptive linalg.Chol path)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu.parallel import sharded_nll_distributed


def main():
    rng = np.random.default_rng(0)
    n = 512
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, n)))
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.1 * rng.standard_normal(n))

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ('r',))
    print(f'mesh: {len(devs)} x {devs[0].platform} devices')

    # the full MAP machinery (whitened hyperprior, scipy driver,
    # Laplace covariance) against the distributed objective
    def nll(hp):
        k = lgp.ExpQuad(scale=hp['scale'])
        return sharded_nll_distributed(
            k.core, x, y, 0.01, mesh=mesh, block=32)

    fit = lgp.empbayes_fit({'log(scale)': (0.0, 1.0)}, custom_nll=nll,
                           raises=False)
    print(f"fitted scale: {fit.p['scale'].mean:.3f} "
          f"+- {fit.p['scale'].sdev:.3f}")
    assert 0.2 < float(fit.p['scale'].mean) < 5.0

    # distributed posterior at new points
    from lsqfitgp_tpu.parallel import sharded_posterior
    xs = jnp.linspace(-4, 4, 64)
    k = lgp.ExpQuad(scale=float(fit.p['scale'].mean))
    mean, var = sharded_posterior(k.core, x, y, xs, 0.01, mesh=mesh,
                                  block=32)
    print(f'posterior mean range: [{float(mean.min()):.2f}, '
          f'{float(mean.max()):.2f}], min var {float(var.min()):.4f}')
    assert float(var.min()) > -1e-9

    # the same fit through the PUBLIC streaming surface — no custom
    # objective: GP(solver='chol-stream', mesh=...) row-shards the
    # never-materialized-Gram factorization and its exact gradient
    # across the mesh, and empbayes_fit drives it like any other GP
    # (covariance from the sharded streamed Fisher)
    def gpfactory(hp):
        return (lgp.GP(hp['amp'] * lgp.ExpQuad(scale=1.5),
                       solver='chol-stream', mesh=mesh, block=64,
                       checkpos=False)
                .addx(x, 'd'))

    sfit = lgp.empbayes_fit({'log(amp)': (0.0, 1.0)}, gpfactory,
                            ({'d': y}, 0.01), covariance='fisher',
                            raises=False)
    print(f"streaming-fit amp: {sfit.p['amp'].mean:.3f} "
          f"+- {sfit.p['amp'].sdev:.3f}")
    post = gpfactory({'amp': float(sfit.p['amp'].mean)}) \
        .addx(xs, 's').predfromdata({'d': y}, 's', 0.01)
    print(f'streaming posterior mean range: '
          f'[{float(np.min(post.mean)):.2f}, '
          f'{float(np.max(post.mean)):.2f}]')


if __name__ == '__main__':
    main()
