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

    def nll(log_scale):
        k = lgp.ExpQuad(scale=jnp.exp(log_scale))
        return sharded_nll_distributed(
            k.core, x, y, 0.01, mesh=mesh, block=32) / n

    vg = jax.jit(jax.value_and_grad(nll))

    # gradient descent (clipped) on the single hyperparameter
    w = jnp.asarray(0.0)
    for i in range(40):
        v, g = vg(w)
        w = w - 0.2 * jnp.clip(g, -1.0, 1.0)
        if i % 10 == 0:
            print(f'iter {i:3d}: nll/n = {float(v):8.4f},  '
                  f'scale = {float(jnp.exp(w)):.3f}')
    print(f'fitted scale: {float(jnp.exp(w)):.3f}')
    assert 0.2 < float(jnp.exp(w)) < 5.0


if __name__ == '__main__':
    main()
