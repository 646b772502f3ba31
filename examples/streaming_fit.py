"""Hyperparameter fitting past the HBM wall, through the PUBLIC API:
``GP(solver='chol-stream')`` streams the Gram matrix inside the
factorization (it never exists in memory) and its marginal likelihood
carries the EXACT hand-derived gradient, so the standard
``empbayes_fit`` gradient driver runs unchanged at sizes where the
dense Gram would not exist (n = 65536 on a 16 GB chip).

This example runs the exact same pipeline at a CI-friendly size and
checks it recovers the hyperparameters of synthetic data, then
predicts through ``predfromdata`` (also streaming).
"""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(7)
    n = 768                       # 65536 on a real chip, same code
    x = jnp.asarray(np.linspace(0, 40, n), jnp.float32)

    # synthetic data: scale 2, amplitude 1.5, noise 0.1
    d2 = (np.asarray(x)[:, None] - np.asarray(x)[None, :]) ** 2
    K = 1.5 * np.exp(-0.5 * d2 / 4.0) + 0.01 * np.eye(n)
    y = jnp.asarray(np.linalg.cholesky(K) @ rng.standard_normal(n),
                    jnp.float32)

    # the universal observation model amp * iso(scale) + noise * White
    # — expressed entirely in the kernel, so the ordinary gpfactory /
    # data plumbing of empbayes_fit applies with no custom_nll
    def gpfactory(hp):
        kernel = hp['amp'] * lgp.ExpQuad(scale=hp['scale']) \
            + hp['noise'] * lgp.White()
        return lgp.GP(kernel, solver='chol-stream', block=128) \
            .addx(x, 'data')

    fit = lgp.empbayes_fit(
        {'log(scale)': (0.0, 1.0), 'log(amp)': (0.0, 1.0),
         'log(noise)': (np.log(0.01), 1.0)},
        gpfactory, {'data': y},
        raises=False,
    )
    scale = float(fit.pmean['scale'])
    amp = float(fit.pmean['amp'])
    noise = float(fit.pmean['noise'])
    print(f'streaming exact-gradient fit: scale {scale:.2f} (true '
          f'2.0), amp {amp:.2f} (true 1.5), noise {noise:.4f} '
          f'(true 0.01)')
    assert 1.4 < scale < 2.8
    assert 0.7 < amp < 3.0
    assert 0.003 < noise < 0.03

    # streaming posterior at new points through the standard surface
    xstar = jnp.asarray(np.linspace(0, 40, 50), jnp.float32)
    gp = fit.gp().addx(xstar, 'star')
    post = gp.predfromdata({'data': y}, 'star')
    assert np.all(np.isfinite(np.asarray(post.mean)))
    assert np.all(np.asarray(post.sdev) >= 0)
    print('posterior mean range:',
          float(post.mean.min()), float(post.mean.max()))


if __name__ == '__main__':
    main()
