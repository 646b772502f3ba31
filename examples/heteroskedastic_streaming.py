"""Weighted (heteroskedastic) regression at streaming scale: per-point
noise variances ride the never-materialized-Gram factorization's
diagonal as a VECTOR ``givencov``, with exact per-element gradients —
so the classic "known relative weights, unknown noise scale" model
fits through the standard ``empbayes_fit`` driver on
``GP(solver='chol-stream')``.

Model: y_i = f(x_i) + e_i,  e_i ~ N(0, sigma2 * w_i) with known
weights w_i (here measurement exposure growing along x) and fitted
overall scale sigma2.  Reference-framework counterpart: a diagonal
``givencov`` matrix on the dense solver (``_GP/_compute.py:138``);
here the diagonal never becomes a matrix.
"""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(11)
    n = 600                        # 65536 on a real chip, same code
    x = jnp.asarray(np.linspace(0, 30, n), jnp.float32)
    w = jnp.asarray(1.0 + np.linspace(0, 3, n), jnp.float32)  # known

    # synthetic data: smooth signal + noise growing with w
    true_sigma2 = 0.02
    f = np.sin(np.asarray(x)) * np.exp(-np.asarray(x) / 20)
    y = jnp.asarray(
        f + rng.standard_normal(n) * np.sqrt(true_sigma2 * np.asarray(w)),
        jnp.float32)

    def gpfactory(hp):
        kernel = hp['amp'] * lgp.ExpQuad(scale=hp['scale'])
        return lgp.GP(kernel, solver='chol-stream', block=128) \
            .addx(x, 'data')

    # data as a callable so the noise VECTOR depends on sigma2: the
    # exact streaming gradient differentiates through every element
    def data(hp):
        return {'data': y}, hp['sigma2'] * w

    fit = lgp.empbayes_fit(
        {'log(scale)': (0.5, 1.0), 'log(amp)': (0.0, 1.0),
         'log(sigma2)': (np.log(0.02), 1.5)},
        gpfactory, data, raises=False,
    )
    sigma2 = float(fit.pmean['sigma2'])
    scale = float(fit.pmean['scale'])
    print(f'heteroskedastic streaming fit: sigma2 {sigma2:.4f} '
          f'(true {true_sigma2}), scale {scale:.2f}')
    assert 0.3 * true_sigma2 < sigma2 < 3 * true_sigma2
    assert 0.5 < scale < 8.0

    # posterior with the fitted per-point noise, still streaming
    hp = fit.pmean
    gp = gpfactory(hp).addx(
        jnp.asarray(np.linspace(0, 30, 40), jnp.float32), 'star')
    post = gp.predfromdata({'data': y}, 'star',
                           jnp.asarray(hp['sigma2'], jnp.float32) * w)
    assert np.all(np.isfinite(np.asarray(post.mean)))
    # noisier (high-w) region ⇒ wider posterior: compare band means
    sd = np.asarray(post.sdev)
    assert sd[-10:].mean() > sd[:10].mean()


if __name__ == '__main__':
    main()
