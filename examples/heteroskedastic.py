"""Nonstationary models: Gibbs varying-length-scale kernel and
Rescaling variance modulation."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    n = 50
    x = np.sort(rng.uniform(-3, 3, n))

    # length scale growing with |x|: wiggly near 0, smooth far out
    scalefun = lambda t: 0.3 + 0.5 * jnp.abs(t)
    k_gibbs = lgp.Gibbs(scalefun=scalefun)
    K = np.asarray(k_gibbs(x[:, None], x[None, :]))
    feps = float(np.finfo(K.dtype).eps)   # lane-aware PSD roundoff
    assert np.linalg.eigvalsh(K).min() > -max(1e-8, 1e3 * n * feps)
    np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-6)

    # variance envelope sigma(x) = 1 + x² via Rescaling
    k_resc = lgp.Rescaling(stdfun=lambda t: 1 + t ** 2) * lgp.ExpQuad()
    K2 = np.asarray(k_resc(x[:, None], x[None, :]))
    np.testing.assert_allclose(np.diag(K2), (1 + x ** 2) ** 2, rtol=1e-5)

    # posterior under the heteroskedastic prior
    y = np.sin(3 * x) * np.exp(-np.abs(x)) + 0.05 * rng.standard_normal(n)
    gp = lgp.GP(k_gibbs).addx(x, 'data').addx(x + 0.05, 'pred')
    post = gp.predfromdata(
        {'data': y}, 'pred', givencov=0.05 ** 2 * np.eye(n))
    assert np.all(np.isfinite(np.asarray(post.mean)))
    print('Gibbs posterior sd range:',
          float(np.min(post.sdev)), float(np.max(post.sdev)))


if __name__ == '__main__':
    main()
