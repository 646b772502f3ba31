"""Multi-output GP: two correlated processes built with the process
DAG (deftransf), jointly inferred — observing one output informs the
other (the reference's multi-process workflow)."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    n = 40
    x = np.sort(rng.uniform(-4, 4, n))

    # latent independent processes u, v; outputs are linear mixtures:
    #   f = u + 0.5 v,   g = u - 0.5 v
    gp = lgp.GP()
    gp = gp.defproc('u', lgp.ExpQuad(scale=2.0))
    gp = gp.defproc('v', lgp.ExpQuad(scale=0.7))
    gp = gp.deftransf('f', {'u': 1.0, 'v': 0.5})
    gp = gp.deftransf('g', {'u': 1.0, 'v': -0.5})

    gp = gp.addx(x, 'f_obs', proc='f')
    gp = gp.addx(x, 'g_pred', proc='g')

    # observe f only; predict g through the shared latent u
    y = np.sin(x) + 0.05 * rng.standard_normal(n)
    post = gp.predfromdata({'f_obs': y}, 'g_pred')

    # the posterior for g must be informed: sdev below the prior sdev
    prior_sd = np.sqrt(1.0 + 0.25)
    post_sd = np.asarray(post.sdev)
    print(f'prior sd {prior_sd:.3f}, posterior sd range '
          f'[{post_sd.min():.3f}, {post_sd.max():.3f}]')
    assert post_sd.max() < prior_sd
    assert np.all(post_sd >= -1e-9)

    # cross-covariance between outputs is Cov[f,g] = k_u - 0.25 k_v
    Kfg = np.asarray(gp._assemble(['f_obs'], ['g_pred']))
    ku = np.asarray(lgp.ExpQuad(scale=2.0)(x[:, None], x[None, :]))
    kv = np.asarray(lgp.ExpQuad(scale=0.7)(x[:, None], x[None, :]))
    np.testing.assert_allclose(Kfg, ku - 0.25 * kv, atol=1e-5)
    print('multi-output cross-covariances check out')


if __name__ == '__main__':
    main()
