"""Nonstationary regression with the Gibbs kernel: a pointwise-varying
length scale adapts to a function that wiggles fast on the left and is
smooth on the right (a scenario no stationary kernel fits well)."""

import numpy as np
from jax import numpy as jnp

import lsqfitgp_tpu as lgp


def truth(x):
    # chirp: fast oscillation for x < 0, slow for x > 0
    return np.sin(2 * np.pi * np.where(x < 0, 3.0, 0.5) * x)


def main():
    rng = np.random.default_rng(2)
    n = 120
    x = np.sort(rng.uniform(-2, 2, n))
    y = truth(x) + 0.05 * rng.standard_normal(n)

    # scalefun: short correlation length on the left, long on the right
    def scalefun(t):
        return 0.12 + 0.5 * (jnp.tanh(2 * t) + 1.0) / 2

    gp = lgp.GP(lgp.Gibbs(scalefun=scalefun))
    xs = np.linspace(-1.9, 1.9, 60)
    gp = gp.addx(x, 'data').addx(xs, 'out')
    post = gp.predfromdata({'data': y}, 'out', 0.05 ** 2 * np.eye(n))

    rmse = np.sqrt(np.mean((np.asarray(post.mean) - truth(xs)) ** 2))
    print(f'nonstationary rmse: {rmse:.3f}')
    assert rmse < 0.25

    # a stationary kernel with ONE scale cannot do both regimes: the
    # best compromise is visibly worse on this grid
    gp2 = lgp.GP(lgp.ExpQuad(scale=0.5)).addx(x, 'data').addx(xs, 'out')
    post2 = gp2.predfromdata({'data': y}, 'out', 0.05 ** 2 * np.eye(n))
    rmse2 = np.sqrt(np.mean((np.asarray(post2.mean) - truth(xs)) ** 2))
    print(f'stationary-compromise rmse: {rmse2:.3f}')
    assert rmse < rmse2


if __name__ == '__main__':
    main()
