"""Model comparison by marginal likelihood: the evidence prefers the
kernel family that generated the data."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def logml(kernel, x, y, noise):
    gp = lgp.GP(kernel).addx(x, 'data')
    return float(gp.marginal_likelihood(
        {'data': y}, givencov=noise ** 2 * np.eye(len(x))))


def main():
    rng = np.random.default_rng(3)
    n = 60
    x = np.sort(rng.uniform(-5, 5, n))
    noise = 0.1

    # data from a smooth (infinitely differentiable) process
    k_true = lgp.ExpQuad(scale=1.5)
    K = np.asarray(k_true(x[:, None], x[None, :]), 'f8')
    # jitter sized for the dtype the kernel was EVALUATED at (the
    # entries carry f32 roundoff in the f32 lane)
    keps = float(np.finfo(
        np.asarray(k_true(x[:1], x[:1])).dtype).eps)
    y = np.linalg.cholesky(K + max(1e-8, 1e3 * n * keps) * np.eye(n)) \
        @ rng.standard_normal(n) + noise * rng.standard_normal(n)

    candidates = {
        'ExpQuad(1.5)': lgp.ExpQuad(scale=1.5),
        'Expon(1.5)': lgp.Expon(scale=1.5),
        'Matern nu=1.7': lgp.Matern(nu=1.7, scale=1.5),
        'White': lgp.White(),
    }
    scores = {name: logml(k, x, y, noise)
              for name, k in candidates.items()}
    for name, s in sorted(scores.items(), key=lambda kv: -kv[1]):
        print(f'{name:15s} log evidence {s:10.2f}')
    best = max(scores, key=scores.get)
    assert best == 'ExpQuad(1.5)', best
    print('the evidence recovers the generating kernel')


if __name__ == '__main__':
    main()
