"""Inference with derivative constraints: observe f', predict f (the
reference's examples/doubleint.py idea)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    # f(x) = sin(x): observe noisy f'(x) = cos(x), predict f
    x = np.sort(rng.uniform(-3, 3, 30))
    dy = np.cos(x) + 0.05 * rng.standard_normal(x.size)

    gp = lgp.GP(lgp.ExpQuad())
    gp = gp.addx(x, 'df', deriv=1)
    gp = gp.addx(x, 'f')
    u = gp.predfromdata({'df': dy}, 'f', 0.05**2 * np.eye(x.size))

    # f is determined up to a constant; compare after centering
    got = np.asarray(u.mean) - np.mean(np.asarray(u.mean))
    want = np.sin(x) - np.mean(np.sin(x))
    rmse = np.sqrt(np.mean((got - want) ** 2))
    print(f'integrated-prediction rmse: {rmse:.3f}')
    assert rmse < 0.2
    return u


if __name__ == '__main__':
    main()
