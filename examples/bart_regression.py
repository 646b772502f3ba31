"""Turnkey BART regression (the reference's bayestree examples)."""

import numpy as np

from lsqfitgp_tpu.models import bart


def main():
    rng = np.random.default_rng(0)
    n = 60
    x = rng.uniform(0, 1, (n, 3))
    f = np.sin(2 * np.pi * x[:, 0]) + 2 * x[:, 1] * x[:, 2]
    y = f + 0.1 * rng.standard_normal(n)

    m = bart(x, y)
    print(m)
    u = m.pred()
    rmse = np.sqrt(np.mean((np.asarray(u.mean) - f) ** 2))
    print(f'in-sample rmse vs truth: {rmse:.3f} (noise 0.1)')
    return m


if __name__ == '__main__':
    main()
