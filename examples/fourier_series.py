"""Inference in the Fourier-coefficient domain with the Zeta kernel
(the reference's examples/fourier.py idea)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 50, endpoint=False)
    y = (np.cos(2 * np.pi * x) + 0.5 * np.sin(4 * np.pi * x)
         + 0.05 * rng.standard_normal(x.size))

    gp = lgp.GP()
    gp = gp.defproc('f', lgp.Zeta(nu=2.0))
    gp = gp.deflinop('F', 'fourier', True, 'f')
    gp = gp.addx(x, 'data', proc='f')
    # coefficients: k=2 -> cos order 1, k=3 -> sin order 2
    gp = gp.addx(np.arange(1, 7), 'coef', proc='F')

    u = gp.predfromdata({'data': y}, 'coef', 0.05**2 * np.eye(x.size))
    mean = np.asarray(u.mean)
    print('posterior Fourier coefficients (k=1..6):')
    for k, (m, s) in enumerate(zip(mean, np.asarray(u.sdev)), start=1):
        print(f'  k={k}: {m:+.3f} ± {s:.3f}')
    # cos order 1 is k=2, sin order 2 is k=3
    assert abs(mean[1] - 1.0) < 0.1
    assert abs(mean[2] - 0.5) < 0.1
    return u


if __name__ == '__main__':
    main()
