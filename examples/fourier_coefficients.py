"""Constraining Fourier series coefficients of a periodic process: the
Zeta kernel's 'fourier' linop family gives direct access to the
coefficient variables (the reference's examples/fourier.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    x = np.linspace(0, 1, 80)
    gp = lgp.GP(lgp.Zeta(nu=2.5))
    gp = gp.deflinop('F', 'fourier', True, lgp.DefaultProcess)
    gp = gp.addx(x, 'x')
    gp = gp.addx(1, 's1', proc='F')   # coefficient of sin(2 pi x)
    gp = gp.addx(2, 'c1', proc='F')   # coefficient of cos(2 pi x)

    # pin the first sine coefficient to 1 and the first cosine to 0
    u = gp.predfromdata({'s1': 1.0, 'c1': 0.0}, 'x')
    mean = np.asarray(u.mean)

    # the posterior mean must contain exactly the pinned sin component
    s_proj = 2 * np.trapezoid(mean * np.sin(2 * np.pi * x), x)
    c_proj = 2 * np.trapezoid(mean * np.cos(2 * np.pi * x), x)
    print(f'sin1 projection: {s_proj:.3f}, cos1 projection: {c_proj:.3f}')
    assert abs(s_proj - 1.0) < 0.05
    assert abs(c_proj) < 0.05
    # the constrained coefficients have (almost) no posterior variance
    us = gp.predfromdata({'s1': 1.0, 'c1': 0.0}, 's1')
    assert float(us.sdev) < 1e-3
    return u


if __name__ == '__main__':
    main()
