"""Inference in the DFT domain: discrete Fourier sums of the process
grid are finite linear functionals (addlintransf), so we can condition
directly on a few spectral amplitudes and read the signal back in the
time domain (the reference's examples/dft.py theme, re-derived)."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    n = 64
    x = np.arange(n) / n

    gp = lgp.GP(lgp.Zeta(nu=2.0), checkpos=False)
    gp = gp.addx(x, 'grid')

    # real DFT functionals at harmonic k: C_k = (2/n) sum f(x_j) cos(2 pi k x_j)
    def proj(k, trig):
        w = jnp.asarray(2 / n * trig(2 * np.pi * k * x))
        return lambda f: w @ f

    for k in (1, 2, 3):
        gp = gp.addlintransf(proj(k, np.cos), ['grid'], f'c{k}',
                             checklin=False)
        gp = gp.addlintransf(proj(k, np.sin), ['grid'], f's{k}',
                             checklin=False)

    # pin the spectrum: pure second harmonic in sine
    given = {'c1': 0.0, 's1': 0.0, 'c2': 0.0, 's2': 1.0,
             'c3': 0.0, 's3': 0.0}
    u = gp.predfromdata(given, 'grid')
    mean = np.asarray(u.mean)

    want = np.sin(4 * np.pi * x)
    # projections onto the pinned harmonics are exact; remaining
    # harmonics shrink to zero, so the mean IS the second harmonic
    rmse = float(np.sqrt(np.mean((mean - want) ** 2)))
    print(f'rmse vs pure 2nd harmonic: {rmse:.4f}')
    assert rmse < 0.05

    # posterior of a pinned functional is deterministic
    uc = gp.predfromdata(given, 's2')
    assert float(uc.sdev) < 1e-3
    return u


if __name__ == '__main__':
    main()
