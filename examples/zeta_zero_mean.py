"""Zeta-kernel samples have exactly zero mean over the period: the
kernel's Fourier series has no constant term, so every draw integrates
to zero — a structural constraint carried by the prior itself (the
reference's examples/y.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    # dense grid over one period
    n = 256
    x = (np.arange(n) + 0.5) / n

    gp = lgp.GP(lgp.Zeta(nu=1.5), checkpos=False).addx(x, 'x')
    cov = gp.prior('x', raw=True)

    means = []
    for i, s in zip(range(8), lgp.raniter(np.zeros(n), np.asarray(cov),
                                          rng=np.random.default_rng(0))):
        means.append(float(np.mean(s)))
    means = np.array(means)
    print('sample means over one period:', np.round(means, 4))
    # each draw has (quadrature-level) zero mean
    assert np.all(np.abs(means) < 1e-2)

    # contrast: ExpQuad samples have O(1) mean freedom
    gp2 = lgp.GP(lgp.ExpQuad(scale=0.3)).addx(x, 'x')
    cov2 = gp2.prior('x', raw=True)
    m2 = [float(np.mean(s)) for _, s in zip(
        range(8), lgp.raniter(np.zeros(n), np.asarray(cov2),
                              rng=np.random.default_rng(0)))]
    print('ExpQuad sample means:', np.round(m2, 3))
    assert np.std(m2) > 0.1

    # the zero-mean property as inference: observing the mean functional
    # of a Zeta process yields a zero with no uncertainty
    gpm = lgp.GP(lgp.Zeta(nu=1.5), checkpos=False).addx(x, 'x')
    gpm = gpm.addlintransf(lambda f: f.mean(), ['x'], 'mean',
                           checklin=False)
    um = gpm.prior('mean')
    print(f'prior of the mean functional: {um}')
    assert abs(float(um.mean)) < 1e-6 and float(um.sdev) < 1e-3
    return means


if __name__ == '__main__':
    main()
