"""Inferring the temporal scale of a process we never observe
directly: only a second process, correlated with the FIRST process's
derivative, is measured — the scale is identified because
differentiation amplifies short scales (the reference's examples/u.py
and n.py themes, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp

TRUE_SCALE = 1.3


def main():
    rng = np.random.default_rng(14)
    t = np.linspace(0, 10, 90)

    # simulate: f ~ GP(ExpQuad(TRUE_SCALE)), observe g = f' + small noise
    gp0 = lgp.GP(lgp.ExpQuad(scale=TRUE_SCALE))
    gp0 = gp0.defderiv('df', 1, lgp.DefaultProcess)
    gp0 = gp0.addx(t, 'g', proc='df')
    cov = np.asarray(gp0.prior('g', raw=True), float)
    cov = 0.5 * (cov + cov.T)
    y = lgp.sample(np.zeros(t.size), cov, rng=rng) \
        + 0.02 * rng.standard_normal(t.size)

    def gpfactory(hp):
        gp = lgp.GP(lgp.ExpQuad(scale=hp['scale']))
        gp = gp.defderiv('df', 1, lgp.DefaultProcess)
        return gp.addx(t, 'g', proc='df')

    fit = lgp.empbayes_fit(
        {'log(scale)': (0.0, 1.0)},
        gpfactory,
        ({'g': y}, {('g', 'g'): 0.02 ** 2 * np.eye(t.size)}),
        raises=False,
    )
    got = float(fit.pmean['scale'])
    sd = float(fit.p['log(scale)'].sdev)
    print(f'scale: fitted {got:.2f} (log-sd {sd:.2f}) vs true {TRUE_SCALE}')
    # identified within a couple of posterior sigmas
    assert abs(np.log(got / TRUE_SCALE)) < 3 * max(sd, 0.1)

    # the derivative data also pin f itself (up to a constant)
    gp = fit.gp().addx(t, 'f')
    u = gp.predfromdata({'g': y}, 'f', 0.02 ** 2 * np.eye(t.size))
    sdev = np.asarray(u.sdev)
    print(f'posterior sd of f: min {sdev.min():.3f} (constant stays free)')
    assert sdev.min() > 0.01
    return fit


if __name__ == '__main__':
    main()
