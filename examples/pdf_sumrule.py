"""A physics-flavored multi-process fit with an exact linear
constraint: two latent "parton distribution" shapes on x in (0, 1) must
integrate to a known total (a momentum sum rule), imposed by observing
the quadrature functional exactly; hyperparameters fitted by empirical
Bayes (the reference's examples/pdf4.py theme, small and re-designed)."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(6)
    ngrid = 30
    xg = (np.arange(ngrid) + 0.5) / ngrid    # midpoint quadrature grid
    w = np.full(ngrid, 1 / ngrid)

    # truth: two positive-ish shapes whose first moments sum to 1/2
    f1 = 2.0 * xg * (1 - xg) ** 2
    f2 = 1.2 * (1 - xg) ** 3
    total = float(w @ (xg * (f1 + f2)))

    xdat = np.sort(rng.uniform(0.05, 0.95, 15))
    y1 = np.interp(xdat, xg, f1) + 0.02 * rng.standard_normal(xdat.size)
    y2 = np.interp(xdat, xg, f2) + 0.02 * rng.standard_normal(xdat.size)

    def gpfactory(hp):
        gp = lgp.GP()
        gp = gp.defproc('f1', hp['amp1'] ** 2 * lgp.ExpQuad(scale=0.4))
        gp = gp.defproc('f2', hp['amp2'] ** 2 * lgp.ExpQuad(scale=0.4))
        gp = gp.addx(xdat, 'd1', proc='f1').addx(xdat, 'd2', proc='f2')
        gp = gp.addx(xg, 'g1', proc='f1').addx(xg, 'g2', proc='f2')
        # the sum rule: integral of x (f1 + f2) dx as one element
        wx = jnp.asarray(w * xg)
        gp = gp.addlintransf(
            lambda g1, g2: wx @ (g1 + g2), ['g1', 'g2'], 'sumrule',
            checklin=False,
        )
        return gp

    fit = lgp.empbayes_fit(
        {'log(amp1)': (0.0, 1.0), 'log(amp2)': (0.0, 1.0)},
        gpfactory,
        lambda hp: (
            {'d1': y1, 'd2': y2, 'sumrule': total},
            {('d1', 'd1'): 0.02**2 * np.eye(xdat.size),
             ('d2', 'd2'): 0.02**2 * np.eye(xdat.size),
             ('sumrule', 'sumrule'): np.array([[1e-10]])},
        ),
        raises=False,
    )
    gp = fit.gp()
    given, gcov = fit.data
    u = gp.predfromdata(given, ['g1', 'g2'], gcov)
    # the posterior respects the sum rule almost exactly
    m1, m2 = np.asarray(u['g1'].mean), np.asarray(u['g2'].mean)
    got_total = float(w @ (xg * (m1 + m2)))
    print(f'sum rule: posterior {got_total:.4f} vs exact {total:.4f}')
    assert abs(got_total - total) < 1e-3
    # and recovers the shapes
    rmse = np.sqrt(np.mean((m1 - f1) ** 2 + (m2 - f2) ** 2))
    print(f'shape rmse: {rmse:.3f}')
    assert rmse < 0.1
    return fit, u


if __name__ == '__main__':
    main()
