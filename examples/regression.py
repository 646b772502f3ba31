"""Basic GP regression with hyperparameter fitting (the reference's
examples/f.py workflow)."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    n = 60
    x = np.sort(rng.uniform(-5, 5, n))
    y = np.sin(x) + 0.1 * rng.standard_normal(n)

    def gpfactory(hp):
        gp = lgp.GP(hp['amp'] ** 2 * lgp.ExpQuad(scale=hp['scale']))
        gp = gp.addx(x, 'f').addcov(hp['sigma2'] * jnp.eye(n), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    fit = lgp.empbayes_fit(
        {
            'log(scale)': (0.0, 1.0),
            'log(amp)': (0.0, 1.0),
            'log(sigma2)': (np.log(0.01), 2.0),
        },
        gpfactory, {'y': y},
    )
    print('fitted hyperparameters:')
    from lsqfitgp_tpu.utils import tabulate_together
    print(tabulate_together(
        {k: fit.prior[k] for k in ['scale', 'amp']},
        {k: fit.p[k] for k in ['scale', 'amp']},
        headers=['prior', 'posterior'],
    ))

    xs = np.linspace(-6, 6, 40)
    gp = fit.gp().addx(xs, 'pred')
    u = gp.predfromdata({'y': y}, 'pred')
    resid = np.asarray(u.mean) - np.sin(xs)
    inside = np.abs(resid) < 2 * np.asarray(u.sdev) + 0.05
    print(f'pred rmse vs truth: {np.sqrt(np.mean(resid**2)):.3f}, '
          f'2sigma coverage: {inside.mean():.0%}')
    assert inside.mean() > 0.8
    return u


if __name__ == '__main__':
    main()
