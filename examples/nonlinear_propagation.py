"""A nonlinear link function on top of the GP: the latent process is
log-intensity, the data are intensities — fit on the log scale, then
propagate the posterior through exp() with the uncertainty machinery
(the reference's examples/c.py theme: a nonlinear transformation hides
the true heights)."""

import numpy as np

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import uncert


def main():
    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(0, 5, 35))
    true_log = 1.0 + 0.8 * np.sin(1.5 * x)
    # multiplicative noise: log data are Gaussian around the latent log
    sigma_log = 0.1
    ylog = true_log + sigma_log * rng.standard_normal(x.size)

    gp = lgp.GP(lgp.ExpQuad(scale=1.5))
    gp = gp.addx(x, 'loglatent')
    ulog = gp.predfromdata({'loglatent': ylog}, 'loglatent',
                           sigma_log**2 * np.eye(x.size))

    # nonlinear propagation: intensity = exp(loglatent); the delta
    # method carries the first-order Jacobian through exp
    uint = uncert.ufunc(np.exp, ulog)
    got = np.asarray(uint.mean)
    want = np.exp(true_log)
    relrmse = np.sqrt(np.mean(((got - want) / want) ** 2))
    print(f'intensity relative rmse: {relrmse:.3f}')
    assert relrmse < 0.15
    # uncertainties scale with the intensity (multiplicative model)
    corr = np.corrcoef(np.asarray(uint.sdev), got)[0, 1]
    print(f'sd-vs-mean correlation: {corr:.2f}')
    assert corr > 0.5
    return uint


if __name__ == '__main__':
    main()
