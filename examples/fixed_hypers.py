"""Freezing hyperparameters with the `fix` mask: due to obscure
political reasons the length scale is decreed, and only the amplitude
and noise are left for the data to decide (the reference's
examples/i.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp

DECREED_SCALE = 2.0     # deliberately wrong: the truth is ~1


def main():
    rng = np.random.default_rng(12)
    x = np.linspace(0, 8, 60)
    y = np.sin(2.5 * x) + 0.05 * rng.standard_normal(x.size)

    def gpfactory(hp):
        k = hp['amp'] ** 2 * lgp.ExpQuad(scale=hp['scale'])
        gp = lgp.GP(k).addx(x, 'data')
        return gp.addcov(hp['noise'] ** 2 * np.eye(x.size), 'err') \
                 .addtransf({'data': 1, 'err': 1}, 'obs')

    hyperprior = {
        'log(amp)': (0.0, 2.0),
        'log(scale)': (np.log(DECREED_SCALE), 2.0),
        'log(noise)': (np.log(0.05), 2.0),
    }

    fit_free = lgp.empbayes_fit(
        hyperprior, gpfactory, {'obs': y}, raises=False)
    fit_fixed = lgp.empbayes_fit(
        hyperprior, gpfactory, {'obs': y},
        fix={'log(scale)': True}, raises=False)

    s_free = float(fit_free.pmean['scale'])
    s_fixed = float(fit_fixed.pmean['scale'])
    print(f'free scale: {s_free:.2f}, fixed scale: {s_fixed:.2f}')
    # the fixed fit keeps the decreed value exactly...
    assert abs(s_fixed - DECREED_SCALE) < 1e-6
    # ...with zero posterior uncertainty on the frozen coordinate
    assert float(fit_fixed.p['log(scale)'].sdev) < 1e-12
    # while the free fit walks away from it toward the truth
    assert s_free < 1.5

    # the frozen, mis-specified model pays in marginal likelihood
    # (compare the Gaussian part at the respective optima)
    nll_free = float(fit_free._nll(np.asarray(fit_free.w)))
    nll_fixed = float(fit_fixed._nll(np.asarray(fit_fixed.w)))
    print(f'objective: free {nll_free:.1f}, fixed {nll_fixed:.1f}')
    assert nll_free < nll_fixed
    return fit_free, fit_fixed


if __name__ == '__main__':
    main()
