"""Inferring a time delay between two correlated series: the second
series is a noisy, attenuated, delayed copy of the first, and the lag
enters the model as a hyperparameter through a process x-transform
(the reference's examples/t.py theme, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp

TRUE_DELAY = 0.6
TRUE_RATIO = 0.7


def main():
    rng = np.random.default_rng(11)
    t1 = np.sort(rng.uniform(0, 8, 45))
    t2 = np.sort(rng.uniform(0, 8, 45))

    def truth(t):
        return np.sin(1.7 * t) + 0.5 * np.cos(3.1 * t)

    noise = 0.05
    y1 = truth(t1) + noise * rng.standard_normal(t1.size)
    y2 = (TRUE_RATIO * truth(t2 - TRUE_DELAY)
          + noise * rng.standard_normal(t2.size))

    def gpfactory(hp):
        gp = lgp.GP(lgp.ExpQuad(scale=1.0))
        # the copy process: g(t) = ratio * f(t - delay)
        gp = gp.defxtransf('shifted', lambda t: t - hp['delay'],
                           lgp.DefaultProcess)
        gp = gp.defrescale('copy', lambda t: hp['ratio'], 'shifted')
        gp = gp.addx(t1, 'y1')
        gp = gp.addx(t2, 'y2', proc='copy')
        return gp

    fit = lgp.empbayes_fit(
        {'delay': (0.0, 1.0), 'log(ratio)': (0.0, 1.0)},
        gpfactory,
        ({'y1': y1, 'y2': y2},
         {('y1', 'y1'): noise**2 * np.eye(t1.size),
          ('y2', 'y2'): noise**2 * np.eye(t2.size)}),
        raises=False,
    )
    delay = float(fit.pmean['delay'])
    ratio = float(fit.pmean['ratio'])
    print(f'delay: fitted {delay:.3f} vs true {TRUE_DELAY}')
    print(f'ratio: fitted {ratio:.3f} vs true {TRUE_RATIO}')
    assert abs(delay - TRUE_DELAY) < 0.1
    assert abs(ratio - TRUE_RATIO) < 0.15
    return fit


if __name__ == '__main__':
    main()
