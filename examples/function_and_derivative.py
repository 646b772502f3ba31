"""Joint observations of a function AND its derivative constrain the
process more than either alone (the reference's examples/e.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(1)
    xobs = np.sort(rng.uniform(-3, 3, 8))
    xpred = np.linspace(-3, 3, 50)
    f = np.sin
    df = np.cos
    sigma = 0.05

    def posterior_sd(use_deriv):
        gp = lgp.GP(lgp.ExpQuad())
        gp = gp.addx(xobs, 'f')
        data = {'f': f(xobs) + sigma * rng.standard_normal(xobs.size)}
        n = xobs.size
        if use_deriv:
            gp = gp.addx(xobs, 'df', deriv=1)
            data['df'] = df(xobs) + sigma * rng.standard_normal(xobs.size)
            n = 2 * xobs.size
        gp = gp.addx(xpred, 'pred')
        u = gp.predfromdata(data, 'pred', sigma**2 * np.eye(n))
        return np.asarray(u.sdev)

    sd_f = posterior_sd(False)
    sd_fdf = posterior_sd(True)
    print(f'mean posterior sd, f only: {sd_f.mean():.4f}, '
          f'f and df: {sd_fdf.mean():.4f}')
    # derivative data strictly tightens the posterior on average
    assert sd_fdf.mean() < 0.8 * sd_f.mean()
    return sd_f, sd_fdf


if __name__ == '__main__':
    main()
