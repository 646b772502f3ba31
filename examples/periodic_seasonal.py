"""Seasonal + trend decomposition: a Periodic kernel (locked to a
known period) summed with a slow ExpQuad trend, fitted and separated
through two processes (the reference's examples using Periodic, e.g.
examples/w.py-style seasonal structure)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(4)
    n = 80
    t = np.sort(rng.uniform(0, 12, n))
    period = 2.0
    truth_season = 0.7 * np.sin(2 * np.pi * t / period)
    truth_trend = 0.1 * (t - 6) ** 2 - 1.0
    y = truth_season + truth_trend + 0.05 * rng.standard_normal(n)

    # two processes: a periodic one (period fixed via scale) and a
    # long-scale trend; the data is their sum
    gp = lgp.GP()
    gp = gp.defproc('season',
                    lgp.Periodic(outerscale=1.0,
                                 scale=period / (2 * np.pi)))
    gp = gp.defproc('trend', 4.0 * lgp.ExpQuad(scale=6.0))
    gp = gp.deftransf('sum', {'season': 1.0, 'trend': 1.0})
    gp = gp.addx(t, 'data', proc='sum')
    gp = gp.addx(t, 's', proc='season')
    gp = gp.addx(t, 'g', proc='trend')

    post = gp.predfromdata({'data': y}, ['s', 'g'],
                           0.05 ** 2 * np.eye(n))
    season = np.asarray(post['s'].mean)
    trend = np.asarray(post['g'].mean)

    # the separated components match the truth up to a shared constant
    c = np.mean(season - truth_season)
    rmse_s = np.sqrt(np.mean((season - c - truth_season) ** 2))
    rmse_t = np.sqrt(np.mean((trend + c - truth_trend) ** 2))
    print(f'season rmse {rmse_s:.3f}, trend rmse {rmse_t:.3f}')
    assert rmse_s < 0.25
    assert rmse_t < 0.35
    # and their sum reproduces the data closely
    resid = season + trend - y
    assert np.sqrt(np.mean(resid ** 2)) < 0.15


if __name__ == '__main__':
    main()
