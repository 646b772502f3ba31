"""Splitting one observed series into latent components: a slow trend
plus a fast seasonal process, observed only through their sum — the
posterior separates them because their kernels occupy different
frequency bands (the reference's examples/w.py theme, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(9)
    t = np.linspace(0, 6, 120)

    trend = 0.8 * np.tanh(t - 3)
    seasonal = 0.3 * np.sin(2 * np.pi * t)
    noise = 0.03
    y = trend + seasonal + noise * rng.standard_normal(t.size)

    gp = lgp.GP()
    gp = gp.defproc('trend', lgp.ExpQuad(scale=2.0))
    # Periodic has period 2π in its input; scale=1/(2π) gives period 1
    gp = gp.defproc('seasonal',
                    0.3 ** 2 * lgp.Periodic(outerscale=1.0,
                                            scale=1 / (2 * np.pi)))
    gp = gp.deflintransf(
        'sum', lambda a, b: (lambda x: a(x) + b(x)), ['trend', 'seasonal'])

    gp = gp.addx(t, 'data', proc='sum')
    gp = gp.addx(t, 'trend_at', proc='trend')
    gp = gp.addx(t, 'seasonal_at', proc='seasonal')

    u = gp.predfromdata({'data': y}, ['trend_at', 'seasonal_at'],
                        noise ** 2 * np.eye(t.size))

    got_t = np.asarray(u['trend_at'].mean)
    got_s = np.asarray(u['seasonal_at'].mean)
    # components are identified up to a shared constant
    c = np.mean(got_t - trend)
    rmse_t = float(np.sqrt(np.mean((got_t - c - trend) ** 2)))
    rmse_s = float(np.sqrt(np.mean((got_s + c - seasonal) ** 2)))
    print(f'trend rmse: {rmse_t:.3f}, seasonal rmse: {rmse_s:.3f}')
    assert rmse_t < 0.08
    assert rmse_s < 0.08
    # and the sum is pinned to the data much more tightly than either part
    gp2 = gp.addx(t, 'sum_at', proc='sum')
    us = gp2.predfromdata({'data': y}, 'sum_at', noise ** 2 * np.eye(t.size))
    assert float(np.mean(np.asarray(us.sdev))) \
        < float(np.mean(np.asarray(u['trend_at'].sdev)))
    return u


if __name__ == '__main__':
    main()
