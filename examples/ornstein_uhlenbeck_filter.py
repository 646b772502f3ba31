"""State filtering with the Ornstein-Uhlenbeck process: posterior of a
mean-reverting latent path from noisy irregular observations, including
forecasting beyond the last datum (where the variance relaxes back to
the stationary value)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(12)
    n = 60
    t = np.sort(rng.uniform(0.1, 8.0, n))
    # simulate an OU path at the observation times by exact recursion
    path = np.empty(n)
    path[0] = rng.standard_normal()
    for i in range(1, n):
        dt = t[i] - t[i - 1]
        a = np.exp(-dt)
        path[i] = a * path[i - 1] \
            + np.sqrt(1 - a * a) * rng.standard_normal()
    y = path + 0.2 * rng.standard_normal(n)

    gp = lgp.GP(lgp.OrnsteinUhlenbeck())
    tstar = np.linspace(0.1, 12.0, 80)
    gp = gp.addx(t, 'data').addx(tstar, 'out')
    post = gp.predfromdata({'data': y}, 'out',
                           0.2 ** 2 * np.eye(n))

    # filtering beats the raw observations
    at_data = lgp.GP(lgp.OrnsteinUhlenbeck()) \
        .addx(t, 'data').addx(t, 'smooth') \
        .predfromdata({'data': y}, 'smooth', 0.2 ** 2 * np.eye(n))
    rmse_smooth = np.sqrt(np.mean((np.asarray(at_data.mean) - path) ** 2))
    rmse_raw = np.sqrt(np.mean((y - path) ** 2))
    print(f'smoothed rmse {rmse_smooth:.3f} vs raw {rmse_raw:.3f}')
    assert rmse_smooth < rmse_raw

    # forecast variance relaxes to the stationary variance (= 1)
    sd = np.asarray(post.sdev)
    far = tstar > t.max() + 2
    assert np.all(sd[far] > 0.7)
    assert np.all(sd[far] <= 1.0 + 1e-3)


if __name__ == '__main__':
    main()
