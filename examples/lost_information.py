"""Conditioning on a functional of the data loses information: given
only the SUM of two values, the posterior is wider than given both
values — and exactly as wide as the analytic conditional (the
reference's examples/h.py / i.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    x = np.array([0.0, 0.4, 2.0])   # two close points and a probe
    gp = lgp.GP(lgp.ExpQuad())
    gp = gp.addx(x[:2], 'pair')
    gp = gp.addx(x[2:], 'probe')
    gp = gp.addlintransf(lambda p: p[0] + p[1], ['pair'], 'sum')

    y = np.array([0.3, 0.5])

    # full information: both values
    u_full = gp.predfromdata({'pair': y}, 'probe')
    # lossy: only the sum
    u_sum = gp.predfromdata({'sum': np.array(y.sum())}, 'probe')

    sd_full = float(u_full.sdev[0])
    sd_sum = float(u_sum.sdev[0])
    print(f'posterior sd at probe: both values {sd_full:.4f}, '
          f'sum only {sd_sum:.4f}')
    assert sd_sum > sd_full

    # analytic check of the sum-conditional: cov(probe, sum) /
    # var(sum) * sum
    K = np.asarray(gp.prior(['pair', 'probe'], raw=True)[('pair', 'pair')])
    kps = np.asarray(
        gp.prior(['pair', 'probe'], raw=True)[('probe', 'pair')]
    ).ravel()
    var_sum = K.sum()
    cov_ps = kps.sum()
    want_mean = cov_ps / var_sum * y.sum()
    want_sd = np.sqrt(1 - cov_ps**2 / var_sum)
    np.testing.assert_allclose(float(u_sum.mean[0]), want_mean,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sd_sum, want_sd, rtol=1e-5)
    print('matches the analytic conditional')
    return u_full, u_sum


if __name__ == '__main__':
    main()
