"""Fit with an UNCERTAIN response matrix (reference examples/pdf6-7
theme): the data are y = M f + noise where the linear response M
(detector acceptance, convolution kernel, ...) is itself known only
with uncertainty.

The reference handles this through gvar arithmetic on M; here the
native `uncert` module plays that role: the extra covariance that M's
uncertainty induces on y is `J Sigma_M J'` with `J = df/dM` evaluated
at an estimate of f, added to the observation covariance.  Since J
depends on the unknown f, the fit is iterated once: stage 1 uses the
mean response, stage 2 re-fits with the M-induced covariance
propagated through the stage-1 posterior mean.  The result is a wider,
better-calibrated posterior wherever M's uncertainty matters.
"""

import numpy as np

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import uncert


def main():
    rng = np.random.default_rng(11)
    nx, ndata = 30, 12
    xg = np.linspace(0, 1, nx)
    truth = np.sin(2.5 * np.pi * xg) * (1 - xg)

    # uncertain response: mean rows are smooth bumps, 5% row noise
    centers = np.linspace(0.1, 0.9, ndata)
    Mmean = np.exp(-0.5 * ((xg - centers[:, None]) / 0.08) ** 2) / nx
    Msd = 0.05 * np.abs(Mmean) + 1e-5
    Mtrue = Mmean + Msd * rng.standard_normal(Mmean.shape)

    noise = 0.002
    y = Mtrue @ truth + noise * rng.standard_normal(ndata)

    def posterior(extra_cov):
        gp = lgp.GP(lgp.ExpQuad(scale=0.2)).addx(xg, 'f')
        gp = gp.addtransf({'f': Mmean}, 'y')
        cov = noise ** 2 * np.eye(ndata) + extra_cov
        return gp.predfromdata({'y': y}, ['f'], {('y', 'y'): cov})['f']

    # stage 1: pretend M is exact
    post1 = posterior(np.zeros((ndata, ndata)))
    f1 = np.asarray(post1.mean)

    # stage 2: propagate M's uncertainty through the stage-1 estimate.
    # uncert builds the correlated y-covariance exactly like gvar
    # arithmetic would: yu_i = sum_j M_ij f1_j with M uncertain
    Mu = uncert.from_cov(
        Mmean.reshape(-1),
        np.diag((Msd ** 2).reshape(-1)),
    ).reshape(ndata, nx)
    yu = Mu @ f1
    extra = np.asarray(uncert.cov(yu)).reshape(ndata, ndata)
    post2 = posterior(extra)

    f2 = np.asarray(post2.mean)
    s1 = np.asarray(post1.sdev)
    s2 = np.asarray(post2.sdev)

    # calibration: z-scores of the truth under each posterior
    z1 = float(np.sqrt(np.mean(((f1 - truth) / s1) ** 2)))
    z2 = float(np.sqrt(np.mean(((f2 - truth) / s2) ** 2)))
    print(f'rms z-score: exact-M {z1:.2f}, uncertain-M {z2:.2f} '
          f'(1 = perfectly calibrated)')
    print(f'mean posterior sd: {s1.mean():.4f} -> {s2.mean():.4f}')
    # stage 2 must widen the posterior and improve calibration
    assert s2.mean() > s1.mean()
    assert z2 < z1
    assert z2 < 3.0


if __name__ == '__main__':
    main()
