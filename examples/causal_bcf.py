"""Causal treatment-effect estimation with BCF (the reference's
examples/bcf.py)."""

import numpy as np

from lsqfitgp_tpu.models import bcf


def main():
    rng = np.random.default_rng(0)
    n = 60
    x = rng.uniform(0, 1, (n, 2))
    mu = np.sin(2 * np.pi * x[:, 0])
    tau = 1.0 + x[:, 1]                       # heterogeneous effect
    propensity = 1 / (1 + np.exp(-2 * (x[:, 0] - 0.5)))
    z = (rng.uniform(size=n) < propensity).astype(float)
    y = mu + tau * z + 0.1 * rng.standard_normal(n)

    m = bcf(y=y, z=z, x_mu=x, pihat=propensity,
            kernelkw_mu=dict(maxd=2, reset=None),
            kernelkw_tau=dict(maxd=2, reset=None))
    print(m)
    u1 = m.pred(z=np.ones(n), x_mu=x, pihat=propensity)
    u0 = m.pred(z=np.zeros(n), x_mu=x, pihat=propensity)
    ate_eta = float(np.mean(np.asarray(u1.mean) - np.asarray(u0.mean)))
    ate = ate_eta * y.std()   # undo the standardize transform scale
    print(f'estimated ATE: {ate:.2f} (truth {tau.mean():.2f})')
    return m


if __name__ == '__main__':
    main()
