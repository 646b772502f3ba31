"""Density estimation with copula hyperpriors (the reference's
examples/pdf*.py family): fit a GP to a histogram with positivity-ish
hyperpriors expressed through the copula PPL."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import copula


def main():
    rng = np.random.default_rng(0)
    # histogram of a mixture
    samples = np.concatenate([
        rng.normal(-1, 0.5, 2000), rng.normal(1.5, 0.8, 1000)
    ])
    edges = np.linspace(-4, 4, 25)
    counts, _ = np.histogram(samples, edges)
    centers = (edges[1:] + edges[:-1]) / 2
    density = counts / counts.sum() / np.diff(edges)
    err = np.sqrt(np.maximum(counts, 1)) / counts.sum() / np.diff(edges)

    hyp = copula.makedict({
        'scale': copula.invgamma(3.0, 2.0),
        'amp': copula.halfcauchy(1.0),
    })

    def gpfactory(hp):
        gp = lgp.GP(hp['amp'] ** 2 * lgp.ExpQuad(scale=hp['scale']))
        gp = gp.addx(centers, 'f')
        gp = gp.addcov(jnp.diag(jnp.asarray(err) ** 2), 'e')
        return gp.addlintransf(lambda f, e: f + e, ['f', 'e'], 'y',
                               checklin=False)

    fit = lgp.empbayes_fit(hyp, gpfactory, {'y': density})
    print(f"scale = {float(fit.p['scale'].mean):.2f} "
          f"± {float(fit.p['scale'].sdev):.2f}")
    u = fit.gp().predfromdata({'y': density}, 'f')
    rmse = np.sqrt(np.mean((np.asarray(u.mean) - density) ** 2))
    print(f'smoothed-density rmse vs histogram: {rmse:.4f}')
    return fit


if __name__ == '__main__':
    main()
