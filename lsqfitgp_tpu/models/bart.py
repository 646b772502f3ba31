"""Turnkey BART regression model.

Counterpart of reference ``src/lsqfitgp/bayestree/_bart.py:35-440``
(class ``bart``): nonparametric regression

    y_i = mu + lambda f(x_i) + eps_i,   f ~ GP(BART kernel),
    eps_i ~ N(0, sigma² / w_i),

with copula hyperpriors alpha ~ beta(2,1), beta ~ invgamma(1,1),
log k ~ N(log 2, 2²), log sigma² ~ N(log s²_data, 2²), and the GP mean
marginalized analytically (an extra constant-covariance component).
Hyperparameters are fitted by MAP (`empbayes_fit`); predictions are
posterior UArrays.
"""

from __future__ import annotations


import numpy
from jax import numpy as jnp

from .. import _array, copula, uncert
from ..fit import empbayes_fit
from ..gp import GP
from ..kernels import BART
from ..raniter import sample as _sample

__all__ = ['bart']


def _to_structured(x):
    x = _array.asarray(x)
    if not isinstance(x, _array.StructuredArray):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = _array.unstructured_to_structured(x)
        else:
            x = _array.StructuredArray({'f0': x})
    return x


class bart:
    """BART-kernel GP regression with MAP hyperparameters.

    Parameters
    ----------
    x_train : (n,) structured array, (n, p) array, or DataFrame
        Covariates.
    y_train : (n,) array
        Outcomes.
    weights : (n,) array, optional
        Error-precision weights: error variance is sigma²/w_i.
    marginalize_mean : bool, default True
        Marginalize the GP mean analytically instead of fitting it.
    kernelkw : dict
        Overrides for the BART kernel (default maxd=10,
        reset=[2, 4, 6, 8] — all depth brackets evaluate in closed form).
    fitkw : dict
        Overrides forwarded to `empbayes_fit`.

    Attributes
    ----------
    fit : empbayes_fit
    sigma, alpha, beta, meansdev, mean : posterior hyperparameters
    """

    def __init__(self, x_train, y_train, *, weights=None,
                 marginalize_mean=True, kernelkw={}, fitkw={}):
        x_train = _to_structured(x_train)
        if hasattr(y_train, 'to_numpy'):
            y_train = y_train.to_numpy().squeeze()
        y_train = jnp.asarray(y_train, float)
        assert y_train.shape == x_train.shape

        if weights is None:
            weights = jnp.ones_like(y_train)
        weights = jnp.asarray(weights, float)

        ymin, ymax = jnp.min(y_train), jnp.max(y_train)
        mu_mu = (ymax + ymin) / 2
        k_sigma_mu = (ymax - ymin) / 2

        splits = BART.splits_from_coord(x_train)
        i_train = self._toindices(x_train, splits)

        sigma2_priormean = float(
            jnp.mean((y_train - y_train.mean()) ** 2 * weights)
        )
        hyp = {
            'alpha': copula.beta(2.0, 1.0),
            'beta': copula.invgamma(1.0, 1.0),
        }
        hyperprior = copula.makedict(hyp)
        extra = {
            'log(k)': uncert.normal(numpy.log(2.0), 2.0),
            'log(sigma2)': uncert.normal(numpy.log(sigma2_priormean), 2.0),
        }
        if not marginalize_mean:
            extra['mean'] = uncert.normal(float(mu_mu), float(k_sigma_mu))
        merged = {k: hyperprior[k] for k in hyperprior.keys()}
        merged.update(extra)
        hyperprior = uncert.BufferDict(merged)

        kernel_defaults = dict(maxd=10, reset=[2, 4, 6, 8])
        kernel_defaults.update(kernelkw)

        def makegp(hp, *, i_train, weights, splits, **_):
            kernel = BART(
                splits=splits, indices=True,
                alpha=hp['alpha'], beta=hp['beta'], **kernel_defaults,
            )
            kernel = kernel * (k_sigma_mu / hp['k']) ** 2
            gp = (
                GP(kernel, checkpos=False, checksym=False)
                .addx(i_train, 'trainmean')
                .addcov(jnp.diag(hp['sigma2'] / weights), 'trainnoise')
            )
            pieces = {'trainmean': 1.0, 'trainnoise': 1.0}
            if 'mean' not in hp:
                gp = gp.addcov(jnp.asarray(k_sigma_mu ** 2), 'mean')
                pieces['mean'] = 1.0
            return gp.addtransf(pieces, 'train')

        def info(hp, *, mu_mu, **_):
            center = hp['mean'] if 'mean' in hp else mu_mu
            return {'train': y_train - center}

        gpfactorykw = dict(
            i_train=i_train, weights=weights, splits=splits, mu_mu=mu_mu,
        )
        options = dict(
            raises=False,
            minkw=dict(method='L-BFGS-B',
                       options=dict(maxls=4, maxiter=100)),
            gpfactorykw=gpfactorykw,
        )
        options.update(fitkw)
        fit = empbayes_fit(hyperprior, makegp, info, **options)

        self.fit = fit
        self.sigma = uncert.ufunc(jnp.sqrt, fit.p['sigma2'])
        self.alpha = fit.p['alpha']
        self.beta = fit.p['beta']
        self.meansdev = k_sigma_mu / fit.p['k']
        self.mean = fit.p['mean'] if 'mean' in fit.p else mu_mu

        self._mu_mu = mu_mu
        self._k_sigma_mu = k_sigma_mu
        self._splits = splits
        self._i_train = i_train
        self._weights = weights
        self._y_train = y_train
        self._makegp = makegp
        self._info = info
        self._gpfactorykw = gpfactorykw

    @staticmethod
    def _toindices(x, splits):
        """Indices packed back into a structured array so each point is
        one element (reference ``bayestree/_bart.py:436``)."""
        ix = BART.indices_from_coord(x, splits)
        return _array.unstructured_to_structured(ix, names=list(x.fields))

    # -- hyperparameter access ------------------------------------------------

    def _gethp(self, hp, rng=None):
        if not isinstance(hp, str):
            return hp
        if hp == 'map':
            return self.fit.pmap
        if hp == 'sample':
            buf = _sample(self.fit.pmean.buf, self.fit.pcov, rng=rng)
            return self.fit.prior.replace_buf(buf)
        raise KeyError(hp)

    # -- prediction --------------------------------------------------------------

    def gp(self, *, hp='map', x_test=None, weights=None, rng=None):
        """The GP at the given hyperparameters, optionally extended with
        test points under keys 'testmean'/'test'."""
        hp = self._gethp(hp, rng)
        return self._gp(hp, x_test, weights)

    def _gp(self, hp, x_test, weights):
        gp = self._makegp(hp, **self._gpfactorykw)
        if x_test is not None:
            x_test = _to_structured(x_test)
            i_test = self._toindices(x_test, self._splits)
            gp = gp.addx(i_test, 'testmean')
            if weights is not None:
                gp = gp.addcov(
                    jnp.diag(hp['sigma2'] / jnp.asarray(weights)),
                    'testnoise',
                )
        return gp

    def data(self, *, hp='map', rng=None):
        """The training data dict for conditioning the GP."""
        hp = self._gethp(hp, rng)
        return self._info(hp, **self._gpfactorykw)

    def pred(self, *, hp='map', error=False, x_test=None, weights=None,
             rng=None):
        """Posterior of the latent mean (or of new observations with
        ``error=True``) at x_test (default: training points).

        Returns a UArray; add back the fitted mean internally.
        """
        hp = self._gethp(hp, rng)
        gp = self._gp(hp, x_test if x_test is not None else None, weights)
        data = self._info(hp, **self._gpfactorykw)
        key = 'trainmean' if x_test is None else 'testmean'
        if 'mean' not in hp:
            # the marginalized constant mean is part of the latent function
            out = gp.predfromdata(data, [key, 'mean'])
            u = out[key] + out['mean']
        else:
            u = gp.predfromdata(data, key)
        center = hp['mean'] if 'mean' in hp else self._mu_mu
        u = u + center
        if error:
            sigma2 = hp['sigma2']
            w = (
                jnp.asarray(weights) if weights is not None
                else (self._weights if x_test is None
                      else jnp.ones(u.shape))
            )
            noise = uncert.from_cov(
                jnp.zeros(u.shape), jnp.diag(sigma2 / w)
            )
            u = u + noise
        return u

    def __repr__(self):
        return (
            f'bart(n={self._y_train.size}, '
            f'alpha={float(self.alpha.mean):.3g}, '
            f'beta={float(self.beta.mean):.3g}, '
            f'sigma={float(self.sigma.mean):.3g})'
        )
