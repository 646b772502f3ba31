"""Bayesian Causal Forests on GPs.

Counterpart of reference ``src/lsqfitgp/bayestree/_bcf.py:85`` (class
``bcf``): the causal model of Hahn, Murray & Carvalho (2020),

    y_i = m + mu(x_i) + tau(x_i) (z_i − z0) + aux(x_i) + eps_i,

with mu and tau independent BART-kernel GPs (prognostic and treatment
effects), the propensity score ``pihat`` optionally appended to the
covariates of either forest, optional y transformations (standardize /
Yeo-Johnson with fitted λ), weights, and an optional user-defined
auxiliary process.  Hyperparameters (scales λ_mu ~ halfcauchy(2),
λ_tau ~ halfnorm(1.48), BART α/β per forest, σ², z0 ~ U(0,1)) are
fitted by MAP.
"""

from __future__ import annotations

import warnings

import numpy
from jax import numpy as jnp

from .. import _array, _jaxutil, copula, uncert
from ..fit import empbayes_fit
from ..gp import GP
from ..kernels import BART, Constant
from ..raniter import sample as _sample
from .bart import _to_structured

__all__ = ['bcf']


def yeojohnson(x, lmbda):
    """Yeo-Johnson transformation (λ away from 0 and 2).

    Each branch is evaluated on inputs clamped to its own domain
    (the double-``where``): the x≥0 branch's ∂/∂λ is
    ``(x+1)^λ log(x+1)``, which is NaN for x < −1, and ``where``'s
    cotangent 0·NaN = NaN would otherwise poison the whole gradient
    whenever the (standardized, hence signed) data dips below −1.
    """
    pos = x >= 0
    xp = jnp.where(pos, x, 0.0)
    xn = jnp.where(pos, 0.0, x)
    return jnp.where(
        pos,
        (jnp.power(xp + 1, lmbda) - 1) / lmbda,
        -((jnp.power(1 - xn, 2 - lmbda) - 1) / (2 - lmbda)),
    )


def yeojohnson_inverse(y, lmbda):
    # same per-branch domain clamp as the forward transform: the
    # unselected branch's base 1 + λy (resp. 1 − (2−λ)y) can be
    # negative, and power's λ-derivative of a negative base is NaN
    pos = y >= 0
    yp = jnp.where(pos, y, 0.0)
    yn = jnp.where(pos, 0.0, y)
    return jnp.where(
        pos,
        jnp.power(1 + lmbda * yp, 1 / lmbda) - 1,
        1 - jnp.power(1 - (2 - lmbda) * yn, 1 / (2 - lmbda)),
    )


def _quantilenorm_knots(y, weights=None, max_knots=101):
    """Knot tables for the quantile-Normal transform: matched
    (y-quantile, Normal-quantile) pairs at probabilities (k+½)/K.
    Ties in y are opened up by a tiny cumulative offset so the
    interpolant is strictly monotone (finite Jacobian loss)."""
    from jax import lax
    from jax.scipy.special import ndtri

    y = jnp.asarray(y)
    K = min(int(y.size), max_knots)
    probs = (jnp.arange(K) + 0.5) / K
    if weights is None:
        qs = jnp.quantile(y, probs)
    else:
        order = jnp.argsort(y)
        ys, w = y[order], jnp.asarray(weights)[order]
        cw = jnp.cumsum(w)
        qs = jnp.interp(probs, (cw - 0.5 * w) / cw[-1], ys)
    eps = jnp.maximum(1e-9, 100 * jnp.finfo(qs.dtype).eps) \
        * (qs[-1] - qs[0] + 1)
    qs = lax.associative_scan(jnp.maximum, qs) + eps * jnp.arange(K)
    return qs, ndtri(probs)


def _pwl(x, xs, ys):
    """Monotone piecewise-linear interpolant with linear tail
    extrapolation (jnp.interp clamps at the end knots)."""
    x = jnp.asarray(x)
    out = jnp.interp(x, xs, ys)
    s_lo = (ys[1] - ys[0]) / (xs[1] - xs[0])
    s_hi = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
    out = jnp.where(x < xs[0], ys[0] + s_lo * (x - xs[0]), out)
    out = jnp.where(x > xs[-1], ys[-1] + s_hi * (x - xs[-1]), out)
    return out


class bcf:
    """GP version of Bayesian Causal Forests.

    Parameters
    ----------
    y, z, pihat : (n,) arrays
        Outcome, binary treatment, propensity-score estimate.
    x_mu : covariates for the prognostic forest.
    x_tau : optional, covariates for the treatment forest (default x_mu).
    x_aux : optional covariates for a user aux process (see ``gpaux``).
    weights : optional error-precision weights.
    include_pi : {'mu', 'tau', 'both'}
        Where to append pihat as a covariate.
    transf : None, str, pair, or list
        y transformations: 'standardize', 'yeojohnson', 'quantilenorm'
        (empirical-quantile -> standard-Normal map), or a custom
        ``(from_data(hp, y), to_data(hp, eta))`` pair; lists compose.
    marginalize_mean : bool
        Marginalize the global mean analytically.
    gpaux : callable(hp, gp) -> gp, optional
        Adds a process named 'aux' to the GP.
    kernelkw_mu, kernelkw_tau, fitkw : dicts of overrides.

    Attributes: ``fit``, ``sigma``, ``lambda_mu``, ``lambda_tau``,
    ``alpha_mu``, ``alpha_tau``, ``beta_mu``, ``beta_tau``, ``z_0``,
    ``m``.
    """

    def __init__(self, *, y, z, x_mu, pihat, x_tau=None, x_aux=None,
                 weights=None, include_pi='mu', transf='standardize',
                 marginalize_mean=True, gpaux=None, kernelkw_mu={},
                 kernelkw_tau={}, fitkw={}, otherhp={}):
        x_mu = _to_structured(x_mu)
        if x_tau is not None:
            x_tau = _to_structured(x_tau)
        if x_aux is not None:
            x_aux = _to_structured(x_aux)

        y = jnp.asarray(numpy.asarray(y), float).reshape(-1)
        z = jnp.asarray(numpy.asarray(z), float).reshape(-1)
        pihat = jnp.asarray(numpy.asarray(pihat), float).reshape(-1)
        assert y.shape == z.shape == pihat.shape == x_mu.shape
        if weights is not None:
            weights = jnp.asarray(numpy.asarray(weights), float).reshape(-1)

        if include_pi not in ('mu', 'tau', 'both'):
            raise KeyError(f'invalid include_pi={include_pi!r}')
        self._include_pi = include_pi
        x_mu, x_tau = self._append_pihat(x_mu, x_tau, pihat)

        splits_mu = BART.splits_from_coord(x_mu)
        i_mu = self._toindices(x_mu, splits_mu)
        if x_tau is None:
            splits_tau = splits_mu
            i_tau = None
        else:
            splits_tau = BART.splits_from_coord(x_tau)
            i_tau = self._toindices(x_tau, splits_tau)

        from_data, to_data, transfloss, transfhp = self._get_transf(
            transf=transf, y=y, weights=weights
        )

        logsigma2_loc = 0.0 if weights is None else float(
            jnp.log(jnp.mean(weights))
        )
        hyp = copula.makedict({
            'sigma^2': copula.lognorm(logsigma2_loc, 2.0),
            'lambda_mu': copula.halfcauchy(2.0),
            'lambda_tau': copula.halfnorm(1.48),
            'alpha_mu': copula.beta(2.0, 1.0),
            'alpha_tau': copula.beta(2.0, 1.0),
            'beta_mu': copula.invgamma(1.0, 1.0),
            'beta_tau': copula.invgamma(1.0, 1.0),
            'z_0': copula.uniform(0.0, 1.0),
        })
        merged = {k: hyp[k] for k in hyp.keys()}
        if not marginalize_mean:
            merged['m'] = uncert.normal(0.0, 1.0)
        for k, v in transfhp.items():
            merged[k] = v
        for k, v in dict(otherhp).items():
            if k in merged:
                warnings.warn(f'user hyperparameter {k!r} overrides default')
            merged[k] = v
        hyperprior = uncert.BufferDict(merged)

        def gpfactory(hp, *, z, i_mu, i_tau, pihat, x_aux, weights,
                      splits_mu, splits_tau, **_):
            kw_default = dict(maxd=10, reset=[2, 4, 6, 8], intercept=False)

            gp = GP(checkpos=False, checksym=False)
            for name, kkw, spl in (
                ('mu', kernelkw_mu, splits_mu),
                ('tau', kernelkw_tau, splits_tau),
            ):
                kw = dict(
                    alpha=hp[f'alpha_{name}'], beta=hp[f'beta_{name}'],
                    dim=name, splits=spl, **kw_default,
                )
                kw.update(kkw)
                kernel = BART(indices=True, **kw)
                kernel = kernel * hp[f'lambda_{name}'] ** 2
                gp = gp.defproc(name, kernel)

            gp = gp.defproc(
                'm', (0 * Constant()) if 'm' in hp else Constant()
            )
            if gpaux is None:
                gp = gp.defproc('aux', 0 * Constant())
            else:
                gp = gpaux(hp, gp)

            from ..gp import DefaultProcess
            gp = gp.deflintransf(
                DefaultProcess,
                lambda m, mu, tau, aux: lambda x:
                    m(x) + mu(x) + tau(x) * (x['z'] - hp['z_0']) + aux(x),
                ['m', 'mu', 'tau', 'aux'],
            )

            x = self._join_points(True, z, i_mu, i_tau, pihat, x_aux)
            gp = gp.addx(x, 'trainmean')
            errcov = self._error_cov(hp, weights, x)
            gp = gp.addcov(errcov, 'trainnoise')
            return gp.addtransf(
                {'trainmean': 1.0, 'trainnoise': 1.0}, 'train'
            )

        def data(hp, *, y, **_):
            eta = from_data(hp, y)
            if 'm' in hp:
                eta = eta - hp['m']
            return {'train': eta}

        gpfactorykw = dict(
            y=y, z=z, i_mu=i_mu, i_tau=i_tau, pihat=pihat, x_aux=x_aux,
            weights=weights, splits_mu=splits_mu, splits_tau=splits_tau,
        )
        options = dict(
            raises=False,
            minkw=dict(method='L-BFGS-B',
                       options=dict(maxls=4, maxiter=100)),
            gpfactorykw=gpfactorykw,
            additional_loss=transfloss,
        )
        options.update(fitkw)
        fit = empbayes_fit(hyperprior, gpfactory, data, **options)

        self.fit = fit
        self.sigma = uncert.ufunc(jnp.sqrt, fit.p['sigma^2'])
        self.lambda_mu = fit.p['lambda_mu']
        self.lambda_tau = fit.p['lambda_tau']
        self.alpha_mu = fit.p['alpha_mu']
        self.alpha_tau = fit.p['alpha_tau']
        self.beta_mu = fit.p['beta_mu']
        self.beta_tau = fit.p['beta_tau']
        self.z_0 = fit.p['z_0']
        self.m = fit.p['m'] if 'm' in fit.p else 0.0
        self._from_data = from_data
        self._to_data = to_data
        self._makegp = gpfactory
        self._data = data
        self._gpfactorykw = gpfactorykw
        self._splits_mu = splits_mu
        self._splits_tau = splits_tau

    # -- construction helpers -------------------------------------------------

    def _append_pihat(self, x_mu, x_tau, pihat):
        ip = self._include_pi
        if ip in ('mu', 'both'):
            x_mu = _array.StructuredArray({'x': x_mu, 'pihat': pihat})
        if x_tau is not None and ip in ('tau', 'both'):
            x_tau = _array.StructuredArray({'x': x_tau, 'pihat': pihat})
        return x_mu, x_tau

    @staticmethod
    def _toindices(x, splits):
        ix = BART.indices_from_coord(x, splits)
        return _array.unstructured_to_structured(
            ix, names=[f'f{i}' for i in range(ix.shape[-1])]
        )

    @staticmethod
    def _join_points(train, z, i_mu, i_tau, pihat, x_aux):
        cols = dict(
            train=jnp.broadcast_to(bool(train), z.shape),
            i=jnp.arange(z.size).reshape(z.shape),
            z=z,
            mu=i_mu,
            tau=i_mu if i_tau is None else i_tau,
            pihat=pihat,
        )
        if x_aux is not None:
            cols['aux'] = x_aux
        return _array.StructuredArray(cols)

    @staticmethod
    def _error_cov(hp, weights, x):
        if weights is None:
            var = jnp.broadcast_to(hp['sigma^2'], (len(x),))
        else:
            var = hp['sigma^2'] / weights
        return jnp.diag(var)

    def _gethp(self, hp, rng=None):
        if not isinstance(hp, str):
            return hp
        if hp == 'map':
            return self.fit.pmap
        if hp == 'sample':
            buf = _sample(self.fit.pmean.buf, self.fit.pcov, rng=rng)
            return self.fit.prior.replace_buf(buf)
        raise KeyError(hp)

    # -- prediction ----------------------------------------------------------

    def gp(self, *, hp='map', z=None, x_mu=None, x_tau=None, pihat=None,
           x_aux=None, weights=None, rng=None):
        """GP at the given hyperparameters, with optional test points
        under keys 'testmean'/'test'."""
        hp = self._gethp(hp, rng)
        gp = self._makegp(hp, **self._gpfactorykw)
        if z is not None:
            gp = self._add_test_points(
                gp, hp, z, x_mu, x_tau, pihat, x_aux, weights
            )
        return gp

    def _add_test_points(self, gp, hp, z, x_mu, x_tau, pihat, x_aux,
                         weights):
        z = jnp.asarray(numpy.asarray(z), float).reshape(-1)
        pihat = jnp.asarray(numpy.asarray(pihat), float).reshape(-1)
        x_mu = _to_structured(x_mu)
        if x_tau is not None:
            x_tau = _to_structured(x_tau)
        x_mu, x_tau = self._append_pihat(x_mu, x_tau, pihat)
        i_mu = self._toindices(x_mu, self._splits_mu)
        i_tau = None if x_tau is None else self._toindices(
            x_tau, self._splits_tau
        )
        x = self._join_points(False, z, i_mu, i_tau, pihat, x_aux)
        gp = gp.addx(x, 'testmean')
        if weights is not None:
            errcov = self._error_cov(hp, jnp.asarray(weights), x)
            gp = gp.addcov(errcov, 'testnoise')
            gp = gp.addtransf(
                {'testmean': 1.0, 'testnoise': 1.0}, 'test'
            )
        return gp

    def data(self, *, hp='map', rng=None):
        """The conditioning data dict (transformed outcomes)."""
        hp = self._gethp(hp, rng)
        return self._data(hp, **self._gpfactorykw)

    def pred(self, *, hp='map', z=None, x_mu=None, x_tau=None, pihat=None,
             x_aux=None, error=False, rng=None, transformed=True):
        """Posterior of the latent mean at the given points (default:
        training points).  ``transformed=True`` returns it in the
        transformed (eta) space; the inverse data transformation is
        applied to the mean otherwise (delta method for the sdev)."""
        hp = self._gethp(hp, rng)
        gp = self._makegp(hp, **self._gpfactorykw)
        if z is not None:
            gp = self._add_test_points(
                gp, hp, z, x_mu, x_tau, pihat, x_aux, None
            )
            key = 'testmean'
        else:
            key = 'trainmean'
        data = self._data(hp, **self._gpfactorykw)
        u = gp.predfromdata(data, key)
        if 'm' in hp:
            u = u + hp['m']
        if error:
            n = u.shape[0]
            u = u + uncert.from_cov(
                jnp.zeros(n), hp['sigma^2'] * jnp.eye(n)
            )
        if not transformed:
            u = uncert.ufunc(lambda e: self._to_data(hp, e), u)
        return u

    def from_data(self, y, *, hp='map', rng=None):
        """Map outcomes y to the transformed space eta."""
        hp = self._gethp(hp, rng)
        return self._from_data(hp, jnp.asarray(y))

    def to_data(self, eta, *, hp='map', rng=None):
        """Map transformed values eta back to outcome space."""
        hp = self._gethp(hp, rng)
        return self._to_data(hp, jnp.asarray(eta))

    # -- data transformations -----------------------------------------------

    def _get_transf(self, *, transf, y, weights):
        from_datas, to_datas, hypers = [], [], {}
        if transf is None:
            transf = []
        elif not isinstance(transf, list):
            transf = [transf]

        for i, tr in enumerate(transf):
            name = f'transf{i}_' if len(transf) > 1 else ''
            if not isinstance(tr, str):
                fd, td = tr
            elif tr == 'standardize':
                if weights is None:
                    loc = jnp.mean(y)
                    scale = jnp.std(y)
                else:
                    loc = jnp.average(y, weights=weights)
                    scale = jnp.sqrt(
                        jnp.average((y - loc) ** 2, weights=weights)
                    )
                fd = lambda hp, y, loc=loc, scale=scale: (y - loc) / scale
                td = lambda hp, e, loc=loc, scale=scale: loc + scale * e
            elif tr == 'yeojohnson':
                key = f'{name}lambda_yj'
                fd = lambda hp, y, key=key: yeojohnson(y, hp[key])
                td = lambda hp, e, key=key: yeojohnson_inverse(e, hp[key])
                d = copula.makedict({key: 2.0 * copula.beta(2.0, 2.0)})
                hypers.update({k: d[k] for k in d.keys()})
            elif tr == 'quantilenorm':
                # empirical-quantile -> standard-Normal map: eta =
                # Phi^-1(F_y(y)), realized as a monotone piecewise-linear
                # interpolant between training-quantile knots so it acts
                # on one point at a time and generalizes out of sample
                knots, etas = _quantilenorm_knots(y, weights)
                fd = lambda hp, y, k=knots, e=etas: _pwl(y, k, e)
                td = lambda hp, eta, k=knots, e=etas: _pwl(eta, e, k)
            else:
                raise KeyError(tr)
            from_datas.append(fd)
            to_datas.append(td)

        if transf:
            def from_data(hp, y):
                for fd in from_datas:
                    y = fd(hp, y)
                return y

            def to_data(hp, e):
                for td in reversed(to_datas):
                    e = td(hp, e)
                return e
        else:
            from_data = lambda hp, y: y
            to_data = lambda hp, e: e

        grad = _jaxutil.elementwise_grad(from_data, 1)

        def loss(hp):
            return -jnp.sum(jnp.log(jnp.abs(grad(hp, y))))

        return from_data, to_data, loss, hypers

    def __repr__(self):
        return (
            f'bcf(n={self._gpfactorykw["y"].size}, '
            f'z0={float(self.z_0.mean):.3g}, '
            f'lambda_tau={float(self.lambda_tau.mean):.3g}, '
            f'sigma={float(self.sigma.mean):.3g})'
        )
