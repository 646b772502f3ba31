"""Multi-flavor parton-distribution fit with sum rules.

The full pdf-series model of the reference (theme of
``examples/pdf4.py``: latent primitives h_i per flavor, PDFs as second
derivatives f_i = h_i'', momentum and valence sum rules imposed exactly
through boundary evaluations of the primitives), re-built on this
framework's structured inputs:

- one latent process ``h`` over the structured domain (x, pid) with
  kernel ``amp^2 * Cauchy(dim='x') * White(dim='pid')`` — independent
  across flavors, smooth in x;
- ``f = d^2 h / dx^2`` is the PDF; ``int_0^1 dx x f(x) = [x h' - h]``
  and ``int_0^1 dx f(x) = [h']`` follow from the fundamental theorem,
  so the sum rules are EXACT linear observations at the boundaries
  (no quadrature error);
- data = a random linear map of the PDF values (a stand-in for DIS
  convolution kernels), with the hyperparameters (amplitude, x
  correlation length) fitted by empirical Bayes.
"""

import numpy as np

import lsqfitgp_tpu as lgp

flavors = np.array([1, -1, 2, -2, 21])  # d dbar u ubar gluon
nflav = flavors.size
nx = 20
ndata = 10

xtype = np.dtype([('x', float), ('pid', int)])


def grid(xvals):
    out = np.empty((nflav, len(xvals)), xtype)
    out['pid'] = flavors[:, None]
    out['x'] = xvals
    return out


xdata = grid(np.linspace(0, 1, nx))
xbound = grid([0.0, 1.0])
# boundary difference weights: g(1) - g(0) per flavor
bweights = np.tile([-1.0, 1.0], (nflav, 1))

rng = np.random.default_rng(20220416)
M = rng.standard_normal((ndata, nflav, nx)) / np.sqrt(nflav * nx)

# valence rules: numbers of (u - ubar) and (d - dbar) quarks
valence = {'d': ([0, 1], 1.0), 'u': ([2, 3], 2.0)}


def makegp(hp):
    kernel = (
        hp['amp'] ** 2
        * lgp.Cauchy(dim='x', scale=hp['scale'], beta=4)
        * lgp.White(dim='pid')
    )
    gp = (
        lgp.GP()
        .defproc('h', kernel)
        .deftransf('hx', {'h': 1}, deriv='x')
        .deftransf('f', {'h': 1}, deriv=(2, 'x'))
        # primitive of x f(x): x h'(x) - h(x)
        .deftransf('primxf', {'hx': lambda x: x['x'], 'h': -1})
        # data: linear map of the PDF values
        .addx(xdata, 'xdata', proc='f')
        .addtransf({'xdata': M}, 'data', axes=2)
        # momentum sum rule: sum_i int_0^1 dx x f_i(x) = 1
        .addx(xbound, 'xmom', proc='primxf')
        .addtransf({'xmom': bweights}, 'momrule', axes=2)
    )
    # valence sum rules: int dx (f_q - f_qbar) = n_q
    for q, (idx, _) in valence.items():
        gp = gp.addx(xbound[idx], f'x{q}', proc='hx')
        gp = gp.addtransf(
            {f'x{q}': bweights[idx] * np.array([[1.0], [-1.0]])},
            f'{q}rule', axes=2,
        )
    return gp


def constraints():
    out = {'momrule': 1.0}
    for q, (_, nq) in valence.items():
        out[f'{q}rule'] = nq
    return out


def main():
    # fake data drawn from the model at known hyperparameters
    hptrue = {'amp': 1.0, 'scale': 0.6}
    gp = makegp(hptrue)
    prior = gp.predfromdata(constraints(), ['data', 'xdata'])
    sample = next(lgp.raniter(prior, rng=rng))
    dataerr = np.full(ndata, 0.05)
    datamean = np.asarray(sample['data']) \
        + dataerr * rng.standard_normal(ndata)

    given = dict(constraints())
    given['data'] = datamean
    cov = {('data', 'data'): np.diag(dataerr**2)}

    fit = lgp.empbayes_fit(
        {'log(amp)': (0.0, 1.0), 'log(scale)': (np.log(0.5), 0.5)},
        makegp,
        lambda hp: (given, cov),
        raises=False,
        minkw={'options': {'maxiter': 30}},
    )
    print('fitted hyperparameters vs truth:')
    for k in ('amp', 'scale'):
        print(f"  {k}: fit {fit.pmean[k]:.3f}  true {hptrue[k]:.3f}")

    gp = makegp(fit.pmean)
    pred = gp.predfromdata(given, ['xdata'], cov)
    m = np.asarray(pred['xdata'].mean)

    # the posterior PDFs respect the sum rules exactly (they are
    # linear observations): verify the momentum rule by trapezoid
    # quadrature on the posterior mean
    xg = xdata['x'][0]

    def trap(y):
        return float(np.sum((y[1:] + y[:-1]) / 2 * np.diff(xg)))

    mom = sum(trap(xg * m[i]) for i in range(nflav))
    print(f'momentum rule (trapezoid on posterior mean): {mom:.3f} '
          f'(exact constraint: 1; quadrature error expected)')
    assert abs(mom - 1) < 0.2

    truth = np.asarray(sample['xdata'])
    resid = np.abs(m - truth).mean()
    print(f'mean abs error vs truth: {resid:.4f}')


if __name__ == '__main__':
    main()
