"""Anisotropic 2-D regression: separate length scales per coordinate
field, fitted by empirical Bayes — the data reveal that the surface
varies fast along x and slowly along y (the reference's examples/q.py
and r.py themes, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(3)
    n = 80
    pts = rng.uniform(0, 4, (n, 2))

    # truth varies on scale ~0.7 in x, ~3 in y
    def truth(x, y):
        return np.sin(3.0 * x) + 0.8 * np.cos(0.7 * y)

    noise = 0.03
    z = truth(pts[:, 0], pts[:, 1]) + noise * rng.standard_normal(n)
    xs = lgp.asarray({'x': pts[:, 0], 'y': pts[:, 1]})

    def gpfactory(hp):
        # per-field scales: ExpQuad on x times ExpQuad on y
        kx = lgp.ExpQuad(scale=hp['sx'], dim='x')
        ky = lgp.ExpQuad(scale=hp['sy'], dim='y')
        return lgp.GP(kx * ky).addx(xs, 'data')

    fit = lgp.empbayes_fit(
        {'log(sx)': (0.0, 1.5), 'log(sy)': (0.0, 1.5)},
        gpfactory,
        ({'data': z}, {('data', 'data'): noise**2 * np.eye(n)}),
        raises=False,
    )
    sx, sy = float(fit.pmean['sx']), float(fit.pmean['sy'])
    print(f'fitted scales: sx={sx:.2f}, sy={sy:.2f}')
    # anisotropy recovered: x-scale several times shorter than y-scale
    assert sx < sy / 2

    # posterior predicts held-out points
    gp = fit.gp()
    tst = rng.uniform(0.5, 3.5, (20, 2))
    gp = gp.addx(lgp.asarray({'x': tst[:, 0], 'y': tst[:, 1]}), 'test')
    u = gp.predfromdata({'data': z}, 'test', noise**2 * np.eye(n))
    rmse = float(np.sqrt(np.mean(
        (np.asarray(u.mean) - truth(tst[:, 0], tst[:, 1]))**2)))
    print(f'held-out rmse: {rmse:.3f}')
    assert rmse < 0.15
    return fit


if __name__ == '__main__':
    main()
