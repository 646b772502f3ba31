"""Observing the second derivative: define the smooth process F,
derive f = F'' with a process-level double derivative, observe f, and
predict F — which keeps TWO flat directions (level and slope), as the
double antiderivative must (the reference's examples/doubleint.py
theme, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(-3, 3, 50))
    # truth: F(x) = sin(x), F''(x) = -sin(x)
    noise = 0.02
    y = -np.sin(x) + noise * rng.standard_normal(x.size)

    gp = lgp.GP(lgp.ExpQuad())
    gp = gp.defderiv('f', 2, lgp.DefaultProcess)
    gp = gp.addx(x, 'data', proc='f')
    gp = gp.addx(x, 'F')

    u = gp.predfromdata({'data': y}, 'F', noise**2 * np.eye(x.size))
    got = np.asarray(u.mean)
    want = np.sin(x)

    # remove the affine (level + slope) component from both: the
    # posterior determines F only up to c0 + c1 x
    A = np.stack([np.ones_like(x), x], axis=1)

    def deflate(v):
        coef, *_ = np.linalg.lstsq(A, v, rcond=None)
        return v - A @ coef

    rmse = float(np.sqrt(np.mean((deflate(got) - deflate(want))**2)))
    print(f'affine-deflated rmse: {rmse:.3f}')
    assert rmse < 0.05

    # the affine directions stay uncertain at the prior's level
    sd = np.asarray(u.sdev)
    print(f'posterior sd range: {sd.min():.3f} .. {sd.max():.3f}')
    assert sd.min() > 0.05
    return u


if __name__ == '__main__':
    main()
