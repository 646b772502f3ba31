"""The primitive (antiderivative) of the observed process: define the
smooth process F, observe its derivative f = F', and predict F — whose
overall constant stays free, as it must (the reference's examples/d.py
theme, re-derived)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-3, 3, 40))
    # truth: F(x) = sin(2x)/2, f(x) = cos(2x)
    y = np.cos(2 * x) + 0.03 * rng.standard_normal(x.size)

    gp = lgp.GP(lgp.ExpQuad())                 # prior on F
    gp = gp.defderiv('f', 1, lgp.DefaultProcess)
    gp = gp.addx(x, 'data', proc='f')
    gp = gp.addx(x, 'F')

    u = gp.predfromdata({'data': y}, 'F', 0.03**2 * np.eye(x.size))

    # the posterior determines F up to an additive constant: centered
    # prediction matches the centered truth, while the absolute level
    # keeps the prior's O(1) uncertainty
    got = np.asarray(u.mean)
    want = np.sin(2 * x) / 2
    rmse = np.sqrt(np.mean(((got - got.mean()) - (want - want.mean()))**2))
    print(f'centered rmse: {rmse:.3f}')
    assert rmse < 0.1
    level_sd = float(np.mean(np.asarray(u.sdev)))
    print(f'mean posterior sd (free constant): {level_sd:.3f}')
    assert level_sd > 0.05
    return u


if __name__ == '__main__':
    main()
