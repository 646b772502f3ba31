"""Summing two numbers in an infinite-dimensional space: two constant
processes hold the addends, a process-level linear transformation holds
their sum, and conditioning on the addends determines the sum exactly —
GP inference as (very expensive) arithmetic (the reference's
examples/z.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    a, b = 1.25, 2.5

    gp = lgp.GP()
    # each addend is a constant random function u(x) = U, U ~ N(0, 9)
    gp = gp.defproc('u', 9 * lgp.Constant())
    gp = gp.defproc('v', 9 * lgp.Constant())
    gp = gp.deflintransf(
        'sum', lambda u, v: (lambda x: u(x) + v(x)), ['u', 'v'])

    x0 = np.array([0.0])
    gp = gp.addx(x0, 'ua', proc='u')
    gp = gp.addx(x0, 'vb', proc='v')
    gp = gp.addx(x0, 's', proc='sum')

    u = gp.predfromdata({'ua': [a], 'vb': [b]}, 's')
    got = float(u.mean[0])
    sd = float(u.sdev[0])
    print(f'{a} + {b} = {got} ± {sd:.2g}')
    # exact up to the working precision (f32 by default on TPU)
    assert abs(got - (a + b)) < 1e-4
    assert sd < 1e-2

    # the marginal prior of the sum has the variance of the sum of two
    # independent N(0, 9) variables
    prior_var = float(gp.prior('s').sdev[0]) ** 2
    print(f'prior variance of the sum: {prior_var:.2f}')
    assert abs(prior_var - 18) < 1e-3
    return got


if __name__ == '__main__':
    main()
