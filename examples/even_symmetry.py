"""An exactly even process built by symmetrization: f_even(x) =
(f(x) + f(-x))/2 via deflintransf — data on one side then fully
determine the mirror side (the reference's examples/even.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(4)

    gp = lgp.GP(lgp.ExpQuad())
    gp = gp.deflintransf(
        'even',
        lambda f: (lambda x: 0.5 * (f(x) + f(-x))),
        [lgp.DefaultProcess],
    )
    xr = np.sort(rng.uniform(0.3, 3, 20))      # right-side data only
    y = np.cos(xr) + 0.01 * rng.standard_normal(xr.size)
    gp = gp.addx(xr, 'data', proc='even')
    gp = gp.addx(-xr, 'mirror', proc='even')

    u = gp.predfromdata({'data': y}, 'mirror', 0.01**2 * np.eye(xr.size))
    # evenness: the mirror points are determined as well as the data side
    err = np.max(np.abs(np.asarray(u.mean) - y))
    print(f'mirror-side max deviation from data: {err:.4f}')
    assert err < 0.05
    assert float(np.max(np.asarray(u.sdev))) < 0.05
    return u


if __name__ == '__main__':
    main()
