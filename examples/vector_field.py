"""Several coordinates under a single field name: a structured input
whose one field holds a 2-vector — isotropic kernels reduce over the
trailing axes of shaped fields, so this is the idiomatic way to write
"points in the plane" (the reference's examples/s.py theme)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(7)
    n = 60
    pts = rng.uniform(-2, 2, (n, 2))

    # one field 'p' of shape (2,) per record
    rec = np.empty(n, dtype=[('p', float, (2,))])
    rec['p'] = pts
    xs = lgp.asarray(rec)

    noise = 0.02
    z = np.sin(pts[:, 0]) * np.cos(pts[:, 1]) \
        + noise * rng.standard_normal(n)

    gp = lgp.GP(lgp.ExpQuad(scale=1.0)).addx(xs, 'data')

    # equivalent formulation with two separate scalar fields
    xs2 = lgp.asarray({'a': pts[:, 0], 'b': pts[:, 1]})
    gp2 = lgp.GP(lgp.ExpQuad(scale=1.0)).addx(xs2, 'data')

    K1 = np.asarray(gp.prior('data', raw=True))
    K2 = np.asarray(gp2.prior('data', raw=True))
    # same Gram matrix: the vector field and the two scalar fields are
    # the same geometry
    assert np.allclose(K1, K2, atol=1e-6)
    print('vector-field Gram == scalar-fields Gram')

    # and inference works the same through either
    tst = rng.uniform(-1.5, 1.5, (15, 2))
    rec_t = np.empty(15, dtype=[('p', float, (2,))])
    rec_t['p'] = tst
    gp = gp.addx(lgp.asarray(rec_t), 'test')
    u = gp.predfromdata({'data': z}, 'test', noise**2 * np.eye(n))
    rmse = float(np.sqrt(np.mean(
        (np.asarray(u.mean) - np.sin(tst[:, 0]) * np.cos(tst[:, 1]))**2)))
    print(f'held-out rmse: {rmse:.3f}')
    assert rmse < 0.1
    return u


if __name__ == '__main__':
    main()
