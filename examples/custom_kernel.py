"""Defining a new kernel with the decorators and putting its
derivatives to a harsh trial: a hand-made rational-quadratic kernel
declared isotropic, differentiated twice on both sides, and
cross-checked against the closed-form derivative Gram (the reference's
examples/x.py theme)."""

import numpy as np
import jax
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


@lgp.isotropickernel(derivable=True)
def RatQuad(r2, alpha=2.0):
    """k(r²) = (1 + r²/(2α))^(−α)"""
    return (1 + r2 / (2 * alpha)) ** -alpha


def main():
    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(-2, 2, 25))

    k = RatQuad(alpha=2.0)

    # PSD of the plain and doubly-differentiated Gram
    gp = lgp.GP(k)
    gp = gp.defderiv('d1', 1, lgp.DefaultProcess)
    gp = gp.addx(x, 'f').addx(x, 'df', proc='d1')
    K = np.asarray(gp.prior(['f', 'df'], raw=True)[('f', 'f')])
    eig = np.linalg.eigvalsh(K)
    print(f'plain Gram min eig: {eig.min():.2e}')
    assert eig.min() > -1e-5 * eig.max()

    # the cross block f-df must equal the autodiff derivative of the
    # closed-form kernel k(x,y) = (1 + (x-y)²/(2α))^(−α) in y
    Kc = np.asarray(gp.prior(['f', 'df'], raw=True)[('f', 'df')])
    core = lambda xa, ya: (1 + (xa - ya) ** 2 / 4) ** -2.0
    want = np.asarray(jax.vmap(jax.vmap(
        jax.grad(core, argnums=1), (None, 0)), (0, None))(
            jnp.asarray(x), jnp.asarray(x)))
    assert np.allclose(Kc, want, atol=1e-5), np.abs(Kc - want).max()
    print('cross-derivative block matches autodiff of the core')

    # use it: observe f' = -2 sin(2x), predict f = cos(2x)
    y = -2 * np.sin(2 * x)
    u = gp.predfromdata({'df': y}, 'f', 1e-4 * np.eye(x.size))
    got = np.asarray(u.mean)
    want_f = np.cos(2 * x)
    rmse = float(np.sqrt(np.mean(
        ((got - got.mean()) - (want_f - want_f.mean())) ** 2)))
    print(f'centered rmse: {rmse:.3f}')
    assert rmse < 0.1
    return u


if __name__ == '__main__':
    main()
