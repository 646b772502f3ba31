"""Sampling from a GP posterior: raniter (generator) and batched
sample() over the joint posterior of several keys."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import raniter, sample, uncert


def main():
    rng = np.random.default_rng(0)
    n = 30
    x = np.sort(rng.uniform(-4, 4, n))
    y = np.sin(x) + 0.05 * rng.standard_normal(n)
    xs = np.linspace(-4, 4, 25)

    gp = lgp.GP(lgp.ExpQuad(scale=1.5))
    gp = gp.addx(x, 'data').addx(xs, 'f').addx(xs, 'df', deriv=1)
    post = gp.predfromdata(
        {'data': y}, ['f', 'df'], givencov=0.05 ** 2 * np.eye(n))

    mean = {k: np.asarray(v.mean) for k, v in post.items()}
    cov = {
        (a, b): np.asarray(uncert.evalcov(post[a], post[b]))
        for a in post for b in post
    }

    # generator of joint samples
    it = raniter(mean, cov, key=42)
    s0 = next(it)
    assert s0['f'].shape == (25,) and s0['df'].shape == (25,)

    # batch of samples: functions and their derivatives co-vary
    batch = sample(mean, cov, key=42, shape=400)
    f, df = np.asarray(batch['f']), np.asarray(batch['df'])
    # empirical derivative consistency: finite differences of sampled f
    # correlate with sampled df
    fd = np.gradient(f, xs, axis=1)
    corr = np.corrcoef(fd[:, 12], df[:, 12])[0, 1]
    print(f'corr(finite-diff of f samples, df samples) = {corr:.3f}')
    assert corr > 0.7

    # sample spread matches the posterior sdev
    emp_sd = f.std(0)
    np.testing.assert_allclose(emp_sd, np.asarray(post['f'].sdev),
                               rtol=0.35, atol=0.02)
    print('sampling consistent with the analytic posterior')


if __name__ == '__main__':
    main()
