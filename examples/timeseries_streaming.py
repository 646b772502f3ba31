"""Time-series regression at never-materialized-Gram scale: a
Celerite (damped simple-harmonic-oscillator) kernel — the classic
stochastic-variability model for irregularly sampled light curves —
through ``GP(solver='chol-stream')``.

One-dimensional STATIONARY kernels qualify for the streaming solver:
at p = 1 a kernel of |Δ| is an isotropic kernel of the Euclidean
distance, and the streaming pipeline computes distances as exact
outer differences, so the non-smooth |Δ| profile keeps full f32
precision near the diagonal.  The same code runs at n = 65536 on one
16 GB chip (the dense Gram would be 17 GB); here a CI-friendly size.

Reference context: the reference evaluates Celerite densely
(``src/lsqfitgp/_kernels/_celerite.py``) and has no out-of-core path.
"""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(11)
    n = 700                        # 65536 on a real chip, same code

    # irregular sampling: a union of observing windows
    t = np.sort(rng.uniform(0.0, 120.0, n)).astype(np.float32)

    # synthetic damped oscillation, period ~ 6.3, decay ~ 10
    true = dict(amp=1.2, gamma=0.1, B=0.05, noise=0.04)
    d = np.abs(t[:, None] - t[None, :])
    K = true['amp'] * np.exp(-true['gamma'] * d) * (
        np.cos(d) + true['B'] * np.sin(d))
    K += true['noise'] * np.eye(n)
    y = jnp.asarray(np.linalg.cholesky(K) @ rng.standard_normal(n),
                    jnp.float32)

    # amp * Celerite(gamma, B) + noise * White — all four
    # hyperparameters reach the streaming solver's exact gradient
    def gpfactory(hp):
        kernel = hp['amp'] * lgp.Celerite(gamma=hp['gamma'], B=0.05) \
            + hp['noise'] * lgp.White()
        return lgp.GP(kernel, solver='chol-stream', block=128) \
            .addx(t, 'obs')

    fit = lgp.empbayes_fit(
        {'log(amp)': (0.0, 1.0),
         'log(gamma)': (np.log(0.2), 1.0),
         'log(noise)': (np.log(0.02), 1.0)},
        gpfactory, {'obs': y},
        raises=False,
    )
    amp = float(fit.pmean['amp'])
    gamma = float(fit.pmean['gamma'])
    noise = float(fit.pmean['noise'])
    print(f'streaming Celerite fit: amp {amp:.2f} (true 1.2), '
          f'gamma {gamma:.3f} (true 0.1), noise {noise:.4f} '
          f'(true 0.04)')
    assert 0.5 < amp < 3.0
    assert 0.03 < gamma < 0.4
    assert 0.01 < noise < 0.12

    # forecast beyond the last observation, streaming posterior
    tstar = jnp.asarray(np.linspace(100.0, 140.0, 60), jnp.float32)
    gp = fit.gp().addx(tstar, 'forecast')
    post = gp.predfromdata({'obs': y}, 'forecast')
    mean = np.asarray(post.mean)
    sdev = np.asarray(post.sdev)
    assert np.all(np.isfinite(mean)) and np.all(sdev >= 0)
    # uncertainty grows past the data and saturates at the prior level
    assert sdev[-1] > sdev[0]
    print(f'forecast sdev grows {sdev[0]:.3f} -> {sdev[-1]:.3f} '
          f'(prior level ~ {np.sqrt(amp):.3f})')


if __name__ == '__main__':
    main()
