"""The kernel zoo in one sweep: instantiate every exported kernel on a
suitable domain, verify the Gram matrix is symmetric PSD with unit-ish
diagonal, and print a one-line profile of each — an executable kernel
reference (the reference's docs/kernelsref gallery, as a script)."""

import numpy as np

import lsqfitgp_tpu as lgp


def main():
    rng = np.random.default_rng(7)
    n = 24
    xu = np.sort(rng.uniform(0.05, 0.95, n))      # (0, 1) domain
    xr = np.sort(rng.uniform(-3, 3, n))           # real line
    xi = np.arange(1, n + 1.0)                    # positive integers

    specials = {
        'AR': lambda: lgp.AR(phi=[0.5, -0.2], maxlag=30),
        'MA': lambda: lgp.MA(w=[1.0, 0.5, 0.2]),
        'BART': lambda: lgp.BART(
            splits=lgp.BART.splits_from_coord(xu), maxd=2),
        'BagOfWords': None,     # text input, shown in docs instead
        'Categorical': lambda: lgp.Categorical(
            cov=np.eye(3) + 0.5),
        'BrownianBridge': lambda: lgp.BrownianBridge(),
        'FracBrownian': lambda: lgp.FracBrownian(H=0.7),
        'Gibbs': lambda: lgp.Gibbs(scalefun=lambda x: 0.5 + 0.2 * x**2),
        'Rescaling': lambda: lgp.Rescaling(stdfun=lambda x: 1 + x**2),
        'Zeta': lambda: lgp.Zeta(nu=1.5),
        'Celerite': lambda: lgp.Celerite(gamma=1.0, B=0.5),
        'Harmonic': lambda: lgp.Harmonic(Q=2.0),
        'Maternp': lambda: lgp.Maternp(p=1),
        'Matern': lambda: lgp.Matern(nu=1.7),
        'Wendland': lambda: lgp.Wendland(k=1),
        'Taylor': lambda: lgp.Taylor(),
        'NNKernel': lambda: lgp.NNKernel(),
        'Linear': lambda: lgp.Linear(),
        'Color': lambda: lgp.Color(n=3),
    }
    domains = {
        'AR': xi, 'MA': xi,   # discrete-time kernels: integer lags
        'BrownianBridge': xu, 'FracBrownian': xr,
        'Wiener': xi / n, 'WienerIntegral': xi / n,
        'OrnsteinUhlenbeck': xi / n,
        'StationaryFracBrownian': xr, 'BART': xu, 'Zeta': xu,
        'Categorical': np.asarray(rng.integers(0, 3, n)),
        'Log': np.abs(xr) + 0.5, 'Taylor': xr / 3,
        'Decaying': np.abs(xr),           # nonnegative domain
        'Fourier': xu, 'Pink': xi, 'Expon': xr,
    }

    count = 0
    for name in sorted(dir(lgp)):
        cls = getattr(lgp, name)
        if not (isinstance(cls, type)
                and issubclass(cls, lgp.CrossKernel)):
            continue
        if name.startswith('Cross') or name in (
                'Kernel', 'CrossKernel', 'StationaryKernel',
                'IsotropicKernel', 'AffineSpan', 'Zero', 'Constant',
                'ZetaFourier'):   # built via the 'fourier' linop family
            continue
        maker = specials.get(name, cls)
        if maker is None:
            continue
        try:
            k = maker()
        except TypeError:
            continue   # needs mandatory args not in specials: skip
        x = domains.get(name, xr)
        K = np.asarray(k(x[:, None], x[None, :]), 'f8')
        # lane eps, not K.dtype: kernels with host/f64 stages hand
        # back f64 arrays whose VALUES carry the lane's roundoff
        import jax.numpy as jnp
        feps = float(jnp.finfo(jnp.zeros(0).dtype).eps)
        sym = np.allclose(K, K.T, atol=max(1e-8, 1e4 * feps))
        eigs = np.linalg.eigvalsh(0.5 * (K + K.T))
        psd = eigs.min() > -1e10 * feps * max(1.0, eigs.max())
        print(f'{name:24s} diag[0]={K[0, 0]:8.3f}  '
              f'eig range [{eigs.min():9.2e}, {eigs.max():9.2e}]  '
              f'{"ok" if sym and psd else "FAIL"}')
        assert sym, name
        assert psd, (name, eigs.min())
        count += 1
    print(f'{count} kernels verified')
    assert count >= 25
    return count


if __name__ == '__main__':
    main()
