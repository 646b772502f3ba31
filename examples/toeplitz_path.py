"""Stationary kernel on a regular grid: the O(n²) Toeplitz solvers
(Schur Cholesky / Levinson) versus the dense decomposition."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu.linalg import toeplitz


def main():
    rng = np.random.default_rng(0)
    n = 400
    x = np.linspace(0, 10, n)            # regular grid -> Toeplitz Gram
    kernel = lgp.ExpQuad(scale=1.5)

    # first column defines the whole matrix
    t = np.asarray(kernel(x, np.full_like(x, x[0])))
    t = t + 1e-4 * (np.arange(n) == 0)   # nugget on the diagonal
    y = np.sin(x) + 0.1 * rng.standard_normal(n)

    # O(n^2) Toeplitz path
    z_t = np.asarray(toeplitz.chol_solve(jnp.asarray(t), jnp.asarray(y)))
    ld_t = float(toeplitz.logdet(jnp.asarray(t)))

    # dense reference
    K = np.asarray(kernel(x[:, None], x[None, :])) + 1e-4 * np.eye(n)
    L = np.linalg.cholesky(K)
    z_d = np.linalg.solve(L, y)
    ld_d = 2 * np.sum(np.log(np.diag(L)))

    err_z = np.max(np.abs(z_t - z_d)) / np.max(np.abs(z_d))
    err_ld = abs(ld_t - ld_d) / abs(ld_d)
    print(f'n = {n} regular grid')
    print(f'whitened-data agreement vs dense: {err_z:.2e}')
    print(f'logdet agreement vs dense:        {err_ld:.2e}')
    f32 = np.asarray(jnp.empty(0)).dtype == np.float32
    lim_z, lim_ld = (3e-2, 1e-3) if f32 else (1e-4, 1e-6)
    assert err_z < lim_z and err_ld < lim_ld


if __name__ == '__main__':
    main()
