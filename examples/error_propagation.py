"""The uncert error-propagation layer: correlated UArrays through
linear and nonlinear maps, covariance introspection, and the
value ± error formatter."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import uncert
from lsqfitgp_tpu.utils import format_uarray, tabulate_together


def main():
    rng = np.random.default_rng(0)

    # correlated inputs
    A = rng.standard_normal((3, 3))
    u = uncert.from_cov(np.array([1.0, 2.0, 3.0]), A @ A.T)

    # linear ops propagate exactly
    v = 2.0 * u + 1.0
    np.testing.assert_allclose(np.asarray(v.cov()),
                               4 * np.asarray(u.cov()), rtol=1e-6)

    # nonlinear: first-order delta method (gvar semantics)
    w = uncert.ufunc(jnp.exp, u[0])
    expected_sd = np.exp(1.0) * float(u[0].sdev)
    np.testing.assert_allclose(float(w.sdev), expected_sd, rtol=1e-5)

    # correlations survive indexing and concatenation
    a, b = u[:2], u[2:]
    c = uncert.uconcatenate([a, b])
    np.testing.assert_allclose(np.asarray(c.cov()),
                               np.asarray(u.cov()), rtol=1e-6)
    cross = np.asarray(uncert.evalcov(a, b))
    np.testing.assert_allclose(cross, np.asarray(u.cov())[:2, 2:],
                               rtol=1e-6)

    # formatting: PDG-style error digits, compact and ± notations
    print('compact :', format_uarray(u[0]))
    print('pm      :', format_uarray(u[0], 'u'))
    print(tabulate_together(
        {'x': u[0], 'y': u[1]}, {'x': v[0], 'y': v[1]},
        headers=['before', 'after'],
    ))


if __name__ == '__main__':
    main()
