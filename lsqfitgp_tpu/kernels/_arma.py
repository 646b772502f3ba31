"""Discrete AR(p) / MA(q) process kernels.

Counterpart of reference ``src/lsqfitgp/_kernels/_arma.py`` (MA ``:32``,
AR ``:371`` over ``_ARBase:66``).  Three AR parametrizations:

- ``phi`` + ``maxlag``: Yule-Walker for the head of the autocovariance,
  then ``lax.scan`` evolution to maxlag;
- ``gamma`` + ``maxlag``: coefficients from a Levinson-Toeplitz solve of
  the Yule-Walker system, then evolution;
- ``slnr``/``lnc`` (log-roots of the characteristic polynomial): the
  analytic mixed power-exponential form, with amplitudes from a linear
  solve against the Yule-Walker head; root multiplicities handled by
  per-occurrence polynomial powers, log-normalized columns for
  stability.
"""

from __future__ import annotations

from jax import lax
from jax import numpy as jnp

from ..kernelalg import stationarykernel
from ..linalg import _toeplitz

__all__ = ['MA', 'AR']


@stationarykernel(derivable=False, maxdim=1, input='abs')
def MA(delta, w=None, norm=False):
    r"""Moving-average kernel over integer lags:
    k(Δ) = Σ_{k=|Δ|}^{n-1} w_k w_{k-|Δ|}; autocovariance of white noise
    filtered by weights w.  ``norm=True`` normalizes k(0) = 1.
    Reference ``_kernels/_arma.py:32``."""
    w = jnp.asarray(w)
    assert w.ndim == 1
    if not w.size:
        return jnp.zeros(delta.shape)
    acf = jnp.convolve(w, w[::-1])
    if norm:
        acf = acf / acf[w.size - 1]
    # round-to-nearest lag: exact on integer inputs, and robust to the
    # O(eps·Δ) float error of the tiled/streaming path's Δ = √r²
    # (truncation would read lag 4 from Δ = 4.99999)
    idx = jnp.round(delta).astype(int) + (w.size - 1)
    return acf.at[idx].get(mode='fill', fill_value=0)


# -- AR helpers ----------------------------------------------------------------


def _yule_walker(gamma):
    """phi (lag 1..p) from autocovariance gamma (lag 0..p): Toeplitz
    solve of the YW system."""
    gamma = jnp.asarray(gamma)
    if gamma.size <= 1:
        return jnp.empty(0, gamma.dtype)
    return _toeplitz.solve(gamma[:-1], gamma[1:])


def _yule_walker_inv(phi):
    """gamma (lag 0..p) from phi, unit driving-noise variance.

    Row m of the linear system: γ_m − Σ_k φ_k γ_{|m−k|} = δ_{m0}; the
    coefficient of γ_j is δ_{mj} − (φ_{m−j} + φ_{m+j}), with the j = 0
    column counting φ_m once.
    """
    phi = jnp.asarray(phi)
    p = phi.size
    pad = jnp.concatenate([jnp.zeros(1, phi.dtype), phi,
                           jnp.zeros(1, phi.dtype)])
    m = jnp.arange(p + 1)[:, None]
    j = jnp.arange(p + 1)[None, :]
    lo = pad[jnp.clip(m - j, 0, p + 1)]
    hi = pad[jnp.clip(m + j, 0, p + 1)]
    A = jnp.eye(p + 1, dtype=phi.dtype) - jnp.where(j > 0, lo + hi, lo)
    e0 = jnp.zeros(p + 1, phi.dtype).at[0].set(1)
    return jnp.linalg.solve(A, e0)


def _ar_evolve(phi, start, n):
    """Evolve the AR recursion γ_m = Σ φ_k γ_{m−k} for n more steps."""
    p = phi.size

    def step(window, _):
        nxt = window @ phi[::-1]
        window = jnp.roll(window, -1).at[-1].set(nxt)
        return window, nxt

    _, out = lax.scan(step, start, None, length=n)
    return out


def _ar_basis(slnr, lnc, lag, lagnorm):
    """Basis of mixed power-exponentials at (broadcast) lags.

    Columns: [∞-root δ_{m0}] + one per real log-root + two (cos/sin or
    power-doubled) per complex log-root.  Each column is divided by a
    lag-independent normalization exp(lognorm) so entries stay O(1).
    """
    lag = jnp.asarray(lag, float)
    # dtype-aware floor: a float64 literal like 1e-300 flushes to 0 in
    # float32, and rep * log(0) = 0 * -inf = NaN for simple roots
    tiny = jnp.finfo(lag.dtype).tiny
    llag = jnp.where(lag > 0, jnp.log(jnp.maximum(lag, tiny)), 0.0)

    def logcol(lam, rep):
        # log of m^rep e^{-lam m} (modulus part)
        return -lam * lag + rep * llag

    def lognorm(lam, rep):
        # max over m in [0, lagnorm] of rep·log m − lam·m
        mstar = jnp.where(lam > 0, rep / jnp.maximum(lam, tiny), lagnorm)
        m0 = jnp.clip(mstar, tiny, lagnorm)
        return rep * jnp.log(jnp.maximum(m0, tiny)) - lam * m0

    cols = [jnp.where(lag == 0, 1.0, 0.0)]

    # real roots: basis sign^m |r|^{-m} m^rep
    prev = None
    rep = 0
    reps = []
    for i in range(slnr.shape[0]):
        root = slnr[i]
        if prev is None:
            rep = jnp.zeros((), int)
        else:
            rep = jnp.where(root == prev, rep + 1, 0)
        prev = root
        lam = jnp.abs(root)
        sign = jnp.sign(root) ** lag
        lc = logcol(lam, rep)
        nrm = lognorm(lam, rep)
        col = sign * jnp.exp(lc - nrm)
        col = jnp.where((rep > 0) & (lag == 0), 0.0, col)
        cols.append(col)

    # complex roots: e^{-λm}, λ = a + ib -> m^rep e^{-am}(cos, sin)(bm)
    prev = None
    rep = 0
    for i in range(lnc.shape[0]):
        root = lnc[i]
        if prev is None:
            rep = jnp.zeros((), int)
        else:
            rep = jnp.where(root == prev, rep + 1, 0)
        prev = root
        a, b = root.real, root.imag
        lc = logcol(a, rep)
        nrm = lognorm(a, rep)
        mod = jnp.exp(lc - nrm)
        mod = jnp.where((rep > 0) & (lag == 0), 0.0, mod)
        ccos = mod * jnp.cos(b * lag)
        csin = mod * jnp.sin(b * lag)
        # a real "complex" root acts as a double real root: the second
        # column gains one power of m instead of the sine
        mod1 = jnp.exp(logcol(a, rep + 1) - lognorm(a, rep + 1))
        mod1 = jnp.where(lag == 0, 0.0, mod1)
        second = jnp.where(b != 0, csin, mod1)
        cols.append(ccos)
        cols.append(second)
        rep = jnp.where(b != 0, rep, rep + 1)

    return jnp.stack(cols, axis=-1)


def _phi_from_roots(slnr, lnc):
    """AR coefficients from the log-roots: expand
    P(x) = Π_j (1 − x / x_j) and read φ_k = −coeff_k."""
    ir_real = jnp.copysign(jnp.exp(-jnp.abs(slnr)), slnr)  # 1/x_j
    ic = jnp.exp(-lnc)                                      # complex 1/x_j
    p = slnr.shape[0] + 2 * lnc.shape[0]
    coef = jnp.zeros(p + 1, complex).at[0].set(1)
    for i in range(slnr.shape[0]):
        shifted = jnp.roll(coef, 1).at[0].set(0)
        coef = coef - ir_real[i] * shifted
    for i in range(lnc.shape[0]):
        # multiply by (1 - ic x)(1 - conj(ic) x)
        #            = 1 - 2 Re(ic) x + |ic|^2 x^2
        c = ic[i]
        s1 = jnp.roll(coef, 1).at[0].set(0)
        s2 = jnp.roll(coef, 2).at[0].set(0).at[1].set(0)
        coef = coef - 2 * c.real * s1 + (c.real**2 + c.imag**2) * s2
    return -coef[1:].real


@stationarykernel(derivable=False, maxdim=1, input='abs')
def _ARBase(delta, phi=None, gamma=None, maxlag=None, slnr=None, lnc=None,
            norm=False):
    r"""Discrete autoregressive kernel.

    Specify exactly one of phi+maxlag, gamma+maxlag, or slnr+lnc; see
    class `AR` for the parameter meanings.
    Reference ``_kernels/_arma.py:66``."""
    by_phi = phi is not None and maxlag is not None and gamma is None \
        and slnr is None and lnc is None
    by_gamma = gamma is not None and maxlag is not None and phi is None \
        and slnr is None and lnc is None
    by_roots = slnr is not None and lnc is not None and phi is None \
        and gamma is None and maxlag is None
    if not (by_phi or by_gamma or by_roots):
        raise ValueError('specify exactly one of phi+maxlag, gamma+maxlag, '
                         'slnr+lnc')

    if by_roots:
        slnr = jnp.asarray(slnr, float)
        lnc = jnp.asarray(lnc, complex)
        phi = _phi_from_roots(slnr, lnc)
        gam = _yule_walker_inv(phi)
        if norm:
            gam = gam / gam[0]
        p = phi.size
        lag0p = jnp.arange(p + 1).astype(float)
        M = _ar_basis(slnr, lnc, lag0p, max(p, 1))
        ampl = jnp.linalg.solve(M, gam)
        basis = _ar_basis(slnr, lnc, delta, max(p, 1))
        return basis @ ampl

    if by_phi:
        phi = jnp.asarray(phi, float)
        gam = _yule_walker_inv(phi)
    else:
        gam = jnp.asarray(gamma, float)
        phi = _yule_walker(gam)
    if norm:
        gam = gam / gam[0]
    n_ext = int(maxlag) + 1 - gam.size
    if n_ext > 0:
        ext = _ar_evolve(phi, gam[gam.size - phi.size:], n_ext)
        acf = jnp.concatenate([gam, ext])
    else:
        acf = gam
    # round-to-nearest lag (see MA): robust to √r² float error
    return acf.at[jnp.round(delta).astype(int)].get(mode='fill',
                                                    fill_value=jnp.nan)


class AR(_ARBase):
    r"""Autoregressive process kernel y_i = Σ_k φ_k y_{i-k} + ε_i.

    Parameters: ``phi`` (AR coefficients, lag 1..p) + ``maxlag``, or
    ``gamma`` (autocovariance, lag 0..p) + ``maxlag``, or the log-root
    parametrization ``slnr`` (signed log real roots) + ``lnc`` (log
    complex roots, one per conjugate pair).  ``norm=True`` normalizes
    the variance to 1.  Reference ``_kernels/_arma.py:371``.
    """

    @classmethod
    def phi_from_gamma(cls, gamma):
        """AR coefficients from the autocovariance head (Yule-Walker)."""
        return _yule_walker(jnp.asarray(gamma, float))

    @classmethod
    def gamma_from_phi(cls, phi):
        """Autocovariance head from AR coefficients (unit noise).

        Wildly inaccurate for roots with high multiplicity or very close
        to 1 (inherent to the Yule-Walker linear system)."""
        return _yule_walker_inv(jnp.asarray(phi, float))

    @classmethod
    def extend_gamma(cls, gamma, phi, n):
        """Extend the autocovariance ``n`` lags past its end using the
        AR recursion."""
        gamma = jnp.asarray(gamma, float)
        phi = jnp.asarray(phi, float)
        assert gamma.size > phi.size
        ext = _ar_evolve(phi, gamma[gamma.size - phi.size:], int(n))
        return jnp.concatenate([gamma, ext])

    @classmethod
    def phi_from_roots(cls, slnr, lnc):
        """AR coefficients from log-root parametrization."""
        return _phi_from_roots(
            jnp.asarray(slnr, float), jnp.asarray(lnc, complex)
        )
