"""Pallas tiled Gram assembly in the GP vs the broadcast path
(reference ``_elements.py:554-580`` halfmatrix semantics; forced tiled
mode runs the Pallas interpreter on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP
from lsqfitgp_tpu.kernels import ExpQuad, Cauchy, Maternp, GammaExp

from util import tol


def _prior_cov(kernel, x, gram, **kw):
    return np.asarray(
        GP(kernel, gram=gram, checkpos=False, **kw)
        .addx(x, 'a').prior('a', raw=True)
    )


KERNELS = [
    ('expquad', lambda: ExpQuad()),
    ('expquad_scaled', lambda: ExpQuad(scale=2.5, loc=0.5)),
    ('cauchy', lambda: Cauchy(alpha=1.5, beta=2.0)),
    ('matern2', lambda: Maternp(p=2)),
    ('gammaexp', lambda: GammaExp(gamma=1.3)),
]


@pytest.mark.parametrize('name,mk', KERNELS, ids=[k[0] for k in KERNELS])
def test_tiled_matches_broadcast_1d(name, mk, rng):
    x = rng.uniform(-3, 3, 60)
    K1 = _prior_cov(mk(), x, 'tiled')
    K2 = _prior_cov(mk(), x, 'broadcast')
    # f32: the MXU form r² = ‖x‖²+‖y‖²−2xy cancels for close points;
    # non-smooth profiles (|r|^γ) amplify that to ~1e-5
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-4, atol32=1e-5))


def test_tiled_matches_broadcast_structured(rng):
    # multi-field structured input: the case where the MXU r² wins
    x = np.empty(50, dtype=[('u', float), ('v', float), ('w', float)])
    for f in 'uvw':
        x[f] = rng.uniform(-2, 2, 50)
    K1 = _prior_cov(ExpQuad(scale=1.7), x, 'tiled')
    K2 = _prior_cov(ExpQuad(scale=1.7), x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-5, atol32=1e-6))


def test_halfmatrix_sym(rng):
    x = rng.uniform(-3, 3, 40)
    K1 = _prior_cov(ExpQuad(), x, 'tiled', halfmatrix=True)
    K2 = _prior_cov(ExpQuad(), x, 'broadcast')
    np.testing.assert_allclose(K1, K1.T, atol=0)
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-5, atol32=1e-6))


def test_cross_block(rng):
    xa = rng.uniform(-3, 3, 30)
    xb = rng.uniform(-3, 3, 20)

    def build(gram):
        return GP(ExpQuad(scale=1.3), gram=gram, checkpos=False) \
            .addx(xa, 'a').addx(xb, 'b')

    Ka = build('tiled')._assemble(['a'], ['b'])
    Kb = build('broadcast')._assemble(['a'], ['b'])
    np.testing.assert_allclose(np.asarray(Ka), np.asarray(Kb),
                               **tol(1e-12, 1e-12,
                                     rtol32=1e-5, atol32=1e-6))


def test_traced_hyperparams_grad(rng):
    # the tiled path must be differentiable w.r.t. hyperparameters in
    # both modes (the fit uses reverse for the NLL and forward for the
    # Fisher) and must not leak tracers into static closures
    x = rng.uniform(-3, 3, 25)
    y = rng.standard_normal(25)

    def nll(log_scale, gram):
        gp = GP(ExpQuad(scale=jnp.exp(log_scale)), gram=gram,
                checkpos=False)
        gp = gp.addx(x, 'a')
        K = gp._assemble(['a'], ['a'])
        K = K + 0.01 * jnp.eye(25)
        from lsqfitgp_tpu.linalg import Chol
        return Chol(K).minus_log_normal_density(jnp.asarray(y))

    g1 = float(jax.grad(nll)(0.3, 'tiled'))
    g2 = float(jax.grad(nll)(0.3, 'broadcast'))
    np.testing.assert_allclose(g1, g2, rtol=2e-3)
    j1 = float(jax.jacfwd(nll)(0.3, 'tiled'))
    np.testing.assert_allclose(j1, g2, rtol=2e-3)


def test_transformed_kernel_falls_back(rng):
    # value-changing transformations (other than the scalar chains,
    # isotropic sums, and White sums the spec algebra tracks) drop the
    # fast-Gram spec: the tiled mode must still produce correct values
    # through the broadcast fallback
    x = rng.uniform(-3, 3, 30)
    k = (ExpQuad() + 0.5 * Cauchy(alpha=1.0, beta=1.0)) \
        .linop('rescale', lambda t: 1 + t ** 2)
    assert getattr(k, '_fastgram', 'missing') is None
    K1 = _prior_cov(k, x, 'tiled')
    K2 = _prior_cov(k, x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-5, atol32=1e-6))


def test_deriv_falls_back(rng):
    x = rng.uniform(-3, 3, 20)
    K1 = np.asarray(
        GP(ExpQuad(), gram='tiled', checkpos=False)
        .addx(x, 'a', deriv=1).prior('a', raw=True)
    )
    K2 = np.asarray(
        GP(ExpQuad(), gram='broadcast', checkpos=False)
        .addx(x, 'a', deriv=1).prior('a', raw=True)
    )
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-5, atol32=1e-6))


def test_spec_attached_and_dropped():
    k = ExpQuad(scale=2.0)
    assert k._fastgram is not None
    assert k._fastgram.scale == 2.0
    assert k.linop('scale', 3.0)._fastgram is None
    # sums of profiled kernels KEEP the spec as a term sum (round 4)
    assert (k + k)._fastgram is not None \
        and (k + k)._fastgram.terms is not None
    # kernel PRODUCTS and batching drop it
    assert (k * k)._fastgram is None
    assert k.batch(10e6)._fastgram is None


def test_auto_mode_cpu_uses_broadcast(rng):
    # on CPU 'auto' must never enter the (interpreted, slow) Pallas path
    gp = GP(ExpQuad(), gram='auto', checkpos=False).addx(
        rng.uniform(-1, 1, 10), 'a')
    ea = gp._elements['a']
    k = gp._crosskernel(ea.proc, ea.proc)
    assert gp._block_points_tiled(k, ea, ea) is None


def test_nested_subarray_fields(rng):
    # nested structured fields and subarray tails all count as
    # coordinates (matching sum_recurse_fields summing tail axes)
    x = np.empty(40, dtype=[('u', [('p', float), ('q', float, (2,))]),
                            ('v', float)])
    x['u']['p'] = rng.uniform(-2, 2, 40)
    x['u']['q'] = rng.uniform(-2, 2, (40, 2))
    x['v'] = rng.uniform(-2, 2, 40)
    K1 = _prior_cov(ExpQuad(scale=1.3), x, 'tiled')
    K2 = _prior_cov(ExpQuad(scale=1.3), x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-4, atol32=1e-5))


def test_maxdim_kernel_respects_guard(rng):
    # Wendland's maxdim is a callable of (k, alpha); the tiled path
    # must resolve it and fall back so the broadcast guard still raises
    from lsqfitgp_tpu.kernels import Wendland
    k = Wendland(k=1, alpha=1)  # maxdim small
    spec = k._fastgram
    assert spec is not None and spec.maxdim is not None
    x = np.empty(10, dtype=[(f'f{i}', float) for i in range(8)])
    for i in range(8):
        x[f'f{i}'] = rng.uniform(0, 0.2, 10)
    import lsqfitgp_tpu as lgp
    gp = GP(k, gram='tiled', checkpos=False).addx(x, 'a')
    ea = gp._elements['a']
    kk = gp._crosskernel(ea.proc, ea.proc)
    # 8 columns > maxdim: the tiled dispatcher must decline
    assert gp._block_points_tiled(kk, ea, ea) is None


def test_posabs_abs_modes_grad_finite(rng):
    # profiles singular at r=0 ('abs'/'posabs' input modes) must give
    # finite tiled-path gradients — including on the Gram diagonal and
    # with tile padding (review findings: sqrt'(0) NaN weights)
    from lsqfitgp_tpu.kernels import Expon, GammaExp
    x = rng.uniform(-3, 3, 30)  # 30 % 128 != 0: padding in play
    y = rng.standard_normal(30)

    for mk in (lambda s: Expon(scale=s),
               lambda s: GammaExp(gamma=1.3, scale=s)):
        def obj(log_s, mk=mk):
            gp = GP(mk(jnp.exp(log_s)), gram='tiled', checkpos=False)
            gp = gp.addx(x, 'a')
            K = gp._assemble(['a'], ['a']) + 0.1 * jnp.eye(30)
            from lsqfitgp_tpu.linalg import Chol
            return Chol(K).minus_log_normal_density(jnp.asarray(y))

        g = float(jax.grad(obj)(0.2))
        assert np.isfinite(g)
        j = float(jax.jacfwd(obj)(0.2))
        assert np.isfinite(j)
        np.testing.assert_allclose(g, j, **tol(1e-6, rtol32=1e-3))


def test_forcekron_not_fast_pathed(rng):
    # forcekron turns the isotropic profile into a per-field product;
    # the spec must NOT be attached (review finding)
    from lsqfitgp_tpu.kernels import Cauchy
    k = Cauchy(alpha=1.0, beta=1.0, forcekron=True)
    assert getattr(k, '_fastgram', 'missing') is None
    x = np.empty(20, dtype=[('u', float), ('v', float)])
    x['u'] = rng.uniform(-2, 2, 20)
    x['v'] = rng.uniform(-2, 2, 20)
    K1 = _prior_cov(k, x, 'tiled')
    K2 = _prior_cov(k, x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-5, atol32=1e-6))


def test_nonnumeric_leaf_disables_fast_path(rng):
    # a bool field must disable the fast path entirely, not silently
    # drop its column (review finding)
    from lsqfitgp_tpu.kernelalg import _fastgram as fg
    import lsqfitgp_tpu as lgp
    x = np.empty(10, dtype=[('t', float), ('flag', '?')])
    x['t'] = rng.uniform(-1, 1, 10)
    x['flag'] = rng.uniform(size=10) > 0.5
    assert fg.leaf_columns(lgp.asarray(x)) is None


def test_tiled_sum_of_isotropic_kernels(rng):
    """Sums of profiled isotropic kernels keep the tiled dispatch (the
    terms spec): each term's scale is applied to r² inside the summed
    profile, and the whole matches the broadcast path."""
    x = rng.uniform(-3, 3, 60)
    k = 1.3 * ExpQuad(scale=0.7) + 0.8 * Cauchy(scale=4.0, alpha=1.5)
    assert k._fastgram is not None and k._fastgram.terms is not None
    K1 = _prior_cov(k, x, 'tiled')
    K2 = _prior_cov(k, x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-4, atol32=1e-5))


def test_tiled_sum_outer_chain_and_nesting(rng):
    """amp * (k1 + k2) + c nests: the summed spec becomes one term of
    the wider sum, the outer chain applies to the whole."""
    x = rng.uniform(-2, 2, 50)
    inner = 1.1 * ExpQuad(scale=0.5) + Maternp(p=1, scale=2.0)
    k = 2.0 * (inner + 0.1) + 0.7 * GammaExp(gamma=1.3)
    spec = k._fastgram
    assert spec is not None and spec.terms is not None
    K1 = _prior_cov(k, x, 'tiled')
    K2 = _prior_cov(k, x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=1e-4, atol32=2e-5))


# -- 1-D stationary kernels on the fast path (round-4) -------------------------
#
# In one dimension a stationary kernel of |Δ| is an isotropic kernel of
# the Euclidean distance, and a SYMMETRIC 'signed' kernel is an even
# function of Δ (k(x,y) = k(y,x)), so both ride the tiled dispatch.
# The p = 1 tile path computes the outer difference EXACTLY (no MXU
# norm-expansion cancellation), so tolerances are tight even for
# non-smooth |Δ| cores.

STATIONARY = [
    ('expon', lambda: lgp.Expon(scale=2.0)),
    ('celerite', lambda: lgp.Celerite(gamma=0.7, B=0.3, scale=1.5)),
    ('celerite_chain',
     lambda: 1.7 * lgp.Celerite(gamma=0.7, B=0.3, scale=1.5) + 0.1),
    ('periodic', lambda: lgp.Periodic(outerscale=0.7)),
    ('harmonic', lambda: lgp.Harmonic(Q=2.0, scale=3.0)),
    ('cos', lambda: lgp.Cos(scale=1.3)),
    ('sinc', lambda: lgp.Sinc(scale=2.0)),
    ('holeeffect', lambda: lgp.HoleEffect(scale=1.4)),
    ('pink', lambda: lgp.Pink(dw=1.5)),
]


@pytest.mark.parametrize('name,mk', STATIONARY,
                         ids=[k[0] for k in STATIONARY])
def test_tiled_matches_broadcast_stationary_1d(name, mk, rng):
    x = np.sort(rng.uniform(0.0, 30.0, 300))
    K1 = _prior_cov(mk(), x, 'tiled')
    K2 = _prior_cov(mk(), x, 'broadcast')
    np.testing.assert_allclose(K1, K2, **tol(1e-12, 1e-12,
                                             rtol32=2e-5, atol32=1e-5))


def test_stationary_spec_gates():
    """Spec-eligibility edges: vector static args (MA/AR) and
    non-symmetric signed cores stay on the broadcast path; everything
    attaches with maxdim clamped to 1."""
    assert lgp.MA(w=[1.0, 0.5, 0.25])._fastgram is None
    assert lgp.AR(phi=[0.5], maxlag=10)._fastgram is None
    spec = lgp.Celerite(gamma=1.0, B=0.0)._fastgram
    assert spec is not None and spec.maxdim == 1 and spec.mode == 'abs'
    assert lgp.Periodic()._fastgram.mode == 'abs'   # even signed core
    from lsqfitgp_tpu.kernelalg import CrossStationaryKernel
    crossk = CrossStationaryKernel(lambda d: jnp.exp(-jnp.abs(d)) * d,
                                   input='signed')
    assert crossk._fastgram is None   # cross: evenness not guaranteed
    # 2-column input exceeds the clamped maxdim -> broadcast fallback,
    # which raises the kernel's own maxdim guard
    gp = GP(lgp.Expon(), gram='tiled', checkpos=False)
    xs = lgp.asarray({'a': np.arange(8.0), 'b': np.arange(8.0)})
    with pytest.raises(Exception):
        gp.addx(xs, 'a').prior('a', raw=True)


def test_tiled_stationary_gradient_matches_broadcast(rng):
    """Hyperparameter gradient through the tiled p = 1 Gram (the
    custom-JVP exact-dr² path) matches the broadcast path."""
    x = np.sort(rng.uniform(0.0, 20.0, 200)).astype(np.float32)
    y = np.sin(x) + 0.1 * rng.standard_normal(200).astype(np.float32)

    def nll(g, gram):
        k = 1.3 * lgp.Celerite(gamma=g, B=0.2, scale=2.0)
        gp = GP(k, gram=gram, checkpos=False, epsabs=0.05, epsrel=0)
        gp = gp.addx(x, 'f')
        return gp.marginal_likelihood({'f': y})

    vt, gt = jax.value_and_grad(lambda g: nll(g, 'tiled'))(
        jnp.float32(0.5))
    vb, gb = jax.value_and_grad(lambda g: nll(g, 'broadcast'))(
        jnp.float32(0.5))
    np.testing.assert_allclose(float(vt), float(vb), rtol=1e-4)
    np.testing.assert_allclose(float(gt), float(gb), rtol=1e-3)
