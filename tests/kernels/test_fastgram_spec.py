"""Fast-Gram spec composition rules (`kernelalg._fastgram`): the
dispatch bookkeeping that keeps the universal fit parameterizations —
``amp * k(scale=s) + c``, ``+ sigma2 * White()``, and multi-scale sums
``a1*k1(s1) + a2*k2(s2)`` — on the tiled/streaming path.  The GP-level
parity lives in tests/GP/test_tiled_gram.py and test_stream_solver.py;
this file pins the spec algebra itself."""

import numpy as np
import jax.numpy as jnp

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu.kernelalg import _fastgram as fg


def _profile_value(kernel, r2):
    profile, params = fg.build_profile(kernel._fastgram)
    return np.asarray(profile(jnp.asarray(r2), *params))


def test_sum_two_profiled_makes_terms():
    k = 1.3 * lgp.ExpQuad(scale=0.7) + 0.8 * lgp.Cauchy(scale=4.0)
    spec = k._fastgram
    assert spec is not None
    assert spec.terms is not None and len(spec.terms) == 2
    assert spec.core is None and spec.scale is None and spec.loc is None
    r2 = np.linspace(0, 30, 64)
    want = 1.3 * np.exp(-0.5 * r2 / 0.7 ** 2) \
        + 0.8 / (1 + r2 / (2 * 4.0 ** 2))
    np.testing.assert_allclose(_profile_value(k, r2), want, rtol=1e-6)


def test_sum_flattens_without_outer_chain():
    k = lgp.ExpQuad(scale=0.5) + lgp.ExpQuad(scale=1.0) \
        + lgp.ExpQuad(scale=2.0)
    assert len(k._fastgram.terms) == 3


def test_sum_nests_with_outer_chain():
    inner = lgp.ExpQuad(scale=0.5) + lgp.ExpQuad(scale=2.0)
    k = 2.0 * inner + lgp.ExpQuad(scale=1.0)
    spec = k._fastgram
    # the chained sum cannot flatten (its 'mul 2' applies to the pair
    # only), so it becomes ONE nested term
    assert len(spec.terms) == 2
    assert spec.terms[0].terms is not None or spec.terms[1].terms is not None
    r2 = np.linspace(0, 10, 32)
    want = 2.0 * (np.exp(-0.5 * r2 / 0.25) + np.exp(-0.5 * r2 / 4.0)) \
        + np.exp(-0.5 * r2)
    np.testing.assert_allclose(_profile_value(k, r2), want, rtol=1e-6)


def test_sum_accumulates_noise_and_maxdim():
    k = (1.0 * lgp.ExpQuad(scale=0.5) + 0.1 * lgp.White()) \
        + (lgp.Wendland(k=1) + 0.2 * lgp.White())
    spec = k._fastgram
    assert spec is not None and spec.terms is not None
    np.testing.assert_allclose(float(spec.noise), 0.3, rtol=1e-6)
    # Wendland(k=1) has a finite maxdim; the sum inherits the
    # tightest bound of its terms
    assert spec.maxdim == lgp.Wendland(k=1)._fastgram.maxdim \
        and spec.maxdim is not None and np.isfinite(spec.maxdim)


def test_loc_drops_in_sums():
    """loc cancels in the distance, so a located kernel still sums."""
    k = lgp.ExpQuad(scale=0.7, loc=2.0) + lgp.ExpQuad(scale=1.5)
    spec = k._fastgram
    assert spec is not None and spec.terms is not None
    assert all(t.loc is None for t in spec.terms)
    r2 = np.linspace(0, 10, 32)
    want = np.exp(-0.5 * r2 / 0.49) + np.exp(-0.5 * r2 / 2.25)
    np.testing.assert_allclose(_profile_value(k, r2), want, rtol=1e-6)


def test_product_of_kernels_drops_spec():
    """k1 * k2 (kernel PRODUCT) stays on the broadcast path."""
    k = lgp.ExpQuad(scale=0.7) * lgp.ExpQuad(scale=1.5)
    assert k._fastgram is None


def test_traced_scales_ride_params():
    """Traced per-term scales appear in the packed parameter vector so
    hyperparameter gradients flow through the summed profile."""
    s1 = jnp.asarray(0.7)
    s2 = jnp.asarray(3.0)
    k = lgp.ExpQuad(scale=s1) + lgp.ExpQuad(scale=s2)
    profile, params = fg.build_profile(k._fastgram)
    vals = [float(p) for p in params]
    # approx: 0.7 is not exactly representable, so the f32 lane packs
    # 0.69999999
    assert any(abs(v - 0.7) < 1e-6 for v in vals)
    assert any(abs(v - 3.0) < 1e-6 for v in vals)


# -- 1-D stationary specs (round-4) ---------------------------------------------

def test_stationary_specs_attach():
    """abs/posabs stationary constructors and SYMMETRIC signed ones
    carry a spec clamped to maxdim=1; cross signed and vector-static
    kernels do not."""
    for k in [lgp.Expon(), lgp.Celerite(gamma=0.7, B=0.3), lgp.Pink(),
              lgp.Sinc(), lgp.HoleEffect(), lgp.Circular(),
              lgp.Periodic(), lgp.Cos(), lgp.Harmonic(Q=1.5),
              lgp.Color(n=3)]:
        spec = k._fastgram
        assert spec is not None and spec.maxdim == 1, type(k).__name__
    assert lgp.MA(w=[1.0, 0.5])._fastgram is None
    assert lgp.AR(phi=[0.5], maxlag=8)._fastgram is None


def test_stationary_profile_matches_core():
    """The spec profile evaluated at r² = Δ² reproduces the kernel."""
    d = np.linspace(0.0, 6.0, 101)
    for k in [lgp.Celerite(gamma=0.7, B=0.3), lgp.Periodic(),
              lgp.Harmonic(Q=2.0), lgp.Expon()]:
        want = np.asarray(k(np.zeros_like(d), d))
        got = _profile_value(k, d * d)
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6,
                                   err_msg=type(k).__name__)


def test_stationary_sums_with_isotropic():
    """Mixed stationary+isotropic sums keep the terms dispatch."""
    k = 1.2 * lgp.Celerite(gamma=0.5, B=0.1, scale=2.0) \
        + 0.7 * lgp.ExpQuad(scale=5.0)
    spec = k._fastgram
    assert spec is not None and spec.terms is not None \
        and len(spec.terms) == 2
    d = np.linspace(0.0, 10.0, 51)
    want = np.asarray(k(np.zeros_like(d), d))
    got = _profile_value(k, d * d)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)
