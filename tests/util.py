"""Shared test utilities (model: reference tests/util.py — retry
decorator for statistically flaky tests, structured-array-aware
asserts)."""

import functools

import numpy as np

from lsqfitgp_tpu import StructuredArray


def tryagain(fun=None, *, times=2):
    """Re-run a statistically flaky test once (with a shifted seed
    argument if the test accepts ``rng``) before failing."""
    if fun is None:
        return lambda f: tryagain(f, times=times)

    @functools.wraps(fun)
    def wrapper(*args, **kw):
        last = None
        for attempt in range(times):
            try:
                return fun(*args, **kw)
            except AssertionError as exc:
                last = exc
                # perturb any rng-like kwarg for the retry
                rng = kw.get('rng')
                if rng is not None:
                    kw['rng'] = np.random.default_rng(
                        rng.integers(2 ** 31) + attempt + 1
                    )
        raise last

    return wrapper


def assert_equal(a, b):
    """Structured-array-aware exact equality."""
    if isinstance(a, StructuredArray) or isinstance(b, StructuredArray):
        assert isinstance(a, StructuredArray)
        assert isinstance(b, StructuredArray)
        assert a.fields == b.fields
        for name in a.fields:
            assert_equal(a[name], b[name])
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_close(a, b, **kw):
    if isinstance(a, StructuredArray) or isinstance(b, StructuredArray):
        assert a.fields == b.fields
        for name in a.fields:
            assert_close(a[name], b[name], **kw)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


def is_f32():
    """True in the LSQFITGP_TPU_F32 (fp32 / TPU-regime) test lane."""
    import jax.numpy as jnp
    return jnp.zeros(()).dtype == jnp.float32


def tol(rtol64, atol64=0.0, *, rtol32=None, atol32=None, scale=1.0):
    """Lane-aware tolerance kwargs for assert_allclose.

    ``rtol64``/``atol64`` are the x64 (reference-parity) tolerances;
    the fp32 lane uses ``rtol32``/``atol32`` when given, else tolerances
    scaled by the eps ratio capped at fp32-realistic floors.  ``scale``
    multiplies everything (for badly conditioned cases).
    """
    if is_f32():
        rtol = rtol32 if rtol32 is not None else max(rtol64, 2e-4)
        atol = atol32 if atol32 is not None else max(atol64, 1e-5)
    else:
        rtol, atol = rtol64, atol64
    return dict(rtol=rtol * scale, atol=atol * scale)


def lane_allclose(a, b, rtol=1e-7, atol=0.0, *, rtol32floor=3e-3,
                  atol32floor=3e-3, **kw):
    """assert_allclose with fp32-lane floors: in the LSQFITGP_TPU_F32
    lane, rtol/atol are raised to fp32-realistic minimums (GP posterior
    algebra against f64 dense references is conditioning-limited in
    fp32); in the x64 lane the stated tolerances apply unchanged."""
    if is_f32():
        rtol = max(rtol, rtol32floor)
        atol = max(atol, atol32floor)
    np.testing.assert_allclose(np.asarray(a, 'f8'), np.asarray(b, 'f8'),
                               rtol=rtol, atol=atol, **kw)
