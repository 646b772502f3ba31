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
