import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu import _array
from lsqfitgp_tpu import StructuredArray, asarray


def test_from_dict():
    x = asarray({'a': np.arange(5.), 'b': np.ones(5)})
    assert isinstance(x, StructuredArray)
    assert x.shape == (5,)
    assert x.fields == ('a', 'b')
    np.testing.assert_array_equal(np.asarray(x['a']), np.arange(5.))


def test_from_numpy_structured():
    x = np.empty(4, dtype=[('a', float), ('b', float, (3,))])
    x['a'] = np.arange(4)
    x['b'] = np.arange(12).reshape(4, 3)
    s = asarray(x)
    assert s.shape == (4,)
    assert s['b'].shape == (4, 3)
    back = np.asarray(s)
    np.testing.assert_array_equal(back['a'], x['a'])
    np.testing.assert_array_equal(back['b'], x['b'])


def test_nested():
    x = np.empty(3, dtype=[('u', [('p', float), ('q', float)]), ('v', float)])
    x['u']['p'] = [1, 2, 3]
    x['u']['q'] = [4, 5, 6]
    x['v'] = [7, 8, 9]
    s = asarray(x)
    assert isinstance(s['u'], StructuredArray)
    np.testing.assert_array_equal(np.asarray(s['u']['q']), [4, 5, 6])
    if np.asarray(s['v']).dtype == np.float64:
        assert s.dtype == x.dtype
    else:  # f32 lane: field values are stored at the compute dtype
        assert s.dtype.names == x.dtype.names
        assert s.dtype == np.dtype(
            [('u', [('p', 'f4'), ('q', 'f4')]), ('v', 'f4')])


def test_broadcast_indexing():
    x = asarray({'a': np.arange(6.).reshape(2, 3)})
    y = x[:, None]
    assert y.shape == (2, 1, 3)
    z = _array.broadcast_to(y, (2, 4, 3))
    assert z.shape == (2, 4, 3)
    assert z['a'].shape == (2, 4, 3)
    w = x[0]
    assert w.shape == (3,)
    e = x[..., 1]
    assert e.shape == (2,)


def test_pytree_roundtrip():
    x = asarray({'a': np.arange(5.), 'b': np.zeros((5, 2))})
    # note: b has base shape (5,2) since dict fields broadcast; use tails
    leaves, treedef = jax.tree.flatten(x)
    y = jax.tree.unflatten(treedef, leaves)
    assert isinstance(y, StructuredArray)
    assert y.fields == x.fields


def test_vmap_through():
    x = StructuredArray({'a': jnp.arange(6.).reshape(2, 3)})

    def f(row):
        assert row.shape == (3,)
        return jnp.sum(row['a'])

    out = jax.vmap(f)(x)
    np.testing.assert_allclose(np.asarray(out), [3., 12.])


def test_jit_through():
    x = StructuredArray({'a': jnp.arange(4.)})

    @jax.jit
    def f(x):
        return x['a'] ** 2

    np.testing.assert_array_equal(np.asarray(f(x)), np.arange(4.) ** 2)


def test_concatenate():
    x = asarray({'a': np.arange(3.)})
    y = asarray({'a': np.arange(2.)})
    z = _array.concatenate([x, y])
    assert z.shape == (5,)


def test_at_set():
    x = asarray({'a': np.arange(3.)})
    y = x.at['b'].set(np.ones(3))
    assert y.fields == ('a', 'b')
    assert x.fields == ('a',)


def test_unstructured_to_structured():
    x = np.arange(12.).reshape(4, 3)
    s = _array.unstructured_to_structured(x)
    assert s.fields == ('f0', 'f1', 'f2')
    np.testing.assert_array_equal(np.asarray(s['f1']), x[:, 1])
    dt = np.dtype([('a', float), ('b', float, (2,))])
    s2 = _array.unstructured_to_structured(x, dtype=dt)
    assert s2['b'].shape == (4, 2)


def test_subfield_list():
    x = asarray({'a': np.arange(3.), 'b': np.ones(3), 'c': np.zeros(3)})
    y = x[['a', 'c']]
    assert y.fields == ('a', 'c')


def test_reshape_squeeze():
    x = asarray({'a': np.arange(6.)})
    y = x.reshape(2, 3)
    assert y.shape == (2, 3)
    z = y.reshape(-1)
    assert z.shape == (6,)
    w = x[None].squeeze(0)
    assert w.shape == (6,)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        StructuredArray({'a': jnp.zeros(3), 'b': jnp.zeros(4)})


class TestNumpyInterop:
    """__array_function__ protocol + recfunctions-style helpers
    (reference _array.py:389-700 interop surface)."""

    def _mk(self, rng, n=6):
        import lsqfitgp_tpu as lgp
        x = np.empty(n, dtype=[('a', float), ('b', float, (2,))])
        x['a'] = rng.standard_normal(n)
        x['b'] = rng.standard_normal((n, 2))
        return lgp.asarray(x)

    def test_swapaxes(self, rng):
        import lsqfitgp_tpu as lgp
        s = self._mk(rng).reshape(2, 3)
        t = np.swapaxes(s, 0, 1)
        assert t.shape == (3, 2)
        np.testing.assert_array_equal(
            np.asarray(t['a']), np.asarray(s['a']).T)
        # tail axes untouched
        assert t['b'].shape == (3, 2, 2)

    def test_ix_(self, rng):
        import lsqfitgp_tpu as lgp
        s = self._mk(rng, 4)
        t = self._mk(rng, 3)
        A, B = np.ix_(s, t)
        assert A.shape == (4, 1) and B.shape == (1, 3)
        with pytest.raises(ValueError):
            np.ix_(s.reshape(2, 2))

    def test_squeeze_protocol(self, rng):
        s = self._mk(rng, 4).reshape(1, 4)
        assert np.squeeze(s).shape == (4,)

    def test_empty(self):
        import lsqfitgp_tpu as lgp
        dt = np.dtype([('u', float), ('v', float, (3,)),
                       ('w', [('x', float)])])
        e = lgp.empty((2, 5), dt)
        assert e.shape == (2, 5)
        assert e['v'].shape == (2, 5, 3)
        assert e['w']['x'].shape == (2, 5)
        e2 = lgp.empty_like(e)
        assert e2.shape == e.shape and e2.dtype == e.dtype

    def test_structured_to_unstructured(self, rng):
        import lsqfitgp_tpu as lgp
        s = self._mk(rng, 5)
        u = lgp.structured_to_unstructured(s)
        assert u.shape == (5, 3)
        np.testing.assert_allclose(np.asarray(u[:, 0]),
                                   np.asarray(s['a']))
        np.testing.assert_allclose(np.asarray(u[:, 1:]),
                                   np.asarray(s['b']))

    def test_append_fields(self, rng):
        import lsqfitgp_tpu as lgp
        s = self._mk(rng, 5)
        t = lgp.append_fields(s, 'c', rng.standard_normal(5))
        assert t.fields == ('a', 'b', 'c')
        with pytest.raises(ValueError):
            lgp.append_fields(t, 'c', np.zeros(5))

    def test_concatenate_protocol(self, rng):
        s = self._mk(rng, 3)
        t = self._mk(rng, 4)
        c = np.concatenate([s, t])
        assert c.shape == (7,)


class TestCtorFromNumpy:
    """StructuredArray() directly wrapping numpy structured arrays
    (reference _array.py:30 usage pattern)."""

    def test_wrap_numpy_structured(self):
        import lsqfitgp_tpu as lgp
        xy = np.empty((3, 4), dtype=[('x', float), ('y', float)])
        xy['x'] = np.arange(3)[:, None]
        xy['y'] = np.arange(4)[None, :]
        sa = lgp.StructuredArray(xy)
        assert sa.shape == (3, 4)
        assert set(sa.dtype.names) == {'x', 'y'}
        np.testing.assert_allclose(np.asarray(sa['x']), xy['x'])

    def test_copy_construction(self):
        import lsqfitgp_tpu as lgp
        xy = np.zeros(5, dtype=[('t', float)])
        sa = lgp.StructuredArray(xy)
        sb = lgp.StructuredArray(sa)
        assert sb.shape == sa.shape and sb.dtype == sa.dtype

    def test_plain_array_rejected(self):
        import lsqfitgp_tpu as lgp
        with pytest.raises(ValueError):
            lgp.StructuredArray(np.zeros((2, 3)))
