"""GP builder error paths and abstract-mode (jit) operation
(model: reference ``tests/GP/test_GP.py`` error-path and
abstract-mode coverage, incl. :722-740)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lsqfitgp_tpu as lgp
from lsqfitgp_tpu import GP
from lsqfitgp_tpu.kernels import ExpQuad, Expon


@pytest.fixture
def x(rng):
    return np.sort(rng.uniform(-3, 3, 8))


class TestAddxErrors:

    def test_key_required(self, x):
        with pytest.raises(ValueError):
            GP(ExpQuad()).addx(x)

    def test_key_with_dict(self, x):
        with pytest.raises(ValueError):
            GP(ExpQuad()).addx({'a': x}, 'b')

    def test_key_none(self, x):
        with pytest.raises(KeyError):
            GP(ExpQuad()).addx({None: x})

    def test_key_reuse(self, x):
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(KeyError):
            gp.addx(x, 'a')

    def test_missing_proc(self, x):
        with pytest.raises(KeyError):
            GP(ExpQuad()).addx(x, 'a', proc='nonexistent')

    def test_named_deriv_plain_x(self, x):
        with pytest.raises(ValueError):
            GP(ExpQuad()).addx(x, 'a', deriv='field')

    def test_deriv_field_missing(self, rng):
        xs = np.empty(5, dtype=[('u', float)])
        xs['u'] = rng.standard_normal(5)
        with pytest.raises(ValueError):
            GP(ExpQuad()).addx(xs, 'a', deriv=(1, 'v'))

    def test_nonfinite_x(self, x):
        bad = np.array(x)
        bad[0] = np.nan
        with pytest.raises(AssertionError):
            GP(ExpQuad()).addx(bad, 'a')

    def test_no_default_process(self, x):
        with pytest.raises(KeyError):
            GP().addx(x, 'a')

    def test_covfun_not_kernel(self):
        with pytest.raises(TypeError):
            GP(lambda x, y: x * y)


class TestAddcovErrors:

    def test_key_required(self):
        with pytest.raises(ValueError):
            GP().addcov(np.eye(3))

    def test_missing_diagonal(self):
        with pytest.raises(ValueError):
            GP().addcov({('a', 'b'): np.eye(3)})

    def test_odd_ndim(self):
        with pytest.raises(ValueError):
            GP().addcov({('a', 'a'): np.zeros((2, 2, 2))})

    def test_not_square(self):
        with pytest.raises(ValueError):
            GP().addcov({('a', 'a'): np.zeros((2, 3))})

    def test_asymmetric_diag(self):
        M = np.array([[1.0, 2.0], [0.0, 1.0]])
        with pytest.raises(AssertionError):
            GP().addcov({('a', 'a'): M})

    def test_blocks_not_transposes(self):
        with pytest.raises(AssertionError):
            GP().addcov({
                ('a', 'a'): np.eye(2), ('b', 'b'): np.eye(2),
                ('a', 'b'): np.full((2, 2), 1.0),
                ('b', 'a'): np.full((2, 2), 2.0),
            })

    def test_nonfinite(self):
        with pytest.raises(AssertionError):
            GP().addcov({('a', 'a'): np.diag([1.0, np.inf])})

    def test_missing_offdiag_is_zero(self, rng):
        gp = GP().addcov({('a', 'a'): np.eye(2), ('b', 'b'): np.eye(3)})
        blk = np.asarray(gp._assemble(['a'], ['b']))
        np.testing.assert_array_equal(blk, 0.0)


class TestLinTransfErrors:

    def test_nonlinear_rejected(self, x):
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(RuntimeError):
            gp.addlintransf(lambda a: a ** 2, ['a'], 'b')

    def test_affine_rejected(self, x):
        # affine-but-not-linear (nonzero at zero) must be rejected
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(RuntimeError):
            gp.addlintransf(lambda a: a + 1.0, ['a'], 'b')

    def test_checklin_false_accepts(self, x):
        gp = GP(ExpQuad()).addx(x, 'a')
        gp = gp.addlintransf(lambda a: a ** 2, ['a'], 'b',
                             checklin=False)
        assert gp._elements['b'].shape == (len(x),)

    def test_unknown_source_key(self, x):
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(KeyError):
            gp.addlintransf(lambda v: v, ['zzz'], 'b')


class TestProcErrors:

    def test_defproc_reuse(self):
        gp = GP(ExpQuad()).defproc('p')
        with pytest.raises(KeyError):
            gp.defproc('p')

    def test_defproc_not_kernel(self):
        with pytest.raises(TypeError):
            GP().defproc('p', lambda x, y: x * y)

    def test_deftransf_unknown_proc(self):
        with pytest.raises(KeyError):
            GP(ExpQuad()).deftransf('q', {'missing': 1.0})

    def test_deftransf_bad_coefficient(self):
        gp = GP(ExpQuad()).defproc('p')
        with pytest.raises(TypeError):
            gp.deftransf('q', {'p': 'not-a-number'})

    def test_defxtransf_not_callable(self):
        gp = GP(ExpQuad()).defproc('p')
        with pytest.raises(TypeError):
            gp.defxtransf('q', 3.0, 'p')

    def test_defrescale_not_callable(self):
        gp = GP(ExpQuad()).defproc('p')
        with pytest.raises(TypeError):
            gp.defrescale('q', 3.0, 'p')

    def test_independent_procs_zero_cross(self, x):
        gp = GP().defproc('p', ExpQuad()).defproc('q', Expon())
        gp = gp.addx(x, 'a', proc='p').addx(x, 'b', proc='q')
        blk = np.asarray(gp._assemble(['a'], ['b']))
        np.testing.assert_array_equal(blk, 0.0)


class TestPredErrors:

    def test_fromdata_required(self, x, rng):
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 10, 'b')
        with pytest.raises(ValueError):
            gp.pred({'a': rng.standard_normal(len(x))}, 'b')

    def test_unknown_out_key(self, x, rng):
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(KeyError):
            gp.predfromdata({'a': rng.standard_normal(len(x))}, 'zzz')

    def test_given_not_dict(self, x, rng):
        gp = GP(ExpQuad()).addx(x, 'a')
        with pytest.raises(TypeError):
            gp.predfromdata(rng.standard_normal(len(x)), 'a')

    def test_data_shape_mismatch(self, x):
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 10, 'b')
        with pytest.raises(ValueError):
            gp.predfromdata({'a': np.zeros(len(x) + 1)}, 'b')

    def test_nonfinite_data(self, x):
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 10, 'b')
        with pytest.raises(AssertionError):
            gp.predfromdata({'a': np.full(len(x), np.nan)}, 'b')

    def test_unknown_solver(self, x):
        with pytest.raises(KeyError):
            GP(ExpQuad(), solver='qr').addx(x, 'a') \
                ._solver_for(['a'])
        with pytest.raises(KeyError):
            GP.decompose(np.eye(3), solver='qr')

    def test_checkpos_fails_on_indefinite(self):
        gp = GP().addcov({('a', 'a'): np.diag([1.0, -1.0])},
                         )
        with pytest.raises(AssertionError):
            gp.prior('a')


class TestAbstractMode:
    """add*/pred inside jit: eager checks must compile away and results
    must match the eager path (reference test_GP.py:722-740)."""

    def test_full_pipeline_under_jit(self, x, rng):
        y = rng.standard_normal(len(x))
        xnew = x + 0.1

        def go(xj, yj, xnewj):
            gp = GP(ExpQuad())
            gp = gp.addx(xj, 'a').addx(xnewj, 'b')
            gp = gp.addcov(0.01 * jnp.eye(len(x)), 'noise')
            gp = gp.addlintransf(lambda a, e: a + e, ['a', 'noise'],
                                 'data', checklin=False)
            u = gp.predfromdata({'data': yj}, 'b')
            return u.mean, u.sdev

        eager = go(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xnew))
        jitted = jax.jit(go)(jnp.asarray(x), jnp.asarray(y),
                             jnp.asarray(xnew))
        np.testing.assert_allclose(np.asarray(eager[0]),
                                   np.asarray(jitted[0]), rtol=1e-5,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(eager[1]),
                                   np.asarray(jitted[1]), rtol=1e-3,
                                   atol=1e-6)

    def test_nonfinite_check_skipped_when_traced(self, x):
        # a traced NaN cannot be checked eagerly; the build must not fail
        @jax.jit
        def go(xj):
            gp = GP(ExpQuad()).addx(xj, 'a')
            return gp._assemble(['a'], ['a'])

        out = go(jnp.asarray(np.where(np.arange(len(x)) == 0,
                                      np.nan, x)))
        assert np.isnan(np.asarray(out)).any()

    def test_marginal_likelihood_grad_under_jit(self, x, rng):
        y = rng.standard_normal(len(x))

        @jax.jit
        def nll(log_scale):
            gp = GP(ExpQuad(scale=jnp.exp(log_scale)))
            gp = gp.addx(x, 'a')
            gp = gp.addcov(0.1 * jnp.eye(len(x)), 'e')
            gp = gp.addlintransf(lambda a, e: a + e, ['a', 'e'], 'y',
                                 checklin=False)
            return -gp.marginal_likelihood({'y': y})

        g = jax.grad(nll)(0.3)
        assert np.isfinite(float(g))


class TestPredConsistency:

    def test_single_vs_list_key(self, x, rng):
        y = rng.standard_normal(len(x))
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 5, 'b').addx(x - 5, 'c')
        u1 = gp.predfromdata({'a': y}, 'b')
        ud = gp.predfromdata({'a': y}, ['b', 'c'])
        np.testing.assert_allclose(np.asarray(u1.mean),
                                   np.asarray(ud['b'].mean), rtol=1e-7)

    def test_default_outkeys_excludes_given(self, x, rng):
        y = rng.standard_normal(len(x))
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 5, 'b')
        out = gp.predfromdata({'a': y})
        assert set(out) == {'b'}

    def test_prior_list_key(self, x):
        gp = GP(ExpQuad()).addx(x, 'a').addx(x + 5, 'b')
        pr = gp.prior(['a', 'b'])
        assert set(pr) == {'a', 'b'}
        raw = gp.prior(['a', 'b'], raw=True)
        assert raw['a', 'b'].shape == (len(x), len(x))
