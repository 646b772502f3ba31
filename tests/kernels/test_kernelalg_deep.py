"""Transformation-engine edge cases (model: reference
``tests/kernels/test_kernel.py``, 57 tests of registry semantics,
promotion/demotion, AffineSpan bookkeeping, decorator behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsqfitgp_tpu.kernelalg import (
    CrossKernel, Kernel, CrossStationaryKernel, StationaryKernel,
    CrossIsotropicKernel, IsotropicKernel, Constant, CrossConstant,
    Zero, AffineSpan, PreservedBySwap,
    kernel, crosskernel, stationarykernel, isotropickernel,
)
from lsqfitgp_tpu.kernels import ExpQuad, Cauchy, Matern


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.uniform(-2, 2, 10))


def const_kernel(v=1.0):
    return Kernel(lambda x, y: v * jnp.ones(jnp.broadcast_shapes(
        jnp.shape(x), jnp.shape(y))))


# -- algop semantics ----------------------------------------------------------

class TestAlgOp:

    def test_add_promotes_to_lcs(self):
        # sum of two concrete isotropic kernels is Isotropic, not either
        # concrete class
        k = ExpQuad() + Cauchy(alpha=1.0, beta=1.0)
        assert type(k) is IsotropicKernel

    def test_scalar_preserves_symmetric(self):
        assert isinstance(ExpQuad() + 1.0, Kernel)
        assert isinstance(2.0 * ExpQuad(), Kernel)

    def test_unknown_operand_type(self):
        with pytest.raises(TypeError):
            ExpQuad() + 'nope'
        with pytest.raises(TypeError):
            ExpQuad() * object()

    def test_pow_invalid_exponent(self):
        with pytest.raises(TypeError):
            ExpQuad() ** -1
        with pytest.raises(TypeError):
            ExpQuad() ** 1.5
        with pytest.raises(TypeError):
            ExpQuad() ** ExpQuad()

    def test_pow_zero_is_one(self, x):
        k = ExpQuad() ** 0
        np.testing.assert_allclose(np.asarray(k(x, x)), 1.0)

    def test_rpow_base_below_one(self):
        with pytest.raises(TypeError):
            0.5 ** ExpQuad()

    def test_rpow_value(self, x):
        k = 2.0 ** ExpQuad()
        want = 2.0 ** np.asarray(ExpQuad()(x, x))
        np.testing.assert_allclose(np.asarray(k(x, x)), want, rtol=1e-6)

    def test_traced_scalar_operand(self, x):
        # inside jit a scalar operand is a tracer: promotion must assume
        # nonnegative (Constant) and values must still be right
        def f(a):
            k = a * ExpQuad()
            return k(x, x)
        got = jax.jit(f)(3.0)
        np.testing.assert_allclose(np.asarray(got),
                                   3 * np.asarray(ExpQuad()(x, x)),
                                   rtol=1e-6)

    def test_radd_rmul(self, x):
        k1 = 1.0 + ExpQuad()
        k2 = ExpQuad() + 1.0
        np.testing.assert_allclose(np.asarray(k1(x, x)),
                                   np.asarray(k2(x, x)))

    def test_algop_via_name(self, x):
        k = ExpQuad().algop('add', Cauchy(alpha=1.0, beta=1.0))
        assert isinstance(k, IsotropicKernel)

    def test_linop_name_is_not_algop(self):
        with pytest.raises(ValueError):
            ExpQuad().algop('scale', 2.0)
        with pytest.raises(ValueError):
            ExpQuad().linop('add', 2.0)

    def test_ufunc_algop_chain(self, x):
        k = ExpQuad().algop('expm1').algop('exp')
        want = np.exp(np.expm1(np.asarray(ExpQuad()(x, x))))
        np.testing.assert_allclose(np.asarray(k(x, x)), want, rtol=1e-6)


# -- registry introspection ---------------------------------------------------

class TestRegistry:

    def test_missing_transf(self):
        with pytest.raises(KeyError):
            ExpQuad().transf('no-such-transf')
        assert not ExpQuad().has_transf('no-such-transf')

    def test_already_registered(self):
        class K(Kernel):
            pass
        K.register_transf(lambda tcls, self: self, 'mytransf')
        with pytest.raises(KeyError):
            K.register_transf(lambda tcls, self: self, 'mytransf')

    def test_transf_help(self):
        assert 'scale' in ExpQuad.transf_help('scale').lower() or \
            ExpQuad.transf_help('scale')

    def test_list_transf_includes_superclasses(self):
        names = set(ExpQuad.list_transf())
        for expected in ('add', 'mul', 'pow', 'diff', 'scale', 'loc',
                         'rescale', 'xtransf', 'dim', 'maxdim',
                         'normalize', 'cond', 'derivable', 'forcekron'):
            assert expected in names
        own = set(ExpQuad.list_transf(superclasses=False))
        assert 'diff' not in own

    def test_kind_tags(self):
        transf = ExpQuad.list_transf()
        assert transf['scale'].kind is not transf['add'].kind

    def test_linop_output_type_error(self):
        class K(Kernel):
            pass
        K.register_linop(lambda tcls, self, a1, a2: 42, 'badlinop')
        k = K(lambda x, y: jnp.ones(jnp.broadcast_shapes(
            jnp.shape(x), jnp.shape(y))))
        with pytest.raises(TypeError):
            k.linop('badlinop', 1.0)

    def test_algop_output_type_error(self):
        class K(Kernel):
            pass
        K.register_algop(lambda tcls, self: 'oops', 'badalgop')
        k = K(lambda x, y: jnp.ones(jnp.broadcast_shapes(
            jnp.shape(x), jnp.shape(y))))
        with pytest.raises(TypeError):
            k.algop('badalgop')

    def test_inherit_unknown(self):
        class K(Kernel):
            pass
        with pytest.raises(KeyError):
            K.inherit_transf('definitely-not-registered')

    def test_super_transf(self, x):
        # a subclass overriding 'mul' can delegate upward
        calls = []

        class K(Kernel):
            pass

        @K.register_algop
        def mul(tcls, self, other):
            calls.append('sub')
            return K.super_transf('mul', self, other)

        k = K(lambda x, y: jnp.ones(jnp.broadcast_shapes(
            jnp.shape(x), jnp.shape(y))))
        out = k * 2.0
        assert calls == ['sub']
        np.testing.assert_allclose(np.asarray(out(x, x)), 2.0)


# -- linop semantics ----------------------------------------------------------

class TestLinOp:

    def test_arg_count_errors(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('scale')
        with pytest.raises(ValueError):
            ExpQuad().linop('scale', 1.0, 2.0, 3.0)

    def test_none_args_noop_returns_self(self):
        k = ExpQuad()
        assert k.linop('scale', None) is k
        assert k.linop('loc', None, None) is k

    def test_asymmetric_arg_demotes_to_cross(self):
        k = ExpQuad().linop('scale', 2.0, 3.0)
        assert not isinstance(k, Kernel)
        assert isinstance(k, CrossIsotropicKernel)

    def test_symmetric_two_args_keeps_class(self):
        a = 2.0
        k = ExpQuad().linop('scale', a, a)
        assert isinstance(k, IsotropicKernel)

    def test_swap_transposes_asymmetric(self, x):
        k = ExpQuad().linop('scale', 2.0, 3.0)
        kt = k._swap()
        K1 = np.asarray(k(x[:, None], x[None, :]))
        K2 = np.asarray(kt(x[:, None], x[None, :]))
        np.testing.assert_allclose(K1, K2.T, rtol=1e-7)

    def test_swap_symmetric_identity(self):
        k = ExpQuad()
        assert k._swap() is k

    def test_rescale_requires_callable(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('rescale', 3.0)

    def test_xtransf_requires_callable(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('xtransf', 3.0)

    def test_derivable_invalid(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('derivable', -1)

    def test_maxdim_invalid(self):
        with pytest.raises(ValueError):
            ExpQuad().linop('maxdim', -2)

    def test_dim_type_error(self):
        with pytest.raises(TypeError):
            ExpQuad().linop('dim', 42)

    def test_dim_missing_field(self, rng):
        xs = np.empty(5, dtype=[('a', float)])
        xs['a'] = rng.standard_normal(5)
        import lsqfitgp_tpu as lgp
        k = ExpQuad().linop('dim', 'b')
        with pytest.raises(ValueError):
            k(lgp.asarray(xs), lgp.asarray(xs))

    def test_diff_value_vs_finite_differences(self, x):
        k = ExpQuad()
        kd = k.linop('diff', 1, 0)
        f32 = np.asarray(jnp.empty(0)).dtype == np.float32
        h = 1e-2 if f32 else 1e-4
        got = np.asarray(kd(x, x * 0.5))
        num = (np.asarray(k(x + h, x * 0.5))
               - np.asarray(k(x - h, x * 0.5))) / (2 * h)
        np.testing.assert_allclose(got, num, rtol=1e-3 if f32 else 1e-5,
                                   atol=1e-3 if f32 else 1e-6)

    def test_diff_second_derivative_psd(self, rng):
        # d/dx d/dy k is the covariance of f', must be PSD
        xs = np.sort(rng.uniform(-2, 2, 12))
        kd = ExpQuad().linop('diff', 1, 1)
        K = np.asarray(kd(xs[:, None], xs[None, :]))
        eig = np.linalg.eigvalsh(K)
        assert eig.min() > -1e-8 * eig.max()
        np.testing.assert_allclose(K, K.T, atol=1e-10)

    def test_diff_beyond_derivable(self, x):
        k = Matern(nu=0.5)  # not derivable
        kd = k.linop('diff', 1, 1)
        with pytest.raises(Exception):
            jax.block_until_ready(kd(x, x))

    def test_diff_named_field_missing(self, rng):
        import lsqfitgp_tpu as lgp
        xs = np.empty(5, dtype=[('a', float)])
        xs['a'] = rng.standard_normal(5)
        kd = ExpQuad().linop('diff', 'b', 0)
        with pytest.raises(Exception):
            kd(lgp.asarray(xs), lgp.asarray(xs))

    def test_cond_asymmetric_sides(self, x):
        # different conditions per side demote to a cross kernel
        k1, k2 = ExpQuad(), Cauchy(alpha=1.0, beta=1.0)
        k = k1.linop('cond', k2, lambda v: v >= 0, lambda v: v > -1)
        assert not isinstance(k, Kernel)
        got = np.asarray(k(x[:, None], x[None, :]))
        mx = np.asarray(x) >= 0
        my = np.asarray(x) > -1
        K1 = np.asarray(k1(x[:, None], x[None, :]))
        K2 = np.asarray(k2(x[:, None], x[None, :]))
        both = np.outer(mx, my)
        neither = np.outer(~mx, ~my)
        np.testing.assert_allclose(got[both], K1[both])
        np.testing.assert_allclose(got[neither], K2[neither])

    def test_normalize(self, x):
        k = 3.0 * ExpQuad(scale=1.3)
        kn = k.linop('normalize', True)
        d = np.asarray(kn(x, x))
        np.testing.assert_allclose(d, 1.0, rtol=1e-6)

    def test_isotropic_preserved_by_symmetric_ops(self):
        for name, arg in (('loc', 1.0), ('scale', 2.0),
                          ('maxdim', 3), ('derivable', 2)):
            k = ExpQuad().linop(name, arg)
            assert isinstance(k, IsotropicKernel), name

    def test_result_capped_at_registering_class(self):
        # a linop registered on CrossKernel cannot return a more
        # specific class than where the transformation sits
        k = ExpQuad().linop('xtransf', lambda x: x)
        assert not isinstance(k, IsotropicKernel)
        assert isinstance(k, Kernel) or isinstance(k, CrossKernel)


# -- input-mode semantics -----------------------------------------------------

class TestStationaryIsotropic:

    def test_invalid_input_mode(self):
        with pytest.raises(KeyError):
            StationaryKernel(lambda d: jnp.exp(-d), input='bogus')
        with pytest.raises(KeyError):
            IsotropicKernel(lambda r2: jnp.exp(-r2), input='bogus')

    def test_isotropic_input_modes_agree(self, x):
        f2 = lambda r2: jnp.exp(-r2)
        fabs = lambda r: jnp.exp(-r ** 2)
        k2 = IsotropicKernel(f2, input='squared')
        kabs = IsotropicKernel(fabs, input='abs')
        kpos = IsotropicKernel(fabs, input='posabs')
        K2 = np.asarray(k2(x[:, None], x[None, :]))
        np.testing.assert_allclose(
            np.asarray(kabs(x[:, None], x[None, :])), K2, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(kpos(x[:, None], x[None, :])), K2,
            rtol=1e-5, atol=1e-7)

    def test_stationary_signed_vs_abs(self, x):
        even = lambda d: jnp.exp(-jnp.abs(d))
        ks = StationaryKernel(even, input='signed')
        ka = StationaryKernel(lambda d: jnp.exp(-d), input='abs')
        np.testing.assert_allclose(
            np.asarray(ks(x[:, None], x[None, :])),
            np.asarray(ka(x[:, None], x[None, :])), rtol=1e-6)

    def test_zero_kernel(self, x):
        z = Zero()
        np.testing.assert_array_equal(
            np.asarray(z(x[:, None], x[None, :])), 0.0)
        assert isinstance(z, IsotropicKernel)

    def test_zero_shape_broadcast(self):
        z = Zero()
        out = z(jnp.zeros((3, 1)), jnp.zeros((1, 4)))
        assert out.shape == (3, 4)


# -- decorators ---------------------------------------------------------------

class TestDecorator:

    def test_decorated_name_and_doc(self):
        @isotropickernel
        def MyKern(r2):
            """my doc"""
            return jnp.exp(-r2)
        assert MyKern.__name__ == 'MyKern'
        assert MyKern.__doc__ == 'my doc'
        assert issubclass(MyKern, IsotropicKernel)
        assert isinstance(MyKern(), MyKern)

    def test_decorator_default_kw_override_warns(self):
        @isotropickernel(derivable=True)
        def MyKern(r2, a=1.0):
            return jnp.exp(-a * r2)
        with pytest.warns(UserWarning):
            MyKern(derivable=False)

    def test_constructor_linop_changes_class(self):
        # scale applied by the constructor demotes the decorated class
        # (the result of a transformation is the registering class)
        k = ExpQuad(scale=2.0)
        assert isinstance(k, IsotropicKernel)

    def test_plain_kernel_decorator(self, x):
        @kernel
        def Lin(x, y):
            return x * y
        np.testing.assert_allclose(np.asarray(Lin()(x, x)),
                                   np.asarray(x) ** 2)

    def test_crosskernel_decorator(self):
        @crosskernel
        def CK(x, y):
            return jnp.zeros(jnp.broadcast_shapes(
                jnp.shape(x), jnp.shape(y)))
        k = CK()
        assert isinstance(k, CrossKernel)
        assert not isinstance(k, Kernel)


# -- AffineSpan ---------------------------------------------------------------

class TestAffineSpan:

    def test_no_direct_instantiation(self):
        with pytest.raises(TypeError):
            AffineSpan(lambda x, y: jnp.zeros(()))

    def test_preserved_through_affine_chain(self, x):
        from lsqfitgp_tpu.kernels import Zeta
        k = Zeta(nu=1.5)
        assert isinstance(k, AffineSpan)
        k2 = 2.0 * k.linop('loc', 1.0).linop('scale', 0.5) + 3.0
        assert isinstance(k2, AffineSpan)
        dk = k2.dynkw
        assert dk['offset'] == 3.0 and dk['ampl'] == 2.0

    def test_negative_scalar_mul_drops_class(self):
        from lsqfitgp_tpu.kernels import Zeta
        k = (-1.0) * Zeta(nu=1.5)
        # negative amplitude is not a valid symmetric-PSD kernel:
        # promotion treats the scalar as CrossConstant
        assert not isinstance(k, Kernel)

    def test_nonaffine_op_drops_dynkw(self):
        from lsqfitgp_tpu.kernels import Zeta
        k = Zeta(nu=1.5).algop('exp')
        assert not isinstance(k, AffineSpan) or \
            k.dynkw == Zeta(nu=1.5).algop('exp').dynkw

    def test_constant_virtual_subclass(self):
        assert issubclass(Constant, AffineSpan.__class__) or \
            isinstance(Constant(lambda x, y: jnp.ones(())), AffineSpan)


# -- misc core ----------------------------------------------------------------

class TestCore:

    def test_initkw_preserved_through_clone(self):
        k = Cauchy(alpha=1.5, beta=2.0)
        assert dict(k.initkw) == dict(alpha=1.5, beta=2.0)
        k2 = k.linop('scale', 2.0)
        assert dict(k2.initkw) == dict(alpha=1.5, beta=2.0)

    def test_callable_constructor_arg(self, x):
        # scale may be a callable of the init kwargs
        @isotropickernel(scale=lambda a: a, a=2.0)
        def MyKern(r2, a):
            return jnp.exp(-r2)
        k = MyKern()
        want = np.exp(-(np.asarray(x)[:, None] / 2.0
                        - np.asarray(x)[None, :] / 2.0) ** 2)
        np.testing.assert_allclose(
            np.asarray(k(x[:, None], x[None, :])), want, rtol=1e-6)

    def test_nary_left_right(self, x):
        k = ExpQuad()
        two_left = CrossKernel._nary(
            lambda f: lambda x_: 2 * f(x_), [k], CrossKernel._side.LEFT)
        two_right = CrossKernel._nary(
            lambda f: lambda y_: 2 * f(y_), [k], CrossKernel._side.RIGHT)
        K = np.asarray(k(x[:, None], x[None, :]))
        np.testing.assert_allclose(
            np.asarray(two_left(x[:, None], x[None, :])), 2 * K,
            rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(two_right(x[:, None], x[None, :])), 2 * K,
            rtol=1e-7)

    def test_crossmro_skips_symmetric(self):
        mro = list(ExpQuad._crossmro())
        assert Kernel not in mro
        assert CrossKernel in mro

    def test_preserved_by_swap(self):
        class P(PreservedBySwap, Kernel):
            pass
        with pytest.raises(TypeError):
            PreservedBySwap(lambda x, y: jnp.zeros(()))

    def test_shape_assertion(self):
        k = ExpQuad()
        out = k(jnp.zeros((5, 1)), jnp.zeros((1, 7)))
        assert out.shape == (5, 7)

    def test_batch_equivalence(self, x):
        k = ExpQuad(scale=1.3)
        kb = k.batch(200)
        from util import tol
        np.testing.assert_allclose(
            np.asarray(kb(x[:, None], x[None, :])),
            np.asarray(k(x[:, None], x[None, :])),
            **tol(1e-7, rtol32=1e-5, atol32=1e-6))
