"""Pallas lower-trapezoid syrk kernels: emulated-kernel parity with the
plain jnp formulas (the real Mosaic compilation is exercised on TPU
runs; interpret mode emulates the same grid/index logic)."""

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from lsqfitgp_tpu.ops import schur_update, syrk_t_full


def _ref_schur(B, A, s, eps, size, offset, tile):
    S = -np.asarray(A, np.float64) @ np.asarray(A, np.float64).T
    if B is not None:
        Bs = np.asarray(B, np.float64)[
            offset:offset + size, offset:offset + size]
        if s is not None:
            sl = np.asarray(s, np.float64)[offset:offset + size]
            Bs = Bs * sl[:, None] * sl[None, :]
        S = S + Bs
    if eps is not None:
        S = S + float(eps) * np.eye(size)
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    return np.where(keep, S, 0.0)


@pytest.mark.parametrize('with_b', [True, False])
@pytest.mark.parametrize('with_s', [True, False])
@pytest.mark.parametrize('with_eps', [True, False])
@pytest.mark.parametrize('offset', [0, 128])
def test_schur_update(rng, with_b, with_s, with_eps, offset):
    tile = 128
    size = 384
    mb = offset + size
    h = 256
    A = jnp.asarray(rng.standard_normal((size, h)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((mb, mb)), jnp.float32) \
        if with_b else None
    s = jnp.asarray(rng.uniform(0.5, 2.0, mb), jnp.float32) \
        if with_s else None
    eps = jnp.float32(0.25) if with_eps else None
    if B is None and offset:
        pytest.skip('offset without B exercises nothing new')
    got = schur_update(B, A, s=s, eps=eps, size=size, offset=offset,
                       tile=tile, kchunk=128, precision='highest',
                       interpret='pallas')
    ref = _ref_schur(B, A, s, eps, size, offset, tile)
    # only the i >= j tiles are defined (the upper ones are
    # uninitialized memory by contract)
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize('n', [128, 384, 300])
def test_syrk_t_full(rng, n):
    W = jnp.asarray(
        np.tril(rng.standard_normal((n, n))), jnp.float32)
    got = syrk_t_full(W, tile=128, kchunk=128, precision='highest',
                      interpret='pallas')
    ref = np.asarray(W, np.float64).T @ np.asarray(W, np.float64)
    np.testing.assert_allclose(np.asarray(got), ref,
                               rtol=2e-5, atol=2e-4)
    # symmetric by construction
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got).T)


@pytest.mark.parametrize('eps', [1e-3, 0.25])
def test_chol_rec_pallas_matches_plain(rng, eps):
    """The emulated-Pallas recursive factorization agrees with the
    plain recursive scheme (same L up to roundoff) including scaling,
    eps, and a non-block-multiple size.  The large-eps case is the
    regression for eps leaking onto the identity-pad pivots (round-3
    ADVICE: the logdet then carried a (npad-n)·log(1+eps) bias)."""
    from lsqfitgp_tpu.linalg import _blocked

    n = 300
    block = 128
    x = np.linspace(0, 5, n)
    K = jnp.asarray(
        np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2)
        + 0.1 * np.eye(n), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    eps = jnp.float32(eps)

    prec = _blocked._precision('highest')
    nb = -(-n // block)
    npad = nb * block
    Kp = _blocked._pad_spd(K, npad)
    sp = jnp.concatenate([s, jnp.ones(npad - n, K.dtype)])
    tree, dinvs = _blocked._chol_rec_tree_pallas(
        Kp, sp, eps, 0, 0, nb, block, 128, prec, None,
        interpret='pallas', nreal=n)
    L = _blocked._tree_assemble(tree, n, block)

    read = _blocked._make_read(K, s, eps, n)
    tree2, dinvs2 = _blocked._chol_rec_tree(
        read, 0, nb, block, 128, prec, None)
    L2 = _blocked._tree_assemble(tree2, n, block)

    np.testing.assert_allclose(np.asarray(L), np.asarray(L2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(dinvs)), np.asarray(jnp.stack(dinvs2)),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('with_s', [True, False])
def test_schur_update_macro_rows(rng, with_s):
    """rows=2 macro-tiles: same values on every i >= j tile (the tiles
    just above the diagonal inside a macro-row are computed too, and
    must also be valid since the formula is position-independent)."""
    tile, rows = 128, 2
    size = 512
    h = 256
    A = jnp.asarray(rng.standard_normal((size, h)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((size, size)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2.0, size), jnp.float32) \
        if with_s else None
    eps = jnp.float32(0.125)
    got = schur_update(B, A, s=s, eps=eps, tile=tile, kchunk=128,
                       rows=rows, precision='highest',
                       interpret='pallas')
    ref = _ref_schur(B, A, s, eps, size, 0, tile)
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize('with_eps', [True, False])
def test_schur_update_gram(rng, with_eps):
    """Gram-fused Schur kernel (emulated) vs computing the Gram block
    explicitly and subtracting."""
    from lsqfitgp_tpu.ops._syrk import schur_update_gram

    tile = 128
    size, offset, npts = 384, 128, 3
    npad = offset + size
    X = jnp.asarray(rng.standard_normal((npad, npts)), jnp.float32)
    xn = jnp.sum(X * X, axis=-1, keepdims=True)
    A = jnp.asarray(rng.standard_normal((size, 256)), jnp.float32)
    amp = jnp.float32(1.7)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)
    eps = jnp.float32(0.25) if with_eps else None
    got = schur_update_gram(
        profile, X, xn, A, params=(amp,), eps=eps, size=size,
        offset=offset, tile=tile, kchunk=128, precision='highest',
        interpret='pallas')
    Xs = np.asarray(X, np.float64)[offset:offset + size]
    r2 = ((Xs[:, None] - Xs[None, :]) ** 2).sum(-1)
    ref = 1.7 * np.exp(-0.5 * r2)
    if with_eps:
        ref = ref + 0.25 * np.eye(size)
    ref = ref - np.asarray(A, np.float64) @ np.asarray(A, np.float64).T
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               rtol=2e-4, atol=5e-4)


def test_chol_nll_stream_matches_dense(rng):
    """Streaming (never-materialized-Gram) NLL vs the dense chol_nll
    on the same kernel matrix, including padding tails."""
    from lsqfitgp_tpu.linalg import chol_nll, chol_nll_stream

    n = 300
    x = np.sort(rng.uniform(-5, 5, n))
    y = rng.standard_normal(n)
    amp = 1.3
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)
    eps = 1e-2   # keep cond within honest f32 reach for the parity
    got = float(chol_nll_stream(
        profile, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        params=(jnp.float32(amp),), epsabs=eps, block=128, b1=128,
        precision='highest'))
    K = amp * np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2) \
        + eps * np.eye(n)
    want = float(chol_nll(jnp.asarray(K, jnp.float32),
                          jnp.asarray(y, jnp.float32),
                          epsrel=0, epsabs=0))
    assert abs(got - want) / abs(want) < 1e-3, (got, want)


def test_chol_nll_stream_wide_coordinates(rng):
    """Wide coordinate ranges: the r² norm expansion loses fine
    distances unless each tile pair is centered (regression: pre-fix,
    eps*|x|² swamped the spacing² and the streaming NLL went NaN or
    silently wrong on long grids)."""
    from lsqfitgp_tpu.linalg import chol_nll, chol_nll_stream

    n = 300
    x = np.arange(n) * 7.0 + 5e4   # huge offset + moderate spacing
    y = rng.standard_normal(n)
    profile = lambda r2, a: a * jnp.exp(-0.5 * (r2 / 100.0))
    eps = 1e-2
    got = float(chol_nll_stream(
        profile, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        params=(jnp.float32(1.3),), epsabs=eps, block=128, b1=128,
        precision='highest'))
    d2 = (x[:, None] - x[None, :]) ** 2
    K = 1.3 * np.exp(-0.5 * d2 / 100.0) + eps * np.eye(n)
    want = float(chol_nll(jnp.asarray(K, jnp.float32),
                          jnp.asarray(y, jnp.float32),
                          epsrel=0, epsabs=0))
    assert np.isfinite(got)
    assert abs(got - want) / abs(want) < 1e-3, (got, want)


def test_chol_pred_stream_matches_dense(rng):
    """Streaming posterior mean vs the dense GP pred on the same
    model."""
    import lsqfitgp_tpu as lgp
    from lsqfitgp_tpu.linalg import chol_pred_stream

    n, ns = 300, 40
    x = np.sort(rng.uniform(-5, 5, n))
    xs = np.linspace(-4.5, 4.5, ns)
    y = np.sin(1.5 * x) + 0.1 * rng.standard_normal(n)
    amp, eps = 1.3, 1e-2
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)

    mean, var, nll = chol_pred_stream(
        profile, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(xs, jnp.float32), params=(jnp.float32(amp),),
        epsabs=eps, block=128, b1=128, precision='highest',
        return_nll=True, return_var=True)

    gp = lgp.GP(amp * lgp.ExpQuad()).addx(x, 'd').addx(xs, 's')
    post = gp.predfromdata({'d': y}, ['s'], {('d', 'd'): eps * np.eye(n)})
    want = np.asarray(post['s'].mean)
    np.testing.assert_allclose(np.asarray(mean), want,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(post['s'].sdev) ** 2,
                               rtol=2e-2, atol=1e-4)
    assert np.isfinite(float(nll))


@pytest.mark.parametrize('exact,n,gradblock,rtol', [
    (True, 256, 128, 0.02),    # exact rule, strips narrower than n
    (True, 300, 512, 0.02),    # exact rule, one strip + pad tail
    (False, 256, 128, 0.2),    # Hutchinson fallback (512 probes)
])
def test_chol_nll_stream_grad_matches_dense(rng, exact, n, gradblock,
                                            rtol):
    """Streaming NLL gradient vs the dense gradient.  The exact rule
    (default) must match to f32 roundoff; the Hutchinson fallback's
    amplitude/lenscale trace terms carry ~sqrt(2/m) probe noise."""
    from lsqfitgp_tpu.linalg import chol_nll, chol_nll_stream_grad

    x = np.sort(rng.uniform(-5, 5, n))
    y = rng.standard_normal(n)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)

    def f_stream(w):
        return chol_nll_stream_grad(
            profile, jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32), params=(w[0],), lenscale=w[1],
            epsabs=w[2], exact=exact, nprobes=512, seed=0, block=128,
            b1=128, gradblock=gradblock)

    w0 = jnp.asarray([1.3, 1.7, 0.02], jnp.float32)
    v, g = jax.value_and_grad(f_stream)(w0)

    def f_dense(w):
        xf = jnp.asarray(x, jnp.float32)
        d2 = (xf[:, None] - xf[None, :]) ** 2
        K = w[0] * jnp.exp(-0.5 * d2 / w[1] ** 2) \
            + w[2] * jnp.eye(n, dtype=jnp.float32)
        return chol_nll(K, jnp.asarray(y, jnp.float32),
                        epsrel=0, epsabs=0)

    vd, gd = jax.value_and_grad(f_dense)(w0)
    assert abs(float(v) - float(vd)) / abs(float(vd)) < 1e-3
    # the amplitude gradient is cancellation-dominated (trace term
    # ~ +n/2a against quad term ~ -n/2a), so the honest f32 floor is
    # an ABSOLUTE tolerance at the scale of the cancelled terms
    # (~2e-4 of the NLL), plus the relative tolerance elsewhere
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gd), rtol=rtol,
        atol=(2e-4 if exact else 2e-3) * abs(float(vd)))


def test_chol_nll_stream_grad_exact_jit_grad_of_grad_free(rng):
    """The exact rule composes with jit and with vmap-free higher-order
    use is not required — but jit(value_and_grad) must compile and
    agree with the eager result."""
    from lsqfitgp_tpu.linalg import chol_nll_stream_grad

    n = 200
    x = np.sort(rng.uniform(-3, 3, n))
    y = rng.standard_normal(n)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)

    def f(w):
        return chol_nll_stream_grad(
            profile, jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32), params=(w[0],), lenscale=w[1],
            epsabs=w[2], exact=True, block=128, b1=128, gradblock=128)

    w0 = jnp.asarray([1.1, 1.3, 0.05], jnp.float32)
    v1, g1 = jax.value_and_grad(f)(w0)
    v2, g2 = jax.jit(jax.value_and_grad(f))(w0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)


def test_schur_update_pad_eps(rng):
    """eps must not leak onto the identity-pad diagonal (ADVICE round
    3): with nreal set, pad pivots stay exactly B's values (no +eps)."""
    tile = 128
    size, offset = 256, 128
    nreal = offset + size - 50          # last 50 rows are padding
    mb = offset + size
    h = 128
    A = jnp.asarray(rng.standard_normal((size, h)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((mb, mb)), jnp.float32)
    eps = jnp.float32(0.25)
    got = schur_update(B, A, eps=eps, size=size, offset=offset,
                       tile=tile, kchunk=128, precision='highest',
                       interpret='pallas', nreal=nreal)
    ref = _ref_schur(B, A, None, None, size, offset, tile)
    gi = offset + np.arange(size)
    ref = ref + np.diag(np.where(gi < nreal, 0.25, 0.0))
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               rtol=2e-5, atol=2e-4)


def test_schur_update_gram_offset_pads(rng):
    """Pad masking must use GLOBAL indices: with offset > 0 and
    nreal < npad, the pad rows/columns of the output sub-square are
    exactly blockdiag(K, I) (regression: the kernels compared local
    tile indices against the global nreal, so offset sub-squares
    treated pad rows as real points)."""
    from lsqfitgp_tpu.ops._syrk import schur_update_gram

    tile = 128
    size, offset, npts = 256, 128, 2
    npad = offset + size
    nreal = npad - 40                   # last 40 rows are padding
    X = jnp.asarray(rng.standard_normal((npad, npts)), jnp.float32)
    X = X.at[nreal:].set(X[nreal - 1])  # pads repeat the last point
    xn = jnp.sum(X * X, axis=-1, keepdims=True)
    A = jnp.asarray(rng.standard_normal((size, 128)), jnp.float32)
    amp = jnp.float32(1.7)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)
    eps = jnp.float32(0.25)
    got = schur_update_gram(
        profile, X, xn, A, params=(amp,), eps=eps, nreal=nreal,
        size=size, offset=offset, tile=tile, kchunk=128,
        precision='highest', interpret='pallas')
    # reference: exact blockdiag(K, I) + masked eps - A A'
    Xs = np.asarray(X, np.float64)
    r2 = ((Xs[:, None] - Xs[None, :]) ** 2).sum(-1)
    K = 1.7 * np.exp(-0.5 * r2)
    gi = np.arange(npad)
    real = (gi[:, None] < nreal) & (gi[None, :] < nreal)
    K = np.where(real, K, 0.0)
    K[np.arange(nreal, npad), np.arange(nreal, npad)] = 1.0
    K = K + np.diag(np.where(gi < nreal, 0.25, 0.0))
    ref = K[offset:, offset:] \
        - np.asarray(A, np.float64) @ np.asarray(A, np.float64).T
    nt = size // tile
    keep = np.tril(np.ones((nt, nt), bool)) \
        .repeat(tile, 0).repeat(tile, 1)
    np.testing.assert_allclose(np.asarray(got)[keep], ref[keep],
                               rtol=2e-5, atol=2e-4)


def test_chol_nll_stream_heteroskedastic_matches_dense(rng):
    """Per-point noise VECTOR on the streaming diagonal: value, exact
    per-element noise gradient, and amp gradient all match the dense
    path.  Exercises both diagonal routes (n > block so the trailing
    Schur complement carries part of the diagonal)."""
    from lsqfitgp_tpu.linalg import chol_nll, chol_nll_stream, \
        chol_nll_stream_grad

    n = 300                       # block=128: 3 strips slice the diag
    x = np.sort(rng.uniform(-5, 5, n))
    y = rng.standard_normal(n)
    noise = rng.uniform(0.05, 0.5, n)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)
    nf = jnp.asarray(noise, jnp.float32)
    amp = jnp.float32(1.3)

    def dense(nv, a):
        d2 = (xf[:, None] - xf[None, :]) ** 2
        K = a * jnp.exp(-0.5 * d2) + jnp.diag(nv)
        return chol_nll(K, yf, epsrel=0, epsabs=0)

    got = float(chol_nll_stream(profile, xf, yf, params=(amp,),
                                epsabs=nf, block=128, b1=128,
                                precision='highest'))
    want = float(dense(nf, amp))
    assert abs(got - want) / abs(want) < 1e-3, (got, want)

    def stream(nv, a):
        return chol_nll_stream_grad(
            profile, xf, yf, params=(a,), epsabs=nv, exact=True,
            block=128, b1=128, gradblock=128, precision='highest')

    (gn, ga) = jax.grad(stream, argnums=(0, 1))(nf, amp)
    (gn_d, ga_d) = jax.grad(dense, argnums=(0, 1))(nf, amp)
    assert gn.shape == (n,)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_d),
                               rtol=0.02, atol=1e-3)
    np.testing.assert_allclose(float(ga), float(ga_d), rtol=0.02,
                               atol=2e-4 * abs(want))


def test_chol_nll_stream_heteroskedastic_hutchinson(rng):
    """The Hutchinson fallback's eps-vector gradient uses the exact
    diagonal term (u_i v_i contraction), so it matches dense closely
    even at few probes."""
    from lsqfitgp_tpu.linalg import chol_nll, chol_nll_stream_grad

    n = 256
    x = np.sort(rng.uniform(-5, 5, n))
    y = rng.standard_normal(n)
    noise = rng.uniform(0.05, 0.5, n)
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)
    nf = jnp.asarray(noise, jnp.float32)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)

    gn = jax.grad(lambda nv: chol_nll_stream_grad(
        profile, xf, yf, params=(jnp.float32(1.3),), epsabs=nv,
        exact=False, nprobes=512, seed=0, block=128, b1=128))(nf)

    def dense(nv):
        d2 = (xf[:, None] - xf[None, :]) ** 2
        K = jnp.float32(1.3) * jnp.exp(-0.5 * d2) + jnp.diag(nv)
        return chol_nll(K, yf, epsrel=0, epsabs=0)

    gn_d = jax.grad(dense)(nf)
    # the Hutchinson trace estimate perturbs the diagonal carrier too,
    # so per-element agreement is probe-noise-limited
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_d),
                               rtol=0.3, atol=0.05)


def test_chol_pred_stream_heteroskedastic_matches_dense(rng):
    """Streaming posterior mean/variance with a per-point noise
    vector."""
    from lsqfitgp_tpu.linalg import chol_pred_stream

    n, ns = 300, 40
    x = np.sort(rng.uniform(-5, 5, n))
    xs = np.linspace(-4.5, 4.5, ns)
    y = np.sin(1.5 * x) + 0.1 * rng.standard_normal(n)
    noise = rng.uniform(0.01, 0.2, n)
    profile = lambda r2, a: a * jnp.exp(-0.5 * r2)
    amp = 1.3

    mean, var = chol_pred_stream(
        profile, jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32), jnp.asarray(xs, jnp.float32),
        params=(jnp.float32(amp),), epsabs=jnp.asarray(noise, jnp.float32),
        block=128, b1=128, precision='highest', return_var=True)

    d2 = (x[:, None] - x[None, :]) ** 2
    K = amp * np.exp(-0.5 * d2) + np.diag(noise)
    Ks = amp * np.exp(-0.5 * (xs[:, None] - x[None, :]) ** 2)
    sol = np.linalg.solve(K, y)
    want_mean = Ks @ sol
    want_var = amp - np.sum(Ks * np.linalg.solve(K, Ks.T).T, axis=1)
    np.testing.assert_allclose(np.asarray(mean), want_mean,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), want_var,
                               rtol=2e-2, atol=1e-4)


def test_chol_stream_fisher_matches_dense(rng):
    """chol_stream_fisher (strip-streamed exact expected information,
    round-4 'streaming Fisher' frontier) vs the dense Chol.fisher on
    the same regularized matrix, including the dr term and a
    heteroskedastic noise-vector tangent.  Reference information
    contract: /root/reference/src/lsqfitgp/_linalg/_decomp.py:509-547."""
    from lsqfitgp_tpu.linalg import Chol, chol_stream_fisher

    n = 260
    X = rng.uniform(-3, 3, (n, 2))
    hetero = rng.uniform(0.01, 0.1, n)

    def profile(r2, a, w):
        return a * jnp.exp(-0.5 * r2) + 0.1 * jnp.exp(-0.5 * w * r2)

    dtype = jnp.asarray(1.0).dtype
    f32 = dtype == jnp.float32
    mach = float(np.finfo(np.dtype(str(dtype))).eps)
    amp, w, ls = dtype.type(1.5), dtype.type(0.3), dtype.type(1.3)
    ep = jnp.asarray(hetero, dtype)
    Xj = jnp.asarray(X, dtype)
    Xc = Xj - jnp.mean(Xj, axis=0, keepdims=True)

    def K_of(theta):
        a, wd, l = theta[0], theta[1], theta[2]
        evec = ep * theta[3]
        d = Xc / l
        r2 = jnp.sum((d[:, None, :] - d[None, :, :]) ** 2, axis=-1)
        k0 = profile(jnp.zeros((1, 1), dtype), a, wd)[0, 0]
        return profile(r2, a, wd) \
            + jnp.diag(evec + 4 * mach * k0)

    theta0 = jnp.asarray([amp, w, ls, 1.0], dtype)
    K0 = K_of(theta0)
    dK = jax.jacfwd(K_of)(theta0)
    dr = jnp.asarray(rng.standard_normal((n, 4)), dtype)
    Fd = Chol(K0, epsabs=0.0, epsrel=0.0).fisher(
        jnp.moveaxis(dK, -1, 0), dr.T)

    # the 4th direction is the amplitude of the heteroskedastic noise
    # VECTOR: its tangent is the vector itself (the chain rule happens
    # inside chol_stream_fisher, so no n×n Fisher block ever exists)
    zero2 = (jnp.zeros((), dtype), jnp.zeros((), dtype))
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    zvec = jnp.zeros(n, dtype)
    tangents = [
        ((one, zero), zero, zvec),
        ((zero, one), zero, zvec),
        (zero2, one, zvec),
        (zero2, zero, ep),
    ]
    Fs = chol_stream_fisher(
        profile, Xj, params=(amp, w), lenscale=ls, epsabs=ep,
        tangents=tangents, dr=dr, block=128, b1=128,
        precision='highest')
    np.testing.assert_allclose(
        np.asarray(Fs), np.asarray(Fd),
        rtol=(2e-2 if f32 else 1e-8),
        atol=(1e-3 if f32 else 1e-10) * float(jnp.max(jnp.abs(Fd))))
