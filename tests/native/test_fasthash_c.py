"""Native C oracle for the JAX fast-hash port (the reference validates
its port against a vendored C implementation the same way)."""

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

import lsqfitgp_tpu as lgp

HERE = pathlib.Path(__file__).parent


@pytest.fixture(scope='module')
def binary(tmp_path_factory):
    cc = shutil.which('cc') or shutil.which('gcc') or shutil.which('g++')
    if cc is None:
        pytest.skip('no C compiler available')
    out = tmp_path_factory.mktemp('native') / 'fasthash_ref'
    subprocess.run(
        [cc, '-O2', '-o', str(out), str(HERE / 'fasthash_ref.c')],
        check=True,
    )
    return out


@pytest.mark.x64only  # the hash state is uint64 arithmetic
@pytest.mark.parametrize('n', [0, 3, 8, 13, 64, 1000])
@pytest.mark.parametrize('seed', [0, 0xDEADBEEF])
def test_jax_port_vs_c(binary, rng, n, seed):
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    res = subprocess.run(
        [str(binary), hex(seed)], input=data, capture_output=True,
        check=True,
    )
    want = int(res.stdout.strip(), 16)
    got = int(lgp.fasthash64(data, seed=seed))
    assert got == want, (n, seed)
