"""Examples as integration tests (the reference runs every example
script in CI, reference ``Makefile:71-103``).  Each script runs
in-process under the conftest CPU config; heavyweight model-fitting
examples run only when LSQFITGP_TPU_RUN_SLOW_EXAMPLES=1 (they are
covered by tests/models)."""

import os
import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / 'examples'

SLOW = {'bart_regression.py', 'causal_bcf.py'}

_names = sorted(
    p.name for p in EXAMPLES.glob('*.py') if p.name != 'runexamples.py'
)


@pytest.mark.parametrize('name', _names)
def test_example(name):
    if name in SLOW and not os.environ.get(
            'LSQFITGP_TPU_RUN_SLOW_EXAMPLES'):
        pytest.skip('slow model-fit example (set '
                    'LSQFITGP_TPU_RUN_SLOW_EXAMPLES=1)')
    runpy.run_path(str(EXAMPLES / name), run_name='__main__')
