"""The auto-generated API reference is CI-executed (the reference
library renders every kernel/transformation into docs pages as an
exhaustive public-API smoke test: ``docs/reference/kernelsref.py``,
``kernelop.py``)."""

import importlib.util
import pathlib

ROOT = pathlib.Path(__file__).parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        'generate_reference', ROOT / 'docs' / 'generate_reference.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_reference_docs():
    gen = _load()
    gen.main()  # raises SystemExit(1) on any smoke failure

    import lsqfitgp_tpu.kernels as kernels
    ktext = (ROOT / 'docs' / 'reference' / 'kernels.md').read_text()
    for name in kernels.__all__:
        assert f'## {name}\n' in ktext, f'kernel {name} not rendered'

    ttext = (ROOT / 'docs' / 'reference'
             / 'transformations.md').read_text()
    # the registry's core transformations must all be documented
    for name in ('diff', 'xtransf', 'rescale', 'scale', 'loc', 'dim',
                 'maxdim', 'derivable', 'normalize', 'cond', 'add',
                 'mul', 'pow', 'rpow', 'fourier', 'forcekron'):
        assert f'### `{name}`' in ttext, f'transf {name} not rendered'
