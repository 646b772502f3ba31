"""Execute every ```python code block in the documentation (the
reference runs all doc code blocks in CI, ``Makefile:95-103`` /
``docs/runcode.py``): documentation that does not run is a bug."""

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).parent.parent
DOCS = sorted(ROOT.glob('docs/**/*.md')) + [ROOT / 'README.md']

_BLOCK = re.compile(r'```python\n(.*?)```', re.S)


def _blocks():
    out = []
    for doc in DOCS:
        for i, m in enumerate(_BLOCK.finditer(doc.read_text())):
            out.append(pytest.param(
                m.group(1), id=f'{doc.name}-{i}'))
    return out


@pytest.mark.parametrize('code', _blocks())
def test_doc_block(code):
    exec(compile(code, '<doc block>', 'exec'), {'__name__': '__doc__'})
