"""numpy-gufunc signature parsing.

Counterpart of reference ``src/lsqfitgp/_signature.py:31`` (``Signature``):
parse strings like ``'(n),(n,m)->(m)'`` into core input/output shapes,
used by the copula ``distribution`` factory for shape bookkeeping.
"""

from __future__ import annotations

import re

__all__ = ['Signature']

_CORE = re.compile(r'\(([^)]*)\)')


def _parse_side(side):
    cores = []
    for m in _CORE.finditer(side):
        body = m.group(1).strip()
        cores.append(tuple(s.strip() for s in body.split(',')) if body
                     else ())
    return tuple(cores)


class Signature:
    """Parsed gufunc signature: ``sig.incores``, ``sig.outcores`` are
    tuples of tuples of dimension names/sizes."""

    def __init__(self, signature):
        self.signature = signature
        try:
            inside, outside = signature.split('->')
        except ValueError:
            raise ValueError(f'invalid signature {signature!r}')
        self.incores = _parse_side(inside)
        self.outcores = _parse_side(outside)

    @classmethod
    def from_tuples(cls, incores, outcores):
        fmt = lambda cores: ','.join(
            '(' + ','.join(map(str, c)) + ')' for c in cores
        )
        return cls(f'{fmt(incores)}->{fmt(outcores)}')

    @property
    def nin(self):
        return len(self.incores)

    @property
    def nout(self):
        return len(self.outcores)

    def __repr__(self):
        return f'Signature({self.signature!r})'

    def eval(self, *shapes):
        """Bind the input shapes to the named dimensions; return the
        dict of sizes and the concrete output shapes."""
        if len(shapes) != self.nin:
            raise ValueError(
                f'{self.nin} inputs expected, got {len(shapes)}'
            )
        sizes = {}
        for core, shape in zip(self.incores, shapes):
            tail = shape[len(shape) - len(core):] if core else ()
            if len(tail) != len(core):
                raise ValueError(
                    f'input shape {shape} too short for core {core}'
                )
            for name, size in zip(core, tail):
                if name.isdigit():
                    if int(name) != size:
                        raise ValueError(
                            f'dimension {name} != {size}'
                        )
                elif name in sizes and sizes[name] != size:
                    raise ValueError(
                        f'inconsistent size for {name}: '
                        f'{sizes[name]} vs {size}'
                    )
                else:
                    sizes[name] = size
        out = tuple(
            tuple(int(n) if n.isdigit() else sizes[n] for n in core)
            for core in self.outcores
        )
        return sizes, out
