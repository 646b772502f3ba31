"""Copula container and BufferDict integration.

Counterpart of reference ``src/lsqfitgp/copula/_copula.py`` (``Copula``)
and ``_makedict.py`` (``makedict``).
"""

from __future__ import annotations

import itertools


from .. import uncert
from ._distr import Distr, DistrBase

__all__ = ['Copula', 'makedict']


class Copula(DistrBase):
    """A container (dict or list) of Distrs expressed as a single flat
    Normal vector; node sharing is preserved across entries."""

    def __init__(self, variables):
        if isinstance(variables, dict):
            self._keys = list(variables)
            self._vals = [variables[k] for k in self._keys]
            self._isdict = True
        else:
            self._keys = list(range(len(variables)))
            self._vals = list(variables)
            self._isdict = False
        for v in self._vals:
            if not isinstance(v, DistrBase):
                raise TypeError(f'Copula entries must be Distr, got {v!r}')

    def _in_size_memo(self, memo):
        return sum(v._in_size_memo(memo) for v in self._vals)

    def _invfcn_memo(self, x, offset, memo):
        out = []
        for v in self._vals:
            val, offset = v._invfcn_memo(x, offset, memo)
            out.append(val)
        if self._isdict:
            return dict(zip(self._keys, out)), offset
        return out, offset

    def __getitem__(self, key):
        if self._isdict:
            return self._vals[self._keys.index(key)]
        return self._vals[key]

    def __repr__(self):
        if self._isdict:
            inner = ', '.join(
                f'{k!r}: {v!r}' for k, v in zip(self._keys, self._vals)
            )
            return f'Copula({{{inner}}})'
        return f'Copula({self._vals!r})'


_counter = itertools.count()


def _collect_nodes(d, acc):
    if isinstance(d, Distr):
        acc.add(id(d))
        for p in d.params:
            if isinstance(p, Distr):
                _collect_nodes(p, acc)


def makedict(mapping, prefix='__copula_'):
    """Convert a dict of Distrs (and plain values) to a BufferDict whose
    transformed keys apply the copula maps on access
    (reference ``copula/_makedict.py:26``).

    Distr values become keys ``'{prefix}{name}_{i}({key})'`` holding
    standard-Normal UArrays; reading ``bd[key]`` applies the inverse
    transformation.  Node sharing *across* different keys is an error
    (each key must be an independent program).
    """
    out = {}
    seen_nodes = {}
    for key, val in mapping.items():
        if isinstance(val, DistrBase):
            nodes = set()
            _collect_nodes(val, nodes) if isinstance(val, Distr) else [
                _collect_nodes(v, nodes) for v in val._vals
            ]
            for n in nodes:
                if n in seen_nodes:
                    raise ValueError(
                        f'distribution node shared between keys '
                        f'{seen_nodes[n]!r} and {key!r}: cross-key sharing '
                        f'must go through a single Copula entry'
                    )
                seen_nodes[n] = key
            name = f'{prefix.strip("_")}_{type(val).__name__}_' \
                   f'{next(_counter)}'
            val.add_distribution(name)
            out[f'{name}({key})'] = val.gvars()
        else:
            out[key] = val
    return uncert.BufferDict(out)
