"""Value ± uncertainty formatting.

Counterpart of reference ``src/lsqfitgp/_gvarext/_format.py``
(``uformat`` at ``:74``, ``gvar_format`` at ``:288``) and
``_tabulate.py`` (``tabulate_together``), operating on
:class:`lsqfitgp_tpu.uncert.UArray` instead of gvar.
"""

from __future__ import annotations

import math

import numpy

from .. import uncert

__all__ = ['uformat', 'format_uarray', 'tabulate_together']


def _exponent(x):
    return int(math.floor(math.log10(abs(x)))) if x else 0


def uformat(value, error, *, errdig=1.5, sep=None, style='pm'):
    """Format ``value ± error`` with ``errdig`` significant digits on
    the error (1.5 = PDG-like: two digits when the leading error digit
    is 1, 2 or 3).

    style='pm' gives '1.234 ± 0.012'; style='compact' gives '1.234(12)'.
    """
    value = float(value)
    error = float(abs(error))
    if not math.isfinite(value) or not math.isfinite(error):
        return f'{value} ± {error}'
    if error == 0:
        return f'{value:.6g}' if style == 'pm' else f'{value:.6g}(0)'

    eexp = _exponent(error)
    lead = error / 10.0 ** eexp
    if errdig == 1.5:
        ndig = 2 if lead < 3.55 else 1
    else:
        ndig = max(1, int(math.ceil(errdig)))
    # rounding position may be left of the decimal point
    dec_round = ndig - 1 - eexp
    dec = max(0, dec_round)
    rval = round(value, dec_round)
    rerr = round(error, dec_round)
    if style == 'compact' and dec > 0:
        errdigits = int(round(rerr * 10 ** dec))
        body = f'{rval:.{dec}f}'
        return f'{body}({errdigits})'
    if style == 'compact':
        return f'{rval:.0f}({rerr:.0f})'
    s = sep if sep is not None else ' ± '
    return f'{rval:.{dec}f}{s}{rerr:.{dec}f}'


def format_uarray(u, **kw):
    """Format a (scalar or array) UArray elementwise to strings."""
    mean = numpy.asarray(u.mean)
    sdev = numpy.asarray(u.sdev)
    if mean.ndim == 0:
        return uformat(mean, sdev, **kw)
    out = numpy.empty(mean.shape, object)
    for idx in numpy.ndindex(*mean.shape):
        out[idx] = uformat(mean[idx], sdev[idx], **kw)
    return out


def tabulate_together(*dicts, headers=None, keys=None):
    """Tabulate multiple dicts of UArrays/scalars side by side (e.g.
    hyperparameter prior vs posterior).

    Returns the table as a string.
    """
    if not dicts:
        return ''
    if keys is None:
        keys = []
        for d in dicts:
            for k in (d.keys() if hasattr(d, 'keys') else d):
                if k not in keys:
                    keys.append(k)
    if headers is None:
        headers = [f'col{i}' for i in range(len(dicts))]
    rows = []
    for k in keys:
        row = [str(k)]
        for d in dicts:
            try:
                v = d[k]
            except (KeyError, TypeError):
                row.append('')
                continue
            if isinstance(v, uncert.UArray):
                f = format_uarray(v)
                row.append(f if isinstance(f, str) else str(f.tolist()))
            else:
                row.append(f'{float(numpy.asarray(v)):.6g}'
                           if numpy.ndim(v) == 0 else str(v))
        rows.append(row)
    widths = [
        max(len(r[i]) for r in rows + [['key', *headers]])
        for i in range(1 + len(dicts))
    ]
    lines = []
    head = ['key', *headers]
    lines.append('  '.join(h.ljust(w) for h, w in zip(head, widths)))
    lines.append('  '.join('-' * w for w in widths))
    for r in rows:
        lines.append('  '.join(c.ljust(w) for c, w in zip(r, widths)))
    return '\n'.join(lines)
