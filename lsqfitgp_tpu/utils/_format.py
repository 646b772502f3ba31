"""Value ± uncertainty formatting.

Counterpart of reference ``src/lsqfitgp/_gvarext/_format.py``
(``uformat`` at ``:74``, ``fmtspec_kwargs`` at ``:198``, ``gvar_format``
at ``:288``) and ``_tabulate.py`` (``tabulate_together``), operating on
:class:`lsqfitgp_tpu.uncert.UArray` instead of gvar.  The behavioral
contract (PDG-style fractional error digits, shared-exponent compact
notation, the ``[-+#$](digits)[:minexp](mode)`` format-spec grammar) is
pinned by the ported reference test battery in
``tests/test_format.py``.
"""

from __future__ import annotations

import math
import re

import numpy

from .. import uncert

__all__ = [
    'uformat', 'fmtspec_kwargs', 'format_uarray', 'tabulate_together',
]


def _e10(x):
    """Exponent of the leading digit of |x|."""
    return int(math.floor(math.log10(abs(x))))


def _plain(x):
    """Render a number without uncertainty semantics (degenerate
    cases: zero, infinite, or non-positive error)."""
    return '0' if x == 0 else f'{x:#.6g}'


def _count_sig(x, errdig):
    """Number of error digits to display: floor(errdig), plus one when
    the mantissa of x is below 10^frac(errdig) — e.g. errdig=1.5 shows
    two digits for leading digits 1-3 ('PDG-like')."""
    base = int(math.floor(errdig))
    lg = math.log10(abs(x))
    return base + (1 if lg - math.floor(lg) < errdig - base else 0)


def _sig_round(s, errdig):
    """(rounded error, digit count): round the error to its displayed
    digits; if rounding up crossed a power of ten the displayed digit
    count is re-evaluated (0.996 @ errdig=1.5 -> '1.0', two digits)."""
    nd = _count_sig(s, errdig)
    e = _e10(s)
    r = round(s * 10.0 ** (nd - 1 - e)) * 10.0 ** (e - nd + 1)
    if r > s:
        nd2 = _count_sig(r, errdig)
        if nd2 > nd:
            return r, nd2
    return s, nd


def _digits_at(x, ndig, lead_exp):
    """Digit string of |x| with ``ndig`` digits whose leading digit sits
    at 10^lead_exp; rounding may overflow into one extra digit, in which
    case the trailing digit is dropped and the exponent bumped (the
    value was exactly representable with a trailing zero)."""
    m = abs(int(round(x * 10.0 ** (ndig - 1 - lead_exp))))
    d = str(m)
    if ndig >= 1 and len(d) == ndig + 1:
        return d[:-1], lead_exp + 1
    return d, lead_exp


def _fixedpoint(d, ndig, lead_exp, *, lead_zeros=True, zero='0'):
    """Render digit string ``d`` as a fixed-point literal with its first
    digit at 10^lead_exp' (adjusted when d is shorter/longer than
    ndig).  Positions right of the last digit but left of the decimal
    point are filled with ``zero`` (a rounding-zero marker under the
    '#' option)."""
    lead_exp += len(d) - ndig
    if lead_exp >= len(d) - 1:
        out = d + zero * (lead_exp - len(d) + 1)
        if len(out) >= 2 and out[0] == '0' \
                and all(c == zero for c in out[1:]):
            out = zero + out[1:]
        return out
    if lead_exp >= 0:
        return d[:lead_exp + 1] + '.' + d[lead_exp + 1:]
    if lead_zeros:
        d = '0' * -lead_exp + d
        return d[:1] + '.' + d[1:]
    return d


_SUPERSCRIPTS = str.maketrans('0123456789+-', '⁰¹²³⁴⁵⁶⁷⁸⁹⁺⁻')


def uformat(mu, s, errdig=1.5, sep=None, *, shareexp=True,
            outersign=False, uniexp=False, minnegexp=6, minposexp=4,
            padzero=None, possign=False):
    """Format ``mu ± s`` (central value and error).

    Parameters (matching reference ``_format.py:74-173``):

    - ``errdig``: error digits shown; fractional values switch between
      floor and ceil depending on the error's leading mantissa (1.5 =
      two digits when the error starts with 1-3).
    - ``sep``: separator string; None puts the error in parentheses
      sharing the central value's decimal places ('compact' notation).
    - ``shareexp``/``outersign``: in exponential notation with a
      separator, group mantissas as ``(a ± b)e+x`` / put the sign
      outside the parentheses.
    - ``uniexp``: unicode ``×10ⁿ`` exponents.
    - ``minnegexp``/``minposexp``: decimal-place / trailing-zero
      thresholds that trigger exponential notation.
    - ``padzero``: a character standing for non-significant zeros when
      exponential notation is suppressed (the '#' spec option).
    - ``possign``: '+' before positive central values.
    """
    if errdig < 1:
        raise ValueError('errdig < 1')
    if not (math.isfinite(mu) and math.isfinite(s)) or s <= 0:
        if sep is None:
            return f'{_plain(mu)}({_plain(s)})'
        return f'{_plain(mu)}{sep}{_plain(s)}'

    s, sndig = _sig_round(s, errdig)
    sexp = _e10(s)
    sdig, sexp = _digits_at(s, sndig, sexp)

    muexp = _e10(mu) if mu != 0 else sexp - sndig - 1
    mundig = sndig + muexp - sexp    # central digits to the same lsd
    mudig, muexp = _digits_at(mu, mundig, muexp)
    sign = '-' if mu < 0 else '+' if possign else ''

    if mundig >= sndig:
        use_exp = muexp >= mundig + minposexp or muexp <= -minnegexp
        shown_exp = muexp
    else:
        use_exp = sexp >= sndig + minposexp or sexp <= -minnegexp
        shown_exp = sexp

    if use_exp:
        mu_str = _fixedpoint(mudig, mundig, muexp - shown_exp)
        s_str = _fixedpoint(sdig, sndig, sexp - shown_exp,
                            lead_zeros=sep is not None)
    elif shown_exp >= max(mundig, sndig) and padzero is None:
        # all displayed digits sit left of the decimal point and no
        # rounding-zero marker is requested: plain integers
        mu_str = str(abs(round(mu)))
        s_str = str(abs(round(s)))
    else:
        zero = '0' if padzero is None else padzero
        mu_str = _fixedpoint(mudig, mundig, muexp, zero=zero)
        s_str = _fixedpoint(sdig, sndig, sexp, zero=zero,
                            lead_zeros=sep is not None)

    if not outersign:
        mu_str = sign + mu_str

    if use_exp:
        if uniexp:
            suffix = '×10' + str(shown_exp).translate(_SUPERSCRIPTS)
        else:
            suffix = f'e{shown_exp:+}'
        if sep is None:
            out = f'{mu_str}({s_str}){suffix}'
        elif shareexp:
            out = f'({mu_str}{sep}{s_str}){suffix}'
        else:
            out = f'{mu_str}{suffix}{sep}{s_str}{suffix}'
    elif sep is None:
        out = f'{mu_str}({s_str})'
    else:
        out = f'{mu_str}{sep}{s_str}'

    return sign + out if outersign else out


_FMTSPEC = re.compile(r'([-+#$]*)(\d*\.?\d*)(:\d+)?(p|s|u|U)')


def fmtspec_kwargs(spec):
    """Parse a ``[options](errdigits)[:minexp](mode)`` format spec into
    `uformat` keyword arguments (reference ``_format.py:198-276``).

    Options: '+' positive sign, '-' sign outside grouping parentheses,
    '#' mark non-significant digits with 'o', '$' repeat the exponent
    on both mantissas.  Modes: 'p' parentheses, 's' ' +/- ', 'u' ' ± ',
    'U' ' ± ' with unicode exponents.
    """
    m = _FMTSPEC.fullmatch(spec)
    if not m:
        raise ValueError(
            f'format specification {spec!r} not understood, expected '
            f'r"{_FMTSPEC.pattern}"'
        )
    opts, digits, minexp, mode = m.groups()
    errdig = float(digits) if digits else 1.5
    nexp = int(minexp[1:]) if minexp else 5
    return dict(
        possign='+' in opts,
        outersign='-' in opts,
        padzero='o' if '#' in opts else None,
        shareexp='$' not in opts,
        errdig=errdig,
        minposexp=max(0, nexp - math.floor(errdig)),
        minnegexp=nexp,
        sep={'p': None, 's': ' +/- ', 'u': ' ± ', 'U': ' ± '}[mode],
        uniexp=mode == 'U',
    )


def format_uarray(u, spec=None, **kw):
    """Format a (scalar or array) UArray elementwise to strings.

    ``spec`` is a `fmtspec_kwargs` pattern (default '#1.5p'); explicit
    keyword arguments override the parsed spec.
    """
    fkw = fmtspec_kwargs(spec if spec is not None else '#1.5p')
    fkw.update(kw)
    mean = numpy.asarray(u.mean)
    sdev = numpy.asarray(u.sdev)
    if mean.ndim == 0:
        return uformat(float(mean), float(sdev), **fkw)
    out = numpy.empty(mean.shape, object)
    for idx in numpy.ndindex(*mean.shape):
        out[idx] = uformat(float(mean[idx]), float(sdev[idx]), **fkw)
    return out


def tabulate_together(*dicts, headers=None, keys=None, spec=None):
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
                f = format_uarray(v, spec)
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
