"""uformat / fmtspec battery.

The (value, error, expected, errdig, sep) cases are ported from the
reference's test suite (reference ``tests/test_gvar.py:93-240``) — they
pin the exact notation contract: PDG-style fractional error digits,
compact parenthesis mode, shared-exponent notation, padzero marks.
"""

import numpy as np
import pytest

from lsqfitgp_tpu.utils import (
    uformat, fmtspec_kwargs, format_uarray, tabulate_together,
)
from lsqfitgp_tpu import uncert


CASES = [
    (1, 0.2, "1.00 pm 0.20", 1.5, " pm "),
    (1, 0.3, "1.00 pm 0.30", 1.5, " pm "),
    (1, 0.31, "1.00 pm 0.31", 1.5, " pm "),
    (1, 0.32, "1.0 pm 0.3", 1.5, " pm "),
    (-1, 0.34, "-1.00 pm 0.34", 2, " pm "),
    (0, 0, "0 pm 0", 2, " pm "),
    (123456, 0, "123456. pm 0", 2, " pm "),
    (12345.6, 0, "12345.6 pm 0", 2, " pm "),
    (12345.67, 0, "12345.7 pm 0", 2, " pm "),
    (1e8, 0, "1.00000e+08 pm 0", 2, " pm "),
    (1e-2, 0, "0.0100000 pm 0", 2, " pm "),
    (1e-1, 0, "0.100000 pm 0", 2, " pm "),
    (12345.99, 0, "12346.0 pm 0", 2, " pm "),
    (0, 0.001, "(0.0 pm 1.0)e-3", 2, " pm "),
    (0, 0.01, "(0.0 pm 1.0)e-2", 2, " pm "),
    (0, 0.1, "0.00 pm 0.10", 2, " pm "),
    (0, 1, "0.0 pm 1.0", 2, " pm "),
    (0, 10, "0 pm 10", 2, " pm "),
    (0, 100, "(0.0 pm 1.0)e+2", 2, " pm "),
    (0, 1000, "(0.0 pm 1.0)e+3", 2, " pm "),
    (0, 0.0196, "(0.0 pm 2.0)e-2", 2, " pm "),
    (0, 0.196, "0.00 pm 0.20", 2, " pm "),
    (0, 1.96, "0.0 pm 2.0", 2, " pm "),
    (0, 19.6, "0 pm 20", 2, " pm "),
    (0, 196, "(0.0 pm 2.0)e+2", 2, " pm "),
    (0, 0.00996, "(0.0 pm 1.0)e-2", 2, " pm "),
    (0, 0.0996, "0.00 pm 0.10", 2, " pm "),
    (0, 0.996, "0.0 pm 1.0", 2, " pm "),
    (0, 9.96, "0 pm 10", 2, " pm "),
    (0, 99.6, "(0.0 pm 1.0)e+2", 2, " pm "),
    (0.025, 3, "0.0 pm 3.0", 2, " pm "),
    (0.0251, 0.3, "0.03 pm 0.30", 2, " pm "),
    (0.025, 0.03, "(2.5 pm 3.0)e-2", 2, " pm "),
    (0.025, 0.003, "(2.50 pm 0.30)e-2", 2, " pm "),
    (0.0025, 0.003, "(2.5 pm 3.0)e-3", 2, " pm "),
    (0.251, 3, "0.3 pm 3.0", 2, " pm "),
    (2.5, 3, "2.5 pm 3.0", 2, " pm "),
    (25, 3, "25.0 pm 3.0", 2, " pm "),
    (2500, 300, "(2.50 pm 0.30)e+3", 2, " pm "),
    (1, 0.99, "1.0 pm 1.0", 1.5, " pm "),
    (np.inf, 1.0, "inf pm 1.00000", 2, " pm "),
    (-np.inf, 1.0, "-inf pm 1.00000", 2, " pm "),
    (0, np.inf, "0 pm inf", 2, " pm "),

    (1, 0.2, "1.00(20)", 1.5, None),
    (1, 0.3, "1.00(30)", 1.5, None),
    (1, 0.31, "1.00(31)", 1.5, None),
    (1, 0.32, "1.0(3)", 1.5, None),
    (-1, 0.34, "-1.00(34)", 2, None),
    (0, 0, "0(0)", 2, None),
    (123456, 0, "123456.(0)", 2, None),
    (12345.6, 0, "12345.6(0)", 2, None),
    (12345.67, 0, "12345.7(0)", 2, None),
    (1e8, 0, "1.00000e+08(0)", 2, None),
    (1e-2, 0, "0.0100000(0)", 2, None),
    (1e-1, 0, "0.100000(0)", 2, None),
    (12345.99, 0, "12346.0(0)", 2, None),
    (0, 0.001, "0.0(1.0)e-3", 2, None),
    (0, 0.01, "0.0(1.0)e-2", 2, None),
    (0, 0.1, "0.00(10)", 2, None),
    (0, 1, "0.0(1.0)", 2, None),
    (0, 10, "0(10)", 2, None),
    (0, 100, "0.0(1.0)e+2", 2, None),
    (0, 1000, "0.0(1.0)e+3", 2, None),
    (0, 0.0196, "0.0(2.0)e-2", 2, None),
    (0, 0.196, "0.00(20)", 2, None),
    (0, 1.96, "0.0(2.0)", 2, None),
    (0, 19.6, "0(20)", 2, None),
    (0, 196, "0.0(2.0)e+2", 2, None),
    (0, 0.00996, "0.0(1.0)e-2", 2, None),
    (0, 0.0996, "0.00(10)", 2, None),
    (0, 0.996, "0.0(1.0)", 2, None),
    (0, 9.96, "0(10)", 2, None),
    (0, 99.6, "0.0(1.0)e+2", 2, None),
    (0.025, 3, "0.0(3.0)", 2, None),
    (0.0251, 0.3, "0.03(30)", 2, None),
    (0.025, 0.03, "2.5(3.0)e-2", 2, None),
    (0.025, 0.003, "2.50(30)e-2", 2, None),
    (0.0025, 0.003, "2.5(3.0)e-3", 2, None),
    (0.251, 3, "0.3(3.0)", 2, None),
    (2.5, 3, "2.5(3.0)", 2, None),
    (25, 3, "25.0(3.0)", 2, None),
    (2500, 300, "2.50(30)e+3", 2, None),
    (1, 0.99, "1.0(1.0)", 1.5, None),
    (np.inf, 1.0, "inf(1.00000)", 2, None),
    (-np.inf, 1.0, "-inf(1.00000)", 2, None),
    (0, np.inf, "0(inf)", 2, None),
]


@pytest.mark.parametrize('mu,s,expected,errdig,sep', CASES)
def test_uformat(mu, s, expected, errdig, sep):
    got = uformat(mu, s, errdig, sep, minnegexp=2, minposexp=0)
    assert got == expected


SPEC_CASES = [
    (1, 12, '1p', '1(12)'),
    (1, 1234, 'p', '1(1234)'),
    (1, 1234, '#p', 'ooo(12oo)'),
    (1, 1234, ':2p', '0.0(1.2)e+3'),
    (1, 1234, ':2u', '(0.0 ± 1.2)e+3'),
    (1, 1234, ':2U', '(0.0 ± 1.2)×10³'),
    (1, 1234, '$:2U', '0.0×10³ ± 1.2×10³'),
    (1, 1234, '+$:2U', '+0.0×10³ ± 1.2×10³'),
    (-1, 1234, ':2u', '(-0.0 ± 1.2)e+3'),
    (-1, 1234, '-:2u', '-(0.0 ± 1.2)e+3'),
]


@pytest.mark.parametrize('mu,s,spec,expected', SPEC_CASES)
def test_fmtspec(mu, s, spec, expected):
    assert uformat(mu, s, **fmtspec_kwargs(spec)) == expected


def test_fmtspec_invalid():
    with pytest.raises(ValueError):
        fmtspec_kwargs('zzz')
    with pytest.raises(ValueError):
        uformat(1.0, 1.0, errdig=0.5)


def test_format_uarray_spec():
    u = uncert.normal(1.0, 0.2)
    assert format_uarray(u, '1.5u') == '1.00 ± 0.20'
    arr = uncert.normal(np.array([1.0, 2.0]), np.array([0.2, 0.03]))
    out = format_uarray(arr, 'p')
    assert out[0] == '1.00(20)' and out[1] == '2.000(30)'


def test_tabulate_spec():
    d1 = {'a': uncert.normal(1.0, 0.2)}
    d2 = {'a': uncert.normal(1.1, 0.1)}
    t = tabulate_together(d1, d2, headers=['prior', 'post'], spec='u')
    assert '1.00 ± 0.20' in t and '1.10 ± 0.10' in t
