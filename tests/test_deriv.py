import pytest

from lsqfitgp_tpu import Deriv


def test_empty():
    d = Deriv()
    assert not d
    assert d.implicit
    assert d.order == 0
    assert d.max == 0


def test_int():
    d = Deriv(2)
    assert d.implicit
    assert d.order == 2
    assert d[None] == 2


def test_str():
    d = Deriv('x')
    assert not d.implicit
    assert d.order == 1
    assert d['x'] == 1


def test_iterable():
    d = Deriv(['a', 'b', 'b', 'c'])
    assert d == Deriv(['a', 2, 'b', 'c'])
    assert d.order == 4
    assert d.max == 2


def test_multiplier_zero():
    d = Deriv([0, 'x'])
    assert not d


def test_errors():
    with pytest.raises(ValueError):
        Deriv(-1)
    with pytest.raises(ValueError):
        Deriv([2, 3, 'x'])
    with pytest.raises(ValueError):
        Deriv(['x', 2])
    with pytest.raises(TypeError):
        Deriv([1.5])
    with pytest.raises(TypeError):
        Deriv(object())


def test_passthrough():
    d = Deriv('x')
    assert Deriv(d) is d


def test_hashable():
    assert hash(Deriv(['x', 'y'])) == hash(Deriv(['y', 'x']))
