"""Unit registry + typed named arrays (reference _named_arrays.py,
_sets_units.py)."""
import numpy as np
import pytest

from xrt_tpu import units


def test_convert():
    assert units.convert(1.0, 'mrad', 'angle') == 1e-3
    assert units.convert(2.0, 'deg', 'angle') == pytest.approx(
        np.radians(2.0))
    assert units.convert(1.0, 'm', 'length') == 1e3
    assert units.convert(9.0, 'keV', 'energy') == 9000.0
    with pytest.raises(KeyError):
        units.convert(1.0, 'furlong', 'length')


def test_unit_of():
    assert units.unit_of('pitch') == 'rad'
    assert units.unit_of('center') == 'mm'
    assert units.unit_of('eE') == 'GeV'
    assert units.unit_of('nosuchfield') == ''


def test_named_arrays_behave_like_tuples():
    c = units.Center(1.0, 2.0, 3.0)
    assert c.x == 1.0 and c.z == 3.0
    assert tuple(c) == (1.0, 2.0, 3.0)
    assert len(c) == 3 and c[1] == 2.0
    assert np.asarray(c).dtype == np.float64
    assert c == (1.0, 2.0, 3.0)

    lim = units.Limits(-5.0, 5.0)
    assert lim.lmin == -5.0 and np.asarray(lim)[1] == 5.0

    op = units.Opening(-1, 1, -2, 2)
    assert (op.left, op.right, op.bottom, op.top) == (-1, 1, -2, 2)

    im = units.Image2D(640, 480)
    assert np.asarray(im).dtype == np.int64 or \
        np.asarray(im).dtype == np.intp
    assert im.width == 640


def test_named_arrays_accepted_by_elements():
    """Center/Limits pass anywhere a tuple does (create() converts via
    asarray)."""
    from xrt_tpu.screens import Screen
    from xrt_tpu.oes import FlatMirror

    s = Screen.create(center=units.Center(0.0, 100.0, 0.0))
    assert float(np.asarray(s.center)[1]) == 100.0
    m = FlatMirror.create(center=units.Center(0, 50, 0), pitch=4e-3,
                          limPhysX=units.Limits(-10, 10),
                          limPhysY=units.Limits(-100, 100))
    assert float(np.asarray(m.limPhysX)[0]) == -10.0


def test_epics_records_carry_egu():
    from xrt_tpu.epics import element_records
    from xrt_tpu.oes import FlatMirror

    m = FlatMirror.create(center=(0, 50, 0), pitch=4e-3,
                          limPhysX=(-10, 10), limPhysY=(-100, 100))
    pvs = {p.record: p for p in element_records('m1', m)}
    assert pvs['m1:pitch'].metadata.get('egu') == 'rad'
    assert pvs['m1:center:x'].metadata.get('egu') == 'mm'
    assert pvs['m1:limPhysX:lmin'].metadata.get('egu') == 'mm'
