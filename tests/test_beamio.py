"""Beam export/load round-trips and BeamFromFile source."""
import numpy as np
import jax

from xrt_tpu.beam import new_beam
from xrt_tpu.beamio import export_beam, load_beam, BeamFromFile
from xrt_tpu.sources.geometric import GeometricSource


def _shine(nrays=500):
    src = GeometricSource.create(
        nrays=nrays, dx=0.1, dz=0.05, dxprime=1e-4, dzprime=5e-5,
        energies=(9000.0, 100.0), distE='normal')
    return src.shine(jax.random.PRNGKey(0))


def _assert_beams_equal(a, b):
    import dataclasses
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if va is None:
            assert vb is None or f.name not in ('x', 'E')
            continue
        assert np.allclose(np.asarray(va), np.asarray(vb)), f.name


def test_roundtrip_npy(tmp_path):
    beam = _shine()
    path = export_beam(beam, str(tmp_path / 'beam'), 'npy')
    assert path.endswith('.npy')
    _assert_beams_equal(beam, load_beam(path))


def test_roundtrip_pickle(tmp_path):
    beam = _shine()
    path = export_beam(beam, str(tmp_path / 'beam'), 'pickle')
    _assert_beams_equal(beam, load_beam(path))


def test_roundtrip_mat(tmp_path):
    beam = _shine()
    path = export_beam(beam, str(tmp_path / 'beam'), 'mat')
    b2 = load_beam(path)
    # .mat loses exact None/dtype structure but array values round-trip
    assert np.allclose(np.asarray(beam.x), np.asarray(b2.x))
    assert np.allclose(np.asarray(beam.E), np.asarray(b2.E))
    assert np.allclose(np.asarray(beam.Jsp), np.asarray(b2.Jsp))


def test_beam_from_file_source(tmp_path):
    beam = _shine(200)
    path = export_beam(beam, str(tmp_path / 'saved'), 'npy')
    src = BeamFromFile.create(path, name='replay')
    replay = src.shine()
    assert replay.nrays == 200
    _assert_beams_equal(beam, replay)


def test_filter_and_replace_by_index():
    import numpy as np
    import jax.numpy as jnp
    from xrt_tpu.beam import (new_beam, filter_by_index, filter_good,
                              replace_by_index, copy_beam)
    b = new_beam(10, energy=9000.0)
    b = b.replace(state=jnp.asarray([1, 2, 1, 3, 1, 1, 2, 1, 1, 1]))
    g = filter_good(b)
    assert g.nrays == 7
    assert np.all(np.asarray(g.state) == 1)
    sub = filter_by_index(b, np.asarray([0, 2, 4]))
    assert sub.nrays == 3
    other = b.replace(x=b.x + 5.0)
    mask = np.zeros(10, bool)
    mask[3] = True
    rep = replace_by_index(b, mask, other)
    assert float(rep.x[3]) == float(b.x[3]) + 5.0
    assert float(rep.x[0]) == float(b.x[0])
    c = copy_beam(b)
    assert np.all(np.asarray(c.E) == np.asarray(b.E))
