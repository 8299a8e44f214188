"""SourceFromField vs reference on the same tabulated (periodic) field."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xrt_tpu.sources import SourceFromField
from xrt_tpu.physconsts import K2B

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


@pytest.fixture(scope='module')
def ref():
    return np.load(os.path.join(GOLDEN, 'ref_customfield.npz'))


def make_sff():
    K, L0, Np = 4.4, 53.96, 41
    zg = np.linspace(-L0 * Np * 0.5, L0 * Np * 0.5, 1000 * Np)
    fieldData = np.vstack([zg, K2B * K / L0 *
                           np.sin(2 * np.pi * zg / L0)]).T
    return SourceFromField.create(
        nrays=100, eE=6.0, eI=0.1, eEpsilonX=0.0, eEpsilonZ=0.0,
        customField=fieldData, eMin=5000, eMax=6500,
        xPrimeMax=0.05, zPrimeMax=0.05, gNodes=3000, gIntervals=2)


def test_customfield_intensity_map(ref):
    sff = make_sff()
    # the reference only computes deviceLength when reading from file
    # (synchr.py:684-699); for ndarray input it stays 0 there.  Ours is the
    # field FWHM = nearly the full periodic range:
    assert 2100 < sff.deviceLength < 2250
    I, Es, Ep = sff.build_I_map(jax.random.PRNGKey(0),
                                jnp.asarray(ref['sff_E']),
                                jnp.asarray(ref['sff_theta']),
                                jnp.asarray(ref['sff_psi']))
    # the 41-period oscillatory integral amplifies last-bit input
    # differences by ~1e10; matching to 1e-4 over sharp spectral features
    # is bitwise-level agreement of the physics
    np.testing.assert_allclose(I, ref['sff_I'], rtol=2e-4)
    np.testing.assert_allclose(Es, ref['sff_Es'], rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(Ep, ref['sff_Ep'], rtol=2e-4, atol=1e-8)


def test_customfield_shine():
    sff = make_sff()
    sff = sff.replace(nrays=5000, oversample=2)
    beam = sff.shine(jax.random.PRNGKey(1))
    assert int(np.asarray(beam.state).sum()) == 5000
    E = np.asarray(beam.E)
    assert (E >= 5000).all() and (E <= 6500).all()
    assert np.isfinite(np.asarray(beam.Jss)).all()
    assert float(beam.accepted) > 0


def test_customfield_near_field_far_limit(ref):
    """R0 -> large reproduces the far-field map (same angles): validates
    the near-field phase expansion and per-node directions (the reference
    R0 branch, synchr.py:811-846)."""
    K, L0, Np = 4.4, 53.96, 41
    zg = np.linspace(-L0 * Np * 0.5, L0 * Np * 0.5, 1000 * Np)
    fieldData = np.vstack([zg, K2B * K / L0 *
                           np.sin(2 * np.pi * zg / L0)]).T
    sff = SourceFromField.create(
        nrays=100, eE=6.0, eI=0.1, eEpsilonX=0.0, eEpsilonZ=0.0,
        customField=fieldData, eMin=5000, eMax=6500,
        xPrimeMax=0.05, zPrimeMax=0.05, gNodes=3000, gIntervals=2,
        R0=1e7)
    I_nf = sff.build_I_map(jax.random.PRNGKey(0),
                           jnp.asarray(ref['sff_E']),
                           jnp.asarray(ref['sff_theta']),
                           jnp.asarray(ref['sff_psi']))[0]
    np.testing.assert_allclose(np.asarray(I_nf), ref['sff_I'], rtol=2e-3)


def test_customfield_near_field_golden():
    """Near-field amplitudes vs the reference's own _sp R0 branch
    (tools/make_golden_sources.py, ref_customfield_nf.npz)."""
    g = np.load(os.path.join(GOLDEN, 'ref_customfield_nf.npz'))
    K, L0, Np = 4.4, 53.96, 41
    zg = np.linspace(-L0 * Np * 0.5, L0 * Np * 0.5, 1000 * Np)
    fieldData = np.vstack([zg, K2B * K / L0 *
                           np.sin(2 * np.pi * zg / L0)]).T
    sff = SourceFromField.create(
        nrays=100, eE=6.0, eI=0.1, eEpsilonX=0.0, eEpsilonZ=0.0,
        customField=fieldData, eMin=5000, eMax=6500,
        xPrimeMax=0.05, zPrimeMax=0.05, gNodes=3000, gIntervals=2,
        R0=float(g['R0']))
    I, Es, Ep = sff.build_I_map(jax.random.PRNGKey(0),
                                jnp.asarray(g['sff_E']),
                                jnp.asarray(g['sff_theta']),
                                jnp.asarray(g['sff_psi']))
    np.testing.assert_allclose(np.asarray(I), g['sff_I'], rtol=2e-4)
    np.testing.assert_allclose(np.asarray(Es), g['sff_Es'], rtol=2e-4,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ep), g['sff_Ep'], rtol=2e-4,
                               atol=1e-8)


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
