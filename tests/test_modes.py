"""Coherent mode pipeline: filament fields at a slit -> eigenmodes ->
saved/reloaded modes (BASELINE config 5 chain)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.beamline import BeamLine
from xrt_tpu.sources import Undulator
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu import modes as xmodes

E0 = 9300.0


def build_bl():
    bl = BeamLine(alignE=E0)
    und = Undulator.create(
        nrays=1000, eE=6.0, eI=0.1, eEpsilonX=0.3, eEpsilonZ=0.01,
        betaX=9., betaZ=2., period=33.0, n=50, K=1.5, eMin=9290, eMax=9310,
        xPrimeMax=0.02, zPrimeMax=0.02, gNodes=200, gIntervals=2)
    bl.add('source', und)
    slit = RectangularAperture.create(center=(0, 20000.0, 0),
                                      opening=(-0.2, 0.2, -0.2, 0.2))
    bl.add('slitFE', slit)
    return bl


def test_modes_pipeline(tmp_path):
    os.chdir(tmp_path)
    bl = build_bl()
    nsamples, nElectrons, nModes = 400, 12, 4
    modes, wAll, fluxFields, wave = xmodes.make_and_save_modes(
        bl, nsamples, nElectrons, nElectronsSave=3, nModes=nModes,
        fixedEnergy=E0, key=jax.random.PRNGKey(0))
    assert len(modes) == nModes
    w = np.asarray(wAll)
    assert (w >= -1e-9).all()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # dominant mode carries the largest weight
    assert w[-1] == w.max()
    # with a small e-beam the 0th mode dominates (threshold calibrated
    # with the spherical propagation phase of the wave-mode shine
    # included, which tilts filament wavefronts and genuinely lowers
    # mutual coherence vs the pre-phase behavior)
    assert w[-1] > 0.25
    assert w[-1] > 1.2 * w[-2]
    # flux is positive and finite
    assert np.isfinite(float(fluxFields)) and float(fluxFields) > 0

    # reload
    saved, wAll2, flux2 = xmodes.use_saved('wave-modes', 'local',
                                           slit=bl.slits[0],
                                           source=bl.sources[0])
    assert len(saved) == nModes
    np.testing.assert_allclose(np.asarray(wAll2), w, rtol=1e-6)
    m0 = saved[0]
    np.testing.assert_allclose(np.asarray(m0.Es), np.asarray(modes[0][0]),
                               rtol=1e-6)
    fields_saved, _, _ = xmodes.use_saved('wave-fields', 'local',
                                          slit=bl.slits[0],
                                          source=bl.sources[0])
    assert len(fields_saved) == 3


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
