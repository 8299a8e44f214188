"""Detector-image parity vs the reference xrt raycing run: same beamline
(GeometricSource -> Rh toroid -> screen), compared through flux and
intensity-weighted image moments at matched ray counts (MC estimates, so
tolerances follow from N=2e5 counting statistics).

Golden from tools/make_golden_trace.py (runs the actual reference code).
"""
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                    'ref_trace_config1.npz')

E0, P, Q, PITCH = 9000.0, 10000.0, 2000.0, 4e-3


def test_detector_parity_toroid_config():
    g = np.load(GOLD)
    nrays = int(g['nrays'])
    src = GeometricSource.create(
        nrays=nrays, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(E0 - 100, E0 + 100),
        polarization='horizontal')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    toroid = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r,
        material=xm.Material.create('Rh', rho=12.41),
        limPhysX=(-20, 20), limPhysY=(-300, 300))
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))

    beam = src.shine(jax.random.PRNGKey(7))
    glo, _ = toroid.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(glo.state) == 1
    I = np.asarray(img.Jss + img.Jpp)[good]
    x = np.asarray(img.x)[good]
    z = np.asarray(img.z)[good]

    # transmitted fraction and flux (mean Rh reflectivity ~0.92)
    assert abs(good.mean() - float(g['ngood_frac'])) < 2e-3
    flux_per_ray = I.sum() / nrays
    ref_flux_per_ray = float(g['flux']) / nrays
    assert abs(flux_per_ray - ref_flux_per_ray) / ref_flux_per_ray < 0.005

    xm_ = np.average(x, weights=I)
    zm_ = np.average(z, weights=I)
    xs_ = np.sqrt(np.average((x - xm_) ** 2, weights=I))
    zs_ = np.sqrt(np.average((z - zm_) ** 2, weights=I))
    # centroids within a few sigma/sqrt(N)
    assert abs(xm_ - float(g['x_mean'])) < 5 * xs_ / math.sqrt(len(x))
    assert abs(zm_ - float(g['z_mean'])) < 5e-4  # includes the coma shift
    # image sizes within 3% (MC + aberration tails)
    assert abs(xs_ - float(g['x_std'])) / float(g['x_std']) < 0.03
    assert abs(zs_ - float(g['z_std'])) / float(g['z_std']) < 0.03

    # normalized 2D histograms agree bin-wise at the MC-noise level
    h = np.histogram2d(x, z, bins=32, range=[[-1, 1], [-1, 1]],
                       weights=I)[0]
    ref = np.asarray(g['hist'])
    hn = h / h.sum()
    rn = ref / ref.sum()
    # compare occupied bins; per-bin Poisson noise ~ 1/sqrt(count)
    big = rn > 1e-4
    rel = np.abs(hn[big] - rn[big]) / rn[big]
    assert np.median(rel) < 0.1
    assert rel.max() < 0.6


def test_dcm_parity_energy_band():
    """Si(111) DCM at fixed Bragg angle vs the reference: transmitted flux
    fraction and the weighted energy band must match (double-crystal
    dynamical diffraction end to end)."""
    gold = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'golden', 'ref_trace_dcm.npz'))
    from xrt_tpu.oes.dcm import DCM
    nrays = int(gold['nrays'])
    thetaB = float(gold['thetaB'])
    src = GeometricSource.create(
        nrays=nrays, dx=0.1, dz=0.05, dxprime=1e-5, dzprime=1e-5,
        distE='flat', energies=(9000.0 - 8, 9000.0 + 8),
        polarization='horizontal')
    cr = xm.CrystalSi.create(hkl=(1, 1, 1))
    dcm = DCM.create(center=(0, 30000.0, 0), material=cr, bragg=thetaB,
                     fixedOffset=20.0, limPhysX=(-50, 50),
                     limPhysY=(-500, 500))
    beam = src.shine(jax.random.PRNGKey(3))
    glo, _, _ = dcm.double_reflect(beam)
    good = np.asarray(glo.state) == 1
    I = np.asarray(glo.Jss + glo.Jpp)[good]
    E = np.asarray(glo.E)[good]
    flux_per_ray = I.sum() / nrays
    ref = float(gold['flux_per_ray'])
    assert abs(flux_per_ray - ref) / ref < 0.02
    Em = np.average(E, weights=I)
    Es = np.sqrt(np.average((E - Em) ** 2, weights=I))
    assert abs(Em - float(gold['E_mean'])) < 0.05   # eV
    assert abs(Es - float(gold['E_std'])) / float(gold['E_std']) < 0.03


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
