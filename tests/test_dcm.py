"""Tests of crystal optics in the tracing path: single crystal OE rocking
behaviour and the double-crystal monochromator geometry/bandwidth."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import FlatMirror
from xrt_tpu.oes.dcm import DCM
import xrt_tpu.materials as xm
from xrt_tpu.physconsts import CH

E0 = 9000.0
P = 10000.0


def si111():
    return xm.CrystalSi.create(hkl=(1, 1, 1), geom='Bragg reflected')


def test_crystal_oe_reflectivity_matches_material():
    """A flat Bragg crystal OE must reproduce material.get_amplitude |r|^2
    for a parallel beam at each pitch offset."""
    cr = si111()
    thetaB = float(cr.get_Bragg_angle(E0))
    dthc = float(cr.get_dtheta_symmetric_Bragg(E0))
    offsets = np.linspace(-40e-6, 80e-6, 9)
    src = GeometricSource.create(
        nrays=100, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    R_traced = []
    R_exact = []
    for off in offsets:
        pitch = thetaB + off
        oe = FlatMirror.create(center=(0, P, 0), pitch=pitch, material=cr,
                               limPhysX=(-50, 50), limPhysY=(-500, 500))
        glo, loc = oe.reflect(beam)
        good = np.asarray(glo.state) == 1
        assert good.all()
        R_traced.append(float(np.asarray(glo.Jss + glo.Jpp)[good].mean()))
        rs, rp = cr.get_amplitude(jnp.asarray([E0]), -math.sin(pitch))
        R_exact.append(float(jnp.abs(rs[0]) ** 2))
    np.testing.assert_allclose(R_traced, R_exact, rtol=1e-6, atol=1e-10)
    # the rocking curve is asymmetric around thetaB with refraction shift
    assert R_traced[0] < 0.1          # well below
    assert max(R_traced) > 0.8        # near total reflection on the curve


def test_dcm_fixed_exit_geometry():
    cr = si111()
    dcm = DCM.create(center=(0, P, 0), material=cr, alignE=E0,
                     fixedOffset=20.0, limPhysX=(-50, 50),
                     limPhysY=(-500, 500))
    src = GeometricSource.create(
        nrays=1000, dx=0.1, dz=0.05, dxprime=1e-5, dzprime=1e-5,
        distE='flat', energies=(E0 - 3, E0 + 3),
        polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(1))
    glo, lo1, lo2 = dcm.double_reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    # exit beam parallel to the incoming one
    np.testing.assert_allclose(np.asarray(glo.a)[good],
                               np.asarray(beam.a)[good], atol=1e-9)
    np.testing.assert_allclose(np.asarray(glo.b)[good],
                               np.asarray(beam.b)[good], atol=1e-9)
    np.testing.assert_allclose(np.asarray(glo.c)[good],
                               np.asarray(beam.c)[good], atol=1e-9)
    # fixed exit offset of 20 mm in z
    screen = Screen.create(center=(0, P + 1000.0, 20.0))
    img = screen.expose(glo)
    z = np.asarray(img.z)[good]
    assert abs(z.mean()) < 0.2


def test_dcm_energy_bandwidth():
    """The DCM passes only the Darwin-width energy band."""
    cr = si111()
    thetaB = float(cr.get_Bragg_angle(E0))
    dcm = DCM.create(center=(0, P, 0), material=cr, alignE=E0,
                     limPhysX=(-50, 50), limPhysY=(-500, 500))
    src = GeometricSource.create(
        nrays=20000, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='flat', energies=(E0 - 20, E0 + 20),
        polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(2))
    glo, _, _ = dcm.double_reflect(beam)
    w = np.asarray(glo.Jss + glo.Jpp) * (np.asarray(glo.state) == 1)
    E = np.asarray(glo.E)
    # FWHM of the reflected spectrum ~ Darwin width in energy
    dw_s = float(cr.get_Darwin_width(jnp.asarray([E0]))[0])
    dE_darwin = dw_s * E0 / math.tan(thetaB)
    h, edges = np.histogram(E, bins=60, range=(E0 - 20, E0 + 20), weights=w)
    centers = 0.5 * (edges[:-1] + edges[1:])
    above = centers[h > h.max() / 2]
    fwhm = above.max() - above.min()
    # double reflection narrows the curve slightly; expect within 2x
    assert 0.4 * dE_darwin < fwhm < 2.5 * dE_darwin
    # the dtheta-corrected alignment centers the transmitted band at E0
    cE = (centers * h).sum() / h.sum()
    assert abs(cE - E0) < 0.5 * dE_darwin


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
