"""Refractive optics tests: plate deflection/absorption and CRL focusing."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import Plate, ParaboloidFlatLens
import xrt_tpu.materials as xm

E0 = 9000.0
P = 10000.0


def parallel_source(nrays=5000, half=0.2):
    return GeometricSource.create(
        nrays=nrays, distx='flat', dx=2 * half, distz='flat', dz=2 * half,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')


def test_plate_transmission_and_absorption():
    mat = xm.Material.create('C', rho=3.52, kind='plate')
    t = 0.5  # mm
    plate = Plate.create(center=(0, P, 0), pitch=math.pi / 2, t=t,
                         material=mat, limPhysX=(-10, 10),
                         limPhysY=(-10, 10))
    beam = parallel_source().shine(jax.random.PRNGKey(0))
    glo, l1, l2 = plate.double_refract(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.99
    # direction unchanged (normal incidence, parallel faces)
    np.testing.assert_allclose(np.asarray(glo.c)[good],
                               np.asarray(beam.c)[good], atol=1e-12)
    # attenuation = T_fresnel^2 * exp(-mu t)
    mu = float(mat.get_absorption_coefficient(jnp.asarray([E0]))[0])
    ts = mat.get_amplitude(jnp.asarray([E0]), -1.0)[0]
    T2 = float(jnp.abs(ts[0]) ** 2) ** 2
    expected = T2 * math.exp(-mu * t * 0.1)
    flux = float(np.asarray(glo.Jss + glo.Jpp)[good].mean())
    np.testing.assert_allclose(flux, expected, rtol=1e-3)


def test_crl_focal_distance():
    """A CRL stack focuses at f = 2*focus/(nCRL*delta) (thin-lens)."""
    mat = xm.Material.create('Be', rho=1.848, kind='lens')
    delta = 1.0 - float(mat.get_refractive_index(jnp.asarray([E0]))[0].real)
    focus = 1.0
    f_target = 5000.0
    lens = ParaboloidFlatLens.create(
        focus=focus, zmax=1.0, nCRL=(f_target, E0), material=mat,
        center=(0, P, 0), t=0.05, limPhysX=(-3, 3), limPhysY=(-3, 3))
    nCRL = lens.nCRL
    assert nCRL == max(int(round(2 * focus / f_target / delta)), 1)
    f_real = 2 * focus / (nCRL * delta)
    beam = parallel_source(5000, half=0.3).shine(jax.random.PRNGKey(1))
    glo, _, _ = lens.multiple_refract(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.95
    screen = Screen.create(center=(0, P + f_real, 0))
    img = screen.expose(glo)
    x = np.asarray(img.x)[good]
    z = np.asarray(img.z)[good]
    # focused spot far smaller than the 0.3 mm beam
    assert x.std() < 0.02 and z.std() < 0.02


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
