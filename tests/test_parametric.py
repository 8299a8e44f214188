"""Tests of parametric (exact conic) mirrors: point-to-point focusing."""
import math

import numpy as np
import jax

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import (EllipticalMirrorParam, ParabolicalMirrorParam,
                         HyperbolicMirrorParam)

E0 = 9000.0
PITCH = 4e-3


def fan_source(nrays=20000, dzprime=5e-5):
    return GeometricSource.create(
        nrays=nrays, center=(0, 0, 0), dx=0.0, dz=0.0, distx=None,
        distz=None, distxprime=None, dxprime=0.0, dzprime=dzprime,
        distE='lines', energies=(E0,), polarization='horizontal')


def test_elliptical_point_focus():
    p, q = 10000.0, 2000.0
    m = EllipticalMirrorParam.create(
        p=p, q=q, pitch=PITCH, center=(0, p, 0),
        limPhysX=(-20, 20), limPhysY=(-400, 400))
    screen = Screen.create(center=(0, p + q * math.cos(2 * PITCH),
                                   q * math.sin(2 * PITCH)))
    beam = fan_source().shine(jax.random.PRNGKey(0))
    glo, loc = m.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(img.state) == 1
    assert good.mean() > 0.9
    z = np.asarray(img.z)[good]
    # exact conic: aberration-free point focus (vs 0.6 mm unfocused)
    assert z.std() < 1e-3
    assert abs(z.mean()) < 1e-3


def test_elliptical_cylinder_focus():
    p, q = 10000.0, 2000.0
    m = EllipticalMirrorParam.create(
        p=p, q=q, pitch=PITCH, center=(0, p, 0), isCylindrical=True,
        limPhysX=(-20, 20), limPhysY=(-400, 400))
    screen = Screen.create(center=(0, p + q * math.cos(2 * PITCH),
                                   q * math.sin(2 * PITCH)))
    beam = fan_source().shine(jax.random.PRNGKey(1))
    glo, _ = m.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(img.state) == 1
    assert good.mean() > 0.9
    assert np.asarray(img.z)[good].std() < 1e-3


def test_parabolic_collimation():
    p = 10000.0
    m = ParabolicalMirrorParam.create(
        p=p, pitch=PITCH, center=(0, p, 0),
        limPhysX=(-20, 20), limPhysY=(-400, 400))
    beam = fan_source().shine(jax.random.PRNGKey(2))
    glo, _ = m.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    # collimated: direction spread collapses
    c = np.asarray(glo.c)[good]
    b = np.asarray(glo.b)[good]
    ang = np.arctan2(c, b)
    assert ang.std() < 1e-7
    np.testing.assert_allclose(ang.mean(), 2 * PITCH, rtol=1e-3)


def test_hyperbolic_virtual_focus():
    """Rays converging towards f2 after reflection appear to come from f1
    (virtual-focus geometry of the hyperbolic mirror)."""
    p, q = 10000.0, 3000.0
    m = HyperbolicMirrorParam.create(
        p=p, q=q, pitch=PITCH, center=(0, p, 0),
        limPhysX=(-20, 20), limPhysY=(-400, 400))
    beam = fan_source(dzprime=2e-5).shine(jax.random.PRNGKey(3))
    glo, _ = m.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.8
    # diverging beam: trace back to the virtual focus at distance q
    # upstream: z(y) = z0 + c/b*(y - y0); find the waist position
    y0 = np.asarray(glo.y)[good]
    z0 = np.asarray(glo.z)[good]
    slope = np.asarray(glo.c)[good] / np.asarray(glo.b)[good]
    # least-squares common crossing point: z0 + slope*(yw - y0) equal for
    # all rays -> solve for yw minimizing variance
    A = np.vstack([slope, np.ones_like(slope)]).T
    bvec = slope * y0 - z0
    sol, *_ = np.linalg.lstsq(A, bvec, rcond=None)
    yw = sol[0]
    # virtual focus lies q upstream of the mirror (y = p - q*cos(...))
    np.testing.assert_allclose(yw, p - q * math.cos(2 * PITCH), rtol=0.02)


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
