"""Bent-crystal analyzers (Johann geometry) and Laue optics."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import (JohannCylinder, JohanssonCylinder,
                         DicedJohannToroid, LauePlate, BentLaueCylinder)
import xrt_tpu.materials as xm

E0 = 9000.0


def si111():
    return xm.CrystalSi.create(hkl=(1, 1, 1))


def test_johann_rowland_focusing():
    """Johann: source on the Rowland circle focuses back onto it (1:1)."""
    cr = si111()
    thetaB = float(cr.get_Bragg_angle(E0))
    Rm = 1000.0   # bending radius = Rowland diameter
    p = Rm * math.sin(thetaB)   # source distance on the Rowland circle
    ana = JohannCylinder.create(
        Rm=Rm, center=(0, p, 0), pitch=thetaB, material=cr,
        limPhysX=(-10, 10), limPhysY=(-25, 25))
    src = GeometricSource.create(
        nrays=5000, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, dxprime=0.0, dzprime=8e-3, distE='flat',
        energies=(E0 - 3, E0 + 3), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, loc = ana.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.3
    # image on the Rowland circle at distance p from the crystal
    screen = Screen.create(center=(0, p + p * math.cos(2 * thetaB),
                                   p * math.sin(2 * thetaB)))
    img = screen.expose(glo)
    z = np.asarray(img.z)[np.asarray(img.state) == 1]
    # meridional focusing: small image from an 8 mrad fan (50 mm footprint)
    assert z.std() < 0.5


def test_johansson_vs_johann_bragg_normal():
    cr = si111()
    jo = JohannCylinder.create(Rm=1000.0, material=cr, limPhysX=(-10, 10),
                               limPhysY=(-30, 30))
    js = JohanssonCylinder.create(Rm=1000.0, material=cr,
                                  limPhysX=(-10, 10), limPhysY=(-30, 30))
    y = jnp.asarray([10.0])
    x = jnp.asarray([0.0])
    n_jo = jo.local_n(x, y)
    n_js = js.local_n(x, y)
    # Johansson splits Bragg normal (effective 2R) from surface normal (R)
    assert len(n_js) == 6
    # surface normals agree
    np.testing.assert_allclose(float(n_js[-2][0]), float(n_jo[1][0]),
                               rtol=1e-9)
    # Bragg-plane tilt of Johansson is about half the surface tilt
    tilt_surf = math.asin(-float(n_js[-2][0]))
    tilt_bragg = math.asin(-float(n_js[1][0]))
    np.testing.assert_allclose(tilt_bragg, tilt_surf / 2, rtol=0.01)


def test_diced_toroid_gaps():
    cr = si111()
    d = DicedJohannToroid.create(
        Rm=1000.0, Rs=500.0, dxFacet=2.0, dyFacet=1.5, dxGap=0.2,
        dyGap=0.2, material=cr, limPhysX=(-10, 10), limPhysY=(-10, 10))
    # points in facet centers are good; points in gaps are lost
    state = jnp.ones((2,), jnp.int32)
    x = jnp.asarray([0.0, 1.05])   # second lands in an x-gap
    y = jnp.asarray([0.0, 0.0])
    out = d.rays_good(x, y, state)
    assert int(out[0]) == 1
    assert int(out[1]) < 0


def test_laue_plate_transmission_geometry():
    """A Laue plate diffracts in transmission geometry: the beam passes to
    the other side of the crystal."""
    cr = xm.CrystalSi.create(hkl=(1, 1, 1), geom='Laue reflected', t=0.1)
    thetaB = float(cr.get_Bragg_angle(E0))
    plate = LauePlate.create(center=(0, 5000.0, 0),
                             pitch=math.pi / 2 + thetaB, material=cr,
                             limPhysX=(-20, 20), limPhysY=(-20, 20))
    src = GeometricSource.create(
        nrays=200, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(1))
    glo, loc = plate.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.all()
    # diffracted beam is deflected by ~2 thetaB from the forward direction
    b = np.asarray(glo.b)[good][0]
    c = np.asarray(glo.c)[good][0]
    ang = abs(math.atan2(c, b))
    np.testing.assert_allclose(ang, 2 * thetaB, rtol=1e-2)
    # reflectivity is finite and below 1
    J = np.asarray(glo.Jss + glo.Jpp)[good]
    assert 0 < J.mean() < 1.0


def test_bent_laue_cylinder_runs():
    cr = xm.CrystalSi.create(hkl=(1, 1, 1), geom='Laue reflected', t=0.1)
    thetaB = float(cr.get_Bragg_angle(E0))
    blc = BentLaueCylinder.create(
        R=2000.0, center=(0, 5000.0, 0), pitch=math.pi / 2 + thetaB,
        material=cr, limPhysX=(-20, 20), limPhysY=(-20, 20))
    src = GeometricSource.create(
        nrays=2000, dx=0.1, dz=0.1, dxprime=1e-4, dzprime=1e-4,
        distE='flat', energies=(E0 - 50, E0 + 50),
        polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(2))
    glo, loc = blc.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    J = np.asarray(glo.Jss + glo.Jpp)[good]
    assert np.isfinite(J).all()
    # the bent crystal passes a wider band than a flat plate
    assert J.mean() > 1e-5


def test_diced_spherical_analyzer_tt_trace():
    """End-to-end trace of a diced SPHERICALLY bent (Rm == Rs) analyzer
    whose crystal uses the Takagi-Taupin amplitudes: the OE wires both
    radii (self.Rm -> Ry, self.Rs -> Rx) into get_amplitude_pytte
    (cf. reference materials.cl spherical-bent TT kernels
    :1861-1953 driven from reflect).  A center-facet pencil scanned in
    energy must reproduce the directly computed 2D-bent TT curve."""
    from xrt_tpu.beam import new_beam
    Rm = 2000.0
    cr = xm.CrystalSi.create(hkl=(1, 1, 1), t=0.1, useTT=True)
    thetaB = float(cr.get_Bragg_angle(E0))
    p = 500.0
    ana = DicedJohannToroid.create(
        Rm=Rm, Rs=Rm, dxFacet=4.0, dyFacet=4.0, dxGap=0.05, dyGap=0.05,
        center=(0, p, 0), pitch=thetaB, material=cr,
        limPhysX=(-2, 2), limPhysY=(-2, 2))
    n = 61
    # energy scan at fixed incidence == rocking scan:
    # theta - thetaB(E) = +tan(thetaB) * dE/E at fixed incidence
    dE = np.linspace(-0.45, 0.9, n)
    E = jnp.asarray(E0 + dE)
    beam = new_beam(n, withAmplitudes=True).replace(E=E)
    glo, loc = ana.reflect(beam, jax.random.PRNGKey(0))
    good = np.asarray(loc.state) == 1
    assert good.mean() > 0.9
    R_traced = np.asarray(loc.Jss)
    dth = np.tan(thetaB) * dE / E0
    bIn = -jnp.sin(thetaB + jnp.asarray(dth))
    rs, _ = cr.get_amplitude_pytte(jnp.full((n,), E0), bIn,
                                   Ry=Rm, Rx=Rm, nsteps=4000)
    R_direct = np.abs(np.asarray(rs)) ** 2
    # the traced curve must be the 2D-bent TT curve (facet tilt at the
    # center is < 1 mm / 2000 mm = 0.5 mrad -> small angular smearing)
    assert np.allclose(R_traced[good], R_direct[good], atol=0.05)
    # and must differ from the cylindrical (Rs=inf) curve, i.e. the
    # sagittal radius actually reaches the solver
    rs_cyl, _ = cr.get_amplitude_pytte(jnp.full((n,), E0), bIn,
                                       Ry=Rm, Rx=math.inf, nsteps=4000)
    R_cyl = np.abs(np.asarray(rs_cyl)) ** 2
    assert np.abs(R_cyl - R_direct).max() > 0.02


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
