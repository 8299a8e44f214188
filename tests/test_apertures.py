"""Aperture behavior: transmitted fraction equals the geometric open-area
fraction for a uniform beam, beam stops invert it, soft edges conserve the
total, and propagate advances rays to the aperture plane
(cf. reference apertures.py:334-413 and the aperture classes)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.apertures import (RectangularAperture, RectangularBeamStop,
                               RoundAperture, RoundBeamStop,
                               PolygonalAperture, DoubleSlit,
                               DoubleBeamStop, GridAperture, GridBeamStop,
                               SiemensStar)
from xrt_tpu.sources import GeometricSource

E0 = 9000.0
P = 1000.0
HALF = 2.0     # uniform beam half-size (mm)


def uniform_beam(nrays=200000):
    src = GeometricSource.create(
        nrays=nrays, distx='flat', dx=2 * HALF, distz='flat', dz=2 * HALF,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    return src.shine(jax.random.PRNGKey(0))


BEAM = uniform_beam()
AREA_BEAM = (2 * HALF) ** 2


def frac(ap):
    out = ap.propagate(BEAM)
    return float((np.asarray(out.state) == 1).mean())


def test_rectangular_and_stop():
    opening = (-0.8, 1.0, -0.5, 0.7)
    ap = RectangularAperture.create(center=(0, P, 0), opening=opening)
    stop = RectangularBeamStop(center=(0, P, 0), opening=opening)
    area = (opening[1] - opening[0]) * (opening[3] - opening[2])
    np.testing.assert_allclose(frac(ap), area / AREA_BEAM, rtol=2e-2)
    np.testing.assert_allclose(frac(ap) + frac(stop), 1.0, atol=1e-12)


def test_round_and_stop():
    r = 1.2
    ap = RoundAperture.create(center=(0, P, 0), r=r)
    stop = RoundBeamStop(center=(0, P, 0), r=r)
    np.testing.assert_allclose(frac(ap), math.pi * r ** 2 / AREA_BEAM,
                               rtol=2e-2)
    np.testing.assert_allclose(frac(ap) + frac(stop), 1.0, atol=1e-12)


def test_polygonal_triangle():
    verts = [(-1.5, -1.0), (1.5, -1.0), (0.0, 1.4)]
    ap = PolygonalAperture.create(center=(0, P, 0), opening=verts)
    area = 0.5 * 3.0 * 2.4
    np.testing.assert_allclose(frac(ap), area / AREA_BEAM, rtol=2e-2)


def test_double_slit_shade():
    opening = (-1.0, 1.0, -1.0, 1.0)
    ds = DoubleSlit.create(center=(0, P, 0), opening=opening,
                           shadeFraction=(0.3, 0.7))
    # open area = rect * (1 - shade width fraction)
    expected = (2.0 * 2.0) * (1 - 0.4) / AREA_BEAM
    np.testing.assert_allclose(frac(ds), expected, rtol=2e-2)
    stop = DoubleBeamStop(center=(0, P, 0), opening=opening,
                          shadeFraction=(0.3, 0.7))
    np.testing.assert_allclose(frac(ds) + frac(stop), 1.0, atol=1e-12)


def test_grid_beamstop_complements_grid():
    ap = GridAperture.create(center=(0, P, 0), dx=0.1, dz=0.1, px=0.5,
                             pz=0.5, nx=3, nz=3)
    stop = GridBeamStop(center=(0, P, 0), dx=0.1, dz=0.1, px=0.5,
                        pz=0.5, nx=3, nz=3)
    np.testing.assert_allclose(frac(ap) + frac(stop), 1.0, atol=1e-12)


def test_grid_fill_factor():
    g = GridAperture.create(center=(0, P, 0), dx=0.1, dz=0.1,
                            px=0.5, pz=0.5, nx=3, nz=3)
    # holes of 0.2x0.2 on a 0.5 pitch, (2*3+1)^2 holes
    nholes = 7 * 7
    expected = nholes * 0.2 * 0.2 / AREA_BEAM
    np.testing.assert_allclose(frac(g), expected, rtol=5e-2)


def test_siemens_star_spokes():
    st = SiemensStar.create(center=(0, P, 0), nSpokes=8, r=1.5)
    # wedge OPENINGS cover half the disk of radius r; outside r opaque
    # (reference apertures.py:1462 builds the star as spoke openings)
    disk = math.pi * 1.5 ** 2
    expected = 0.5 * disk / AREA_BEAM
    np.testing.assert_allclose(frac(st), expected, rtol=3e-2)


def test_propagate_advances_to_plane():
    ap = RectangularAperture.create(center=(0, P, 0),
                                    opening=(-5, 5, -5, 5))
    out = ap.propagate(BEAM)
    good = np.asarray(out.state) == 1
    # local frame: y == 0 on the aperture plane; path advanced by ~P
    np.testing.assert_allclose(np.asarray(out.y)[good], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.path)[good], P, rtol=1e-6)


def test_soft_edge_conserves_total_flux_shape():
    """Soft-edge transmission integrates to the same open area and is
    monotonic across the blade."""
    hard = RectangularAperture.create(center=(0, P, 0),
                                      opening=(-1, 1, -1, 1))
    soft = RectangularAperture.create(center=(0, P, 0),
                                      opening=(-1, 1, -1, 1),
                                      softEdge=0.05)
    x = jnp.linspace(-2, 2, 2001)
    z = jnp.zeros_like(x)
    Th = hard.transmission(x, z)
    Ts = soft.transmission(x, z)
    # same integral (the sigmoid is symmetric about the blade)
    np.testing.assert_allclose(float(Ts.sum()), float(Th.sum()), rtol=1e-3)
    # strictly inside/outside agree
    assert float(Ts[1000]) > 0.999          # center
    assert float(Ts[0]) < 1e-6              # far outside
