"""BentLaue2D: 2D-bent Laue geometry, depth-dependent lattice rotation,
volumetric diffraction."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.oes import BentLaue2D, LauePlate
from xrt_tpu.materials import CrystalSi
from xrt_tpu.sources.geometric import GeometricSource

E0 = 40000.0
RM = 2000.0
RS = -10000.0


def _crystal(**kw):
    return CrystalSi.create(hkl=(1, 1, 1), t=0.2, geom='Laue reflected',
                            **kw)


def test_surface_shape_and_normals():
    oe = BentLaue2D.create(Rm=RM, Rs=RS, center=(0, 1000, 0),
                           material=_crystal(), alpha=0.0)
    x = jnp.asarray([0.0, 5.0, 0.0])
    y = jnp.asarray([0.0, 0.0, 10.0])
    z = np.asarray(oe.local_z(x, y))
    assert np.isclose(z[1], 0.5 * 25 / RS)
    assert np.isclose(z[2], 0.5 * 100 / RM)
    n = oe.local_n(x, y)
    # surface normal tilts opposite to the slope
    assert np.isclose(float(n[-3][1]), -5.0 / RS, rtol=1e-3)
    assert np.isclose(float(n[-2][2]), -10.0 / RM, rtol=1e-3)
    # on-apex Bragg-plane normal is +y for alpha=0 (Laue)
    assert np.isclose(float(n[1][0]), 1.0, atol=1e-12)
    assert abs(float(n[2][0])) < 1e-12


def test_depth_normal_rotation():
    """The depth-local plane normal rotates with z per the displacement
    jacobian; at the neutral surface z=0 on-axis it equals the nominal."""
    cr = _crystal()
    oe = BentLaue2D.create(Rm=RM, Rs=RS, center=(0, 1000, 0), material=cr,
                           alpha=0.0)
    assert oe.djparams is not None
    x = jnp.zeros(3)
    y = jnp.zeros(3)
    z = jnp.asarray([0.0, -0.05, -0.1])
    hN = oe.local_n_depth(x, y, z)
    hy = np.asarray(hN[1])
    hz = np.asarray(hN[2])
    assert np.isclose(hy[0], 1.0, atol=1e-12)
    # rotation angle grows linearly with depth: dtheta = z*coef2*1e3
    # (z negative into the crystal)
    coef2 = float(oe.djparams[1])
    ang = np.arctan2(-hz, hy)
    assert np.isclose(ang[1], -0.05 * coef2 * 1e3, rtol=1e-4, atol=1e-12)
    assert np.isclose(ang[2], 2 * ang[1], rtol=1e-4)
    # off-axis y at surface: plane rotates by ~ -y*invR1*1e3 (cylindrical
    # bending of the lattice)
    hN2 = oe.local_n_depth(jnp.zeros(1), jnp.asarray([10.0]),
                           jnp.zeros(1))
    invR1 = float(oe.djparams[2])
    ang2 = float(np.arctan2(-np.asarray(hN2[2]), np.asarray(hN2[1]))[0])
    assert np.isclose(ang2, -10.0 * invR1 * 1e3, rtol=1e-4)


def test_volumetric_diffraction_e2e():
    """Bent Laue with volumetric diffraction: rays diffract from random
    depths, producing a depth-spread of reflected directions wider than a
    flat Laue plate's."""
    cr = _crystal(volumetricDiffraction=True)
    thetaB = float(cr.get_Bragg_angle(E0))
    oe = BentLaue2D.create(Rm=RM, Rs=RS, center=(0, 1000.0, 0),
                           pitch=thetaB + math.pi / 2, material=cr,
                           limPhysX=(-10, 10), limPhysY=(-10, 10))
    src = GeometricSource.create(nrays=2000, dzprime=1e-4,
                                 energies=(E0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, loc = oe.reflect(beam, jax.random.PRNGKey(1))
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    I = np.asarray(glo.Jss + glo.Jpp)[good]
    assert np.all(np.isfinite(I))
    assert I.max() > 1e-4
    # the bent lattice sweeps a range of Bragg angles through the depth:
    # integrated acceptance exceeds the flat plate's
    flat = LauePlate.create(center=(0, 1000.0, 0),
                            pitch=thetaB + math.pi / 2,
                            material=_crystal(),
                            limPhysX=(-10, 10), limPhysY=(-10, 10))
    glof, _ = flat.reflect(beam, jax.random.PRNGKey(1))
    goodf = np.asarray(glof.state) == 1
    If = np.asarray(glof.Jss + glof.Jpp)[goodf]
    assert I.sum() > If.sum()


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
