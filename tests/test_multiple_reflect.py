"""Multiple reflections in a capillary (whispering-gallery style)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import EllipsoidCapillaryMirror
import xrt_tpu.materials as xm

E0 = 9000.0


def test_capillary_multiple_bounces():
    """Rays entering an ellipsoidal capillary slightly off-axis bounce
    multiple times and exit with nRefl >= 1."""
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    cap = EllipsoidCapillaryMirror.create(
        ellipseA=5000.0, ellipseB=2.0, workingDistance=50.0,
        center=(0, 1000.0, 0), material=mat,
        limPhysX=(-5, 5), limPhysY=(-100, 100))
    src = GeometricSource.create(
        nrays=2000, distx='annulus', dx=(0.3, 0.8), dz=0.0, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, loc = cap.multiple_reflect(beam, maxReflections=8)
    nRefl = np.asarray(glo.nRefl)
    good = np.asarray(glo.state) == 1
    assert good.sum() > 100
    assert nRefl[good].max() >= 1
    assert np.isfinite(np.asarray(glo.x)).all()
    # reflected rays lose some flux (mirror reflectivity < 1 at steep
    # grazing): none can gain
    J = np.asarray(glo.Jss + glo.Jpp)
    assert (J[good] <= 1.0 + 1e-9).all()
