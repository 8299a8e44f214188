"""Figure error tests: distorted mirror changes the reflected beam in the
expected way."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import FlatMirror
from xrt_tpu import figure_error as fe

E0 = 9000.0
P = 10000.0
PITCH = 4e-3


def test_waviness_rms():
    w = fe.waviness(amplitude=5.0, period=20.0, limPhysX=(-10, 10),
                    limPhysY=(-100, 100), gridStep=0.25)
    # rms of a sine = A/sqrt(2)
    np.testing.assert_allclose(float(w.get_rms()), 5.0 / math.sqrt(2),
                               rtol=0.02)
    # evaluation in mm
    z = w.local_z_distorted(jnp.asarray([0.0]), jnp.asarray([5.0]))
    np.testing.assert_allclose(float(z[0]), 5e-6 * math.sin(2 * math.pi *
                                                            5.0 / 20.0),
                               rtol=0.05)


def test_random_roughness_rms():
    r = fe.random_roughness(rms=2.0, corrLength=3.0, seed=4,
                            limPhysX=(-10, 10), limPhysY=(-100, 100),
                            gridStep=0.5)
    np.testing.assert_allclose(float(r.get_rms()), 2.0, rtol=1e-6)


def test_waviness_broadens_reflection():
    """Slope errors broaden the reflected angular distribution by
    ~2x the rms slope."""
    amp_nm = 50.0
    period = 20.0
    w = fe.waviness(amplitude=amp_nm, period=period, limPhysX=(-10, 10),
                    limPhysY=(-200, 200), gridStep=0.2)
    mirror_flat = FlatMirror.create(center=(0, P, 0), pitch=PITCH,
                                    limPhysX=(-10, 10),
                                    limPhysY=(-200, 200))
    mirror_wavy = mirror_flat.replace(figure_error=w)
    src = GeometricSource.create(
        nrays=20000, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, dxprime=0.0, dzprime=2e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    glo_f, _ = mirror_flat.reflect(beam)
    glo_w, _ = mirror_wavy.reflect(beam)
    good = (np.asarray(glo_w.state) == 1) & (np.asarray(glo_f.state) == 1)
    ang_f = np.arctan2(np.asarray(glo_f.c), np.asarray(glo_f.b))[good]
    ang_w = np.arctan2(np.asarray(glo_w.c), np.asarray(glo_w.b))[good]
    # rms slope of sine: (2 pi A / period) / sqrt(2), in rad
    slope_rms = 2 * math.pi * amp_nm * 1e-6 / period / math.sqrt(2)
    extra = np.sqrt(max(ang_w.std() ** 2 - ang_f.std() ** 2, 0.0))
    np.testing.assert_allclose(extra, 2 * slope_rms, rtol=0.15)


def test_bump_displaces_heights():
    g = fe.gaussian_bump(height=100.0, sigmaX=2.0, sigmaY=10.0,
                         limPhysX=(-10, 10), limPhysY=(-100, 100),
                         gridStep=0.25)
    z0 = float(g.local_z_distorted(jnp.asarray([0.0]),
                                   jnp.asarray([0.0]))[0])
    np.testing.assert_allclose(z0, 100e-6, rtol=0.02)
