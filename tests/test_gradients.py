"""End-to-end differentiability: pixel-flux gradients w.r.t. alignment and
aperture parameters checked against finite differences (SURVEY.md section 7,
the differentiability layer)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import FlatMirror, ToroidMirror
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen
from xrt_tpu.histogram import hist2d

E0 = 9000.0


def test_grad_flux_vs_mirror_pitch_fd():
    """d(central flux)/d(pitch) through source -> toroid -> screen -> 2D
    histogram matches central finite differences."""
    p, q = 10000.0, 2000.0
    pitch0 = 4e-3
    src = GeometricSource.create(nrays=4000, dx=0.1, dz=0.05,
                                 dxprime=2e-5, dzprime=2e-5,
                                 energies=(E0,), distE='lines')
    mat = xm.Material.create('Rh', rho=12.41)
    R = 2 * p * q / (p + q) / math.sin(pitch0)
    r = 2 * p * q / (p + q) * math.sin(pitch0)
    mirror0 = ToroidMirror.create(center=(0, p, 0), pitch=pitch0, R=R, r=r,
                                  material=mat, limPhysX=(-20, 20),
                                  limPhysY=(-300, 300))
    screen = Screen.create(center=(0, p + q, 2 * pitch0 * q))
    beam = src.shine(jax.random.PRNGKey(0))

    def flux(pitch):
        m = mirror0.replace(pitch=pitch)
        glo, _ = m.reflect(beam)
        img = screen.expose(glo)
        w = jnp.where(img.state == 1, img.Jss + img.Jpp, 0.0)
        h = hist2d(img.x, img.z, w, 16, 16, (-2.0, 2.0), (-2.0, 2.0))
        # smooth central weight, not a hard pixel edge
        zc = jnp.linspace(-2, 2, 16)
        wz = jnp.exp(-zc ** 2 / 0.5)
        return jnp.sum(h * wz[:, None] * wz[None, :])

    g = float(jax.grad(flux)(jnp.asarray(pitch0)))
    h = 2e-6
    fd = (float(flux(jnp.asarray(pitch0 + h))) -
          float(flux(jnp.asarray(pitch0 - h)))) / (2 * h)
    assert np.isfinite(g) and abs(fd) > 0
    assert np.isclose(g, fd, rtol=0.1)


def test_grad_through_soft_aperture_fd():
    """Soft-edged slit: flux gradient w.r.t. the blade position matches
    finite differences (hard apertures have zero a.e. gradients)."""
    src = GeometricSource.create(nrays=3000, dx=0.0, dz=0.4, distz='flat',
                                 dxprime=0.0, dzprime=0.0,
                                 distxprime=None, distzprime=None,
                                 energies=(E0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(1))
    slit0 = RectangularAperture.create(center=(0, 1000.0, 0),
                                       opening=(-1.0, 1.0, -0.1, 0.1),
                                       softEdge=0.01)

    def flux(top):
        s = slit0.replace(top=top)
        lo = s.propagate(beam)
        return jnp.sum(jnp.where(lo.state > 0, lo.Jss + lo.Jpp, 0.0))

    g = float(jax.grad(flux)(jnp.asarray(0.1)))
    h = 1e-5
    fd = (float(flux(jnp.asarray(0.1 + h))) -
          float(flux(jnp.asarray(0.1 - h)))) / (2 * h)
    # opening the top blade admits more flux: positive gradient ~ density
    assert g > 0
    assert np.isclose(g, fd, rtol=1e-4)
    # sanity: transmission between blade-dominated and open regions
    T = slit0.transmission(jnp.zeros(3), jnp.asarray([0.0, 0.1, 0.2]))
    T = np.asarray(T)
    assert T[0] > 0.99 and np.isclose(T[1], 0.5, atol=0.01) and \
        T[2] < 0.01


def test_grad_wrt_source_divergence():
    """Gradient of focused spot size w.r.t. source divergence."""
    p, q = 10000.0, 2000.0
    pitch = 4e-3
    mat = xm.Material.create('Rh', rho=12.41)
    R = 2 * p * q / (p + q) / math.sin(pitch)
    r = 2 * p * q / (p + q) * math.sin(pitch)
    mirror = ToroidMirror.create(center=(0, p, 0), pitch=pitch, R=R, r=r,
                                 material=mat, limPhysX=(-20, 20),
                                 limPhysY=(-300, 300))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))
    src = GeometricSource.create(nrays=2000, dx=0.1, dz=0.05,
                                 dxprime=2e-5, dzprime=2e-5,
                                 energies=(E0,), distE='lines')

    def spot_var(scale):
        beam = src.shine(jax.random.PRNGKey(2))
        # reparameterized divergence scaling (differentiable MC)
        beam = beam.replace(c=beam.c * scale)
        nrm = jnp.sqrt(beam.a ** 2 + beam.b ** 2 + beam.c ** 2)
        beam = beam.replace(a=beam.a / nrm, b=beam.b / nrm, c=beam.c / nrm)
        glo, _ = mirror.reflect(beam)
        img = screen.expose(glo)
        w = (img.state == 1).astype(img.z.dtype)
        zm = jnp.sum(img.z * w) / jnp.sum(w)
        return jnp.sum(w * (img.z - zm) ** 2) / jnp.sum(w)

    g = float(jax.grad(spot_var)(jnp.asarray(1.0)))
    h = 1e-3
    fd = (float(spot_var(jnp.asarray(1.0 + h))) -
          float(spot_var(jnp.asarray(1.0 - h)))) / (2 * h)
    assert np.isfinite(g)
    assert np.isclose(g, fd, rtol=0.05)


def test_aperture_touch_beam_and_divergence():
    from xrt_tpu.apertures import RectangularAperture
    src = GeometricSource.create(nrays=2000, dx=0.0, dz=0.0,
                                 distx=None, distz=None,
                                 dxprime=1e-4, dzprime=5e-5,
                                 energies=(E0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(9))
    slit = RectangularAperture.create(center=(0, 1000.0, 0),
                                      opening=(-10, 10, -10, 10))
    fitted = slit.touch_beam(beam)
    # blades hug the +-~3.5-sigma beam: ~0.35 mm in x, ~0.175 in z
    assert 0.2 < -float(fitted.left) < 0.6
    assert 0.2 < float(fitted.right) < 0.6
    assert 0.1 < float(fitted.top) < 0.3
    # divergence round-trip
    div = fitted.get_divergence(src)
    back = fitted.set_divergence(src, div)
    assert np.isclose(float(back.left), float(fitted.left), atol=1e-6)
    assert np.isclose(float(back.top), float(fitted.top), atol=1e-6)


def test_aperture_set_on_z_actuator():
    from xrt_tpu.apertures import SetOfRectangularAperturesOnZActuator
    st = SetOfRectangularAperturesOnZActuator(
        center=(0, 1000.0, 0),
        apertures=['small', 'big', 'top-edge'],
        centerZs=[0.0, 5.0, 10.0], dXs=[1.0, 4.0], dZs=[0.5, 2.0])
    ap = st.select_aperture('small')
    assert np.isclose(float(ap.top) - float(ap.bottom), 0.5)
    ap2 = st.select_aperture('big', targetZ=1000.0 * 0 + 5.0)
    assert np.isclose(float(ap2.right), 2.0)
    edge = st.select_aperture('top-edge', targetZ=3.0)
    assert np.isinf(float(edge.bottom)) and float(edge.top) == 3.0


def test_grad_through_kirchhoff_wave_chain_fd():
    """End-to-end differentiability of the WAVE path (a capability the
    reference does not have at all): the focal-plane intensity of a
    Gaussian beam diffracted through a slit is differentiated w.r.t. the
    source waist w0 through shine + the Kirchhoff integral, and checked
    against finite differences."""
    import jax
    import jax.numpy as jnp
    from xrt_tpu.apertures import RectangularAperture
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GaussianBeam
    from xrt_tpu.waves import (prepare_wave_on_aperture,
                               prepare_wave_on_screen, diffract)

    E0 = 9000.0
    L = 5000.0
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.1, 0.1, -0.1, 0.1))
    screen = Screen.create(center=(0, L, 0))
    gb0 = GaussianBeam.create(w0=0.05, distE='lines', energies=(E0,),
                              polarization='horizontal')
    waveSlit = prepare_wave_on_aperture(slit, gb0, 300,
                                        key=jax.random.PRNGKey(1))
    zs = np.linspace(-0.2, 0.2, 41)
    waveScr = prepare_wave_on_screen(screen, slit, np.asarray([0.0]), zs)

    def focal_peak(w0):
        gb = gb0.replace(w0=w0)
        src = gb.shine(jax.random.PRNGKey(2), waveSlit, toGlobal=False)
        out = diffract(src, waveScr)
        I = out.Jss + out.Jpp
        return jnp.sum(I * jnp.exp(-(out.z / 0.05) ** 2))  # soft peak flux

    w0 = jnp.asarray(0.05)
    g = jax.grad(focal_peak)(w0)
    eps = 1e-5
    fd = (focal_peak(w0 + eps) - focal_peak(w0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
    assert abs(float(g)) > 0


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
