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




def test_grad_figure_error_amplitude_fd():
    """d(focal flux)/d(figure-error amplitude) through a 2-hop WAVE chain
    (slit field -> Kirchhoff -> figure-errored mirror -> reflect ->
    Kirchhoff -> screen) matches finite differences — the north-star
    capability of the rebuild: pixel-flux gradients w.r.t. surface
    figure (SURVEY.md section 7.7; reference parameter set
    figure_error.py:199-251, which the reference cannot differentiate).

    The traced amplitude moves BOTH the receiving-surface samples (via
    waves.wave_frame_rotation retargeting) and the reflected phase/
    normals (figure_error through reflect), and the gradient flows
    through the Kirchhoff kernel custom VJP on the Pallas path too
    (checked at the kernel level in test_kirchhoff_grad)."""
    import jax
    import jax.numpy as jnp
    from xrt_tpu.apertures import RectangularAperture
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GaussianBeam
    from xrt_tpu.figure_error import waviness
    from xrt_tpu.waves import (prepare_wave_on_aperture,
                               prepare_wave_on_oe, prepare_wave_on_screen,
                               diffract, reflect_wave, wave_frame_rotation)
    from xrt_tpu.oes import FlatMirror

    E0 = 9000.0
    p, q = 5000.0, 2000.0
    pitch = 5e-3
    mat = xm.Material.create('Rh', rho=12.41)
    fe_unit = waviness(amplitude=1.0, period=25.0, limPhysX=(-5, 5),
                       limPhysY=(-60, 60), gridStep=1.0)
    mirror0 = FlatMirror.create(center=(0, p, 0), pitch=pitch,
                                material=mat, limPhysX=(-5, 5),
                                limPhysY=(-60, 60),
                                figure_error=fe_unit)
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.2, 0.2, -0.2, 0.2))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))
    gb = GaussianBeam.create(w0=0.08, distE='lines', energies=(E0,),
                             polarization='horizontal')
    key = jax.random.PRNGKey(3)
    waveSlit = prepare_wave_on_aperture(slit, gb, 300, key=key)
    slitBeam = gb.shine(jax.random.PRNGKey(4), waveSlit, toGlobal=False)
    wvM0 = prepare_wave_on_oe(mirror0, slit, (24, 32),
                              key=jax.random.PRNGKey(5), shape='grid')
    zscr = np.linspace(-0.3, 0.3, 41)
    wvScr0 = prepare_wave_on_screen(screen, mirror0, np.asarray([0.0]),
                                    zscr)
    R = wave_frame_rotation(mirror0, slit)
    z_unit = fe_unit.local_z_distorted(wvM0.x, wvM0.y)
    wz = jnp.exp(-(jnp.asarray(zscr) / 0.1) ** 2)

    def loss(amp):
        fe = fe_unit.replace(zmap=amp * fe_unit.zmap,
                             dzdx=amp * fe_unit.dzdx,
                             dzdy=amp * fe_unit.dzdy)
        m = mirror0.replace(figure_error=fe)
        dz = (amp - 1.0) * z_unit
        wvM = wvM0.replace(xDiffr=wvM0.xDiffr + R[0, 2] * dz,
                           yDiffr=wvM0.yDiffr + R[1, 2] * dz,
                           zDiffr=wvM0.zDiffr + R[2, 2] * dz,
                           z=wvM0.z + dz)
        b = diffract(slitBeam, wvM)
        _, loc = reflect_wave(m, b)
        out = diffract(loc, wvScr0)
        I = out.Jss + out.Jpp
        return jnp.sum(I * wz) * 1e-10

    a0 = jnp.asarray(1.0)
    g = float(jax.grad(loss)(a0))
    h = 0.02   # nm
    fd = (float(loss(a0 + h)) - float(loss(a0 - h))) / (2 * h)
    assert np.isfinite(g) and abs(fd) > 0
    np.testing.assert_allclose(g, fd, rtol=2e-3)


def test_grad_ellipse_semiaxis_through_parametric_intersection_fd():
    """d(focal sharpness)/d(ellipseB) through the RAY path's parametric
    intersection solver (Illinois + Newton polish, oes/base.py): the
    implicit-function differentiability claim exercised where it can
    break — the surface shape parameter itself."""
    import jax
    import jax.numpy as jnp
    from xrt_tpu.oes.parametric import EllipticalMirrorParam
    from xrt_tpu.screens import Screen

    E0 = 9000.0
    p, q = 10000.0, 2000.0
    pitch = 4e-3
    mat = xm.Material.create('Rh', rho=12.41)
    m0 = EllipticalMirrorParam.create(p=p, q=q, pitch=pitch,
                                      center=(0, p, 0), material=mat,
                                      limPhysX=(-20, 20),
                                      limPhysY=(-300, 300))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))
    src = GeometricSource.create(nrays=2000, dx=0.05, dz=0.05,
                                 dxprime=3e-5, dzprime=3e-5,
                                 energies=(E0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(11))

    def sharp(bscale):
        m = m0.replace(ellipseB=m0.ellipseB * bscale)
        glo, _ = m.reflect(beam)
        img = screen.expose(glo)
        w = jnp.where(img.state == 1, img.Jss + img.Jpp, 0.0)
        # soft focal sharpness: Gaussian-weighted central flux
        return jnp.sum(w * jnp.exp(-(img.z / 0.02) ** 2)) / jnp.sum(w)

    s0 = jnp.asarray(1.0)
    g = float(jax.grad(sharp)(s0))
    h = 1e-4
    fd = (float(sharp(s0 + h)) - float(sharp(s0 - h))) / (2 * h)
    assert np.isfinite(g) and abs(fd) > 0
    np.testing.assert_allclose(g, fd, rtol=5e-3)



import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
