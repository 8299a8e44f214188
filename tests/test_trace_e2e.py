"""End-to-end trace tests: source -> mirror -> screen (BASELINE config 1)
with analytic cross-checks of geometry, focusing and reflectivity."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xrt_tpu import config
from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.oes import FlatMirror, SphericalMirror, ToroidMirror
import xrt_tpu.materials as xm
from xrt_tpu.runner import run_ray_tracing
from xrt_tpu.plotspec import XYCPlot, XYCAxis

E0 = 9000.0
PITCH = 4e-3
P = 10000.0   # source-mirror
Q = 2000.0    # mirror-screen


def make_source(nrays=20000):
    return GeometricSource.create(
        nrays=nrays, center=(0, 0, 0), dx=0.1, dz=0.05,
        dxprime=2e-5, dzprime=1e-5,
        distE='lines', energies=(E0,), polarization='horizontal')


def test_source_to_screen_statistics():
    src = make_source()
    screen = Screen.create(center=(0, P, 0))
    beam = src.shine(jax.random.PRNGKey(3))
    img = screen.expose(beam)
    x = np.asarray(img.x)
    z = np.asarray(img.z)
    # sigma = sqrt(size^2 + (div*L)^2)
    sx_exp = math.hypot(0.1, 2e-5 * P)
    sz_exp = math.hypot(0.05, 1e-5 * P)
    assert abs(x.std() - sx_exp) / sx_exp < 0.03
    assert abs(z.std() - sz_exp) / sz_exp < 0.03
    assert abs(x.mean()) < 5 * sx_exp / math.sqrt(len(x))
    np.testing.assert_allclose(np.asarray(img.path), P, rtol=1e-6)


def test_flat_mirror_deflection_and_reflectivity():
    src = make_source()
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    mirror = FlatMirror.create(center=(0, P, 0), pitch=PITCH, material=mat,
                               limPhysX=(-10, 10), limPhysY=(-150, 150))
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))

    beam = src.shine(jax.random.PRNGKey(5))
    glo, loc = mirror.reflect(beam)
    img = screen.expose(glo)

    state = np.asarray(glo.state)
    assert (state == 1).mean() > 0.95   # mirror catches nearly all rays

    # direction: reflected beam rises at 2*pitch
    good = state == 1
    c = np.asarray(glo.c)[good]
    b = np.asarray(glo.b)[good]
    np.testing.assert_allclose(np.mean(c / b), math.tan(2 * PITCH),
                               rtol=2e-2)
    # centroid on screen at z = 2*pitch*Q above screen center -> near 0 local
    z = np.asarray(img.z)[good]
    assert abs(z.mean()) < 0.05

    # flux reduced by |rs|^2 (s-polarized horizontal beam on horizontal
    # deflecting... the mirror deflects vertically, s = horizontal => Jss)
    rs, rp = mat.get_amplitude(jnp.asarray([E0]), -math.sin(PITCH))[0:2]
    R_s = float(jnp.abs(rs[0]) ** 2)
    flux_ratio = float(np.asarray(glo.Jss)[good].sum() +
                       np.asarray(glo.Jpp)[good].sum()) / good.sum()
    np.testing.assert_allclose(flux_ratio, R_s, rtol=1e-3)

    # incidence angle stored
    theta = np.asarray(loc.theta)[good]
    np.testing.assert_allclose(theta.mean(), PITCH, rtol=1e-2)


def test_spherical_mirror_focusing():
    """1:1 vertical focusing with the Coddington meridional radius."""
    src = GeometricSource.create(
        nrays=20000, center=(0, 0, 0), dx=0.0, dz=0.0,
        distx=None, distz=None, dxprime=0.0, dzprime=5e-5,
        distxprime=None, distE='lines', energies=(E0,),
        polarization='horizontal')
    R = 2 * P * P / (2 * P) / math.sin(PITCH)  # p = q = P
    mirror = SphericalMirror.create(center=(0, P, 0), pitch=PITCH, R=R,
                                    limPhysX=(-20, 20),
                                    limPhysY=(-300, 300))
    screen = Screen.create(center=(0, 2 * P, 2 * PITCH * P))
    beam = src.shine(jax.random.PRNGKey(7))
    glo, _ = mirror.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(img.state) == 1
    z = np.asarray(img.z)[good]
    # source size is zero -> the image z-size shrinks to aberration level,
    # much smaller than the unfocused size (2*P*dzprime = 1 mm)
    assert good.mean() > 0.9
    assert z.std() < 0.02
    assert abs(z.mean()) < 0.02


def test_toroid_focusing_both_planes():
    src = GeometricSource.create(
        nrays=20000, center=(0, 0, 0), dx=0.0, dz=0.0,
        distx=None, distz=None, dxprime=3e-5, dzprime=3e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    mirror = ToroidMirror.create(center=(0, P, 0), pitch=PITCH, R=R, r=r,
                                 limPhysX=(-20, 20), limPhysY=(-300, 300))
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))
    beam = src.shine(jax.random.PRNGKey(11))
    glo, _ = mirror.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(img.state) == 1
    assert good.mean() > 0.9
    x = np.asarray(img.x)[good]
    z = np.asarray(img.z)[good]
    # demagnified image of a point source: small in both planes vs
    # unfocused sizes (3e-5 * 12000 = 0.36 mm)
    assert x.std() < 0.05
    assert z.std() < 0.05


def test_aperture_blocks():
    src = make_source()
    slit = RectangularAperture.create(
        center=(0, P / 2, 0), opening=(-0.05, 0.05, -0.02, 0.02))
    beam = src.shine(jax.random.PRNGKey(13))
    loc = slit.propagate(beam)
    state = np.asarray(loc.state)
    x = np.asarray(loc.x)
    z = np.asarray(loc.z)
    inside = (np.abs(x) <= 0.05) & (np.abs(z) <= 0.02)
    assert ((state == 1) == inside).all()


def test_run_ray_tracing_accumulation():
    src = make_source(5000)
    screen = Screen.create(center=(0, P, 0))

    def run_process(bl, key):
        beam = src.shine(key)
        img = screen.expose(beam)
        return {'screen': img}

    plot = XYCPlot(beam='screen',
                   xaxis=XYCAxis('x', 'mm', bins=64),
                   yaxis=XYCAxis('z', 'mm', bins=64),
                   caxis=XYCAxis('energy', 'eV', data='energy', bins=32))
    run_ray_tracing(plot, repeats=3, run_process=run_process, key=17)
    assert plot.nRaysAll == 15000
    assert plot.nRaysGood == 15000
    assert plot.repeats == 3
    assert plot.total2D.sum() > 0
    # intensity accumulated = total flux = nrays (Jss=1 each)
    np.testing.assert_allclose(plot.intensity, 15000, rtol=1e-6)
    # hist totals match
    np.testing.assert_allclose(plot.total1D_x.sum(), plot.total2D.sum(),
                               rtol=1e-6)
    assert plot.dx > 0 and plot.dy > 0
    assert abs(plot.cx) < 0.05


def test_reflect_differentiable():
    """Gradient of screen centroid w.r.t. mirror pitch ~ 2*Q."""
    src = make_source(2000)
    mat = None
    beam = src.shine(jax.random.PRNGKey(23))
    screen = Screen.create(center=(0, P + Q, 0))

    def centroid(pitch):
        mirror = FlatMirror.create(center=(0, P, 0), pitch=0.0,
                                   limPhysX=(-10, 10),
                                   limPhysY=(-150, 150))
        mirror = mirror.replace(pitch=pitch)
        glo, _ = mirror.reflect(beam)
        img = screen.expose(glo)
        w = (img.state == 1)
        return jnp.sum(jnp.where(w, img.z, 0.0)) / jnp.sum(w)

    g = jax.grad(centroid)(jnp.asarray(PITCH))
    np.testing.assert_allclose(float(g), 2 * Q, rtol=1e-4)


def test_dual_vfm_two_stripes():
    """DualVFM: each cylinder stripe sagittally focuses with its own
    radius; meridional substrate curvature present."""
    from xrt_tpu.oes import DualVFM
    vfm = DualVFM.create(center=(0, P, 0), pitch=PITCH,
                         R=5e6, r1=70.0, xCylinder1=23.5, hCylinder1=0.1,
                         r2=36.0, xCylinder2=-25.0, hCylinder2=0.1,
                         limPhysX=(-50, 50), limPhysY=(-100, 100))
    import jax.numpy as jnp
    # surface continuity & curvature on each stripe
    x1 = jnp.asarray([23.5, 24.5])
    z1 = np.asarray(vfm.local_z(x1, jnp.zeros(2)))
    # cylinder 1 sag ~ dx^2/(2 r1) relative to its apex
    assert np.isclose(z1[1] - z1[0], 1.0 / (2 * 70.0), rtol=1e-2)
    x2 = jnp.asarray([-25.0, -24.0])
    z2 = np.asarray(vfm.local_z(x2, jnp.zeros(2)))
    assert np.isclose(z2[1] - z2[0], 1.0 / (2 * 36.0), rtol=1e-2)
    # normals: -dz/dx antisymmetric around each apex
    n = vfm.local_n(jnp.asarray([23.0, 24.0]), jnp.zeros(2))
    assert np.asarray(n[0])[0] > 0 > np.asarray(n[0])[1]
    # stripe selection offsets
    _, dx1 = vfm.select_surface(0)
    _, dx2 = vfm.select_surface(1)
    assert dx1 == -23.5 and dx2 == 25.0
