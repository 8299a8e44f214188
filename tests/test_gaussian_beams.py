"""Analytic Gaussian/Laguerre/Hermite beams (cf. reference
tests/raycing/laguerre_hermite_gaussian_beam.py) and mesh sources."""
import math

import numpy as np
import jax
import jax.numpy as jnp
from scipy import special

from xrt_tpu import config
from xrt_tpu.sources import (GaussianBeam, LaguerreGaussianBeam,
                             HermiteGaussianBeam, MeshSource,
                             CollimatedMeshSource, hermite_poly,
                             genlaguerre_poly)
from xrt_tpu.sources.gaussian import GaussianBeam as GB
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen
from xrt_tpu.waves import prepare_wave_on_screen
from xrt_tpu.physconsts import CHBAR

E0 = 9000.0


def test_polynomials_vs_scipy():
    x = np.linspace(-3, 3, 41)
    for n in (1, 2, 3, 5):
        np.testing.assert_allclose(hermite_poly(n, jnp.asarray(x)),
                                   special.eval_hermite(n, x), rtol=1e-10)
    for p in (1, 2, 3):
        for a in (0, 1, 2):
            np.testing.assert_allclose(
                genlaguerre_poly(p, a, jnp.asarray(x)),
                special.eval_genlaguerre(p, a, x), rtol=1e-9, atol=1e-9)


def _field_on_screen(src, L=5000.0, lim=0.3, n=101):
    screen = Screen.create(center=(0, L, 0))
    xs = np.linspace(-lim, lim, n)
    wave = prepare_wave_on_screen(screen, src, xs, xs)
    out = src.shine(jax.random.PRNGKey(0), wave, toGlobal=False)
    I = np.asarray(out.Jss + out.Jpp).reshape(n, n)
    return xs, I


def test_gaussian_beam_width():
    w0 = 0.01
    src = GaussianBeam.create(center=(0, 0, 0), w0=w0,
                              energies=(E0,))
    L = 5000.0
    xs, I = _field_on_screen(src, L=L)
    k = E0 / CHBAR * 1e7
    yR = k / 2 * w0 ** 2
    w_exp = w0 * math.sqrt(1 + (L / yR) ** 2)
    # fit the 1/e^2 radius from the central slice second moment:
    # for I ~ exp(-2 r^2/w^2), sigma = w/2
    Ix = I[I.shape[0] // 2]
    sigma = math.sqrt(float((Ix * xs ** 2).sum() / Ix.sum()))
    np.testing.assert_allclose(2 * sigma, w_exp, rtol=0.02)


def test_laguerre_vortex_has_dark_center():
    src = LaguerreGaussianBeam(center=(0, 0, 0), w0=0.01,
                               energies=(E0,), vortex=(1, 0))
    xs, I = _field_on_screen(src)
    mid = I.shape[0] // 2
    assert I[mid, mid] < 0.01 * I.max()


def test_hermite_mode_lobes():
    src = HermiteGaussianBeam(center=(0, 0, 0), w0=0.01,
                              energies=(E0,), TEM=(1, 0))
    xs, I = _field_on_screen(src)
    mid = I.shape[0] // 2
    Ix = I[mid]   # slice along x
    # TEM10: node at center, two lobes in x
    assert Ix[mid] < 0.05 * Ix.max()
    left = Ix[:mid]
    right = Ix[mid + 1:]
    assert left.max() > 0.5 * Ix.max() and right.max() > 0.5 * Ix.max()


def test_mesh_source():
    ms = MeshSource.create(minxprime=-1e-4, maxxprime=1e-4,
                           minzprime=-2e-4, maxzprime=2e-4, nx=5, nz=7,
                           energies=(E0,))
    beam = ms.shine(jax.random.PRNGKey(1))
    assert beam.nrays == 5 * 7 + 1
    a = np.asarray(beam.a)
    assert a[0] == 0.0  # central ray
    assert abs(a.min() + 1e-4) < 1e-12 and abs(a.max() - 1e-4) < 1e-12


def test_collimated_mesh_source():
    cs = CollimatedMeshSource.create(dx=2.0, dz=1.0, nx=9, nz=5,
                                     energies=(E0,))
    beam = cs.shine(jax.random.PRNGKey(2))
    x = np.asarray(beam.x)
    assert x.min() == -1.0 and x.max() == 1.0
    np.testing.assert_allclose(np.asarray(beam.b), 1.0)


def test_nesw_compass_rays():
    """NESWSource emits exactly the 4 compass rays (geoms.py:849-886)."""
    import jax
    from xrt_tpu.sources import NESWSource
    b = NESWSource(dxprime=2e-4, dzprime=1e-4).shine(jax.random.PRNGKey(0),
                                                     toGlobal=False)
    np.testing.assert_allclose(np.asarray(b.a),
                               [0.0, 2e-4, 0.0, -2e-4], atol=1e-15)
    np.testing.assert_allclose(np.asarray(b.c),
                               [1e-4, 0.0, -1e-4, 0.0], atol=1e-15)


def test_shrink_source_fits_mirror():
    """shrink_source trims the mesh divergence until the footprint fits
    the mirror (geoms.py:1041-1146)."""
    import jax
    from xrt_tpu.sources import shrink_source
    from xrt_tpu.oes import FlatMirror

    pitch = 5e-3
    P = 1000.0
    # mirror much smaller than the initial divergence window
    mirror = FlatMirror.create(center=(0, P, 0), pitch=pitch,
                               limPhysX=(-1.0, 1.0), limPhysY=(-40, 40))

    def trace(src):
        beam = src.shine(jax.random.PRNGKey(0))
        glo, loc = mirror.reflect(beam)
        return {'foot': loc}

    mesh = shrink_source(trace, 'foot', -5e-3, 5e-3, -1e-3, 1e-3, 21, 21)
    # footprint of the fitted mesh is fully good
    out = trace(mesh)['foot']
    state = np.asarray(out.state)[1:]   # skip the central ray
    assert (state == 1).all()
    # the window really shrank: x' limited by the mirror width (+-1 mm at
    # 1 m => +-1e-3), z' by the length (+-40 mm at grazing 5e-3 =>
    # +-2e-4 around the specular direction)
    assert mesh.maxxprime < 2e-3 and mesh.minxprime > -2e-3
    assert mesh.maxzprime < 1e-3


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
