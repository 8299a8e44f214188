"""Wave-propagation tests: the Kirchhoff integral vs the reference
implementation, and physics validation (slit diffraction fringes, flux
conservation)."""
import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xrt_tpu import config
from xrt_tpu.physconsts import CH, CHBAR
from xrt_tpu.waves import (kirchhoff_integral_xla, prepare_wave_on_screen,
                           prepare_wave_on_aperture, diffract,
                           estimate_footprint_area, Wave)
from xrt_tpu.screens import Screen
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.sources import GeometricSource
from xrt_tpu.beam import Beam

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')
E0 = 9000.0


def test_kirchhoff_integral_vs_reference():
    ref = np.load(os.path.join(GOLDEN, 'ref_kirchhoff.npz'))
    k = jnp.asarray(ref['src_E']) / CHBAR * 1e7
    n = [jnp.zeros(ref['src_x'].shape), jnp.ones(ref['src_x'].shape),
         jnp.zeros(ref['src_x'].shape)]
    nl = n[1]  # beam along y
    w = jnp.asarray(ref['good'].astype(float))
    Es, Ep, aE, bE, cE = kirchhoff_integral_xla(
        jnp.asarray(ref['dst_x']), jnp.asarray(ref['dst_y']),
        jnp.asarray(ref['dst_z']),
        jnp.asarray(ref['src_x']), jnp.asarray(ref['src_y']),
        jnp.asarray(ref['src_z']),
        jnp.asarray(ref['src_Es']), jnp.asarray(ref['src_Ep']), k, n, nl, w)
    np.testing.assert_allclose(Es, ref['Es'], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(Ep, ref['Ep'], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(aE, ref['aE'], rtol=1e-8, atol=1e-3)
    np.testing.assert_allclose(bE, ref['bE'], rtol=1e-8, atol=1e-3)
    np.testing.assert_allclose(cE, ref['cE'], rtol=1e-8, atol=1e-3)


def _slit_wave_source(nrays, key, half_z=0.5e-3, half_x=0.01):
    """A coherent plane-wave field on a slit: samples uniform in the
    opening, Es=1, state good.  The x extent is kept small so that both
    directions are in the far field for the sample counts used here."""
    dt = config.dtype()
    cdt = config.cdtype()
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(k1, (nrays,), dt, -half_x, half_x)
    z = jax.random.uniform(k2, (nrays,), dt, -half_z, half_z)
    zero = jnp.zeros((nrays,), dt)
    return Beam(
        x=x, y=zero, z=z, a=zero, b=jnp.ones((nrays,), dt), c=zero,
        E=jnp.full((nrays,), E0, dt),
        state=jnp.ones((nrays,), jnp.int32), path=zero,
        Jss=jnp.ones((nrays,), dt), Jpp=zero,
        Jsp=jnp.zeros((nrays,), cdt),
        Es=jnp.ones((nrays,), cdt), Ep=jnp.zeros((nrays,), cdt),
        area=jnp.asarray(2 * half_x * 2 * half_z, dt))


def test_single_slit_fraunhofer():
    """Far-field diffraction of a slit: minima at z = m * lambda L / d."""
    d = 2 * 0.5e-3      # slit height, mm
    L = 10000.0         # distance
    lam = CH / E0 * 1e-7  # mm
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.01, 0.01, -d / 2, d / 2))
    screen = Screen.create(center=(0, L, 0))
    zmax = 3 * lam * L / d
    wave = prepare_wave_on_screen(screen, slit, np.asarray([0.0]),
                                  np.linspace(-zmax, zmax, 301))
    src = _slit_wave_source(4000, key=0, half_z=d / 2)
    out = diffract(src, wave)
    I = np.asarray(out.Jss + out.Jpp)
    z = np.asarray(out.z)
    # theoretical sinc^2 envelope
    beta = math.pi * d * z / (lam * L)
    sinc2 = (np.sinc(beta / math.pi)) ** 2
    Irel = I / I.max()
    # MC sampling noise ~ 1/sqrt(N); compare within 5%
    assert np.abs(Irel - sinc2).max() < 0.05
    # central intensity from the Fresnel-Kirchhoff formula:
    # I0 = (d*w / (lambda*L))^2 * ... ; check via flux conservation instead
    fn, spz = __import__('xrt_tpu.waves', fromlist=['qualify_sampling']) \
        .qualify_sampling(out, E0, 4000)
    assert np.isfinite(float(fn))


def test_double_slit_fringes():
    """Two-slit interference: fringe period lambda*L/separation."""
    lam = CH / E0 * 1e-7
    L = 10000.0
    sep = 0.2       # slit separation, mm
    hw = 0.02       # slit half-height
    dt = config.dtype()
    cdt = config.cdtype()
    n2 = 2000
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    z1 = jax.random.uniform(k1, (n2,), dt, sep / 2 - hw, sep / 2 + hw)
    z2 = jax.random.uniform(k2, (n2,), dt, -sep / 2 - hw, -sep / 2 + hw)
    z = jnp.concatenate([z1, z2])
    x = jax.random.uniform(jax.random.PRNGKey(6), (2 * n2,), dt, -0.01,
                           0.01)
    zero = jnp.zeros((2 * n2,), dt)
    src = Beam(
        x=x, y=zero, z=z, a=zero, b=jnp.ones((2 * n2,), dt), c=zero,
        E=jnp.full((2 * n2,), E0, dt),
        state=jnp.ones((2 * n2,), jnp.int32), path=zero,
        Jss=jnp.ones((2 * n2,), dt), Jpp=zero,
        Jsp=jnp.zeros((2 * n2,), cdt),
        Es=jnp.ones((2 * n2,), cdt), Ep=jnp.zeros((2 * n2,), cdt),
        area=jnp.asarray(0.02 * 4 * hw, dt))
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.01, 0.01, -0.3, 0.3))
    screen = Screen.create(center=(0, L, 0))
    period = lam * L / sep
    zs = np.linspace(-2 * period, 2 * period, 401)
    wave = prepare_wave_on_screen(screen, slit, np.asarray([0.0]), zs)
    out = diffract(src, wave)
    I = np.asarray(out.Jss + out.Jpp)
    # expected cos^2 fringes
    expected = np.cos(math.pi * zs / period) ** 2
    Irel = I / I.max()
    # normalize out the slow envelope by comparing peak positions
    peaks = zs[np.r_[False, (I[1:-1] > I[:-2]) & (I[1:-1] > I[2:]), False]]
    dpk = np.diff(peaks)
    np.testing.assert_allclose(dpk.mean(), period, rtol=0.03)


def test_flux_conservation_free_space():
    """In the xrt convention the sum of wave J values is the flux
    (histogram weights); capturing (almost) the whole diffracted cone must
    conserve sum(J) ~ sum of incoming ray J
    (cf. the normalization chain waves.py:739-749)."""
    lam = CH / E0 * 1e-7
    dz = 2 * 0.01
    dx = 2 * 0.01
    L = 5000.0
    src = _slit_wave_source(3000, key=1, half_z=dz / 2, half_x=dx / 2)
    slit = RectangularAperture.create(
        center=(0, 0, 0), opening=(-dx / 2, dx / 2, -dz / 2, dz / 2))
    screen = Screen.create(center=(0, L, 0))
    # capture many diffraction orders in both directions
    zmax = 8 * lam * L / dz
    xmax = 8 * lam * L / dx
    wave = prepare_wave_on_screen(
        screen, slit, np.linspace(-xmax, xmax, 161),
        np.linspace(-zmax, zmax, 161))
    out = diffract(src, wave)
    flux_out = float(jnp.sum(out.Jss + out.Jpp))
    flux_in = float(jnp.sum(src.Jss + src.Jpp))
    assert abs(flux_out - flux_in) / flux_in < 0.15


def test_diffract_through_aperture_wave():
    """Chained wave propagation slit -> slit -> screen runs and keeps a
    finite, positive field."""
    d = 0.1
    src = _slit_wave_source(2000, key=2, half_z=d / 2)
    slit1 = RectangularAperture.create(center=(0, 0, 0),
                                       opening=(-0.5, 0.5, -d / 2, d / 2))
    slit2 = RectangularAperture.create(center=(0, 3000.0, 0),
                                       opening=(-0.5, 0.5, -0.05, 0.05))
    screen = Screen.create(center=(0, 8000.0, 0))
    wave2 = prepare_wave_on_aperture(slit2, slit1, 1500,
                                     key=jax.random.PRNGKey(3))
    wave2 = diffract(src, wave2)
    assert np.isfinite(np.asarray(wave2.Es)).all()
    waveS = prepare_wave_on_screen(screen, slit2, np.asarray([0.0]),
                                   np.linspace(-0.5, 0.5, 101))
    local2 = wave2.replace(state=jnp.ones_like(wave2.state))
    out = diffract(local2, waveS)
    I = np.asarray(out.Jss + out.Jpp)
    assert np.isfinite(I).all()
    assert I.max() > 0


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
