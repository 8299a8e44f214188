"""Figure errors (surface distortions) for optical elements.

TPU-native re-implementation of xrt/backends/raycing/figure_error.py
(FigureErrorBase:30 with local_z_distorted:199 / local_n_distorted:222,
FigureErrorImported:256, RandomRoughness:448, GaussianBump, Waviness,
PlanarRidge) composable via *baseFE*.

Profiles are generated once on the host (numpy, including the FFT-based
PSD shaping of RandomRoughness) and stored as regular-grid height and slope
maps; on-device evaluation interpolates them with
jax.scipy.ndimage.map_coordinates.  Heights are stored in nm (like the
reference) and returned in mm.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates
from flax import struct

from . import config

MAX_FE_HALF_SIZE = 500.0


@struct.dataclass
class FigureError:
    """A sampled height-error map z(x, y) with precomputed slope maps.

    Construct via the factory functions below (imported_figure_error,
    random_roughness, gaussian_bump, waviness, planar_ridge) or
    :meth:`from_map`."""
    zmap: jnp.ndarray        # (ny, nx), nm
    dzdx: jnp.ndarray        # (ny, nx), nm/mm
    dzdy: jnp.ndarray
    x0: jnp.ndarray          # grid origin, mm
    y0: jnp.ndarray
    dx: jnp.ndarray          # grid steps, mm
    dy: jnp.ndarray
    xShift: jnp.ndarray = None
    yShift: jnp.ndarray = None
    name: str = struct.field(pytree_node=False, default='')

    @classmethod
    def from_map(cls, z_nm, x1d, y1d, name='', xShift=0.0, yShift=0.0):
        """Build from a host height map *z_nm* (ny, nx) on regular grids
        *x1d*, *y1d* (mm)."""
        dt = config.dtype()
        z_nm = np.asarray(z_nm, float)
        x1d = np.asarray(x1d, float)
        y1d = np.asarray(y1d, float)
        dzdy, dzdx = np.gradient(z_nm, y1d, x1d)
        return cls(zmap=jnp.asarray(z_nm, dt),
                   dzdx=jnp.asarray(dzdx, dt), dzdy=jnp.asarray(dzdy, dt),
                   x0=jnp.asarray(x1d[0], dt), y0=jnp.asarray(y1d[0], dt),
                   dx=jnp.asarray(x1d[1] - x1d[0], dt),
                   dy=jnp.asarray(y1d[1] - y1d[0], dt),
                   xShift=jnp.asarray(xShift, dt),
                   yShift=jnp.asarray(yShift, dt), name=name)

    def _coords(self, x, y):
        cx = (x + self.xShift - self.x0) / self.dx
        cy = (y + self.yShift - self.y0) / self.dy
        return jnp.stack([cy, cx])

    def local_z_distorted(self, x, y):
        """Height error in mm (map in nm -> 1e-6 factor,
        cf. figure_error.py:199-220)."""
        z = map_coordinates(self.zmap, self._coords(x, y), order=1,
                            mode='nearest')
        return z * 1e-6

    def local_n_distorted(self, x, y):
        """(d_pitch, d_roll) normal rotations from the slope maps
        (cf. figure_error.py:222-250)."""
        c = self._coords(x, y)
        a = map_coordinates(self.dzdx, c, order=1, mode='nearest') * 1e-6
        b = map_coordinates(self.dzdy, c, order=1, mode='nearest') * 1e-6
        return [jnp.arctan(b), -jnp.arctan(a)]

    def local_r_distorted(self, s, phi):
        """For parametric OEs the distortion is applied in (s, phi)."""
        return self.local_z_distorted(s, phi)

    # diagnostics (cf. figure_error.py:142-185)
    def get_rms(self):
        """RMS height in nm."""
        return jnp.sqrt(jnp.mean(self.zmap ** 2))

    def get_rms_slope(self):
        """(pitch, roll) RMS slopes in urad."""
        return (jnp.sqrt(jnp.mean(self.dzdy ** 2)) * 1e-3,
                jnp.sqrt(jnp.mean(self.dzdx ** 2)) * 1e-3)


def _grids(limPhysX, limPhysY, gridStep):
    def axis(lim):
        n = 1 << int(math.ceil(math.log2(
            max((lim[1] - lim[0]) / gridStep, 2))))
        return np.linspace(lim[0], lim[1], n)
    return axis(limPhysX), axis(limPhysY)


def _add_base(z, x1d, y1d, baseFE):
    if baseFE is None:
        return z
    X, Y = np.meshgrid(x1d, y1d)
    zb = np.asarray(baseFE.local_z_distorted(jnp.asarray(X.ravel()),
                                             jnp.asarray(Y.ravel())))
    return z + zb.reshape(z.shape) * 1e6


def imported_figure_error(fileName=None, array=None, x1d=None, y1d=None,
                          columnFactors=(1.0, 1.0, 1e6), recenter=False,
                          baseFE=None, name='imported'):
    """Height map from a 3-column text file (x, y, z) or explicit arrays
    (cf. FigureErrorImported, figure_error.py:256-446).  *columnFactors*
    converts the file units to (mm, mm, nm)."""
    if fileName is not None:
        data = np.loadtxt(fileName)
        xs = np.unique(data[:, 0]) * columnFactors[0]
        ys = np.unique(data[:, 1]) * columnFactors[1]
        z = data[:, 2].reshape(len(ys), len(xs)) * columnFactors[2]
    else:
        xs, ys, z = np.asarray(x1d), np.asarray(y1d), np.asarray(array)
    if recenter:
        z = z - z.mean()
        xs = xs - 0.5 * (xs[0] + xs[-1])
        ys = ys - 0.5 * (ys[0] + ys[-1])
    z = _add_base(z, xs, ys, baseFE)
    return FigureError.from_map(z, xs, ys, name=name)


def random_roughness(rms=1.0, rmsKind='height', corrLength=5.0, seed=0,
                     limPhysX=(-10, 10), limPhysY=(-50, 50), gridStep=0.5,
                     baseFE=None, name='random roughness'):
    """PSD-shaped random roughness (cf. RandomRoughness,
    figure_error.py:448-605): white noise filtered by a Gaussian in k-space
    with the given correlation length(s), normalized to the requested RMS
    height [nm] or slope [urad]."""
    x1d, y1d = _grids(limPhysX, limPhysY, gridStep)
    nx, ny = len(x1d), len(y1d)
    dx = x1d[1] - x1d[0]
    dy = y1d[1] - y1d[0]
    rng = np.random.default_rng(seed)
    z = rng.normal(0.0, 1.0, (ny, nx))
    if corrLength is not None:
        Z = np.fft.rfft2(z)
        kx = 2 * np.pi * np.fft.rfftfreq(nx, d=dx)
        ky = 2 * np.pi * np.fft.fftfreq(ny, d=dy)
        KX, KY = np.meshgrid(kx, ky)
        if isinstance(rms, (tuple, list)):
            corrY = corrLength
            corrX = corrLength * rms[0] / rms[1]
        else:
            corrX = corrY = corrLength
        filt = np.exp(-0.5 * (KX ** 2 * corrX ** 2 + KY ** 2 * corrY ** 2))
        z = np.fft.irfft2(Z * filt, s=(ny, nx))
    z -= z.mean()
    if rmsKind == 'height':
        z *= rms / max(np.sqrt((z ** 2).mean()), 1e-300)
    else:  # slope, urad
        gy, gx = np.gradient(z, y1d, x1d)
        rms0 = np.sqrt((gy ** 2).mean()) * 1e-3  # urad for z in nm
        target = rms[0] if isinstance(rms, (tuple, list)) else rms
        z *= target / max(rms0, 1e-300)
    z = _add_base(z, x1d, y1d, baseFE)
    return FigureError.from_map(z, x1d, y1d, name=name)


def gaussian_bump(height=1.0, sigmaX=1.0, sigmaY=5.0, centerX=0.0,
                  centerY=0.0, limPhysX=(-10, 10), limPhysY=(-50, 50),
                  gridStep=0.5, baseFE=None, name='gaussian bump'):
    """Gaussian bump of *height* nm (cf. GaussianBump,
    figure_error.py:607-690)."""
    x1d, y1d = _grids(limPhysX, limPhysY, gridStep)
    X, Y = np.meshgrid(x1d, y1d)
    z = height * np.exp(-0.5 * (((X - centerX) / sigmaX) ** 2 +
                                ((Y - centerY) / sigmaY) ** 2))
    z = _add_base(z, x1d, y1d, baseFE)
    return FigureError.from_map(z, x1d, y1d, name=name)


def waviness(amplitude=1.0, period=10.0, phase=0.0, direction='y',
             limPhysX=(-10, 10), limPhysY=(-50, 50), gridStep=0.5,
             baseFE=None, name='waviness'):
    """Sinusoidal waviness of *amplitude* nm and *period* mm
    (cf. Waviness, figure_error.py:692-756)."""
    x1d, y1d = _grids(limPhysX, limPhysY, gridStep)
    X, Y = np.meshgrid(x1d, y1d)
    C = Y if direction == 'y' else X
    z = amplitude * np.sin(2 * np.pi * C / period + phase)
    z = _add_base(z, x1d, y1d, baseFE)
    return FigureError.from_map(z, x1d, y1d, name=name)


def planar_ridge(height=1.0, width=5.0, centerY=0.0, direction='y',
                 limPhysX=(-10, 10), limPhysY=(-50, 50), gridStep=0.5,
                 baseFE=None, name='ridge'):
    """Planar ridge/step of *height* nm and *width* mm (cf. PlanarRidge,
    figure_error.py:758-831)."""
    x1d, y1d = _grids(limPhysX, limPhysY, gridStep)
    X, Y = np.meshgrid(x1d, y1d)
    C = Y if direction == 'y' else X
    z = np.where(np.abs(C - centerY) < width / 2, height, 0.0)
    z = _add_base(z, x1d, y1d, baseFE)
    return FigureError.from_map(z, x1d, y1d, name=name)
