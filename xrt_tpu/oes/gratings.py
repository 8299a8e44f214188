"""Gratings and Fresnel zone plates.

TPU-native re-implementation of xrt/backends/raycing/oes/gratings.py
(NormalFZP:10, GeneralFZPin0YZ:140, BlazedGrating:316, LaminarGrating:538,
VLSLaminarGrating:655) plus the generic constant/variable line-density
grating OE (diffraction via the Spencer-Murty deflection in the base class,
reflect.py:451).

The FZP zone inversion r(n) is solved analytically instead of the
reference's interp1d tables — exact and jit-friendly.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from .. import config
from ..physconsts import CH
from .base import OE


@struct.dataclass
class Grating(OE):
    """A plane diffraction grating with (optionally polynomial-varied) line
    density *rho* lines/mm along y.  Use with a material of kind 'grating'
    (or EmptyMaterial) and set *order*."""
    rho: jnp.ndarray = None
    # variable line density polynomial: rho(y) = rho*(1 + 2 b2 y + 3 b3 y^2
    # + 4 b4 y^3), cf. VLS grating conventions
    vlsCoeffs: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, rho=300.0, vlsCoeffs=None, **kwargs):
        dt = config.dtype()
        kwargs.setdefault('order', 1)
        return super(Grating, cls).create(
            rho=jnp.asarray(rho, dt),
            vlsCoeffs=None if vlsCoeffs is None
            else jnp.asarray(vlsCoeffs, dt), **kwargs)

    auto_material_kind = 'grating'

    def local_g(self, x, y):
        rho = self.rho
        if self.vlsCoeffs is not None:
            poly = jnp.ones_like(y)
            for i in range(self.vlsCoeffs.shape[0]):
                poly = poly + (i + 2) * self.vlsCoeffs[i] * y ** (i + 1)
            rho = rho * poly
        return [jnp.zeros_like(x), -rho * jnp.ones_like(y),
                jnp.zeros_like(x)]


@struct.dataclass
class NormalFZP(OE):
    """Circular Fresnel zone plate with zero-thickness binary zones
    (gratings.py:10-137): r_n = sqrt(n f lambda + (n lambda / 2)^2);
    rays in opaque zones are absorbed, transparent zones get the local
    radial grating vector."""
    f: jnp.ndarray = None
    E0: float = struct.field(pytree_node=False, default=1000.0)
    N: int = struct.field(pytree_node=False, default=1000)
    isCentralZoneBlack: bool = struct.field(pytree_node=False, default=True)

    auto_material_kind = 'FZP'

    @classmethod
    def create(cls, f=50.0, E=1000.0, N=1000, thinnestZone=None,
               isCentralZoneBlack=True, order=1, **kwargs):
        dt = config.dtype()
        lambdaE = CH / E * 1e-7
        if thinnestZone is not None:
            N = int(lambdaE * f / 4.0 / thinnestZone ** 2)
        rN = math.sqrt(N * f * lambdaE + 0.25 * (N * lambdaE) ** 2)
        kwargs.setdefault('limPhysX', (-rN, rN))
        kwargs.setdefault('limPhysY', (-rN, rN))
        kwargs.setdefault('shape', 'round')
        return super(NormalFZP, cls).create(
            f=jnp.asarray(f, dt), E0=float(E), N=int(N),
            isCentralZoneBlack=isCentralZoneBlack, order=order, **kwargs)

    @property
    def _lambdaE(self):
        return CH / self.E0 * 1e-7

    def _r_of_n(self, n):
        lam = self._lambdaE
        return jnp.sqrt(jnp.clip(n * self.f * lam + 0.25 * (n * lam) ** 2,
                                 0.0, None))

    def _n_of_r(self, r):
        """Inverse of r_n: n = 2 (sqrt(f^2 + r^2) - f)/lambda (exact)."""
        lam = self._lambdaE
        return 2.0 * (jnp.sqrt(self.f ** 2 + r ** 2) - self.f) / lam

    def rays_good(self, x, y, state, lostNum=config.STATE_DEAD,
                  limits=None):
        locState = OE.rays_good(self, x, y, state, lostNum, limits)
        r = jnp.sqrt(x ** 2 + y ** 2)
        i = jnp.floor(self._n_of_r(r)).astype(jnp.int32)
        rmax = self._r_of_n(jnp.asarray(float(self.N)))
        transparent = (i % 2 == int(self.isCentralZoneBlack)) & (r < rmax)
        return jnp.where((locState == 1) & ~transparent, lostNum, locState)

    def local_g(self, x, y):
        r = jnp.sqrt(x ** 2 + y ** 2)
        i = jnp.floor(self._n_of_r(r))
        rho = 1.0 / jnp.maximum(self._r_of_n(i + 1) - self._r_of_n(i - 1),
                                1e-12)
        rsafe = jnp.maximum(r, 1e-12)
        return [-x / rsafe * rho, -y / rsafe * rho, jnp.zeros_like(x)]


@struct.dataclass
class GeneralFZPin0YZ(OE):
    """Elliptical FZP for two arbitrary focal points *f1* (real) and *f2*
    (real or virtual) given in the local frame; zones from the path-length
    condition (gratings.py:140-313).  Here implemented through its local
    grating vector: g = grad(phase)/2pi with
    phase(x, y) = k (|r - f1| + sign |r - f2|)."""
    f1: jnp.ndarray = None    # (3,) local
    f2: jnp.ndarray = None    # (3,) local
    E0: float = struct.field(pytree_node=False, default=1000.0)
    f2Virtual: bool = struct.field(pytree_node=False, default=False)

    auto_material_kind = 'FZP'

    @classmethod
    def create(cls, f1=(0, 0, -50.0), f2=(0, 0, 50.0), E=1000.0,
               f2isVirtual=False, order=1, **kwargs):
        dt = config.dtype()
        return super(GeneralFZPin0YZ, cls).create(
            f1=jnp.asarray(f1, dt), f2=jnp.asarray(f2, dt), E0=float(E),
            f2Virtual=f2isVirtual, order=order, **kwargs)

    def local_g(self, x, y):
        lam = CH / self.E0 * 1e-7
        sign2 = -1.0 if self.f2Virtual else 1.0

        def grad_path(f):
            dx = x - f[0]
            dy = y - f[1]
            dz = -f[2]
            r = jnp.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
            return dx / r, dy / r
        g1x, g1y = grad_path(self.f1)
        g2x, g2y = grad_path(self.f2)
        gx = (g1x + sign2 * g2x) / lam
        gy = (g1y + sign2 * g2y) / lam
        return [-gx, -gy, jnp.zeros_like(x)]


@struct.dataclass
class BlazedGrating(OE):
    """Sawtooth-profile grating for wave propagation (gratings.py:316-535):
    the diffraction comes from the Kirchhoff integral over the real surface
    — use a 'mirror'-kind material.  Custom analytic intersection selects
    the first (illuminated) facet crossing."""
    blaze: jnp.ndarray = None
    antiblaze: jnp.ndarray = None
    rho: jnp.ndarray = None

    @classmethod
    def create(cls, blaze=None, antiblaze=math.pi * 0.4999, rho=300.0,
               **kwargs):
        dt = config.dtype()
        return super(BlazedGrating, cls).create(
            blaze=jnp.asarray(blaze, dt),
            antiblaze=jnp.asarray(antiblaze, dt),
            rho=jnp.asarray(rho, dt), **kwargs)

    @property
    def rho_1(self):
        return 1.0 / self.rho

    def _local_pre(self, y):
        rho_1 = self.rho_1
        y0 = jnp.floor(y / rho_1) * rho_1
        y1 = y0 + rho_1
        yL = y - y0
        tanB = jnp.tan(self.blaze)
        tanA = jnp.tan(self.antiblaze)
        yC = (y1 - y0) / (1 + tanA / tanB)
        return y0, y1, yC, yL, tanB, tanA

    def local_z(self, x, y):
        y0, y1, yC, yL, tanB, tanA = self._local_pre(y)
        return jnp.where(yL > yC, -(y1 - y) * tanB, -yL * tanA)

    def local_n(self, x, y):
        y0, y1, yC, yL, tanB, tanA = self._local_pre(y)
        sinB, cosB = jnp.sin(self.blaze), jnp.cos(self.blaze)
        sinA, cosA = jnp.sin(self.antiblaze), jnp.cos(self.antiblaze)
        return [jnp.zeros_like(x),
                jnp.where(yL > yC, -sinB, sinA),
                jnp.where(yL > yC, cosB, cosA)]

    def analytic_intersect(self, tMin, tMax, x, y, z, a, b, c):
        """First-facet intersection (cf. gratings.py find_intersection
        :489-518): project along the ray onto the blaze facet of the period
        that contains the ray's z=0 crossing."""
        b_c = b / jnp.where(c == 0, -1e-12, c)
        rho_1 = self.rho_1
        n = jnp.floor((y - b_c * z) / rho_1)
        y0 = rho_1 * n
        y1 = y0 + rho_1
        tanB = jnp.tan(self.blaze)
        tanA = jnp.tan(self.antiblaze)
        zabl = -tanA * (y - b_c * z - y0) / (1 + tanA * b_c)
        zbl = tanB * (y - b_c * z - y1) / (1 - tanB * b_c)
        z2 = zbl
        y2 = b_c * (z2 - z) + y
        t2 = (y2 - y) / jnp.where(b == 0, 1e-12, b)
        x2 = x + t2 * a
        lost = jnp.zeros_like(t2, dtype=bool)
        return t2, x2, y2, z2, lost

    def get_grating_area_fraction(self):
        """Illuminated fraction of the period (gratings.py:521-532)."""
        tanPitch = jnp.tan(jnp.abs(self.pitch))
        tanB = jnp.tan(self.blaze)
        y1 = self.rho_1 * tanB / (tanB + tanPitch)
        z1 = -y1 * tanPitch
        y2 = self.rho_1
        d = jnp.sqrt((y2 - y1) ** 2 + z1 ** 2)
        return d * self.rho


@struct.dataclass
class LaminarGrating(OE):
    """Rectangular-profile (laminar) grating for wave propagation
    (gratings.py:538-652)."""
    rho: jnp.ndarray = None
    aspect: jnp.ndarray = None
    depth: jnp.ndarray = None

    @classmethod
    def create(cls, rho=300.0, aspect=0.5, depth=1e-3, **kwargs):
        dt = config.dtype()
        return super(LaminarGrating, cls).create(
            rho=jnp.asarray(rho, dt), aspect=jnp.asarray(aspect, dt),
            depth=jnp.asarray(depth, dt), **kwargs)

    @property
    def rho_1(self):
        return 1.0 / self.rho

    def local_z(self, x, y):
        yL = jnp.mod(y, self.rho_1)
        top = yL < self.aspect * self.rho_1
        return jnp.where(top, 0.0, -self.depth)

    def local_n(self, x, y):
        return [jnp.zeros_like(x), jnp.zeros_like(y), jnp.ones_like(x)]

    def analytic_intersect(self, tMin, tMax, x, y, z, a, b, c):
        """Hit either the top of a ridge or the groove floor."""
        csafe = jnp.where(c == 0, -1e-12, c)
        # intersection with z=0 plane
        t_top = -z / csafe
        y_top = y + b * t_top
        on_top = jnp.mod(y_top, self.rho_1) < self.aspect * self.rho_1
        # intersection with z=-depth plane
        t_bot = (-self.depth - z) / csafe
        t2 = jnp.where(on_top, t_top, t_bot)
        x2 = x + a * t2
        y2 = y + b * t2
        z2 = z + c * t2
        lost = jnp.zeros_like(t2, dtype=bool)
        return t2, x2, y2, z2, lost


@struct.dataclass
class VLSLaminarGrating(LaminarGrating):
    """Laminar grating with polynomial variable line spacing
    (gratings.py:655-790): rho(y) = rho0 (1 + 2 b2 y + 3 b3 y^2)."""
    coeffs: jnp.ndarray = None

    @classmethod
    def create(cls, rho=300.0, coeffs=(1.0, 0.0, 0.0), **kwargs):
        return super(VLSLaminarGrating, cls).create(
            rho=rho, coeffs=jnp.asarray(coeffs, config.dtype()), **kwargs)

    def _groove_number(self, y):
        g = jnp.zeros_like(y)
        for i in range(self.coeffs.shape[0]):
            g = g + self.coeffs[i] * y ** (i + 1)
        return self.rho * g

    def local_z(self, x, y):
        frac = jnp.mod(self._groove_number(y), 1.0)
        return jnp.where(frac < self.aspect, 0.0, -self.depth)
