"""Bent-crystal analyzer optics: Johann/Johansson cylinders and toroids,
diced versions.

TPU-native re-implementation of xrt/backends/raycing/oes/bragg.py
(DicedOE:8, JohannCylinder:104, JohanssonCylinder:179, JohannToroid:200,
JohanssonToroid:266, GeneralBraggToroid:293, DicedJohannToroid:313,
DicedJohanssonToroid:330).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import struct

from .. import config
from ..transforms import rotate_x, rotate_y
from .base import OE


def _apply_alpha(self, b, c, a=None):
    """Rotate (b, c) into the Bragg-normal frame by the asymmetry angle."""
    if self.alpha is None:
        return None
    cosa = jnp.cos(self.alpha)
    sina = jnp.sin(self.alpha)
    return rotate_x(b, c, cosa, -sina)


@struct.dataclass
class JohannCylinder(OE):
    """Simply bent reflective crystal (bragg.py:104-176): cylindrical
    (crossSection='circular') or parabolic meridional bending of radius
    Rm."""
    Rm: jnp.ndarray = None
    crossSection: str = struct.field(pytree_node=False, default='circular')

    @classmethod
    def create(cls, Rm=1000.0, crossSection='circular', **kwargs):
        if not (crossSection.startswith('circ') or
                crossSection.startswith('parab')):
            raise ValueError('unknown crossSection!')
        return super(JohannCylinder, cls).create(
            Rm=jnp.asarray(Rm, config.dtype()), crossSection=crossSection,
            **kwargs)

    def local_z(self, x, y):
        if self.crossSection.startswith('circ'):
            return self.Rm - jnp.sqrt(jnp.clip(self.Rm ** 2 - y ** 2,
                                               1e-30, None))
        return y ** 2 / 2.0 / self.Rm

    def local_n_cylinder(self, x, y, R, withAlpha):
        a = jnp.zeros_like(x)
        b = -y / R
        if self.crossSection.startswith('circ'):
            c = jnp.sqrt(jnp.clip(R ** 2 - y ** 2, 1e-30, None)) / R
        else:
            norm = jnp.sqrt(b ** 2 + 1)
            b = b / norm
            c = 1.0 / norm
        if withAlpha and self.alpha is not None:
            bA, cA = rotate_x(b, c, jnp.cos(self.alpha),
                              -jnp.sin(self.alpha))
            return [a, bA, cA, a, b, c]
        return [a, b, c]

    def local_n(self, x, y):
        return self.local_n_cylinder(x, y, self.Rm, True)


@struct.dataclass
class JohanssonCylinder(JohannCylinder):
    """Ground-bent (Johansson) crystal (bragg.py:179-197): the Bragg planes
    follow the Rowland circle (radius 2Rm effectively) while the surface is
    bent to Rm."""

    def local_n(self, x, y):
        nSurf = self.local_n_cylinder(x, y, self.Rm, False)
        a = jnp.zeros_like(x)
        b = -y
        c = jnp.sqrt(jnp.clip(self.Rm ** 2 - y ** 2, 1e-30, None)) + self.Rm
        if self.alpha is not None:
            b, c = rotate_x(b, c, jnp.cos(self.alpha),
                            -jnp.sin(self.alpha))
        norm = jnp.sqrt(b ** 2 + c ** 2)
        return [a / norm, b / norm, c / norm,
                nSurf[-3], nSurf[-2], nSurf[-1]]


@struct.dataclass
class JohannToroid(OE):
    """2D-bent reflective crystal with meridional Rm and sagittal Rs
    (bragg.py:200-263)."""
    Rm: jnp.ndarray = None
    Rs: jnp.ndarray = None

    @classmethod
    def create(cls, Rm=1000.0, Rs=None, **kwargs):
        dt = config.dtype()
        if Rs is None:
            Rs = Rm
        return super(JohannToroid, cls).create(
            Rm=jnp.asarray(Rm, dt), Rs=jnp.asarray(Rs, dt), **kwargs)

    def local_z(self, x, y):
        z = self.Rm - self.Rs - jnp.sqrt(jnp.clip(self.Rm ** 2 - y ** 2,
                                                  1e-30, None))
        absz = jnp.abs(z)
        cosangle = jnp.sqrt(jnp.clip(z ** 2 - x ** 2, 1e-30, None)) / absz
        sinangle = -x / absz
        _, z2 = rotate_y(jnp.zeros_like(z), z, cosangle, sinangle)
        return z2 + self.Rs

    def local_n_toroid(self, x, y, Rm, Rs, withAlpha):
        a = jnp.zeros_like(x)
        b = -y / Rm
        c = jnp.sqrt(jnp.clip(Rm ** 2 - y ** 2, 1e-30, None)) / Rm
        hasAlpha = withAlpha and self.alpha is not None
        if hasAlpha:
            aA = jnp.zeros_like(x)
            bA, cA = rotate_x(b, c, jnp.cos(self.alpha),
                              -jnp.sin(self.alpha))
        r = Rs - (Rm - jnp.sqrt(jnp.clip(Rm ** 2 - y ** 2, 1e-30, None)))
        cosangle = jnp.sqrt(jnp.clip(r ** 2 - x ** 2, 1e-30, None)) / r
        sinangle = -x / r
        a, c = rotate_y(a, c, cosangle, sinangle)
        if hasAlpha:
            aA, cA = rotate_y(aA, cA, cosangle, sinangle)
            return [aA, bA, cA, a, b, c]
        return [a, b, c]

    def local_n(self, x, y):
        return self.local_n_toroid(x, y, self.Rm, self.Rs, True)


@struct.dataclass
class JohanssonToroid(JohannToroid):
    """Ground-2D-bent (Johansson) toroid (bragg.py:266-290)."""

    def local_n(self, x, y):
        nSurf = self.local_n_toroid(x, y, self.Rm, self.Rs, False)
        a = jnp.zeros_like(x)
        b = -y
        c = jnp.sqrt(jnp.clip(self.Rm ** 2 - y ** 2, 1e-30, None)) + self.Rm
        norm = jnp.sqrt(b ** 2 + c ** 2)
        b, c = b / norm, c / norm
        if self.alpha is not None:
            b, c = rotate_x(b, c, jnp.cos(self.alpha),
                            -jnp.sin(self.alpha))
        r = self.Rs - (self.Rm - jnp.sqrt(jnp.clip(
            self.Rm ** 2 - y ** 2, 1e-30, None)))
        cosangle = jnp.sqrt(jnp.clip(r ** 2 - x ** 2, 1e-30, None)) / r
        sinangle = -x / r
        a, c = rotate_y(a, c, cosangle, sinangle)
        if self.alpha is not None:
            a, c = rotate_y(a, c, cosangle, sinangle)
        return [a, b, c, nSurf[-3], nSurf[-2], nSurf[-1]]


@struct.dataclass
class GeneralBraggToroid(JohannToroid):
    """Toroid with 4 independent radii: surface (Rm, Rs) and Bragg planes
    (RmBragg, RsBragg) (bragg.py:293-310)."""
    RmBragg: jnp.ndarray = None
    RsBragg: jnp.ndarray = None

    @classmethod
    def create(cls, Rm=1000.0, Rs=None, RmBragg=None, RsBragg=None,
               **kwargs):
        dt = config.dtype()
        if Rs is None:
            Rs = Rm
        if RmBragg is None:
            RmBragg = Rm
        if RsBragg is None:
            RsBragg = Rs
        return super(GeneralBraggToroid, cls).create(
            Rm=Rm, Rs=Rs, RmBragg=jnp.asarray(RmBragg, dt),
            RsBragg=jnp.asarray(RsBragg, dt), **kwargs)

    def local_n(self, x, y):
        nSurf = self.local_n_toroid(x, y, self.Rm, self.Rs, False)
        nBr = self.local_n_toroid(x, y, self.RmBragg, self.RsBragg, False)
        return [nBr[0], nBr[1], nBr[2], nSurf[-3], nSurf[-2], nSurf[-1]]


class _DicedMethods:
    """Facet decomposition of a diced OE (cf. DicedOE, bragg.py:8-101)."""

    def facet_center_z(self, x, y):
        return jnp.zeros_like(y)

    def facet_center_n(self, x, y):
        return [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x)]

    def facet_delta_z(self, u, v):
        return jnp.zeros_like(u)

    def facet_delta_n(self, u, v):
        return None

    def _facets(self, x, y):
        xStep = self.dxFacet + self.dxGap
        yStep = self.dyFacet + self.dyGap
        cx = jnp.round(x / xStep) * xStep
        cy = jnp.round(y / yStep) * yStep
        return cx, cy, x - cx, y - cy

    def local_z(self, x, y):
        cx, cy, fx, fy = self._facets(x, y)
        cz = self.facet_center_z(cx, cy)
        cn = self.facet_center_n(cx, cy)
        return cz + (self.facet_delta_z(fx, fy) - cn[-3] * fx -
                     cn[-2] * fy) / cn[-1]

    def local_n(self, x, y):
        cx, cy, fx, fy = self._facets(x, y)
        cn = list(self.facet_center_n(cx, cy))
        dn = self.facet_delta_n(fx, fy)
        if dn is not None:
            n1 = cn[-1] + dn[-1]
            n2 = cn[-2] + dn[-2]
            n3 = cn[-3]
            norm = jnp.sqrt(n1 ** 2 + n2 ** 2 + n3 ** 2)
            cn[-1], cn[-2], cn[-3] = n1 / norm, n2 / norm, n3 / norm
        if self.alpha is not None and len(cn) == 3:
            bA, cA = rotate_x(cn[1], cn[2], jnp.cos(self.alpha),
                              -jnp.sin(self.alpha))
            return [cn[0], bA, cA, cn[-3], cn[-2], cn[-1]]
        return cn

    def rays_good(self, x, y, state, lostNum=config.STATE_DEAD,
                  limits=None):
        locState = OE.rays_good(self, x, y, state, lostNum, limits)
        _, _, fx, fy = self._facets(x, y)
        inGaps = (jnp.abs(fx) > self.dxFacet / 2) | \
                 (jnp.abs(fy) > self.dyFacet / 2)
        return jnp.where((locState == 1) & inGaps, lostNum, locState)


@struct.dataclass
class DicedOE(_DicedMethods, OE):
    """Flat diced mirror of facets (dxFacet x dyFacet) separated by gaps."""
    dxFacet: jnp.ndarray = None
    dyFacet: jnp.ndarray = None
    dxGap: jnp.ndarray = None
    dyGap: jnp.ndarray = None

    @classmethod
    def create(cls, dxFacet=2.1, dyFacet=1.4, dxGap=0.05, dyGap=0.05,
               **kwargs):
        dt = config.dtype()
        return super(DicedOE, cls).create(
            dxFacet=jnp.asarray(dxFacet, dt),
            dyFacet=jnp.asarray(dyFacet, dt),
            dxGap=jnp.asarray(dxGap, dt), dyGap=jnp.asarray(dyGap, dt),
            **kwargs)


@struct.dataclass
class DicedJohannToroid(_DicedMethods, JohannToroid):
    """Diced Johann toroid (bragg.py:313-327)."""
    dxFacet: jnp.ndarray = None
    dyFacet: jnp.ndarray = None
    dxGap: jnp.ndarray = None
    dyGap: jnp.ndarray = None

    @classmethod
    def create(cls, dxFacet=2.1, dyFacet=1.4, dxGap=0.05, dyGap=0.05,
               **kwargs):
        dt = config.dtype()
        return super(DicedJohannToroid, cls).create(
            dxFacet=jnp.asarray(dxFacet, dt),
            dyFacet=jnp.asarray(dyFacet, dt),
            dxGap=jnp.asarray(dxGap, dt), dyGap=jnp.asarray(dyGap, dt),
            **kwargs)

    def facet_center_z(self, x, y):
        return JohannToroid.local_z(self, x, y)

    def facet_center_n(self, x, y):
        return JohannToroid.local_n(self, x, y)


@struct.dataclass
class DicedJohanssonToroid(DicedJohannToroid):
    """Diced Johansson toroid (bragg.py:330-345)."""

    def facet_center_n(self, x, y):
        return JohanssonToroid.local_n(self, x, y)

    def facet_delta_z(self, u, v):
        return v ** 2 / 2.0 / self.Rm

    def facet_delta_n(self, u, v):
        b = -v / self.Rm
        norm = jnp.sqrt(b ** 2 + 1)
        return [jnp.zeros_like(u), b / norm, 1.0 / norm]
