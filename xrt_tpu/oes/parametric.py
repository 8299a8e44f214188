"""Parametric mirrors: exact elliptical, parabolic and hyperbolic figures
and capillary surfaces of revolution.

TPU-native re-implementation of xrt/backends/raycing/oes/parametric.py
(EllipticalMirrorParam:9, ParabolicalMirrorParam:252,
HyperbolicMirrorParam:477, SurfaceOfRevolution:717,
ParaboloidCapillaryMirror:733, EllipsoidCapillaryMirror:791,
HyperboloidCapillaryMirror:890).

Parameterization (same as the reference): *s* along the conic major axis,
(*phi*, *r*) polar coordinates in planes normal to it, polar axis up; the
OE center lies on the surface and the figure parameters are computed from
(p, q, pitch) at create time.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import struct

from .. import config
from ..transforms import rotate_x
from .base import OE

_FAR = 1e20


class _ConicParamMethods:
    isParametric = True

    def xyz_to_param(self, x, y, z):
        """(x, y, z) -> (s, phi, r) (cf. parametric.py:213-216)."""
        yNew, zNew = rotate_x(y - self.y0, z - self.z0, self.cosGamma,
                              self.sinGamma)
        return yNew, jnp.arctan2(x, zNew), jnp.sqrt(x ** 2 + zNew ** 2)

    def param_to_xyz(self, s, phi, r):
        x = r * jnp.sin(phi)
        y = s
        z = r * jnp.cos(phi)
        yNew, zNew = rotate_x(y, z, self.cosGamma, -self.sinGamma)
        return x, yNew + self.y0, zNew + self.z0


@struct.dataclass
class EllipticalMirrorParam(_ConicParamMethods, OE):
    """Ellipsoid of revolution (or elliptical cylinder) given by arms p, q
    and the grazing pitch (parametric.py:9-249)."""
    ellipseA: jnp.ndarray = None
    ellipseB: jnp.ndarray = None
    y0: jnp.ndarray = None
    z0: jnp.ndarray = None
    cosGamma: jnp.ndarray = None
    sinGamma: jnp.ndarray = None
    isCylindrical: bool = struct.field(pytree_node=False, default=False)
    isClosed: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, p=1000.0, q=1000.0, pitch=0.0, isCylindrical=False,
               isClosed=False, **kwargs):
        dt = config.dtype()
        absPitch = abs(pitch)
        gamma = math.atan2((p - q) * math.sin(absPitch),
                           (p + q) * math.cos(absPitch))
        return super(EllipticalMirrorParam, cls).create(
            pitch=pitch,
            createArgs=(('p', float(p)), ('q', float(q)),
                        ('isCylindrical', bool(isCylindrical)),
                        ('isClosed', bool(isClosed))),
            ellipseA=jnp.asarray((q + p) / 2.0, dt),
            ellipseB=jnp.asarray(math.sqrt(q * p) * math.sin(absPitch), dt),
            y0=jnp.asarray((q - p) / 2.0 * math.cos(absPitch), dt),
            z0=jnp.asarray((q + p) / 2.0 * math.sin(absPitch), dt),
            cosGamma=jnp.asarray(math.cos(gamma), dt),
            sinGamma=jnp.asarray(math.sin(gamma), dt),
            isCylindrical=isCylindrical, isClosed=isClosed, **kwargs)

    def local_r(self, s, phi):
        r = self.ellipseB * jnp.sqrt(jnp.abs(1 - s ** 2 /
                                             self.ellipseA ** 2))
        if self.isCylindrical:
            r = r / jnp.maximum(jnp.abs(jnp.cos(phi)), 1e-12)
        if self.isClosed:
            return r
        return jnp.where(jnp.abs(phi) > math.pi / 2, r, _FAR)

    def local_n(self, s, phi):
        A2s2 = self.ellipseA ** 2 - s ** 2
        A2s2 = jnp.where(A2s2 <= 0, 1e22, A2s2)
        nr = -self.ellipseB / self.ellipseA * s / jnp.sqrt(A2s2)
        norm = jnp.sqrt(nr ** 2 + 1)
        b = nr / norm
        if self.isCylindrical:
            a = jnp.zeros_like(phi)
            c = 1.0 / norm
        else:
            a = -jnp.sin(phi) / norm
            c = -jnp.cos(phi) / norm
        bNew, cNew = rotate_x(b, c, self.cosGamma, -self.sinGamma)
        return [a, bNew, cNew]


EllipticalMirror = EllipticalMirrorParam


@struct.dataclass
class ParabolicalMirrorParam(_ConicParamMethods, OE):
    """Paraboloid of revolution (or parabolic cylinder) with one focal arm:
    collimating (q focus at infinity, give p) or focusing (give q)
    (parametric.py:252-474)."""
    parabParam: jnp.ndarray = None
    y0: jnp.ndarray = None
    z0: jnp.ndarray = None
    cosGamma: jnp.ndarray = None
    sinGamma: jnp.ndarray = None
    isCylindrical: bool = struct.field(pytree_node=False, default=False)
    isClosed: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, p=None, q=None, pitch=0.0, isCylindrical=False,
               isClosed=False, **kwargs):
        dt = config.dtype()
        if (p is None) == (q is None):
            raise ValueError('give exactly one of p or q')
        absPitch = abs(pitch)
        if p is None:
            y0 = q * math.cos(absPitch)
            z0 = q * math.sin(absPitch)
            parabParam = -q * math.sin(absPitch) ** 2
            gamma = absPitch
        else:
            y0 = -p * math.cos(absPitch)
            z0 = p * math.sin(absPitch)
            parabParam = p * math.sin(absPitch) ** 2
            gamma = -absPitch
        ca = (('q', float(q)),) if p is None else (('p', float(p)),)
        return super(ParabolicalMirrorParam, cls).create(
            pitch=pitch,
            createArgs=ca + (('isCylindrical', bool(isCylindrical)),
                             ('isClosed', bool(isClosed))),
            parabParam=jnp.asarray(parabParam, dt),
            y0=jnp.asarray(y0, dt), z0=jnp.asarray(z0, dt),
            cosGamma=jnp.asarray(math.cos(gamma), dt),
            sinGamma=jnp.asarray(math.sin(gamma), dt),
            isCylindrical=isCylindrical, isClosed=isClosed, **kwargs)

    def local_r(self, s, phi):
        r2 = jnp.clip(self.parabParam * s + self.parabParam ** 2, 0.0, None)
        r = 2 * jnp.sqrt(r2)
        if self.isCylindrical:
            r = r / jnp.maximum(jnp.abs(jnp.cos(phi)), 1e-12)
        if self.isClosed:
            return r
        return jnp.where(jnp.abs(phi) > math.pi / 2, r, _FAR)

    def local_n(self, s, phi):
        denom = jnp.sqrt(jnp.maximum(self.parabParam * s +
                                     self.parabParam ** 2, 1e-30))
        nr = self.parabParam / denom
        norm = jnp.sqrt(nr ** 2 + 1)
        b = nr / norm
        if self.isCylindrical:
            a = jnp.zeros_like(phi)
            c = 1.0 / norm
        else:
            a = -jnp.sin(phi) / norm
            c = -jnp.cos(phi) / norm
        bNew, cNew = rotate_x(b, c, self.cosGamma, -self.sinGamma)
        return [a, bNew, cNew]


ParabolicMirror = ParabolicalMirrorParam


@struct.dataclass
class HyperbolicMirrorParam(_ConicParamMethods, OE):
    """Hyperboloid of revolution (or hyperbolic cylinder); reflective is the
    outer surface unless *useInnerSurface* (parametric.py:477-714)."""
    hyperbolaA: jnp.ndarray = None
    hyperbolaB: jnp.ndarray = None
    y0: jnp.ndarray = None
    z0: jnp.ndarray = None
    cosGamma: jnp.ndarray = None
    sinGamma: jnp.ndarray = None
    isCylindrical: bool = struct.field(pytree_node=False, default=False)
    isClosed: bool = struct.field(pytree_node=False, default=False)
    invertNormal: int = struct.field(pytree_node=False, default=-1)

    @classmethod
    def create(cls, p=1000.0, q=1000.0, pitch=0.0, isCylindrical=False,
               isClosed=False, useInnerSurface=False, **kwargs):
        dt = config.dtype()
        absPitch = abs(pitch)
        gamma = math.atan2((p + q) * math.sin(absPitch),
                           (p - q) * math.cos(absPitch))
        return super(HyperbolicMirrorParam, cls).create(
            pitch=pitch,
            createArgs=(('p', float(p)), ('q', float(q)),
                        ('isCylindrical', bool(isCylindrical)),
                        ('isClosed', bool(isClosed)),
                        ('useInnerSurface', bool(useInnerSurface))),
            hyperbolaA=jnp.asarray(abs(p - q) / 2.0, dt),
            hyperbolaB=jnp.asarray(math.sqrt(p * q) * math.sin(absPitch),
                                   dt),
            y0=jnp.asarray(-(p + q) / 2.0 * math.cos(absPitch), dt),
            z0=jnp.asarray((p - q) / 2.0 * math.sin(absPitch), dt),
            cosGamma=jnp.asarray(math.cos(gamma), dt),
            sinGamma=jnp.asarray(math.sin(gamma), dt),
            isCylindrical=isCylindrical, isClosed=isClosed,
            invertNormal=1 if useInnerSurface else -1, **kwargs)

    def local_r(self, s, phi):
        r = self.hyperbolaB * jnp.sqrt(jnp.abs(s ** 2 /
                                               self.hyperbolaA ** 2 - 1))
        if self.isCylindrical:
            r = r / jnp.maximum(jnp.abs(jnp.cos(phi)), 1e-12)
        if self.isClosed:
            return r
        return jnp.where(jnp.abs(phi) < math.pi / 2, r, _FAR)

    def local_n(self, s, phi):
        A2s2 = s ** 2 - self.hyperbolaA ** 2
        A2s2 = jnp.where(A2s2 <= 0, 1e22, A2s2)
        nr = -self.hyperbolaB / self.hyperbolaA * s / jnp.sqrt(A2s2)
        norm = jnp.sqrt(nr ** 2 + 1)
        b = nr / norm
        if self.isCylindrical:
            a = jnp.zeros_like(phi)
            c = 1.0 / norm
        else:
            a = jnp.sin(phi) / norm
            c = jnp.cos(phi) / norm
        bNew, cNew = rotate_x(b, c, self.cosGamma, -self.sinGamma)
        return [a, bNew, cNew]


HyperbolicMirror = HyperbolicMirrorParam


# ---------------------------------------------------------------------------
# capillary surfaces of revolution around the beam axis
# ---------------------------------------------------------------------------

class _RevolutionMethods:
    """Cylindrical parameterization around the beam axis: s = y (along the
    beamline), (phi, r) polar in normal planes
    (cf. SurfaceOfRevolution, parametric.py:717-731)."""
    isParametric = True

    def xyz_to_param(self, x, y, z):
        return y, jnp.arctan2(x, z), jnp.sqrt(x ** 2 + z ** 2)

    def param_to_xyz(self, s, phi, r):
        return r * jnp.sin(phi), s, r * jnp.cos(phi)


#: Public name matching the reference's base class for capillary optics
#: (parametric.py:717).  Subclass together with :class:`~xrt_tpu.oes.OE`
#: and define ``local_r(s, phi)`` / ``local_n(s, phi)``.
SurfaceOfRevolution = _RevolutionMethods


@struct.dataclass
class EllipsoidCapillaryMirror(_RevolutionMethods, OE):
    """Ellipsoid-of-revolution capillary ("mirror lens"); the center is on
    the major axis in the middle of the capillary
    (cf. parametric.py:791-887).  *workingDistance* is from the end face to
    the focus; set reasonable limPhysY."""
    ellipseA: jnp.ndarray = None
    ellipseB: jnp.ndarray = None
    workingDistance: jnp.ndarray = None
    ctd: jnp.ndarray = None

    @classmethod
    def create(cls, ellipseA=10000.0, ellipseB=2.5, workingDistance=17.0,
               limPhysY=(-50.0, 50.0), **kwargs):
        dt = config.dtype()
        c = math.sqrt(ellipseA ** 2 - ellipseB ** 2)
        ctd = c - workingDistance - 0.5 * abs(limPhysY[-1] - limPhysY[0])
        return super(EllipsoidCapillaryMirror, cls).create(
            ellipseA=jnp.asarray(ellipseA, dt),
            ellipseB=jnp.asarray(ellipseB, dt),
            workingDistance=jnp.asarray(workingDistance, dt),
            ctd=jnp.asarray(ctd, dt), limPhysY=limPhysY, **kwargs)

    def local_r(self, s, phi):
        return self.ellipseB * jnp.sqrt(jnp.abs(
            1 - (self.ctd + s) ** 2 / self.ellipseA ** 2))

    def local_n(self, s, phi):
        A2s2 = self.ellipseA ** 2 - (self.ctd + s) ** 2
        A2s2 = jnp.where(A2s2 <= 0, 1e22, A2s2)
        nr = -self.ellipseB / self.ellipseA * (self.ctd + s) / \
            jnp.sqrt(A2s2)
        norm = jnp.sqrt(nr ** 2 + 1.0)
        return [-jnp.sin(phi) / norm, nr / norm, -jnp.cos(phi) / norm]


@struct.dataclass
class ParaboloidCapillaryMirror(_RevolutionMethods, OE):
    """Paraboloid-of-revolution capillary, oriented for focusing by default
    (cf. parametric.py:733-788): *q* is the distance from the element
    center to the focus, *r0* the radius at the center."""
    q: jnp.ndarray = None
    r0: jnp.ndarray = None
    focus: jnp.ndarray = None
    s0: jnp.ndarray = None

    @classmethod
    def create(cls, q=500.0, r0=2.5, **kwargs):
        dt = config.dtype()
        focus = -0.5 * (q - math.sqrt(q ** 2 + r0 ** 2))
        s0 = focus + q
        return super(ParaboloidCapillaryMirror, cls).create(
            q=jnp.asarray(q, dt), r0=jnp.asarray(r0, dt),
            focus=jnp.asarray(focus, dt), s0=jnp.asarray(s0, dt), **kwargs)

    def local_r(self, s, phi):
        return 2 * jnp.sqrt(jnp.clip((self.s0 - s) * self.focus, 0.0,
                                     None))

    def local_n(self, s, phi):
        a = -jnp.sin(phi)
        b = -jnp.sqrt(self.focus / jnp.maximum(self.s0 - s, 1e-12))
        c = -jnp.cos(phi)
        norm = jnp.sqrt(a ** 2 + b ** 2 + c ** 2)
        return [a / norm, b / norm, c / norm]


@struct.dataclass
class HyperboloidCapillaryMirror(_RevolutionMethods, OE):
    """Hyperboloid-of-revolution capillary; the *outer* surface reflects
    (cf. parametric.py:890-991)."""
    hyperbolaA: jnp.ndarray = None
    hyperbolaB: jnp.ndarray = None
    workingDistance: jnp.ndarray = None
    ctd: jnp.ndarray = None
    invertNormal: int = struct.field(pytree_node=False, default=-1)

    @classmethod
    def create(cls, hyperbolaA=10000.0, hyperbolaB=2.5,
               workingDistance=17.0, limPhysY=(-50.0, 50.0), **kwargs):
        dt = config.dtype()
        c = math.sqrt(hyperbolaA ** 2 + hyperbolaB ** 2)
        ctd = c + workingDistance + 0.5 * abs(limPhysY[-1] - limPhysY[0])
        return super(HyperboloidCapillaryMirror, cls).create(
            hyperbolaA=jnp.asarray(hyperbolaA, dt),
            hyperbolaB=jnp.asarray(hyperbolaB, dt),
            workingDistance=jnp.asarray(workingDistance, dt),
            ctd=jnp.asarray(ctd, dt), limPhysY=limPhysY, **kwargs)

    def local_r(self, s, phi):
        ss = self.ctd + s
        return self.hyperbolaB * jnp.sqrt(jnp.abs(
            ss ** 2 / self.hyperbolaA ** 2 - 1))

    def local_n(self, s, phi):
        ss = self.ctd + s
        A2s2 = ss ** 2 - self.hyperbolaA ** 2
        A2s2 = jnp.where(A2s2 <= 0, 1e22, A2s2)
        nr = -self.hyperbolaB / self.hyperbolaA * ss / jnp.sqrt(A2s2)
        norm = jnp.sqrt(nr ** 2 + 1)
        return [jnp.sin(phi) / norm, nr / norm, jnp.cos(phi) / norm]
