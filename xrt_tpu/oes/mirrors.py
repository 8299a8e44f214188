"""Stock mirrors: bent-flat (cylindrical), spherical, toroidal, conical.

TPU-native re-implementation of the reference stock mirrors
(xrt/backends/raycing/oes/__init__.py: BentFlatMirror:237, ToroidMirror:317,
ConicalMirror:586) and the Coddington helpers (oes/base.py:649-674).
Parametric elliptical/parabolic/hyperbolic mirrors live in
xrt_tpu.oes.parametric.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import struct

from .. import config
from .base import OE


def rmer_from_coddington(p, q, pitch):
    """Meridional radius 2pq/(p+q)/sin(pitch) (base.py:649-660)."""
    return 2 * p * q / (p + q) / jnp.sin(jnp.abs(pitch))


def rsag_from_coddington(p, q, pitch):
    """Sagittal radius 2pq/(p+q)*sin(pitch) (base.py:662-673)."""
    return 2 * p * q / (p + q) * jnp.sin(jnp.abs(pitch))


def _resolve_R(R, pitch):
    if isinstance(R, (tuple, list)):
        if len(R) == 3:
            return rmer_from_coddington(R[0], R[1], R[2])
        return rmer_from_coddington(R[0], R[1], pitch)
    if R in (0, None):
        return 1e100
    return R


def _resolve_r(r, pitch):
    if isinstance(r, (tuple, list)):
        if len(r) == 3:
            return rsag_from_coddington(r[0], r[1], r[2])
        return rsag_from_coddington(r[0], r[1], pitch)
    if r in (0, None):
        return 1e100
    return r


@struct.dataclass
class FlatMirror(OE):
    """A plane mirror (the plain reference OE with default surface)."""


@struct.dataclass
class BentFlatMirror(OE):
    """Meridionally bent parabolic cylinder with fixed ends
    (oes/__init__.py:237-301): z = (y^2 - limPhysY[0]^2)/(2R)."""
    R: jnp.ndarray = None

    @classmethod
    def create(cls, R=5.0e6, pitch=0.0, **kwargs):
        Rv = _resolve_R(R, pitch)
        return super(BentFlatMirror, cls).create(
            pitch=pitch, R=jnp.asarray(Rv, config.dtype()), **kwargs)

    def local_z(self, x, y):
        return (y ** 2 - self.limPhysY[0] ** 2) / 2.0 / self.R

    def local_n(self, x, y):
        b = -y / self.R
        norm = jnp.sqrt(b ** 2 + 1)
        return [jnp.zeros_like(x), b / norm, 1.0 / norm]


SimpleVCM = BentFlatMirror
VCM = BentFlatMirror


def MirrorOnTripodWithTwoXStages(oe_cls=FlatMirror, *, jack1, jack2, jack3,
                                 tx1, tx2, center, height=0.0,
                                 positionRoll=0.0, **kwargs):
    """Create *oe_cls* with its orientation read from a tripod + two-X-stage
    support (reference MirrorOnTripodWithTwoXStages, oes/__init__.py:209-235
    and VCM:306 / VFM:414 when given a bent class).

    The measured stage x's give (dx, yaw), the measured jack z's give
    (pitch, roll, center z).  OEs here are immutable pytrees, so instead of
    a mutable mixin the support is applied at creation time; keep the
    :mod:`xrt_tpu.stages` objects around for motor readouts
    (``set_jacks`` / ``set_x_stages``).
    """
    from ..stages import Tripod, TwoXStages
    st = TwoXStages(tx1=list(tx1), tx2=list(tx2))
    dx, yaw = st.get_orientation(positionRoll)
    # the tripod is defined in its horizontal state (all jack z equal);
    # the measured jack z's are then motor readbacks
    tp = Tripod([jack1[0], jack1[1], 0.0], [jack2[0], jack2[1], 0.0],
                [jack3[0], jack3[1], 0.0], center=list(center),
                height=height)
    tp.jack1[2], tp.jack2[2], tp.jack3[2] = jack1[2], jack2[2], jack3[2]
    pitch, roll, cz = tp.get_orientation(positionRoll)
    return oe_cls.create(center=(center[0] + dx, center[1], cz),
                         pitch=pitch, roll=roll, yaw=yaw,
                         positionRoll=positionRoll, **kwargs)


@struct.dataclass
class SphericalMirror(OE):
    """Spherical mirror of radius R: z = R - sqrt(R^2 - x^2 - y^2)."""
    R: jnp.ndarray = None

    @classmethod
    def create(cls, R=5.0e6, pitch=0.0, **kwargs):
        Rv = _resolve_R(R, pitch)
        return super(SphericalMirror, cls).create(
            pitch=pitch, R=jnp.asarray(Rv, config.dtype()), **kwargs)

    def local_z(self, x, y):
        rho2 = jnp.clip(self.R ** 2 - x ** 2 - y ** 2, 0.0, None)
        return self.R - jnp.sqrt(rho2)

    def local_n(self, x, y):
        rho2 = jnp.clip(self.R ** 2 - x ** 2 - y ** 2, 1e-30, None)
        s = jnp.sqrt(rho2)
        a = -x / s
        b = -y / s
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1)
        return [a / norm, b / norm, 1.0 / norm]


@struct.dataclass
class ToroidMirror(OE):
    """Toroidal mirror with meridional R and sagittal r
    (oes/__init__.py:317-411); becomes flat at the sagittal equator."""
    R: jnp.ndarray = None
    r: jnp.ndarray = None

    @classmethod
    def create(cls, R=5.0e6, r=50.0, pitch=0.0, **kwargs):
        dt = config.dtype()
        return super(ToroidMirror, cls).create(
            pitch=pitch, R=jnp.asarray(_resolve_R(R, pitch), dt),
            r=jnp.asarray(_resolve_r(r, pitch), dt), **kwargs)

    def local_z(self, x, y):
        rx = jnp.clip(1 - (x / self.r) ** 2, 0.0, None)
        return y ** 2 / 2.0 / self.R + self.r * (1 - jnp.sqrt(rx))

    def local_n(self, x, y):
        rx = 1 - (x / self.r) ** 2
        ax = jnp.where(rx <= 0, 0.0, 1.0 / jnp.sqrt(jnp.clip(rx, 1e-30,
                                                             None)))
        a = -x / self.r * ax
        b = -y / self.R
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1)
        return [a / norm, b / norm, 1.0 / norm]


SimpleVFM = ToroidMirror
VFM = ToroidMirror


@struct.dataclass
class DualVFM(OE):
    """Vertically focusing mirror with TWO sagittal cylinders side by side
    on a meridionally bent (parabolic, fixed-end) substrate
    (oes/__init__.py:477-585).  ``curSurface``/``select_surface`` picks the
    active stripe; *xCylinder1/2* are the cylinder axis x positions,
    *hCylinder1/2* the sag depths under the flat reference."""
    R: jnp.ndarray = None
    r1: jnp.ndarray = None
    r2: jnp.ndarray = None
    xCylinder1: jnp.ndarray = None
    hCylinder1: jnp.ndarray = None
    xCylinder2: jnp.ndarray = None
    hCylinder2: jnp.ndarray = None

    @classmethod
    def create(cls, R=5.0e6, r1=70.0, xCylinder1=23.5, hCylinder1=3.7035,
               r2=35.98, xCylinder2=-25.0, hCylinder2=6.9504, **kwargs):
        dt = config.dtype()
        return super(DualVFM, cls).create(
            R=jnp.asarray(R, dt), r1=jnp.asarray(r1, dt),
            r2=jnp.asarray(r2, dt),
            xCylinder1=jnp.asarray(xCylinder1, dt),
            hCylinder1=jnp.asarray(hCylinder1, dt),
            xCylinder2=jnp.asarray(xCylinder2, dt),
            hCylinder2=jnp.asarray(hCylinder2, dt), **kwargs)

    def _cyl(self, x):
        """(z_cyl, -dz/dx) of the two-cylinder cross profile, clipped to
        z<=0 like the reference."""
        t2 = self.r2 ** 2 - (x - self.xCylinder2) ** 2
        t1 = self.r1 ** 2 - (x - self.xCylinder1) ** 2
        s2 = jnp.sqrt(jnp.clip(t2, 1e-30, None))
        s1 = jnp.sqrt(jnp.clip(t1, 1e-30, None))
        z2 = jnp.where(t2 > 0, self.r2 - self.hCylinder2 - s2, 0.0)
        z1 = jnp.where(t1 > 0, self.r1 - self.hCylinder1 - s1, 0.0)
        a2 = jnp.where(t2 > 0, -(x - self.xCylinder2) / s2, 0.0)
        a1 = jnp.where(t1 > 0, -(x - self.xCylinder1) / s1, 0.0)
        neg = x < 0
        z = jnp.where(neg, z2, z1)
        a = jnp.where(neg, a2, a1)
        a = jnp.where(z > 0, 0.0, a)
        z = jnp.minimum(z, 0.0)
        return z, a

    def local_z(self, x, y):
        z, _ = self._cyl(x)
        return z + (y ** 2 - self.limPhysY[0] ** 2) / 2.0 / self.R

    def local_n(self, x, y):
        _, a = self._cyl(x)
        b = -y / self.R
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1.0)
        return [a / norm, b / norm, 1.0 / norm]

    def select_surface(self, surfaceName_or_index):
        """dx offset that centers the chosen cylinder in the beam
        (oes/__init__.py:573-585); returns (new OE with curSurface set,
        dx)."""
        idx = surfaceName_or_index
        if not isinstance(idx, int):
            idx = 0 if str(idx).endswith('1') else 1
        dx = float(-self.xCylinder1 if idx == 0 else -self.xCylinder2)
        return self.replace(curSurface=idx), dx


@struct.dataclass
class CylindricalMirror(OE):
    """Sagittal cylinder of radius r (round pipe along y):
    z = r - sqrt(r^2 - x^2)."""
    r: jnp.ndarray = None

    @classmethod
    def create(cls, r=50.0, pitch=0.0, **kwargs):
        return super(CylindricalMirror, cls).create(
            pitch=pitch, r=jnp.asarray(_resolve_r(r, pitch),
                                       config.dtype()), **kwargs)

    def local_z(self, x, y):
        rx = jnp.clip(1 - (x / self.r) ** 2, 0.0, None)
        return self.r * (1 - jnp.sqrt(rx))

    def local_n(self, x, y):
        rx = 1 - (x / self.r) ** 2
        ax = jnp.where(rx <= 0, 0.0, 1.0 / jnp.sqrt(jnp.clip(rx, 1e-30,
                                                             None)))
        a = -x / self.r * ax
        norm = jnp.sqrt(a ** 2 + 1)
        return [a / norm, jnp.zeros_like(y), 1.0 / norm]


@struct.dataclass
class ConicalMirror(OE):
    """Conical mirror with its base parallel to the cone side
    (oes/__init__.py:586-633).  *L0* is the distance from the mirror center
    to the cone vertex along the surface, *theta* the opening angle."""
    L0: jnp.ndarray = None
    theta_c: jnp.ndarray = None

    @classmethod
    def create(cls, L0=1000.0, theta=math.pi / 6, **kwargs):
        dt = config.dtype()
        return super(ConicalMirror, cls).create(
            L0=jnp.asarray(L0, dt), theta_c=jnp.asarray(theta, dt), **kwargs)

    @property
    def _tt(self):
        return jnp.tan(self.theta_c)

    @property
    def _t2t(self):
        return jnp.tan(2 * self.theta_c)

    @property
    def _redfocus(self):
        return jnp.cos(self.theta_c) ** 2 / (1.0 / self._tt -
                                             1.0 / self._t2t)

    def local_z(self, x, y):
        t2t = self._t2t
        sqroot = jnp.sqrt(jnp.clip(
            0.25 * t2t ** 2 * (y - self.L0) ** 2 -
            self._redfocus * t2t * x ** 2, 0.0, None))
        return -0.5 * t2t * (y - self.L0) - jnp.sign(t2t) * sqroot

    def local_n(self, x, y):
        t2t = self._t2t
        sqroot = jnp.sign(t2t) * jnp.sqrt(jnp.clip(
            0.25 * t2t ** 2 * (y - self.L0) ** 2 -
            self._redfocus * x * x * t2t, 1e-30, None))
        a = -x * self._redfocus * t2t / sqroot
        b = 0.5 * t2t + 0.25 * t2t ** 2 * (y - self.L0) / sqroot
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1)
        return [a / norm, b / norm, 1.0 / norm]
