"""Apertures and beam stops.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/apertures.py: RectangularAperture:75 (propagate:334),
RoundAperture:668, beam stops :543/:916/:1312/:1450, DoubleSlit:931,
PolygonalAperture:1035, GridAperture:1324, SiemensStar:1462.

Design: every aperture advances rays to its plane, applies the propagation
phase to amplitudes, and marks blocked rays dead via the ``state`` mask
(never filtering — static shapes).  Subclasses define ``inside(x, z)``;
``isBeamStop`` inverts it.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import config
from .beam import Beam
from .physconsts import CHBAR, PI2


@struct.dataclass
class _ApertureBase:
    center: jnp.ndarray = None
    ex: jnp.ndarray = None
    ez: jnp.ndarray = None
    name: str = struct.field(pytree_node=False, default='')
    isBeamStop: bool = struct.field(pytree_node=False, default=False)
    # smooth-edge width (mm): when set, the blade edges attenuate the flux
    # with a sigmoid of this width instead of a hard kill — gives useful
    # gradients of pixel flux w.r.t. aperture/beam parameters
    # (SURVEY.md section 7, differentiability layer)
    softEdge: jnp.ndarray = None

    @property
    def ey(self):
        return jnp.cross(self.ez, self.ex)

    def inside(self, x, z):
        raise NotImplementedError

    def transmission(self, x, z):
        """Smooth transmission in [0, 1]; defaults to the hard indicator.
        Subclasses with analytic edge distances override for softEdge."""
        return self.inside(x, z).astype(x.dtype)

    def propagate(self, beam: Beam, needNewGlobal=False):
        """Advance rays to the aperture plane and kill the blocked ones
        (cf. apertures.py:334-413).  Returns the local beam, or
        (global, local) when *needNewGlobal*."""
        good = beam.state > 0
        ex, ey, ez = self.ex, self.ey, self.ez
        dx = beam.x - self.center[0]
        dy = beam.y - self.center[1]
        dz = beam.z - self.center[2]
        lx = dx * ex[0] + dy * ex[1] + dz * ex[2]
        ly = dx * ey[0] + dy * ey[1] + dz * ey[2]
        lz = dx * ez[0] + dy * ez[1] + dz * ez[2]
        la = beam.a * ex[0] + beam.b * ex[1] + beam.c * ex[2]
        lb = beam.a * ey[0] + beam.b * ey[1] + beam.c * ey[2]
        lc = beam.a * ez[0] + beam.b * ez[1] + beam.c * ez[2]
        safe_lb = jnp.where(lb == 0, 1.0, lb)
        path = jnp.where(good, -ly / safe_lb, 0.0)
        lx = lx + la * path
        lz = lz + lc * path
        ly = jnp.where(good, 0.0, ly)

        if self.softEdge is not None:
            # smooth edges: keep all rays alive, scale the flux by the
            # sigmoid transmission (differentiable aperture)
            T = self.transmission(lx, lz)
            if self.isBeamStop:
                T = 1.0 - T
            state = beam.state
            updates = dict(x=lx, y=ly, z=lz, a=la, b=lb, c=lc, state=state,
                           path=beam.path + path,
                           Jss=jnp.where(good, beam.Jss * T, beam.Jss),
                           Jpp=jnp.where(good, beam.Jpp * T, beam.Jpp),
                           Jsp=jnp.where(good, beam.Jsp * T, beam.Jsp))
            if beam.Es is not None:
                propPhase = jnp.exp(1e7j * (beam.E / CHBAR) * path)
                amp = jnp.sqrt(jnp.clip(T, 0.0, None))
                updates['Es'] = jnp.where(good, beam.Es * propPhase * amp,
                                          beam.Es)
                updates['Ep'] = jnp.where(good, beam.Ep * propPhase * amp,
                                          beam.Ep)
            lo = beam.replace(**updates)
            if needNewGlobal:
                glo = self._to_global(lo)
                return glo, lo
            return lo

        keep = self.inside(lx, lz)
        if self.isBeamStop:
            keep = ~keep
        state = jnp.where(good & ~keep, config.STATE_DEAD, beam.state)
        updates = dict(x=lx, y=ly, z=lz, a=la, b=lb, c=lc, state=state,
                       path=beam.path + path)
        if beam.Es is not None:
            propPhase = jnp.exp(1e7j * (beam.E / CHBAR) * path)
            updates['Es'] = jnp.where(good, beam.Es * propPhase, beam.Es)
            updates['Ep'] = jnp.where(good, beam.Ep * propPhase, beam.Ep)
        lo = beam.replace(**updates)
        if needNewGlobal:
            glo = self._to_global(lo)
            return glo, lo
        return lo

    def propagate_wave(self, wave=None, nrays='auto', key=None,
                       fixedEnergy=None, prevOE=None, **dkw):
        """One-call Kirchhoff hop onto samples inside this opening
        (reference apertures propagate_wave, apertures.py:501-542).
        Returns the filled Wave."""
        from .waves import propagate_wave_to_aperture
        return propagate_wave_to_aperture(self, wave, nrays=nrays, key=key,
                                          fixedEnergy=fixedEnergy,
                                          prevOE=prevOE, **dkw)

    def _to_global(self, lo: Beam) -> Beam:
        ex, ey, ez = self.ex, self.ey, self.ez
        gx = self.center[0] + lo.x * ex[0] + lo.y * ey[0] + lo.z * ez[0]
        gy = self.center[1] + lo.x * ex[1] + lo.y * ey[1] + lo.z * ez[1]
        gz = self.center[2] + lo.x * ex[2] + lo.y * ey[2] + lo.z * ez[2]
        ga = lo.a * ex[0] + lo.b * ey[0] + lo.c * ez[0]
        gb = lo.a * ex[1] + lo.b * ey[1] + lo.c * ez[1]
        gc = lo.a * ex[2] + lo.b * ey[2] + lo.c * ez[2]
        return lo.replace(x=gx, y=gy, z=gz, a=ga, b=gb, c=gc)


def _frame(x, z, dt):
    ex = jnp.asarray(x if x not in (None, 'auto') else (1, 0, 0), dt)
    ex = ex / jnp.linalg.norm(ex)
    ez = jnp.asarray(z if z not in (None, 'auto') else (0, 0, 1), dt)
    ez = ez / jnp.linalg.norm(ez)
    return ex, ez


@struct.dataclass
class RectangularAperture(_ApertureBase):
    """Opening given by blade positions (left, right, bottom, top) in the
    local (x, z) plane, any subset of which may be present (+-inf when
    absent)."""
    left: jnp.ndarray = None
    right: jnp.ndarray = None
    bottom: jnp.ndarray = None
    top: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0),
               kind=('left', 'right', 'bottom', 'top'),
               opening=(-10, 10, -2, 2), x='auto', z='auto',
               isBeamStop=False, softEdge=None):
        dt = config.dtype()
        blades = dict(zip(kind, opening))
        ex, ez = _frame(x, z, dt)
        inf = float('inf')
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop,
                   softEdge=None if softEdge is None
                   else jnp.asarray(softEdge, dt),
                   left=jnp.asarray(blades.get('left', -inf), dt),
                   right=jnp.asarray(blades.get('right', inf), dt),
                   bottom=jnp.asarray(blades.get('bottom', -inf), dt),
                   top=jnp.asarray(blades.get('top', inf), dt))

    def _export_params(self):
        """(drop, extra) for beamline._element_params: the four blades
        serialize as the create() 'opening' list."""
        return (), {'opening': [float(self.left), float(self.right),
                                float(self.bottom), float(self.top)]}

    def inside(self, x, z):
        return (x >= self.left) & (x <= self.right) & \
               (z >= self.bottom) & (z <= self.top)

    def transmission(self, x, z):
        if self.softEdge is None:
            return self.inside(x, z).astype(x.dtype)
        w = self.softEdge
        big = jnp.asarray(1e30, x.dtype)

        def edge(signed):   # signed distance into the opening
            return jax.nn.sigmoid(jnp.clip(signed, -big, big) / w)
        T = edge(x - jnp.maximum(self.left, -big)) * \
            edge(jnp.minimum(self.right, big) - x) * \
            edge(z - jnp.maximum(self.bottom, -big)) * \
            edge(jnp.minimum(self.top, big) - z)
        return T

    @property
    def opening(self):
        return [self.left, self.right, self.bottom, self.top]

    def get_divergence(self, source):
        """Angular openings given the blade positions and the distance to
        *source* (apertures.py:307-315)."""
        d = float(np.linalg.norm(np.asarray(self.center) -
                                 np.asarray(source.center)))
        return [float(v) / d for v in (self.left, self.right,
                                       self.bottom, self.top)]

    def set_divergence(self, source, divergence):
        """A copy with blades set from the angular openings
        (left, right, bottom, top) (apertures.py:317-331)."""
        import jax.numpy as _jnp
        d = float(np.linalg.norm(np.asarray(self.center) -
                                 np.asarray(source.center)))
        dt = self.left.dtype
        eps = 1e-9
        vals = [dv * d + (eps if dv > 0 else -eps) for dv in divergence]
        return self.replace(left=_jnp.asarray(vals[0], dt),
                            right=_jnp.asarray(vals[1], dt),
                            bottom=_jnp.asarray(vals[2], dt),
                            top=_jnp.asarray(vals[3], dt))

    def touch_beam(self, beam: Beam):
        """A copy of this aperture with the blades moved to just touch the
        *beam* footprint on the aperture plane (apertures.py:415-444).
        Host-side helper (returns a new immutable aperture)."""
        good = np.asarray((beam.state == 1) | (beam.state == 2))
        ex, ey, ez = (np.asarray(v) for v in (self.ex, self.ey, self.ez))
        c = np.asarray(self.center)
        dx = np.asarray(beam.x) - c[0]
        dy = np.asarray(beam.y) - c[1]
        dz = np.asarray(beam.z) - c[2]
        lx = dx * ex[0] + dy * ex[1] + dz * ex[2]
        ly = dx * ey[0] + dy * ey[1] + dz * ey[2]
        lz = dx * ez[0] + dy * ez[1] + dz * ez[2]
        la = (np.asarray(beam.a) * ex[0] + np.asarray(beam.b) * ex[1] +
              np.asarray(beam.c) * ex[2])
        lb = (np.asarray(beam.a) * ey[0] + np.asarray(beam.b) * ey[1] +
              np.asarray(beam.c) * ey[2])
        lc = (np.asarray(beam.a) * ez[0] + np.asarray(beam.b) * ez[1] +
              np.asarray(beam.c) * ez[2])
        t = -ly / np.where(lb == 0, 1.0, lb)
        x_at = (lx + la * t)[good]
        z_at = (lz + lc * t)[good]
        if x_at.size == 0:
            return self
        import jax.numpy as _jnp
        dt = self.left.dtype
        return self.replace(left=_jnp.asarray(x_at.min(), dt),
                            right=_jnp.asarray(x_at.max(), dt),
                            bottom=_jnp.asarray(z_at.min(), dt),
                            top=_jnp.asarray(z_at.max(), dt))


def RectangularBeamStop(name='', center=(0, 0, 0),
                        kind=('left', 'right', 'bottom', 'top'),
                        opening=(-10, 10, -2, 2), x='auto', z='auto'):
    """RectangularAperture in beam-stop mode (apertures.py:543)."""
    return RectangularAperture.create(name, center, kind, opening, x, z,
                                      isBeamStop=True)


@struct.dataclass
class RoundAperture(_ApertureBase):
    """Round opening of radius r (apertures.py:668)."""
    r: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0), r=1.0, x='auto', z='auto',
               isBeamStop=False, softEdge=None):
        dt = config.dtype()
        ex, ez = _frame(x, z, dt)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop, r=jnp.asarray(r, dt),
                   softEdge=None if softEdge is None
                   else jnp.asarray(softEdge, dt))

    def inside(self, x, z):
        return x ** 2 + z ** 2 <= self.r ** 2

    def transmission(self, x, z):
        if self.softEdge is None:
            return self.inside(x, z).astype(x.dtype)
        rr = jnp.sqrt(x ** 2 + z ** 2)
        return jax.nn.sigmoid((self.r - rr) / self.softEdge)


def RoundBeamStop(name='', center=(0, 0, 0), r=1.0, x='auto', z='auto'):
    """RoundAperture in beam-stop mode (apertures.py:916)."""
    return RoundAperture.create(name, center, r, x, z, isBeamStop=True)


@struct.dataclass
class DoubleSlit(_ApertureBase):
    """Two parallel vertical slits (apertures.py:931): an outer rectangular
    opening with an opaque shade strip of fractional width *shadeW* at
    position *shadeX* (fractions of the full x opening)."""
    left: jnp.ndarray = None
    right: jnp.ndarray = None
    bottom: jnp.ndarray = None
    top: jnp.ndarray = None
    shadeLeft: jnp.ndarray = None
    shadeRight: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0), opening=(-1, 1, -1, 1),
               shadeFraction=(0.3, 0.7), x='auto', z='auto',
               isBeamStop=False):
        dt = config.dtype()
        ex, ez = _frame(x, z, dt)
        le, ri, bo, to = opening
        width = ri - le
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop,
                   left=jnp.asarray(le, dt), right=jnp.asarray(ri, dt),
                   bottom=jnp.asarray(bo, dt), top=jnp.asarray(to, dt),
                   shadeLeft=jnp.asarray(le + shadeFraction[0] * width, dt),
                   shadeRight=jnp.asarray(le + shadeFraction[1] * width, dt))

    def _export_params(self):
        le, ri = float(self.left), float(self.right)
        width = ri - le
        return (), {
            'opening': [le, ri, float(self.bottom), float(self.top)],
            'shadeFraction': [(float(self.shadeLeft) - le) / width,
                              (float(self.shadeRight) - le) / width]}

    def inside(self, x, z):
        inRect = (x >= self.left) & (x <= self.right) & \
                 (z >= self.bottom) & (z <= self.top)
        inShade = (x > self.shadeLeft) & (x < self.shadeRight)
        return inRect & ~inShade


def DoubleBeamStop(name='', center=(0, 0, 0), opening=(-1, 1, -1, 1),
                   shadeFraction=(0.3, 0.7), x='auto', z='auto'):
    """DoubleSlit in beam-stop mode (apertures.py:1023): the two strips
    block instead of transmit."""
    return DoubleSlit.create(name, center, opening, shadeFraction, x, z,
                             isBeamStop=True)


@struct.dataclass
class PolygonalAperture(_ApertureBase):
    """Opening bounded by a closed polygon given by its vertices (N, 2) in
    the local (x, z) plane (apertures.py:1035).  Containment by the
    even-odd (crossing-number) rule, vectorized over rays x edges."""
    vertices: jnp.ndarray = None   # (N, 2)

    @classmethod
    def create(cls, name='', center=(0, 0, 0), opening=None, x='auto',
               z='auto', isBeamStop=False):
        dt = config.dtype()
        ex, ez = _frame(x, z, dt)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop,
                   vertices=jnp.asarray(opening, dt))

    def _export_params(self):
        return (), {'opening': np.asarray(self.vertices).tolist()}

    def inside(self, x, z):
        v = self.vertices
        x1 = v[:, 0]
        z1 = v[:, 1]
        x2 = jnp.roll(v[:, 0], -1)
        z2 = jnp.roll(v[:, 1], -1)
        # crossing number: edge crosses the horizontal ray from (x, z)
        xp = x[:, None]
        zp = z[:, None]
        cond = ((z1[None, :] > zp) != (z2[None, :] > zp))
        dz_ = jnp.where(z2 - z1 == 0, 1.0, z2 - z1)[None, :]
        xCross = x1[None, :] + (zp - z1[None, :]) * (x2 - x1)[None, :] / dz_
        crossings = jnp.sum(cond & (xp < xCross), axis=1)
        return (crossings % 2) == 1


def PolygonalBeamStop(name='', center=(0, 0, 0), opening=None, x='auto',
                      z='auto'):
    return PolygonalAperture.create(name, center, opening, x, z,
                                    isBeamStop=True)


@struct.dataclass
class GridAperture(_ApertureBase):
    """Cartesian grid of rectangular holes (apertures.py:1324-1449):
    hole half-sizes (dx, dz), pitches (px, pz), counts (nx, nz) on each side
    of the center."""
    dx: jnp.ndarray = None
    dz: jnp.ndarray = None
    px: jnp.ndarray = None
    pz: jnp.ndarray = None
    nx: int = struct.field(pytree_node=False, default=7)
    nz: int = struct.field(pytree_node=False, default=7)

    @classmethod
    def create(cls, name='', center=(0, 0, 0), dx=0.1, dz=0.1, px=1.0,
               pz=1.0, nx=7, nz=7, x='auto', z='auto', isBeamStop=False):
        dt = config.dtype()
        ex, ez = _frame(x, z, dt)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop,
                   dx=jnp.asarray(dx, dt), dz=jnp.asarray(dz, dt),
                   px=jnp.asarray(px, dt), pz=jnp.asarray(pz, dt),
                   nx=int(nx), nz=int(nz))

    def inside(self, x, z):
        hx = jnp.abs(x - jnp.round(x / self.px) * self.px) <= self.dx
        hz = jnp.abs(z - jnp.round(z / self.pz) * self.pz) <= self.dz
        inGridX = jnp.abs(x) <= (self.nx + 0.5) * self.px
        inGridZ = jnp.abs(z) <= (self.nz + 0.5) * self.pz
        return hx & hz & inGridX & inGridZ


def GridBeamStop(name='', center=(0, 0, 0), dx=0.1, dz=0.1, px=1.0,
                 pz=1.0, nx=7, nz=7, x='auto', z='auto'):
    """GridAperture in beam-stop mode (apertures.py:1450): the grid of
    rectangles blocks instead of transmits."""
    return GridAperture.create(name, center, dx, dz, px, pz, nx, nz, x, z,
                               isBeamStop=True)


@struct.dataclass
class SiemensStar(_ApertureBase):
    """Siemens star resolution pattern (apertures.py:1462): *nSpokes*
    wedge-shaped OPENINGS within radius *r* (half the disk is open, the
    alternating wedges and everything outside *r* are opaque — the
    reference builds the same star as a polygonal aperture)."""
    r: jnp.ndarray = None
    nSpokes: int = struct.field(pytree_node=False, default=9)
    vortex: int = struct.field(pytree_node=False, default=0)
    phi0: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0), nSpokes=9, r=1.0, phi0=0.0,
               vortex=0, x='auto', z='auto', isBeamStop=False):
        dt = config.dtype()
        ex, ez = _frame(x, z, dt)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   isBeamStop=isBeamStop, r=jnp.asarray(r, dt),
                   nSpokes=int(nSpokes), vortex=int(vortex),
                   phi0=jnp.asarray(phi0, dt))

    def inside(self, x, z):
        rho = jnp.sqrt(x ** 2 + z ** 2)
        phi = jnp.arctan2(z, x) - self.phi0
        if self.vortex:
            phi = phi + self.vortex * jnp.log(jnp.maximum(rho, 1e-12))
        spoke = jnp.sin(self.nSpokes * phi) > 0
        return (rho <= self.r) & ~spoke


class SetOfRectangularAperturesOnZActuator:
    """A set of coplanar named openings on a vertical actuator
    (apertures.py:555-651).  Host-side selector: ``select_aperture`` moves
    the actuator and returns the corresponding
    :class:`RectangularAperture` (or an edge half-plane for the final
    'top-edge'/'bottom-edge' entry)."""

    def __init__(self, center, apertures, centerZs, dXs, dZs,
                 x='auto', z='auto'):
        self.center = tuple(float(v) for v in center)
        self.apertures = list(apertures)
        self.centerZs = list(centerZs)
        self.dXs = list(dXs)
        self.dZs = list(dZs)
        self.x = x
        self.z = z
        self.curAperture = 0
        self.zActuator = self.center[2]

    def select_aperture(self, apertureName, targetZ=None):
        """Pick *apertureName*; the actuator moves so that its window is
        centered at *targetZ* (defaults to the window's nominal z).
        Returns the configured RectangularAperture."""
        ca = self.apertures.index(apertureName)
        self.curAperture = ca
        cz = self.centerZs[ca]
        if targetZ is None:
            targetZ = self.center[2] + cz
        self.zActuator = targetZ - cz
        dzAct = self.zActuator - self.center[2]
        inf = float('inf')
        if ca < len(self.apertures) - 1:
            dx = self.dXs[ca] * 0.5
            dz = self.dZs[ca] * 0.5
            opening = (-dx, dx, cz + dzAct - dz, cz + dzAct + dz)
        elif self.apertures[-1].startswith('top'):
            opening = (-inf, inf, -inf, cz + dzAct)
        else:
            opening = (-inf, inf, cz + dzAct, inf)
        return RectangularAperture.create(
            name=apertureName, center=self.center, opening=opening,
            x=self.x, z=self.z)
