"""Screens — flat and hemispheric observation surfaces.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/screens.py (Screen:34 with expose:226,
expose_global:196, HemisphericScreen:422).  ``expose`` intersects rays with
the screen plane and returns the image beam in the screen-local frame;
amplitudes acquire the propagation phase exp(1e7j*k*path) (path mm -> A).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from . import config
from .beam import Beam
from .physconsts import CHBAR


@struct.dataclass
class Screen:
    """A flat screen at *center* with orientation given by the unit frame
    vectors *x* (local x) and *z* (local z); the normal is y = z cross x."""
    center: jnp.ndarray = None
    ex: jnp.ndarray = None     # local x axis in global frame
    ez: jnp.ndarray = None     # local z axis in global frame
    name: str = struct.field(pytree_node=False, default='')
    compressX: Optional[float] = struct.field(pytree_node=False, default=None)
    compressZ: Optional[float] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, name='', center=(0, 0, 0), x=(1, 0, 0), z=(0, 0, 1),
               compressX=None, compressZ=None):
        dt = config.dtype()
        ex = jnp.asarray(x, dt)
        ex = ex / jnp.linalg.norm(ex)
        ez = jnp.asarray(z, dt)
        ez = ez / jnp.linalg.norm(ez)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   compressX=compressX, compressZ=compressZ)

    @property
    def ey(self):
        return jnp.cross(self.ez, self.ex)

    def local_to_global(self, x, y, z):
        """Screen-local point -> global coordinates (screens.py:190-194)."""
        ex, ey, ez = self.ex, self.ey, self.ez
        xglo = self.center[0] + x * ex[0] + y * ey[0] + z * ez[0]
        yglo = self.center[1] + x * ex[1] + y * ey[1] + z * ez[1]
        zglo = self.center[2] + x * ex[2] + y * ey[2] + z * ez[2]
        return xglo, yglo, zglo

    def expose(self, beam: Beam, onlyPositivePath=False) -> Beam:
        """Intersect *beam* (global frame) with the screen plane; returns the
        local-frame image beam (cf. screens.py:226-295).  Rays parallel to
        the plane (or with negative path when *onlyPositivePath*) are marked
        lost."""
        ex, ey, ez = self.ex, self.ey, self.ez
        # to local frame
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
        path = -ly / safe_lb
        condBad = (lb == 0) | jnp.isnan(path) | jnp.isinf(path)
        if onlyPositivePath:
            condBad = condBad | (path < 0)
        path = jnp.where(condBad, 0.0, path)
        state = jnp.where(condBad, config.STATE_DEAD, beam.state)

        lx = lx + la * path
        lz = lz + lc * path
        ly = jnp.zeros_like(ly)
        updates = dict(x=lx, y=ly, z=lz, a=la, b=lb, c=lc,
                       path=beam.path + path, state=state)
        if beam.Es is not None:
            propPhase = jnp.exp(1e7j * (beam.E / CHBAR) * path)
            updates['Es'] = beam.Es * propPhase
            updates['Ep'] = beam.Ep * propPhase
        out = beam.replace(**updates)
        if self.compressX:
            out = out.replace(x=out.x * self.compressX)
        if self.compressZ:
            out = out.replace(z=out.z * self.compressZ)
        return out

    def expose_wave(self, wave=None, dim1=None, dim2=None, key=None,
                    fixedEnergy=None, prevOE=None, **dkw):
        """One-call Kirchhoff hop onto this screen's pixel grid (reference
        Screen.expose_wave, screens.py:367-421).  Returns the filled
        Wave."""
        from .waves import expose_wave_on_screen
        return expose_wave_on_screen(self, wave, dim1, dim2, key=key,
                                     fixedEnergy=fixedEnergy,
                                     prevOE=prevOE, **dkw)

    def expose_global(self, beam: Beam, onlyPositivePath=False) -> Beam:
        """Like :meth:`expose` but returns the beam in the global frame
        (cf. screens.py:196-224)."""
        ey = self.ey
        denom = beam.a * ey[0] + beam.b * ey[1] + beam.c * ey[2]
        safe = jnp.where(denom == 0, 1.0, denom)
        path = ((self.center[0] - beam.x) * ey[0] +
                (self.center[1] - beam.y) * ey[1] +
                (self.center[2] - beam.z) * ey[2]) / safe
        condBad = (denom == 0) | jnp.isnan(path) | jnp.isinf(path)
        if onlyPositivePath:
            condBad = condBad | (path < 0)
        path = jnp.where(condBad, 0.0, path)
        state = jnp.where(condBad, config.STATE_DEAD, beam.state)
        updates = dict(x=beam.x + path * beam.a, y=beam.y + path * beam.b,
                       z=beam.z + path * beam.c, path=beam.path + path,
                       state=state)
        if beam.Es is not None:
            propPhase = jnp.exp(1e7j * (beam.E / CHBAR) * path)
            updates['Es'] = beam.Es * propPhase
            updates['Ep'] = beam.Ep * propPhase
        return beam.replace(**updates)


@struct.dataclass
class HemisphericScreen(Screen):
    """Hemispheric screen of radius R; the image is in spherical angular
    coordinates (x = phi*R, z = theta*R) with surface element
    dS = cos(theta) R^2 (cf. screens.py:422-559)."""
    R: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0), x=(1, 0, 0), z=(0, 0, 1),
               R=1000.0):
        dt = config.dtype()
        ex = jnp.asarray(x, dt)
        ex = ex / jnp.linalg.norm(ex)
        ez = jnp.asarray(z, dt)
        ez = ez / jnp.linalg.norm(ez)
        return cls(center=jnp.asarray(center, dt), ex=ex, ez=ez, name=name,
                   R=jnp.asarray(R, dt))

    def expose(self, beam: Beam, onlyPositivePath=False) -> Beam:
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
        # |p + t*v| = R with p=(lx,ly,lz), v=(la,lb,lc) unit
        pv = lx * la + ly * lb + lz * lc
        p2 = lx ** 2 + ly ** 2 + lz ** 2
        disc = pv ** 2 - p2 + self.R ** 2
        bad = disc < 0
        path = -pv + jnp.sqrt(jnp.clip(disc, 0.0, None))
        if onlyPositivePath:
            bad = bad | (path < 0)
        path = jnp.where(bad, 0.0, path)
        state = jnp.where(bad, config.STATE_DEAD, beam.state)
        x3 = lx + la * path
        y3 = ly + lb * path
        z3 = lz + lc * path
        theta = jnp.arcsin(jnp.clip(z3 / self.R, -1.0, 1.0))
        phi = jnp.arctan2(x3, y3)
        updates = dict(x=phi * self.R, z=theta * self.R,
                       y=jnp.zeros_like(ly), a=la, b=lb, c=lc,
                       path=beam.path + path, state=state)
        if beam.Es is not None:
            propPhase = jnp.exp(1e7j * (beam.E / CHBAR) * path)
            updates['Es'] = beam.Es * propPhase
            updates['Ep'] = beam.Ep * propPhase
        return beam.replace(**updates)
