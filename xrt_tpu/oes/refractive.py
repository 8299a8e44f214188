"""Refractive optics: plates and compound refractive lenses (CRL).

TPU-native re-implementation of xrt/backends/raycing/oes/refractive.py
(Plate:12 with double_refract:169, ParaboloidFlatLens:235 with
multiple_refract:405-470, ParabolicCylinderFlatLens:513,
DoubleParaboloidLens:581, DoubleParabolicCylinderLens:616).

A Plate is a DCM-like two-surface body traced with fromVacuum=True on entry
and False on exit (refraction + absorption inside); a CRL stack applies the
lens *nCRL* times with the center stepped along the optical axis.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..transforms import rotate_point
from .dcm import DCM


@struct.dataclass
class Plate(DCM):
    """A body with two refracting surfaces: thickness *t* (mm) and optional
    *wedgeAngle* of the back surface (refractive.py:12-167)."""
    t: jnp.ndarray = None
    wedgeAngle: jnp.ndarray = None

    auto_material_kind = 'plate'

    @classmethod
    def create(cls, t=0.0, wedgeAngle=0.0, **kwargs):
        dt = config.dtype()
        kwargs.setdefault('overEdge', '')
        obj = super(Plate, cls).create(
            t=jnp.asarray(t, dt), wedgeAngle=jnp.asarray(wedgeAngle, dt),
            **kwargs)
        # back surface: perpendicular translation -t, pitch offset wedge
        return obj.replace(cryst2perpTransl=jnp.asarray(-t, dt),
                           cryst2pitch=jnp.asarray(wedgeAngle, dt),
                           braggAngle=jnp.asarray(0.0, dt))

    def double_refract(self, beam, key=None, needLocal=True):
        """(beamGlobal, beamLocal1, beamLocal2): refraction into the body at
        the first surface, out of it at the second
        (cf. refractive.py:169-233)."""
        return self.double_reflect(beam, key=key, needLocal=needLocal,
                                   fromVacuum1=True, fromVacuum2=False)

    def multiple_refract(self, beam, key=None, needLocal=True):
        """Refraction through the whole CRL stack.  The first lens runs
        standalone (its local beams are returned, as in the reference);
        the remaining nCRL-1 lenses run under one ``lax.scan`` body so the
        compiled program stays one double_refract regardless of the stack
        length (a 100+-lens stack would otherwise unroll into an
        untractable jaxpr)."""
        nCRL = int(getattr(self, 'nCRL', 1))
        if key is None:
            key = jax.random.PRNGKey(0)
        out, lo1, lo2 = self.double_refract(
            beam, jax.random.fold_in(key, 0), needLocal=True)
        if nCRL == 1:
            return out, lo1, lo2
        zmax = getattr(self, 'zmax', None)
        zstep = 5.0 if zmax is None else zmax
        if isinstance(self, (DoubleParaboloidLens,
                             DoubleParabolicCylinderLens)):
            step = 2.0 * zstep + self.t
        else:
            step = zstep + self.t
        toward = rotate_point([jnp.zeros(()), jnp.zeros(()), jnp.ones(())],
                              self.rotationSequence, self.pitch,
                              self.roll + self.positionRoll, self.yaw)
        tvec = jnp.stack([toward[0], toward[1], toward[2]])
        idx = jnp.arange(1, nCRL, dtype=out.x.dtype)
        centers = self.center[None, :] - tvec[None, :] * \
            (step * idx)[:, None]
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(1, nCRL))

        def body(carry, inp):
            c, k = inp
            o, _, _ = self.replace(center=c).double_refract(
                carry, k, needLocal=True)
            return o, None

        out, _ = jax.lax.scan(body, out, (centers, keys))
        return out, lo1, lo2


@struct.dataclass
class ParaboloidFlatLens(Plate):
    """Paraboloid-flat refractive lens / CRL stack
    (refractive.py:235-510): entrance z = (x^2+y^2)/(4 focus) capped at
    *zmax*, flat exit."""
    focus: jnp.ndarray = None
    zmax: Optional[float] = struct.field(pytree_node=False, default=None)
    nCRL: int = struct.field(pytree_node=False, default=1)

    auto_material_kind = 'lens'

    @classmethod
    def create(cls, focus=1.0, zmax=None, nCRL=1, pitch=math.pi / 2,
               material=None, **kwargs):
        dt = config.dtype()
        if isinstance(nCRL, (tuple, list)):
            f, E = nCRL
            nFactor = 0.5 if cls.__name__.startswith('Double') else 1.0
            # under jit: some TPU transports cannot transfer the complex
            # intermediates of an eager get_refractive_index (the real
            # result ships fine)
            delta = 1.0 - float(jax.jit(
                lambda: material.get_refractive_index(E).real)())
            nCRL = max(int(round(2 * focus / f / delta * nFactor)), 1)
        return super(ParaboloidFlatLens, cls).create(
            focus=jnp.asarray(focus, dt),
            zmax=None if zmax is None else float(zmax), nCRL=int(nCRL),
            pitch=pitch, material=material, **kwargs)

    def local_z1(self, x, y):
        z = (x ** 2 + y ** 2) / (4 * self.focus)
        if self.zmax is not None:
            z = jnp.minimum(z, self.zmax)
        return z

    def local_n1(self, x, y):
        a = -x / (2 * self.focus)
        b = -y / (2 * self.focus)
        if self.zmax is not None:
            z = (x ** 2 + y ** 2) / (4 * self.focus)
            flat = z > self.zmax
            a = jnp.where(flat, 0.0, a)
            b = jnp.where(flat, 0.0, b)
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1)
        return [a / norm, b / norm, 1.0 / norm]

    def local_z2(self, x, y):
        return jnp.zeros_like(x)

    def local_n2(self, x, y):
        return [jnp.zeros_like(x), jnp.zeros_like(y), jnp.ones_like(x)]

    # the single-surface views used by prepare_wave etc.
    def local_z(self, x, y):
        return self.local_z1(x, y)

    def local_n(self, x, y):
        return self.local_n1(x, y)


@struct.dataclass
class ParabolicCylinderFlatLens(ParaboloidFlatLens):
    """1D (cylindrical) parabolic-flat lens (refractive.py:513-578): the
    paraboloid depends only on x (roll the lens by 90 deg for vertical
    focusing)."""

    def local_z1(self, x, y):
        z = x ** 2 / (4 * self.focus)
        if self.zmax is not None:
            z = jnp.minimum(z, self.zmax)
        return z

    def local_n1(self, x, y):
        a = -x / (2 * self.focus)
        if self.zmax is not None:
            z = x ** 2 / (4 * self.focus)
            a = jnp.where(z > self.zmax, 0.0, a)
        norm = jnp.sqrt(a ** 2 + 1)
        return [a / norm, jnp.zeros_like(y), 1.0 / norm]


@struct.dataclass
class DoubleParaboloidLens(ParaboloidFlatLens):
    """Lens with two paraboloid surfaces (refractive.py:581-613)."""

    def local_z2(self, x, y):
        return self.local_z1(x, y)

    def local_n2(self, x, y):
        return self.local_n1(x, y)


@struct.dataclass
class DoubleParabolicCylinderLens(ParabolicCylinderFlatLens):
    """Cylindrical lens with two parabolic surfaces
    (refractive.py:616-633)."""

    def local_z2(self, x, y):
        return self.local_z1(x, y)

    def local_n2(self, x, y):
        return self.local_n1(x, y)
