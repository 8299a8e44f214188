"""Laue-geometry crystal optics.

TPU-native re-implementation of xrt/backends/raycing/oes/laue.py
(LauePlate:11, BentLaueCylinder:26, GroundBentLaueCylinder:455,
BentLaueSphere:478).  The bent 2D Laue with depth-dependent lattice rotation
(BentLaue2D:229, tied to the Takagi-Taupin solver) is planned together with
the TT module.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import struct

from .. import config
from ..transforms import rotate_x
from .base import OE
from .mirrors import rmer_from_coddington


@struct.dataclass
class LauePlate(OE):
    """A flat Laue plate (laue.py:11-24); thickness comes from the
    material.  The Bragg-plane normal lies in the surface (rotated by alpha
    when asymmetric)."""

    def local_n(self, x, y):
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        if self.alpha is not None:
            bB, cB = rotate_x(zero, one, -jnp.sin(self.alpha),
                              -jnp.cos(self.alpha))
        else:
            bB, cB = one, -zero
        return [zero, bB, cB, zero, zero, one]


@struct.dataclass
class BentLaueCylinder(OE):
    """Simply bent crystal in Laue geometry (duMond)
    (laue.py:26-452)."""
    R: jnp.ndarray = None
    crossSection: str = struct.field(pytree_node=False, default='circular')

    @classmethod
    def create(cls, R=1000.0, crossSection='circular', pitch=0.0,
               bragg=None, **kwargs):
        if not (crossSection.startswith('circ') or
                crossSection.startswith('parab')):
            raise ValueError('unknown crossSection!')
        if isinstance(R, (tuple, list)):
            ang = bragg if bragg else pitch
            R = float(rmer_from_coddington(R[0], R[1], ang))
        return super(BentLaueCylinder, cls).create(
            R=jnp.asarray(R, config.dtype()), crossSection=crossSection,
            pitch=pitch, bragg=bragg, **kwargs)

    def local_z(self, x, y):
        if self.crossSection.startswith('circ'):
            return self.R - jnp.sqrt(jnp.clip(self.R ** 2 - y ** 2, 1e-30,
                                              None))
        return y ** 2 / 2.0 / self.R

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
            bB, cB = rotate_x(b, c, -jnp.sin(self.alpha),
                              -jnp.cos(self.alpha))
        else:
            bB, cB = c, -b
        return [a, bB, cB, a, b, c]

    def local_n(self, x, y):
        return self.local_n_cylinder(x, y, self.R, True)


@struct.dataclass
class GroundBentLaueCylinder(BentLaueCylinder):
    """Ground-bent Laue crystal (laue.py:455-475)."""

    def local_n(self, x, y):
        nSurf = self.local_n_cylinder(x, y, self.R, False)
        a = jnp.zeros_like(x)
        b = -y
        c = jnp.sqrt(jnp.clip(self.R ** 2 - y ** 2, 1e-30, None)) + self.R
        if self.alpha is not None:
            b, c = rotate_x(b, c, -jnp.sin(self.alpha),
                            -jnp.cos(self.alpha))
        else:
            b, c = c, -b
        norm = jnp.sqrt(b ** 2 + c ** 2)
        return [a / norm, b / norm, c / norm,
                nSurf[-3], nSurf[-2], nSurf[-1]]


@struct.dataclass
class BentLaueSphere(BentLaueCylinder):
    """Spherically bent Laue crystal (laue.py:478-515)."""

    def local_z(self, x, y):
        if self.crossSection.startswith('circ'):
            return self.R - jnp.sqrt(jnp.clip(
                self.R ** 2 - x ** 2 - y ** 2, 1e-30, None))
        return (x ** 2 + y ** 2) / 2.0 / self.R

    def local_n(self, x, y):
        if self.crossSection.startswith('circ'):
            s = jnp.sqrt(jnp.clip(self.R ** 2 - x ** 2 - y ** 2, 1e-30,
                                  None))
            a = -x / s
            b = -y / s
        else:
            a = -x / self.R
            b = -y / self.R
        c = jnp.ones_like(x)
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1)
        aB = jnp.zeros_like(x)
        bB = c
        cB = -b
        normB = jnp.sqrt(b ** 2 + c ** 2)
        return [aB / normB, bB / normB, cB / normB,
                a / norm, b / norm, c / norm]
