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
class BentLaue2D(OE):
    """Parabolically 2D-bent Laue crystal with independent meridional (Rm)
    and sagittal (Rs) radii and a depth-dependent lattice orientation from
    the pyTTE displacement jacobian (laue.py:229-452).  Works with
    volumetric-diffraction crystals (``volumetricDiffraction=True``) whose
    diffraction point is sampled through the depth."""
    Rm: jnp.ndarray = None
    Rs: jnp.ndarray = None
    # djparams [coef1, coef2, invR1, coef3, invR2] in 1/um, precomputed at
    # create from the material's elastic model (set_OE_properties)
    djparams: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, Rm=1.0e4, Rs=-5.0e4, material=None, alpha=0.0,
               **kwargs):
        from ..materials.tt import compute_tt_params_full
        dt = config.dtype()
        Rm = float('inf') if Rm in (None, 0) else float(Rm)
        Rs = float('inf') if Rs in (None, 0) else float(Rs)
        dj = None
        if material is not None and hasattr(material, 'get_F_chi'):
            try:
                dj = jnp.asarray(compute_tt_params_full(
                    material, alpha, Rm=Rm, Rs=Rs), dt)
            except (ValueError, KeyError):
                dj = None
        return super(BentLaue2D, cls).create(
            Rm=jnp.asarray(Rm, dt), Rs=jnp.asarray(Rs, dt), djparams=dj,
            material=material, alpha=alpha, **kwargs)

    def local_z(self, x, y):
        return 0.5 * x ** 2 / self.Rs + 0.5 * y ** 2 / self.Rm

    def local_n(self, x, y):
        """Surface normal and Bragg-plane normal rotated by the local
        surface slopes (laue.py:418-452)."""
        a = -x / self.Rs
        b = -y / self.Rm
        c = jnp.ones_like(x)
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1.0)
        a, b, c = a / norm, b / norm, c / norm
        sinpitch = -b
        cospitch = jnp.sqrt(jnp.clip(1 - b ** 2, 0.0, 1.0))
        sinroll = -a
        cosroll = jnp.sqrt(jnp.clip(1 - a ** 2, 0.0, 1.0))
        aB = jnp.zeros_like(a)
        bB = jnp.ones_like(a)
        cB = jnp.zeros_like(a)
        if self.alpha is not None:
            bB, cB = rotate_x(bB, cB, jnp.cos(self.alpha),
                              -jnp.sin(self.alpha))
        # rotate_y then rotate_x like the reference
        aB, cB = (cosroll * aB + (-sinroll) * cB,
                  sinroll * aB + cosroll * cB)
        bB, cB = rotate_x(bB, cB, cospitch, sinpitch)
        normB = jnp.sqrt(aB ** 2 + bB ** 2 + cB ** 2)
        return [aB / normB, bB / normB, cB / normB, a, b, c]

    def local_n_depth(self, x, y, z):
        """Bragg-plane normal at depth, strained by the displacement-field
        jacobian (laue.py:366-417): h' = h - grad(u . h)."""
        alpha = self.alpha if self.alpha is not None else 0.0
        a = -x / self.Rs
        b = -y / self.Rm
        c = jnp.ones_like(x)
        norm = jnp.sqrt(a ** 2 + b ** 2 + 1.0)
        a, b, c = a / norm, b / norm, c / norm
        hx = jnp.zeros_like(x)
        hy = jnp.cos(alpha) * jnp.ones_like(x)
        hz = -jnp.sin(alpha) * jnp.ones_like(x)
        if self.djparams is not None:
            coef1, coef2, invR1, coef3, invR2 = self.djparams
            # jacobian in 1/um -> 1/mm
            duh_dx = (hx * (-z * invR2) + hz * (x * invR2)) * 1e3
            duh_dy = (hy * (-z * invR1) + hz * (y * invR1)) * 1e3
            duh_dz = (hx * (-x * invR2 + z * coef3) +
                      hy * (-y * invR1 + z * coef2) +
                      hz * (z * coef1)) * 1e3
        else:
            nu = getattr(self.material, 'nu', None)
            nu = 0.22 if nu is None else nu  # Si-like anticlastic default
            duh_dx = hx * (-z * nu / self.Rm) + hz * (-x * nu / self.Rm)
            duh_dy = hy * (-z / self.Rm) + hz * (y / self.Rm)
            duh_dz = (hx * (-x * nu / self.Rm) + hy * (-y / self.Rm) +
                      hz * (nu * z / self.Rm))
        hpx = hx - duh_dx
        hpy = hy - duh_dy
        hpz = hz - duh_dz
        hn = jnp.sqrt(hpx ** 2 + hpy ** 2 + hpz ** 2)
        return [hpx / hn, hpy / hn, hpz / hn, a, b, c]


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
