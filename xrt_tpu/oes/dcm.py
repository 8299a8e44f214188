"""Double-crystal monochromator.

TPU-native re-implementation of the reference DCM
(xrt/backends/raycing/oes/dcm.py:12 with double_reflect:248-354): two flat
(or subclass-curved) crystal surfaces traced sequentially in the same
virgin-local frame, with fixed-exit geometry via *fixedOffset* and all the
misalignment degrees of freedom (cryst1roll, cryst2roll, cryst2pitch,
cryst2finePitch, cryst2longTransl, cryst2perpTransl).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..transforms import global_to_virgin_local, virgin_local_to_global
from .base import OE, _merge_by_mask


@struct.dataclass
class DCM(OE):
    """Double crystal monochromator with flat crystals.

    *bragg* is the Bragg angle in rad (use
    ``material.get_Bragg_angle(E) - material.get_dtheta(E)`` or
    :func:`bragg_from_material` for auto-alignment at a given energy)."""
    braggAngle: jnp.ndarray = None
    cryst1roll: jnp.ndarray = None
    cryst2roll: jnp.ndarray = None
    cryst2pitch: jnp.ndarray = None
    cryst2finePitch: jnp.ndarray = None
    cryst2perpTransl: jnp.ndarray = None
    cryst2longTransl: jnp.ndarray = None
    dxCryst: jnp.ndarray = None
    limPhysX2: Optional[jnp.ndarray] = None
    limPhysY2: Optional[jnp.ndarray] = None
    limOptX2: Optional[jnp.ndarray] = None
    limOptY2: Optional[jnp.ndarray] = None
    material2: Any = None

    @classmethod
    def create(cls, bragg=0.0, braggOffset=0.0, cryst1roll=0.0,
               cryst2roll=0.0, cryst2pitch=0.0, cryst2finePitch=0.0,
               cryst2perpTransl=0.0, cryst2longTransl=0.0, fixedOffset=None,
               limPhysX2=None, limPhysY2=None, limOptX2=None, limOptY2=None,
               material=None, material2=None, alignE=None, **kwargs):
        dt = config.dtype()
        if isinstance(bragg, str):
            E_al = config.parse_energy(bragg)
            if E_al is not None:
                alignE, bragg = float(E_al), None
            elif 'auto' in bragg.lower():
                bragg = None
            else:
                bragg = config.auto_units_angle(bragg)
        if bragg is None and material is None:
            raise ValueError(
                "DCM with bragg='auto'/energy (or no bragg) needs a "
                'material to resolve the Bragg angle')
        if (bragg is None or alignE is not None) and material is not None:
            if alignE is None:
                alignE = 9000.0
            bragg = float(material.get_Bragg_angle(alignE) -
                          material.get_dtheta(alignE))
        bragg = bragg - braggOffset
        if fixedOffset not in (0, None):
            cryst2perpTransl = fixedOffset / 2.0 / math.cos(bragg)
        if material2 is None:
            material2 = material

        def arr(v):
            return None if v is None else jnp.asarray(v, dt)
        return super(DCM, cls).create(
            material=material,
            braggAngle=arr(bragg), cryst1roll=arr(cryst1roll),
            cryst2roll=arr(cryst2roll), cryst2pitch=arr(cryst2pitch),
            cryst2finePitch=arr(cryst2finePitch),
            cryst2perpTransl=arr(cryst2perpTransl),
            cryst2longTransl=arr(cryst2longTransl),
            dxCryst=arr(0.0),
            limPhysX2=arr(limPhysX2), limPhysY2=arr(limPhysY2),
            limOptX2=arr(limOptX2), limOptY2=arr(limOptY2),
            material2=material2, **kwargs)

    # surfaces of the two crystals; override in subclasses (cf. dcm.py
    # local_z1/local_n1/local_z2/local_n2)
    def local_z1(self, x, y):
        return self.local_z(x, y)

    def local_n1(self, x, y):
        return self.local_n(x, y)

    def local_z2(self, x, y):
        return jnp.zeros_like(x)

    def local_n2(self, x, y):
        return [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x)]

    def double_reflect(self, beam, key=None, needLocal=True,
                       fromVacuum1=True, fromVacuum2=True):
        """(beamGlobal, beamLocal1, beamLocal2) (cf. dcm.py:248-354)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        good1 = beam.state > 0
        lb = global_to_virgin_local(beam, self.center)

        # first crystal
        vlb1, lo1 = self._reflect_local(
            lb, good1, k1, self.pitch + self.braggAngle,
            self.roll + self.positionRoll + self.cryst1roll, self.yaw,
            dx=self.dxCryst, fromVacuum=fromVacuum1,
            local_z=self.local_z1, local_n=self.local_n1,
            material=self.material)
        goodAfter1 = (vlb1.state == 1) | (vlb1.state == 2)

        # second crystal
        lim2 = (self.limPhysX2 if self.limPhysX2 is not None
                else self.limPhysX,
                self.limPhysY2 if self.limPhysY2 is not None
                else self.limPhysY,
                self.limOptX2, self.limOptY2)
        vlb2, lo2 = self._reflect_local(
            vlb1, goodAfter1, k2,
            -self.pitch - self.braggAngle + self.cryst2pitch +
            self.cryst2finePitch,
            self.roll + self.cryst2roll + self.positionRoll, -self.yaw,
            dx=-self.dxCryst, dy=self.cryst2longTransl,
            dz=-self.cryst2perpTransl, fromVacuum=fromVacuum2,
            is2ndXtal=True, local_z=self.local_z2, local_n=self.local_n2,
            material=self.material2, limits=lim2)
        goodAfter2 = (vlb2.state == 1) | (vlb2.state == 2)

        glo = virgin_local_to_global(vlb2, self.center)
        merged = _merge_by_mask(beam, glo, good1 & goodAfter1 & goodAfter2)
        # propagate the dead states
        merged = merged.replace(state=glo.state)
        if needLocal:
            return merged, lo1, lo2
        return merged


@struct.dataclass
class DCMwithSagittalFocusing(DCM):
    """DCM with sagittally bent second crystal of radius Rs
    (oes/__init__.py:636-663)."""
    Rs: jnp.ndarray = None

    @classmethod
    def create(cls, Rs=1000.0, **kwargs):
        return super(DCMwithSagittalFocusing, cls).create(
            Rs=jnp.asarray(Rs, config.dtype()), **kwargs)

    def local_z2(self, x, y):
        return (x ** 2) / 2.0 / self.Rs

    def local_n2(self, x, y):
        a = -x / self.Rs
        norm = jnp.sqrt(a ** 2 + 1)
        return [a / norm, jnp.zeros_like(y), 1.0 / norm]


def DCMOnTripodWithOneXStage(dcm_cls=DCM, *, jack1, jack2, jack3, dx,
                             center, height=0.0, positionRoll=0.0,
                             **kwargs):
    """Create a DCM with its orientation read from a tripod + one-X-stage
    support (reference DCMOnTripodWithOneXStage, oes/__init__.py:666-705):
    the single stage gives the lateral dx, the jack z's give
    (pitch, roll, center z).  Counterpart of
    :func:`xrt_tpu.oes.mirrors.MirrorOnTripodWithTwoXStages`.
    """
    from ..stages import Tripod
    # the tripod is defined in its horizontal state (all jack z equal);
    # the measured jack z's are then motor readbacks
    tp = Tripod([jack1[0], jack1[1], 0.0], [jack2[0], jack2[1], 0.0],
                [jack3[0], jack3[1], 0.0], center=list(center),
                height=height)
    tp.jack1[2], tp.jack2[2], tp.jack3[2] = jack1[2], jack2[2], jack3[2]
    pitch, roll, cz = tp.get_orientation(positionRoll)
    return dcm_cls.create(center=(center[0] + dx, center[1], cz),
                          pitch=pitch, roll=roll,
                          positionRoll=positionRoll, **kwargs)
