"""Multilayer reflectivity/transmittivity by the recursive Parratt-type
matrix method with Nevot-Croce interdiffusion factors.

TPU-native re-implementation of the capability of the reference
xrt/backends/raycing/materials/multilayer.py (get_amplitude:285-517, layer
recursion at :434-466; graded d-spacing set_dti/set_dbi:191-219; Coated:528).
The layer recursion is a ``lax.scan`` over the layer index with per-ray
vector state — one fused XLA loop instead of the reference's OpenCL kernel.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physconsts import CH, CHBAR
from .material import Material


def _graded_thicknesses(tHigh, tLow, nPairs, power):
    """d_n = A/(B+n)^power graded thickness profile
    (cf. multilayer.py:191-219)."""
    if tLow:
        layers = np.arange(1, nPairs + 1)
        qRoot = (tHigh / tLow) ** (1.0 / power)
        qB = (nPairs - qRoot) / (qRoot - 1.0)
        qA = tHigh * (qB + 1) ** power
        return qA * (qB + layers) ** (-power)
    return np.ones(nPairs) * float(tHigh)


@struct.dataclass
class Multilayer:
    """Periodic or depth-graded multilayer of (tLayer, bLayer) pairs on a
    substrate.  Thicknesses in Angstrom.  *geom* is 'reflected' or
    'transmitted'."""
    tLayer: Optional[Material]
    bLayer: Optional[Material]
    substrate: Optional[Material]
    dti: jnp.ndarray          # per-pair top-layer thicknesses, A
    dbi: jnp.ndarray          # per-pair bottom-layer thicknesses, A
    idThickness: jnp.ndarray  # interdiffusion RMS thickness, A
    substRoughness: jnp.ndarray
    substThickness: jnp.ndarray
    nPairs: int = struct.field(pytree_node=False, default=0)
    geom: str = struct.field(pytree_node=False, default='reflected')
    kind: str = struct.field(pytree_node=False, default='multilayer')
    name: str = struct.field(pytree_node=False, default='')

    @classmethod
    def create(cls, tLayer=None, tThickness=0.0, bLayer=None, bThickness=0.0,
               nPairs=0, substrate=None, tThicknessLow=0.0,
               bThicknessLow=0.0, idThickness=0.0, power=2.0,
               substRoughness=0.0, substThickness=np.inf, name='',
               geom='reflected', kind='multilayer'):
        from .. import config
        dt = config.dtype()
        dti = _graded_thicknesses(tThickness, tThicknessLow, nPairs, power)
        dbi = _graded_thicknesses(bThickness, bThicknessLow, nPairs, power)
        return cls(tLayer=tLayer, bLayer=bLayer, substrate=substrate,
                   dti=jnp.asarray(dti, dt), dbi=jnp.asarray(dbi, dt),
                   idThickness=jnp.asarray(idThickness, dt),
                   substRoughness=jnp.asarray(substRoughness, dt),
                   substThickness=jnp.asarray(substThickness, dt),
                   nPairs=int(nPairs), geom=geom, name=name, kind=kind)

    @property
    def d(self):
        """Period = tThickness + bThickness (top values if graded)."""
        return self.dti[0] + self.dbi[0]

    def resolved_kind(self, default='mirror') -> str:
        return self.kind

    def get_sin_Bragg_angle(self, E, order=1):
        a = order * CH / (2 * self.d * jnp.asarray(E))
        return jnp.clip(a, -1 + 1e-16, 1 - 1e-16)

    def get_Bragg_angle(self, E, order=1):
        return jnp.arcsin(self.get_sin_Bragg_angle(E, order))

    def get_dtheta(self, E, order=1):
        return self.get_dtheta_symmetric_Bragg(E, order)

    def get_dtheta_symmetric_Bragg(self, E, order=1):
        """theta_B - arcsin(sqrt(m^2 lambda^2 + 8 d^2 delta_mean)/2d)
        (multilayer.py:241-259)."""
        nt = self.tLayer.get_refractive_index(E).real if self.tLayer else 1.0
        nb = self.bLayer.get_refractive_index(E).real if self.bLayer else 1.0
        d_ = jnp.abs((nt - 1) * self.dti[0] + (nb - 1) * self.dbi[0]) / self.d
        return self.get_Bragg_angle(E, order) - jnp.arcsin(
            jnp.sqrt((order * CH / E) ** 2 + self.d ** 2 * 8 * d_) /
            (2 * self.d))

    def get_amplitude(self, E, beamInDotNormal, x=None, y=None):
        """(rs, rp) for 'reflected' / (ts, tp) for 'transmitted'
        (multilayer.py:285-517); returns a 4-tuple like Material.get_amplitude
        with absorption slots zeroed (handled through layers here)."""
        E = jnp.asarray(E)
        k = E / CHBAR
        one = jnp.ones_like(E) * (1 + 0j)
        nt = (self.tLayer.get_refractive_index(E).conj()
              if self.tLayer else one)
        nb = (self.bLayer.get_refractive_index(E).conj()
              if self.bLayer else one)
        ns = (self.substrate.get_refractive_index(E).conj()
              if self.substrate else one)

        Q = 2 * k * jnp.abs(beamInDotNormal)
        Q2 = Q ** 2
        k28 = 8 * k ** 2
        Qt = jnp.sqrt(Q2 + (nt - 1) * k28)
        Qb = jnp.sqrt(Q2 + (nb - 1) * k28)
        Qs = jnp.sqrt(Q2 + (ns - 1) * k28)
        id2 = self.idThickness ** 2
        tran = 'tran' in self.geom

        roughvt = jnp.exp(-0.5 * Q * Qt * id2)
        rvt_s = (Q - Qt) / (Q + Qt) * roughvt
        rvt_p = (Q * nt - Qt / nt) / (Q * nt + Qt / nt) * roughvt

        roughtb = jnp.exp(-0.5 * Qt * Qb * id2)
        rtb_s = (Qt - Qb) / (Qt + Qb) * roughtb
        rtb_p = (Qt / nt * nb - Qb / nb * nt) / \
                (Qt / nt * nb + Qb / nb * nt) * roughtb
        rbt_s = -rtb_s
        rbt_p = -rtb_p

        rmsbs = id2 if self.tLayer else self.substRoughness ** 2
        roughbs = jnp.exp(-0.5 * Qb * Qs * rmsbs)
        rbs_s = (Qb - Qs) / (Qb + Qs) * roughbs
        rbs_p = (Qb / nb * ns - Qs / ns * nb) / \
                (Qb / nb * ns + Qs / ns * nb) * roughbs

        rsv_s = (Qs - Q) / (Qs + Q) * roughbs
        rsv_p = (Qs / ns - Q * ns) / (Qs / ns + Q * ns) * roughbs

        if tran:
            tvt_s = 2 * Q / (Q + Qt) * roughvt
            tvt_p = 2 * Q * nt / (Q * nt + Qt / nt) * roughvt
            ttb_s = 2 * Qt / (Qt + Qb) * roughtb
            ttb_p = 2 * Qt / nt * nb / (Qt / nt * nb + Qb / nb * nt) * roughtb
            tbt_s = 2 * Qb / (Qt + Qb) * roughtb
            tbt_p = 2 * Qb / nb * nt / (Qt / nt * nb + Qb / nb * nt) * roughtb
            tbs_s = 2 * Qb / (Qb + Qs) * roughbs
            tbs_p = 2 * Qb / nb * ns / (Qb / nb * ns + Qs / ns * nb) * roughbs
            tsv_s = 2 * Qs / (Qs + Q) * roughbs
            tsv_p = 2 * Qs / ns / (Qs / ns + Q * ns) * roughbs
            rj_s, rj_p = rsv_s, rsv_p
            tj_s, tj_p = tsv_s, tsv_p
            extraLayer = 1
        else:
            rj_s, rj_p = rbs_s, rbs_p
            tj_s = tj_p = jnp.zeros_like(rj_s)
            extraLayer = 0

        nLayers = 2 * self.nPairs + extraLayer
        dti = self.dti
        dbi = self.dbi

        def body(carry, i):
            rj_s, rj_p, tj_s, tj_p = carry
            even = (i % 2) == 0
            pair = i // 2
            is_top = i == 0
            is_subst = i == 2 * self.nPairs  # only reachable in 'tran'
            d_t = dti[jnp.minimum(pair, dti.shape[0] - 1)]
            d_b = dbi[jnp.minimum(pair, dbi.shape[0] - 1)]
            # interface reflectivity above layer i and its optical thickness
            rij_s = jnp.where(even,
                              jnp.where(is_top, rvt_s,
                                        jnp.where(is_subst, rbs_s, rbt_s)),
                              rtb_s)
            rij_p = jnp.where(even,
                              jnp.where(is_top, rvt_p,
                                        jnp.where(is_subst, rbs_p, rbt_p)),
                              rtb_p)
            iQT = jnp.where(even,
                            jnp.where(is_subst, Qs * self.substThickness,
                                      Qt * d_t),
                            Qb * d_b)
            p1i = jnp.exp(0.5j * iQT)
            p2i = p1i ** 2
            rj2i_s = rj_s * p2i
            rj2i_p = rj_p * p2i
            ri_s = (rij_s + rj2i_s) / (1 + rij_s * rj2i_s)
            ri_p = (rij_p + rj2i_p) / (1 + rij_p * rj2i_p)
            if tran:
                tij_s = jnp.where(even,
                                  jnp.where(is_top, tvt_s,
                                            jnp.where(is_subst, tbs_s,
                                                      tbt_s)),
                                  ttb_s)
                tij_p = jnp.where(even,
                                  jnp.where(is_top, tvt_p,
                                            jnp.where(is_subst, tbs_p,
                                                      tbt_p)),
                                  ttb_p)
                ti_s = tij_s * tj_s * p1i / (1 + rij_s * rj2i_s)
                ti_p = tij_p * tj_p * p1i / (1 + rij_p * rj2i_p)
            else:
                ti_s, ti_p = tj_s, tj_p
            return (ri_s, ri_p, ti_s, ti_p), None

        init = (rj_s + 0j, rj_p + 0j, tj_s + 0j, tj_p + 0j)
        (ri_s, ri_p, ti_s, ti_p), _ = jax.lax.scan(
            body, init, jnp.arange(nLayers - 1, -1, -1))

        zero = jnp.zeros_like(E)
        if tran:
            return ti_s, ti_p, zero, zero
        # delta may be < 0 for some tabulations (multilayer.py:510-515)
        flip = (nt.real - 1) > 0
        ri_s = jnp.where(flip, ri_s.conj(), ri_s)
        ri_p = jnp.where(flip, ri_p.conj(), ri_p)
        return ri_s, ri_p, zero, zero


@struct.dataclass
class GradedMultilayer(Multilayer):
    """Alias class with graded layer thicknesses (multilayer.py:520)."""


def Coated(coating=None, cThickness=0.0, surfaceRoughness=0.0,
           substrate=None, substRoughness=0.0, name='', **kwargs):
    """Single reflective coating on a substrate (multilayer.py:528-560):
    a 1-pair multilayer with vacuum top layer."""
    return Multilayer.create(
        bLayer=coating, bThickness=cThickness, idThickness=surfaceRoughness,
        nPairs=1, substrate=substrate, substRoughness=substRoughness,
        name=name, kind='mirror', **kwargs)
