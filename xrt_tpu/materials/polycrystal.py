"""Polycrystalline and multi-reflex crystal materials.

TPU-native re-implementation of the reference's OpenCL-only classes
Powder, CrystalHarmonics and MonoCrystal
(xrt/backends/raycing/materials/crystals_basic.py:443-540) and their
per-ray reflex loops in cl/OE.cl (reflect_powder:781, reflect_harmonics:727,
reflect_single_crystal:616).

Design notes (deliberately different from the CL kernels):

- The reflex list is a *static* table baked at ``create`` time; the
  per-(ray, reflex) amplitude is one broadcast call into
  :func:`~.crystal.two_beam_amplitude`, evaluated reflex-chunk by
  reflex-chunk under ``lax.scan`` so memory stays O(rays).
- The reference samples a reflex with a cumulative-sum walk over reflex
  intensities and one uniform; we use the equivalent Gumbel-max trick,
  which composes with the streaming scan (a running arg-max needs no
  normalization pass).
- CrystalHarmonics picks the arg-max reflex exactly like the CL code.
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physconsts import PI2, CH
from .crystal import CrystalFromCell, two_beam_amplitude

_REFLEX_CHUNK = 16


def _d_spacing_table(a, b, c, alpha, beta, gamma, hkl_table):
    """Triclinic d-spacings for an (R, 3) integer reflex table (host numpy;
    cf. get_distance in cl/materials.cl and crystals_basic.py:157-440)."""
    ar, br, gr = map(math.radians, (alpha, beta, gamma))
    ca, cb, cg = math.cos(ar), math.cos(br), math.cos(gr)
    sa, sb, sg = math.sin(ar), math.sin(br), math.sin(gr)
    V = a * b * c * (1 - ca**2 - cb**2 - cg**2 + 2*ca*cb*cg) ** 0.5
    h = hkl_table[:, 0].astype(float)
    k = hkl_table[:, 1].astype(float)
    l = hkl_table[:, 2].astype(float)
    inv_d2 = ((h * sa / a) ** 2 + (k * sb / b) ** 2 + (l * sg / c) ** 2 +
              2 * h * k * (ca * cb - cg) / (a * b) +
              2 * h * l * (ca * cg - cb) / (a * c) +
              2 * k * l * (cb * cg - ca) / (b * c)) * (a * b * c / V) ** 2
    return 1.0 / np.sqrt(np.maximum(inv_d2, 1e-300))


class _PolyCrystalMethods:
    """Shared machinery: batched structure factors over an arbitrary reflex
    sub-table and the streaming per-ray reflex interaction."""

    # Powder sets True: its "surface" is the crystallite plane itself, so
    # the deflection normal must flip together with the plane normal
    # (otherwise crystallites facing down-beam pass straight while keeping
    # full Bragg amplitude — the reference CL kernel flips only planeNormal,
    # OE.cl:389-392, losing half of every Debye-Scherrer cone)
    _flipSurfWithPlane = False

    def reflex_tables(self):
        """(hkl (R,3) int, d (R,) float) static numpy tables."""
        raise NotImplementedError

    def _chi_batch(self, E, hkl_chunk, d_chunk):
        """chi0 (N,1), chih/chih_ (N, r) for a chunk of reflexes.
        Vectorized analogue of CrystalFromCell.get_structure_factor
        (crystals_basic.py:424-440) with hkl as data, then the conjugation
        of get_F_chi (crystal.py:285-294)."""
        el_by_Z = {el.Z: el for el in self.elements}
        E = jnp.asarray(E)[:, None]                    # (N,1)
        stol = 0.5 / d_chunk[None, :]                  # (1,r)
        cdt = jnp.result_type(E.dtype, jnp.complex64)
        from .. import config as _config
        F0 = _config.czeros(E.shape, cdt)
        Fhkl = _config.czeros((E.shape[0], d_chunk.shape[0]), cdt)
        Fhkl_ = jnp.zeros_like(Fhkl)
        cache = {}
        for i, Z in enumerate(self.atoms_Z):
            el = el_by_Z[Z]
            if Z in cache:
                f0, anom = cache[Z]
            else:
                f0 = el.get_f0(stol)                   # (1,r)
                anom = el.get_f1f2(E)                  # (N,1)
                cache[Z] = (f0, anom)
            af = self.atomsFraction[i]
            F0 = F0 + af * (Z + anom) * self.factDW
            fact = af * (f0 + anom) * self.factDW      # (N,r)
            phase = PI2 * (self.atomsXYZ[i] @ hkl_chunk.T)[None, :]  # (1,r)
            expiHr = jnp.cos(phase) + 1j * jnp.sin(phase)
            Fhkl = Fhkl + fact * expiHr
            Fhkl_ = Fhkl_ + fact / expiHr
        waveLength = CH / E
        chiToFlambdaSquare = self.chiToF * waveLength ** 2  # (N,1)
        return (jnp.conj(F0) * chiToFlambdaSquare,
                jnp.conj(Fhkl) * chiToFlambdaSquare,
                jnp.conj(Fhkl_) * chiToFlambdaSquare)

    def _plane_normals(self, hkl_chunk, nb):
        """Unit Bragg-plane normal per (ray, reflex) for a reflex chunk.
        Default: the nominal normal *nb* for every reflex (powder crystallite
        or harmonics of one reflex)."""
        nbx, nby, nbz = nb
        r = hkl_chunk.shape[0]
        shp = (nbx.shape[0], r)
        return (jnp.broadcast_to(nbx[:, None], shp),
                jnp.broadcast_to(nby[:, None], shp),
                jnp.broadcast_to(nbz[:, None], shp))

    def _select(self, key, score):
        """Per-ray reflex score to maximize; powder/monocrystal add Gumbel
        noise for categorical-by-intensity sampling (the CL kernels'
        cumulative-sum walk, reflect_powder:1010-1040), harmonics overrides
        with plain arg-max."""
        g = jax.random.gumbel(key, score.shape, score.dtype)
        return jnp.log(jnp.maximum(score, 1e-300)) + g

    def reflect_multi_hkl(self, key, E, abc, nb, ns):
        """One streaming pass over the reflex table: returns
        (a, b, c, curveS, curveP) of the per-ray selected reflex.

        *abc*: incoming directions (3 arrays (N,)); *nb*: nominal plane
        normal; *ns*: surface normal (equal to *nb* for powder, cf.
        reflect.py:754-765 where oeNormal has only 3 components)."""
        hkl_table, d_table = self.reflex_tables()
        R = hkl_table.shape[0]
        nchunks = (R + _REFLEX_CHUNK - 1) // _REFLEX_CHUNK
        pad = nchunks * _REFLEX_CHUNK - R
        hkl_p = np.concatenate(
            [hkl_table, np.zeros((pad, 3), hkl_table.dtype)])
        d_p = np.concatenate([d_table, np.ones(pad, d_table.dtype)])
        valid_p = np.concatenate(
            [np.ones(R, bool), np.zeros(pad, bool)])
        a, b, c = abc
        nsx, nsy, nsz = ns
        E = jnp.asarray(E)
        dt = a.dtype
        cdt = jnp.result_type(dt, jnp.complex64)
        isLaue = self.geom.startswith('Laue')
        sig = 1.0 if isLaue else -1.0
        beamInDotSurf = a * nsx + b * nsy + c * nsz
        kg = jax.random.fold_in(key, 7)

        def one_chunk(carry, inp):
            ic, hklc, dc, validc = inp
            bestScore, bA, bB, bC, bS, bP = carry
            dcj = jnp.asarray(dc, dt)
            chi0, chih, chih_ = self._chi_batch(E, hklc, dcj)
            px, py, pz = self._plane_normals(hklc, nb)
            # flip so the beam hits the planes from "above"
            # (reflect_crystal_internal, OE.cl:389-392)
            pdot = a[:, None] * px + b[:, None] * py + c[:, None] * pz
            flip = jnp.where(pdot > 0, -1.0, 1.0)
            px, py, pz, pdot = px * flip, py * flip, pz * flip, \
                pdot * jnp.where(pdot > 0, -1.0, 1.0)
            if self._flipSurfWithPlane:
                nsxr, nsyr, nszr = px, py, pz
                bInS = pdot
            else:
                nsxr = jnp.broadcast_to(nsx[:, None], px.shape)
                nsyr = jnp.broadcast_to(nsy[:, None], px.shape)
                nszr = jnp.broadcast_to(nsz[:, None], px.shape)
                bInS = jnp.broadcast_to(beamInDotSurf[:, None], px.shape)
            # crystal "grating" vector in the surface (OE.cl:421-425)
            nDotNs = px * nsxr + py * nsyr + pz * nszr
            wHd = 1e7 / dcj[None, :]
            gx = (px - nDotNs * nsxr) * wHd
            gy = (py - nDotNs * nsyr) * wHd
            gz = (pz - nDotNs * nszr) * wHd
            orderLambda = (CH / E * 1e-7)[:, None]
            bInG = a[:, None] * gx + b[:, None] * gy + c[:, None] * gz
            G2 = gx ** 2 + gy ** 2 + gz ** 2
            u = bInS ** 2 - 2 * bInG * orderLambda - G2 * orderLambda ** 2
            dn = bInS + sig * jnp.sqrt(jnp.abs(u))
            aO = a[:, None] - nsxr * dn + gx * orderLambda
            bO = b[:, None] - nsyr * dn + gy * orderLambda
            cO = c[:, None] - nszr * dn + gz * orderLambda
            norm = jnp.sqrt(aO ** 2 + bO ** 2 + cO ** 2)
            aO, bO, cO = aO / norm, bO / norm, cO / norm
            bOutDotSurf = aO * nsxr + bO * nsyr + cO * nszr
            sinThB = jnp.clip((CH / E)[:, None] / (2 * dcj[None, :]),
                              -1 + 1e-16, 1 - 1e-16)
            thetaB = jnp.arcsin(sinThB)
            curveS, curveP = two_beam_amplitude(
                E[:, None], bInS, bOutDotSurf, pdot,
                dcj[None, :], chi0, chih, chih_, thetaB, self.t, self.geom)
            curveS = jnp.where(jnp.isnan(jnp.abs(curveS)), 0.0, curveS)
            curveP = jnp.where(jnp.isnan(jnp.abs(curveP)), 0.0, curveP)
            intensity = jnp.abs(curveS) ** 2 + jnp.abs(curveP) ** 2
            keyc = jax.random.fold_in(kg, ic)
            score = self._select(keyc, intensity)
            score = jnp.where(validc[None, :], score, -jnp.inf)
            cbest = jnp.argmax(score, axis=1)
            csc = jnp.take_along_axis(score, cbest[:, None], 1)[:, 0]
            upd = csc > bestScore
            take = lambda v: jnp.take_along_axis(v, cbest[:, None], 1)[:, 0]
            carry = (jnp.where(upd, csc, bestScore),
                     jnp.where(upd, take(aO), bA),
                     jnp.where(upd, take(bO), bB),
                     jnp.where(upd, take(cO), bC),
                     jnp.where(upd, take(curveS), bS),
                     jnp.where(upd, take(curveP), bP))
            return carry, None

        init = (jnp.full_like(a, -jnp.inf), a, b, c,
                jnp.zeros_like(a, cdt), jnp.zeros_like(a, cdt))
        xs = (jnp.arange(nchunks),
              jnp.asarray(hkl_p.reshape(nchunks, _REFLEX_CHUNK, 3), dt),
              jnp.asarray(d_p.reshape(nchunks, _REFLEX_CHUNK), dt),
              jnp.asarray(valid_p.reshape(nchunks, _REFLEX_CHUNK)))
        carry, _ = jax.lax.scan(one_chunk, init, xs)
        _, bA, bB, bC, bS, bP = carry
        return bA, bB, bC, bS, bP


@struct.dataclass
class Powder(_PolyCrystalMethods, CrystalFromCell):
    """Random-orientation polycrystal (crystals_basic.py:443-476).  *hkl*
    bounds the reflex set: all [mnp] with 0<=m<=h, 0<=n<=k, 0<=p<=l except
    [000]; *chi* limits the crystallite azimuth distribution."""
    chi: Tuple[float, float] = struct.field(
        pytree_node=False, default=(0.0, 0.5 * math.pi))
    _flipSurfWithPlane = True

    @classmethod
    def create(cls, chi=(0.0, 0.5 * math.pi), **kwargs):
        mat = super(Powder, cls).create(**kwargs)
        return mat.replace(kind='powder', chi=tuple(float(v) for v in chi))

    def reflex_tables(self):
        h, k, l = self.hkl
        m, n, p = np.meshgrid(np.arange(h + 1), np.arange(k + 1),
                              np.arange(l + 1), indexing='ij')
        tab = np.stack([m.ravel(), n.ravel(), p.ravel()], axis=1)
        tab = tab[np.abs(tab).sum(1) > 0].astype(np.int32)
        d = _d_spacing_table(self.a, self.b_, self.c, self.alpha, self.beta,
                             self.gamma, tab)
        return tab, d

    def random_orientation(self, key, nrays, dtype):
        """Sample crystallite normals: theta = arccos(U), chi uniform in the
        *chi* window (base.py:1304-1320 local_n_random)."""
        k1, k2 = jax.random.split(key)
        cosY = jax.random.uniform(k1, (nrays,), dtype)
        sinY = jnp.sqrt(1.0 - cosY ** 2)
        zAng = self.chi[0] + (self.chi[1] - self.chi[0]) * \
            jax.random.uniform(k2, (nrays,), dtype)
        # start from (0,0,1); rotate_y then rotate_z as in the reference
        ax, cz = sinY, cosY                       # rotate_y(0, 1)
        a2 = ax * jnp.cos(zAng)                   # rotate_z(ax, 0)
        b2 = ax * jnp.sin(zAng)
        return a2, b2, cz


@struct.dataclass
class CrystalHarmonics(_PolyCrystalMethods, CrystalFromCell):
    """n*[hkl] for n=1..Nmax; the brightest harmonic wins
    (crystals_basic.py:479-506, reflect_harmonics OE.cl:727-779)."""
    Nmax: int = struct.field(pytree_node=False, default=3)

    @classmethod
    def create(cls, Nmax=3, **kwargs):
        mat = super(CrystalHarmonics, cls).create(**kwargs)
        return mat.replace(kind='crystal harmonics', Nmax=int(Nmax))

    def reflex_tables(self):
        base = np.asarray(self.hkl, np.int32)
        tab = np.stack([n * base for n in range(1, self.Nmax + 1)])
        d = _d_spacing_table(self.a, self.b_, self.c, self.alpha, self.beta,
                             self.gamma, tab)
        return tab, d

    def _select(self, key, score):
        return score  # arg-max, no sampling (OE.cl:765-770)


@struct.dataclass
class MonoCrystal(_PolyCrystalMethods, CrystalFromCell):
    """Single-crystal diffraction pattern: all reflexes [-Nmax..Nmax]^3 of a
    crystal cut along *hkl*, one sampled per ray by intensity
    (crystals_basic.py:508-540, reflect_single_crystal OE.cl:616-724)."""
    Nmax: int = struct.field(pytree_node=False, default=3)

    @classmethod
    def create(cls, Nmax=3, **kwargs):
        mat = super(MonoCrystal, cls).create(**kwargs)
        return mat.replace(kind='monocrystal', Nmax=int(Nmax))

    def reflex_tables(self):
        n = self.Nmax
        rng = np.arange(-n, n + 1)
        m, k, p = np.meshgrid(rng, rng, rng, indexing='ij')
        tab = np.stack([m.ravel(), k.ravel(), p.ravel()], axis=1)
        tab = tab[np.abs(tab).sum(1) > 0].astype(np.int32)
        d = _d_spacing_table(self.a, self.b_, self.c, self.alpha, self.beta,
                             self.gamma, tab)
        return tab, d

    def _plane_normals(self, hkl_chunk, nb):
        """Rotate each reflex direction by the rotation taking the cut
        normal [hkl] onto the local plane normal (quaternion construction
        in reflect_single_crystal, OE.cl:644-655; here Rodrigues, cubic
        symmetry so reciprocal directions == real directions)."""
        nbx, nby, nbz = nb
        dt = nbx.dtype
        cut = np.asarray(self.hkl, float)
        cut = cut / np.linalg.norm(cut)
        ux, uy, uz = (jnp.asarray(v, dt) for v in cut)
        # axis = cut x n, angle = acos(cut . n), per ray
        kx = uy * nbz - uz * nby
        ky = uz * nbx - ux * nbz
        kz = ux * nby - uy * nbx
        kn = jnp.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
        degenerate = kn < 1e-12
        kn_s = jnp.where(degenerate, 1.0, kn)
        kx, ky, kz = kx / kn_s, ky / kn_s, kz / kn_s
        cosA = jnp.clip(ux * nbx + uy * nby + uz * nbz, -1.0, 1.0)
        sinA = kn
        hn = jnp.sqrt(jnp.sum(jnp.asarray(hkl_chunk, dt) ** 2, axis=1))
        hn = jnp.where(hn == 0, 1.0, hn)
        e = jnp.asarray(hkl_chunk, dt) / hn[:, None]
        ex = e[:, 0][None, :]
        ey = e[:, 1][None, :]
        ez = e[:, 2][None, :]
        kxc, kyc, kzc = kx[:, None], ky[:, None], kz[:, None]
        cA, sA = cosA[:, None], sinA[:, None]
        kDotE = kxc * ex + kyc * ey + kzc * ez
        crx = kyc * ez - kzc * ey
        cry = kzc * ex - kxc * ez
        crz = kxc * ey - kyc * ex
        px = ex * cA + crx * sA + kxc * kDotE * (1 - cA)
        py = ey * cA + cry * sA + kyc * kDotE * (1 - cA)
        pz = ez * cA + crz * sA + kzc * kDotE * (1 - cA)
        deg = degenerate[:, None]
        sgn = jnp.sign(cosA)[:, None]  # anti-parallel cut: mirror
        px = jnp.where(deg, ex * sgn, px)
        py = jnp.where(deg, ey * sgn, py)
        pz = jnp.where(deg, ez * sgn, pz)
        return px, py, pz
