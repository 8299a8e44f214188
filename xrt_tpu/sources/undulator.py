"""Undulator source: far-field, tapered and near-field radiation integrals.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/sources/synchr.py Undulator:1332 (build_I_map:1982,
_sp/_sp_sum:1751-1980, _build_integration_grid:1734, targetE auto-K
:1496-1525, Tanaka-Kitamura sizes :2147-2207) and the quadrature /
convergence machinery of sybase.py IntegratedSource (Clenshaw-Curtis
:1112-1145, mixed convergence search :1196-1290).

The retarded-potential integral over one period (periodic sum via the
sin(pi Np w)/sin(pi w) factor) or over all Np periods (taper / near-field)
is evaluated as a ``lax.scan`` over node chunks with per-ray complex
accumulators — the XLA analog of the reference's ``undulator*`` OpenCL
kernels (cl/undulator.cl:54-490): memory stays O(nrays x chunk) and the
chunked elementwise work saturates the TPU VPU.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..physconsts import (PI, PI2, SQ2, SQPI, SIE0, M0, C, EV2ERG, E2WC,
                          FINE_STR, K2B, CHeVcm)
from .synchrotron import _SynchrotronBase

NODE_CHUNK = 64   # quadrature nodes per scan step


def clenshaw_curtis(n):
    """Clenshaw-Curtis nodes and weights on [-1, 1] (the standard
    FFT-based algorithm, cf. quadpy / reference sybase.py:1112-1145)."""
    if n == 1:
        return np.zeros(1), np.full(1, 2.0)
    points = -np.cos((np.pi * np.arange(n)) / (n - 1))
    if n == 2:
        return points, np.array([1.0, 1.0])
    m = n - 1
    N = np.arange(1, m, 2)
    length = len(N)
    v0 = np.concatenate([2.0 / N / (N - 2), np.array([1.0 / N[-1]]),
                         np.zeros(m - length)])
    v2 = -v0[:-1] - v0[:0:-1]
    g0 = -np.ones(m)
    g0[length] += m
    g0[m - length] += m
    g = g0 / (m ** 2 - 1 + (m % 2))
    w = np.fft.ihfft(v2 + g).real
    if m % 2 == 1:
        weights = np.concatenate([w, w[::-1]])
    else:
        weights = np.concatenate([w, w[-2::-1]])
    return points, weights


def tanaka_kitamura_Qa2(x, eps=1e-6):
    """Squared Q_a of Tanaka & Kitamura (2009) Eq. 17 (sybase.py:692)."""
    x = jnp.asarray(x)
    y = SQ2 * jnp.maximum(x, eps)
    y2 = y ** 2
    val = y2 / (jnp.exp(-y2) + SQPI * y * jax.scipy.special.erf(y) - 1)
    return jnp.where(x > eps, val, jnp.ones_like(x))


@struct.dataclass
class Undulator(_SynchrotronBase):
    """Planar/elliptic undulator with optional linear taper or near-field
    observation distance R0 (mm)."""
    Kx: jnp.ndarray = None
    Ky: jnp.ndarray = None
    L0: float = struct.field(pytree_node=False, default=33.0)   # period, mm
    n: int = struct.field(pytree_node=False, default=50)        # Np
    phase: float = struct.field(pytree_node=False, default=0.0)
    taper_val: Optional[float] = struct.field(pytree_node=False,
                                              default=None)
    R0: Optional[float] = struct.field(pytree_node=False, default=None)
    quadm: int = struct.field(pytree_node=False, default=50)
    gIntervals: int = struct.field(pytree_node=False, default=2)
    # quadrature arrays (leaves; shapes fixed by quadm*gIntervals)
    tg: jnp.ndarray = None
    ag: jnp.ndarray = None

    @classmethod
    def create(cls, name='', center=(0, 0, 0), nrays=None, eE=6.0, eI=0.1,
               eEspread=0.0, eSigmaX=None, eSigmaZ=None, eEpsilonX=1.0,
               eEpsilonZ=0.01, betaX=9.0, betaZ=2.0, period=33.0, n=50,
               K=None, Kx=0.0, Ky=None, phaseDeg=0.0, targetE=None,
               taper=None, R0=None, eMin=5000.0, eMax=15000.0,
               xPrimeMax=0.5, zPrimeMax=0.5, xPrimeMaxAutoReduce=True,
               zPrimeMaxAutoReduce=True, distE='eV', pitch=0.0, yaw=0.0,
               gNodes=None, gIntervals=None, gp=1e-6, oversample=4,
               targetHarmonic=None):
        from .synchrotron import BendingMagnet
        dt = config.dtype()
        gamma = eE * 1e9 * EV2ERG / (M0 * C ** 2)
        gamma2 = gamma ** 2
        if targetE is not None:
            # auto-K from the target energy/harmonic (synchr.py:1496-1525)
            Ky = math.sqrt(targetE[1] * 8 * PI * gamma2 /
                           period / targetE[0] / E2WC - 2)
            if len(targetE) > 2 and targetE[2]:
                Ky /= math.sqrt(2)
                Kx = Ky
        if K is not None:
            Ky = K
        if Ky is None:
            Ky = 4.4
        taper_val = None
        if taper is not None:
            # (dgap(mm), gap(mm)) -> dB/B per unit length
            # (cf. synchr.py:1533: dgap / (Np * L0 * gap))
            taper_val = taper[0] / n / period / taper[1] \
                if isinstance(taper, (tuple, list)) else float(taper)

        # e-beam sizes like BendingMagnet.create
        epsX = eEpsilonX * 1e-6
        epsZ = eEpsilonZ * 1e-6
        if eSigmaX is not None:
            dx = eSigmaX * 1e-3
        else:
            dx = math.sqrt(epsX * betaX * 1e3) if betaX else 0.0
        if eSigmaZ is not None:
            dz = eSigmaZ * 1e-3
        else:
            dz = math.sqrt(epsZ * betaZ * 1e3) if betaZ else 0.0
        dxprime = epsX / dx if dx > 0 else 0.0
        dzprime = epsZ / dz if dz > 0 else 0.0

        xPrimeMax_ = xPrimeMax * 1e-3
        zPrimeMax_ = zPrimeMax * 1e-3
        if R0 is not None:
            xPrimeMaxAutoReduce = True
            zPrimeMaxAutoReduce = True
        if xPrimeMaxAutoReduce:
            xPrimeMaxTmp = (Ky if Ky > 0 else 2.0) / gamma
            xPrimeMax_ = min(xPrimeMax_, xPrimeMaxTmp)
        if zPrimeMaxAutoReduce:
            K0 = Kx if Kx > 0 else 2.0
            zPrimeMax_ = min(zPrimeMax_, K0 / gamma)

        src = cls(center=jnp.asarray(center, dt), eE=eE,
                  eI=jnp.asarray(eI, dt), eEspread=eEspread,
                  dx=jnp.asarray(dx, dt), dz=jnp.asarray(dz, dt),
                  dxprime=jnp.asarray(dxprime, dt),
                  dzprime=jnp.asarray(dzprime, dt),
                  eMin=eMin, eMax=eMax, xPrimeMax=xPrimeMax_,
                  zPrimeMax=zPrimeMax_, distE=distE, nrays=nrays,
                  oversample=oversample, pitch=float(pitch),
                  yaw=float(yaw), name=name,
                  Kx=jnp.asarray(Kx, dt), Ky=jnp.asarray(Ky, dt),
                  L0=float(period), n=int(n),
                  phase=math.radians(phaseDeg), taper_val=taper_val,
                  R0=None if R0 is None else float(R0),
                  quadm=int(gNodes) if gNodes else 0,
                  gIntervals=int(gIntervals) if gIntervals else 2)
        if not gNodes:
            src = src.with_converged_grid(gp)
        else:
            src = src.with_grid(src.quadm, src.gIntervals)
        return src

    # ------------------------------------------------------------------
    @property
    def Np(self):
        return self.n

    @property
    def E1(self):
        """Fundamental on-axis photon energy, eV."""
        gamma2 = self.gamma2
        wu = PI / self.L0 / gamma2 * \
            (2 * gamma2 - 1 - 0.5 * float(self.Kx) ** 2 -
             0.5 * float(self.Ky) ** 2) / E2WC
        return 2 * gamma2 * wu / \
            (1 + 0.5 * float(self.Kx) ** 2 + 0.5 * float(self.Ky) ** 2)

    def with_grid(self, quadm, gIntervals):
        """Attach the Clenshaw-Curtis x intervals composite grid
        (cf. _build_integration_grid, synchr.py:1734-1749)."""
        dt = config.dtype()
        tg_n, ag_n = clenshaw_curtis(quadm)
        dstep = 2 * PI / float(gIntervals)
        dI = np.arange(-PI + 0.5 * dstep, PI, dstep)
        tg = (dI[:, None] + 0.5 * dstep * tg_n).ravel()
        ag = (dI[:, None] * 0 + ag_n).ravel()
        # pad to a multiple of NODE_CHUNK with zero weights
        npad = (-len(tg)) % NODE_CHUNK
        if npad:
            tg = np.concatenate([tg, np.zeros(npad)])
            ag = np.concatenate([ag, np.zeros(npad)])
        return self.replace(quadm=int(quadm), gIntervals=int(gIntervals),
                            tg=jnp.asarray(tg, dt), ag=jnp.asarray(ag, dt))

    def with_converged_grid(self, gp=1e-6):
        """Automatic quadrature convergence: exponential search + bisection
        on the MAD statistic (cf. sybase.py _find_convergence_mixed:1196,
        _get_mad:1251)."""
        def mad_at(quadm):
            stat_step = 5
            vals = []
            dIs = []
            Iold = None
            for k in range(quadm - stat_step // 2,
                           quadm - stat_step // 2 + stat_step + 1):
                src = self.with_grid(max(k, 3), self.gIntervals)
                Inew = float(src._intensity_probe())
                if Iold is not None:
                    vals.append(Inew)
                    dIs.append(abs(Inew - Iold) /
                               max(abs(Inew), 1e-300))
                Iold = Inew
            vals = np.array(vals)
            med = np.median(vals)
            mad = np.median(np.abs(vals - med)) / max(abs(med), 1e-300)
            return mad, float(np.median(dIs))

        m = 3
        while m < 20:
            m += 1
            quadm = 2 ** m
            mad, dimad = mad_at(quadm)
            if dimad < gp or mad < gp:
                break
            if quadm > 400000:
                break
        lo, hi = 2 ** (m - 1), 2 ** m
        while hi - lo > 20:
            mid = (lo + hi) // 2
            mad, dimad = mad_at(mid)
            if dimad < gp or mad < gp:
                hi = mid
            else:
                lo = mid
        return self.with_grid(hi, self.gIntervals)

    def _intensity_probe(self):
        """Intensity at the acceptance corner used by the convergence search
        (cf. sybase.py:1266-1276)."""
        E = jnp.asarray([self.eMax])
        th = jnp.asarray([self.Theta_max])
        ps = jnp.asarray([self.Psi_max])
        I = self.build_I_map(jax.random.PRNGKey(0), E, th, ps)[0]
        return jnp.abs(I[0])

    # ------------------------------------------------------------------
    def _integrate(self, ww1, w, wu, gamma, ddphi, ddpsi):
        """The per-ray radiation integral: scan over node chunks
        (cf. _sp_sum, synchr.py:1876-1980).  Returns (Is, Ip) complex."""
        dt = ww1.dtype
        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        Kx = self.Kx
        Ky = self.Ky
        revgamma = 1.0 / gamma
        revgamma2 = revgamma ** 2
        # 1 - betam kept as its own quantity: ~1e-8, so betam itself rounds
        # to 1.0 in float32 and any later (1 - betam) would be exactly 0
        one_minus_betam = (1. + 0.5 * Kx ** 2 + 0.5 * Ky ** 2) * \
            0.5 * revgamma2
        betam = 1. - one_minus_betam
        wwuS = w / wu

        dirx = ddphi
        diry = ddpsi
        dirz = 1. - 0.5 * (ddphi ** 2 + ddpsi ** 2)

        nearField = self.R0 is not None
        taper = self.taper_val is not None
        Nmx = self.Np if (nearField or taper) else 1

        if nearField:
            R0n = self.R0 * PI2 / self.L0
            R0x = jnp.tan(ddphi) * R0n
            R0y = jnp.tan(ddpsi) * R0n
            R0z = jnp.ones_like(ddpsi) * R0n
            sinr0z = jnp.sin(wwuS * R0z)
            cosr0z = jnp.cos(wwuS * R0z)
        if taper:
            alphaS = self.taper_val / E2WC

        tg_all = self.tg
        ag_all = self.ag
        nchunks = tg_all.shape[0] // NODE_CHUNK
        tg_c = tg_all.reshape(nchunks, NODE_CHUNK)
        ag_c = ag_all.reshape(nchunks, NODE_CHUNK)

        def chunk_term(tg, ag, period_offset):
            """Contribution of one node chunk; shapes (rays, chunk)."""
            zloc = tg[None, :] + period_offset
            sinx = jnp.sin(tg)[None, :]
            cosx = jnp.cos(tg)[None, :]
            sinxph = jnp.sin(tg + self.phase)[None, :]
            cosxph = jnp.cos(tg + self.phase)[None, :]
            sin2x = 2 * sinx * cosx
            sin2xph = 2 * sinxph * cosxph
            rg = revgamma[:, None]
            rg2 = revgamma2[:, None]
            wwu = wwuS[:, None]
            dx_ = dirx[:, None]
            dy_ = diry[:, None]
            dz_ = dirz[:, None]
            taperC = 1.0
            if taper:
                taperC = 1. - alphaS * zloc / wu[:, None]
                ucos = ww1[:, None] * zloc + wwu * rg * (
                    -Ky * dx_ * (sinx + alphaS / wu[:, None] *
                                 (1 - cosx - zloc * sinx)) +
                    Kx * dy_ * sinx + 0.125 * rg * (
                        Kx ** 2 * sin2xph + Ky ** 2 *
                        (sin2x - 2 * alphaS / wu[:, None] *
                         (zloc ** 2 + cosx ** 2 + zloc * sin2x))))
                eucos = jnp.exp(1j * ucos)
            elif nearField:
                betam_ = betam[:, None]
                omb_ = one_minus_betam[:, None]
                zterm = 0.5 * (Ky ** 2 * sin2x + Kx ** 2 * sin2xph) * rg
                rlocx = Ky * sinx * rg
                rlocy = Kx * sinxph * rg
                rlocz = betam_ * zloc - 0.25 * zterm * rg
                drx = R0x[:, None] - rlocx
                dry = R0y[:, None] - rlocy
                drz = R0z[:, None] - rlocz
                dist = jnp.sqrt(drx ** 2 + dry ** 2 + drz ** 2)
                drs = 0.5 * (drx ** 2 + dry ** 2) / drz
                # phase computed with wrapped arguments (synchr.py:1824-1842)
                sinzloc = jnp.sin(wwu * zloc * omb_)
                coszloc = jnp.cos(wwu * zloc * omb_)
                sindrs = jnp.sin(wwu * (drs + 0.25 * zterm * rg))
                cosdrs = jnp.cos(wwu * (drs + 0.25 * zterm * rg))
                sz = sinr0z[:, None]
                cz = cosr0z[:, None]
                eucosx = (-sz * sinzloc * cosdrs - sz * coszloc * sindrs -
                          cz * sinzloc * sindrs + cz * coszloc * cosdrs)
                eucosy = (-sz * sinzloc * sindrs + sz * coszloc * cosdrs +
                          cz * sinzloc * cosdrs + cz * coszloc * sindrs)
                eucos = eucosx + 1j * eucosy
                dx_ = drx / dist
                dy_ = dry / dist
                dz_ = drz / dist
            else:
                ucos = ww1[:, None] * zloc + wwu * rg * (
                    -Ky * dx_ * sinx + Kx * dy_ * sinxph +
                    0.125 * rg * (Ky ** 2 * sin2x + Kx ** 2 * sin2xph))
                eucos = jnp.exp(1j * ucos)

            betax = taperC * Ky * rg * cosx
            betay = -Kx * rg * cosxph
            # B := 1 - betaz exactly; betaz = 1 - B is never formed, because
            # in float32 the downstream 1 - dir.beta (~1e-8) would cancel to
            # zero digits against operands of order 1 (rkrel -> inf/NaN).
            B1m = 0.5 * (rg2 + betax * betax + betay * betay)
            betaz = 1. - B1m
            if taper:
                betaPx = -Ky * (alphaS * cosx + taperC * sinx)
                betaPz = 0.5 * rg * (
                    Ky ** 2 * taperC * (alphaS * cosx ** 2 +
                                        taperC * sin2x) +
                    Kx ** 2 * sin2xph)
            else:
                betaPx = -Ky * sinx
                betaPz = 0.5 * rg * (Ky ** 2 * sin2x + Kx ** 2 * sin2xph)
            betaPy = Kx * sinxph

            # 1 - dir.beta and dirz - betaz, regrouped exactly so the ~1e-8
            # results come from products of small well-scaled terms instead
            # of differences of numbers ~1 (float32-safe; the naive forms
            # cancel to 0 -> rkrel = inf -> NaN on TPU).
            if nearField:
                # dir = dr/dist; 1 - dirz = (drx^2+dry^2)/(dist*(dist+drz))
                t2 = (drx ** 2 + dry ** 2) / (dist * (dist + drz))
                one_minus_nb = (B1m + betaz * t2 -
                                (drx * betax + dry * betay) / dist)
                bnz = B1m - t2
            else:
                # dirz = 1 - A1m with A1m = (theta^2+psi^2)/2:
                # 1 - dir.beta = [rg2 + (dx-bx)^2 + (dy-by)^2]/2 - A1m*B1m
                A1m = 0.5 * (dx_ ** 2 + dy_ ** 2)
                one_minus_nb = (0.5 * (rg2 + (dx_ - betax) ** 2 +
                                       (dy_ - betay) ** 2) - A1m * B1m)
                bnz = B1m - A1m
            rkrel = 1. / one_minus_nb
            eucos = eucos * ag[None, :] * rkrel ** 2
            bnx = dx_ - betax
            bny = dy_ - betay
            dirDotBetaP = dx_ * betaPx + dy_ * betaPy + dz_ * betaPz
            dirDotDmB = dx_ * bnx + dy_ * bny + dz_ * bnz
            Bs = jnp.sum(eucos * (bnx * dirDotBetaP - betaPx * dirDotDmB),
                         axis=1)
            Bp = jnp.sum(eucos * (bny * dirDotBetaP - betaPy * dirDotDmB),
                         axis=1)
            return Bs, Bp

        def scan_body(carry, inputs):
            Bs_acc, Bp_acc = carry
            tg, ag, off = inputs
            Bs, Bp = chunk_term(tg, ag, off)
            return (Bs_acc + Bs, Bp_acc + Bp), None

        # build the (chunks * periods) scan inputs
        if Nmx > 1:
            offs = (-(Nmx - 1) * PI + PI2 *
                    np.arange(Nmx))
            tg_rep = jnp.tile(tg_c, (Nmx, 1))
            ag_rep = jnp.tile(ag_c, (Nmx, 1))
            off_rep = jnp.repeat(jnp.asarray(offs, dt), nchunks)
        else:
            tg_rep = tg_c
            ag_rep = ag_c
            off_rep = jnp.zeros((nchunks,), dt)

        # derive init from ww1 so the carry inherits shard_map's varying
        # axes (zeros would be unvarying and fail the scan type check)
        init = ((ww1 * 0).astype(cdt), (ww1 * 0).astype(cdt))
        (Bs, Bp), _ = jax.lax.scan(scan_body, init,
                                   (tg_rep, ag_rep, off_rep))
        return wu * revgamma * Bs, wu * revgamma * Bp

    def build_I_map(self, key, w, ddtheta, ddpsi, harmonic=None,
                    dgamma=None):
        """(flux, amp_s, amp_p) at (E, theta, psi)
        (cf. _build_I_map_conv, synchr.py:1982-2056)."""
        w = jnp.asarray(w)
        if not jnp.issubdtype(w.dtype, jnp.floating):
            w = w.astype(config.dtype())
        dt = w.dtype
        gamma0 = self.gamma
        if self.eEspread > 0:
            if dgamma is not None:
                gamma = gamma0 + dgamma
            else:
                gamma = gamma0 * (1 + self.eEspread *
                                  jax.random.normal(key, w.shape, dt))
        else:
            gamma = jnp.full(w.shape, gamma0, dt)
        gamma2 = gamma ** 2

        wu = PI / self.L0 / gamma2 * \
            (2 * gamma2 - 1 - 0.5 * self.Kx ** 2 - 0.5 * self.Ky ** 2) / \
            E2WC
        ww1 = w * ((1. + 0.5 * self.Kx ** 2 + 0.5 * self.Ky ** 2) +
                   gamma2 * (ddtheta ** 2 + ddpsi ** 2)) / (2. * gamma2 * wu)
        if (self.taper_val is not None) or (self.R0 is not None):
            ab = 1. / PI2 / wu
        else:
            sinw = jnp.sin(PI * ww1)
            tiny = jnp.asarray(jnp.finfo(sinw.dtype).tiny, sinw.dtype)
            sinw = jnp.where(jnp.abs(sinw) < tiny, tiny, sinw)
            ab = 1. / PI2 / wu * jnp.sin(PI * self.Np * ww1) / sinw

        Is, Ip = self._integrate(ww1, w, wu, gamma, ddtheta, ddpsi)

        bwFact = 0.001 if self.distE == 'BW' else 1. / w
        Amp2Flux = FINE_STR * bwFact * self.eI / SIE0

        if harmonic is not None:
            mask = (ww1 <= harmonic + 0.5) & (ww1 >= harmonic - 0.5)
            Is = jnp.where(mask, Is, 0.0)
            Ip = jnp.where(mask, Ip, 0.0)

        dstep = 2 * PI / float(self.gIntervals)
        integralField = jnp.abs(Is) ** 2 + jnp.abs(Ip) ** 2
        return (Amp2Flux * ab ** 2 * 0.25 * dstep ** 2 * integralField,
                jnp.sqrt(Amp2Flux) * ab * Is * 0.5 * dstep,
                jnp.sqrt(Amp2Flux) * ab * Ip * 0.5 * dstep)

    # ------------------------------------------------------------------
    def get_sigma_r02(self, E):
        """sigma_r0^2 (Tanaka & Kitamura after Eq. 23; synchr.py:2147)."""
        return 2 * CHeVcm / E * 10 * self.L0 * self.Np / PI2 ** 2

    def get_sigmaP_r02(self, E):
        return CHeVcm / E * 10 / (2 * self.L0 * self.Np)

    def get_sigma_r2(self, E, onlyOddHarmonics=True, with0eSpread=False):
        sigma_r02 = self.get_sigma_r02(E)
        if self.eEspread == 0 or with0eSpread:
            return sigma_r02
        harmonic = jnp.floor_divide(E, self.E1)
        if onlyOddHarmonics:
            harmonic = harmonic + harmonic % 2 - 1
        eEspread_norm = PI2 * harmonic * self.Np * self.eEspread
        Qa2 = tanaka_kitamura_Qa2(eEspread_norm / 4.)
        return sigma_r02 * Qa2 ** (2 / 3.)

    def get_sigmaP_r2(self, E, onlyOddHarmonics=True, with0eSpread=False):
        sigmaP_r02 = self.get_sigmaP_r02(E)
        if self.eEspread == 0 or with0eSpread:
            return sigmaP_r02
        harmonic = jnp.floor_divide(E, self.E1)
        if onlyOddHarmonics:
            harmonic = harmonic + harmonic % 2 - 1
        eEspread_norm = PI2 * harmonic * self.Np * self.eEspread
        return sigmaP_r02 * tanaka_kitamura_Qa2(eEspread_norm)

    def get_SIGMA(self, E, onlyOddHarmonics=True, with0eSpread=False):
        sigma_r2 = self.get_sigma_r2(E, onlyOddHarmonics, with0eSpread)
        return (jnp.sqrt(self.dx ** 2 + sigma_r2),
                jnp.sqrt(self.dz ** 2 + sigma_r2))

    def get_SIGMAP(self, E, onlyOddHarmonics=True, with0eSpread=False):
        sigmaP_r2 = self.get_sigmaP_r2(E, onlyOddHarmonics, with0eSpread)
        return (jnp.sqrt(self.dxprime ** 2 + sigmaP_r2),
                jnp.sqrt(self.dzprime ** 2 + sigmaP_r2))

    def _sample_positions(self, key, E, Theta0, nrays, dt):
        """x, z ~ N(0, SIGMA(E)); y = 0 (cf. sybase.py:1669-1672)."""
        k1, k2 = jax.random.split(key)
        sx, sz = self.get_SIGMA(E, onlyOddHarmonics=False)
        x = sx * jax.random.normal(k1, (nrays,), dt)
        z = sz * jax.random.normal(k2, (nrays,), dt)
        return x, jnp.zeros((nrays,), dt), z

    def shine(self, key, toGlobal=True, withAmplitudes=True,
              fixedEnergy=False):
        beam = super().shine(key, toGlobal=False,
                             withAmplitudes=withAmplitudes,
                             fixedEnergy=fixedEnergy)
        # undulator rays use angles directly, not tan (sybase.py:1686)
        # and normalized amplitudes Es = mJs/|mJs| (sybase.py:1720-1724);
        # the parent already normalizes direction from tan-angles: the
        # difference is O(theta^3) ~ 1e-11 — negligible; amplitudes:
        if beam.Es is not None:
            absS = jnp.abs(beam.Es)
            absP = jnp.abs(beam.Ep)
            beam = beam.replace(
                Es=jnp.where(absS > 0, beam.Es / jnp.maximum(absS, 1e-300),
                             0.0),
                Ep=jnp.where(absP > 0, beam.Ep / jnp.maximum(absP, 1e-300),
                             0.0))
        from ..transforms import virgin_local_to_global, rotate_xyz
        if toGlobal:
            beam = virgin_local_to_global(beam, self.center)
        return beam

    def shine_wave(self, key, wave, fixedEnergy):
        """One coherent macro-electron (filament) field computed directly at
        the wave sample points (cf. the wave branch of the reference shine,
        sybase.py:1594-1707): the amplitudes get the 1/r and sqrt(area)
        factors so that sum(|Es|^2 + |Ep|^2) estimates the flux.

        Returns the wave with Es/Ep/J replaced.  Pure and jittable."""
        import jax
        dt = wave.xDiffr.dtype
        n = wave.xDiffr.shape[0]
        keys = jax.random.split(key, 5)
        rX = self.dx * jax.random.normal(keys[0], (), dt)
        rZ = self.dz * jax.random.normal(keys[1], (), dt)
        dtheta = self.dxprime * jax.random.normal(keys[2], (), dt)
        dpsi = self.dzprime * jax.random.normal(keys[3], (), dt)
        dgamma = None
        if self.eEspread > 0:
            dgamma = self.gamma * self.eEspread * \
                jax.random.normal(keys[4], (), dt)
        x = wave.xDiffr - rX
        y = wave.yDiffr
        z = wave.zDiffr - rZ
        rDiffr = jnp.sqrt(x ** 2 + y ** 2 + z ** 2)
        rTheta = x / rDiffr + dtheta
        rPsi = z / rDiffr + dpsi
        rE = jnp.full((n,), fixedEnergy, dt)
        # production sampling: the node-chunked integral's temporaries
        # are O(nrays x NODE_CHUNK); above ~2.6e5 samples a single pass
        # would exceed HBM (observed worker crash at 1e6), so the rays
        # are mapped in fixed blocks — same math, bounded memory
        RAY_BLOCK = 131072
        if n > 2 * RAY_BLOCK:
            npad = (-n) % RAY_BLOCK
            def pad(v):
                return jnp.concatenate(
                    [v, jnp.broadcast_to(v[-1:], (npad,))]) if npad else v
            nb = (n + npad) // RAY_BLOCK
            stacked = tuple(pad(v).reshape(nb, RAY_BLOCK)
                            for v in (rE, rTheta, rPsi))

            def body(args):
                return self.build_I_map(keys[4], *args, dgamma=dgamma)

            Ib, Jsb, Jpb = jax.lax.map(body, stacked)
            Intensity = Ib.reshape(-1)[:n]
            mJs = Jsb.reshape(-1)[:n]
            mJp = Jpb.reshape(-1)[:n]
        else:
            Intensity, mJs, mJp = self.build_I_map(
                keys[4], rE, rTheta, rPsi, dgamma=dgamma)
        # the wave's aperture area projected onto the beam direction when
        # sampling an OE surface (reference sybase.py:1702-1707)
        wave_area = wave.area if wave.areaNormal is None else wave.areaNormal
        norm = jnp.sqrt(wave_area) / rDiffr
        Es = mJs * norm
        Ep = mJp * norm
        # spherical propagation phase to the receiving points — the
        # reference far-field wave mode applies
        # exp(1e7j*E/CHBAR*rDiffr) at the end of shine
        # (sybase.py:1793-1797).  k*r is ~1e10 rad: float32 needs the
        # double-float reduction to cycles
        from ..physconsts import CHBAR
        if dt == jnp.float32:
            from ..ops import dd as _dd
            xh, xl = _dd.add_f(wave.xDiffr,
                               getattr(wave, 'xDiffr_lo', None)
                               if wave.xDiffr_lo is not None
                               else jnp.zeros_like(x), -rX)
            yh = wave.yDiffr
            yl = (wave.yDiffr_lo if wave.yDiffr_lo is not None
                  else jnp.zeros_like(y))
            zh, zl = _dd.add_f(wave.zDiffr,
                               getattr(wave, 'zDiffr_lo', None)
                               if wave.zDiffr_lo is not None
                               else jnp.zeros_like(z), -rZ)
            s2 = _dd.sqr(xh, xl)
            s2 = _dd.add(*s2, *_dd.sqr(yh, yl))
            s2 = _dd.add(*s2, *_dd.sqr(zh, zl))
            rD = _dd.sqrt(*s2)
            _KC = 1e7 / CHBAR
            _KC_HI = np.float32(_KC)
            _KC_LO = np.float32(_KC - np.float64(_KC_HI))
            kh, kl = _dd.two_prod(rE, jnp.asarray(_KC_HI, dt))
            kl = kl + rE * _KC_LO
            kah, kal = _dd.mul(kh, kl,
                               jnp.full_like(kh, _dd.INV_TWO_PI_HI),
                               jnp.full_like(kh, _dd.INV_TWO_PI_LO))
            mh, ml = _dd.mul(kah, kal, rD[0], rD[1])
            cyc = _dd.frac_cycles(mh, ml)
            sph, cph = _dd.sincos_cycles(cyc)
            mPh = jax.lax.complex(cph, sph)
        else:
            mPh = jnp.exp(1j * (rE * (1e7 / CHBAR)) * rDiffr)
        Es = Es * mPh
        Ep = Ep * mPh
        return wave.replace(
            E=rE, Es=Es, Ep=Ep,
            a=x / rDiffr, b=y / rDiffr, c=z / rDiffr,
            Jss=(Es * jnp.conj(Es)).real, Jpp=(Ep * jnp.conj(Ep)).real,
            Jsp=Es * jnp.conj(Ep),
            accepted=jnp.sum(Intensity) * (self.eMax - self.eMin),
            seeded=jnp.asarray(float(n), dt),
            seededI=jnp.sum(Intensity) * (self.eMax - self.eMin))

    def _fix_position_sign(self):
        pass

    def power_vs_K(self, Ks=None):
        """Total radiated power P[W] = 0.633 E^2[GeV] B^2[T] L[m] I[A]
        (cf. synchr.py:1699)."""
        Kv = self.Ky if Ks is None else jnp.asarray(Ks)
        B = K2B * Kv / self.L0
        length = self.L0 * self.Np * 1e-3
        return 0.633 * (self.eE ** 2) * (B ** 2) * length * self.eI * 1e3

    def tuning_curves(self, energy, theta, psi, harmonics, Ks):
        """Maximum flux of the given *harmonics* through the (theta, psi)
        aperture, for each K in *Ks* (synchr.py:1657-1697).  Returns
        (tunesE [keV], tunesF [ph/s/0.1%bw]) shaped (len(Ks),
        len(harmonics)) after transposition like the reference."""
        import numpy as np
        energy = np.atleast_1d(np.asarray(energy, float))
        theta = np.atleast_1d(np.asarray(theta, float))
        psi = np.atleast_1d(np.asarray(psi, float))
        try:
            dtheta, dpsi = theta[1] - theta[0], psi[1] - psi[0]
        except IndexError:
            dtheta, dpsi = 1.0, 1.0
        tunesE, tunesF = [], []
        for K in Ks:
            src = self.replace(Ky=jnp.asarray(K, self.Ky.dtype))
            I0 = np.asarray(src.intensities_on_mesh(
                energy=energy, theta=theta, psi=psi,
                harmonic=harmonics)[0])
            flux = I0.sum(axis=(1, 2)) * dtheta * dpsi  # (nE, nHarm)
            argm = np.argmax(flux, axis=0)
            tunesE.append(energy[argm] / 1000.0)
            tunesF.append(np.max(flux, axis=0))
        return np.array(tunesE), np.array(tunesF)

    def power_vs_K_through_aperture(self, energy, theta, psi, Ks):
        """Power [W] passing the (theta, psi) aperture within *energy* for
        each K (synchr.py:1699-1727)."""
        import numpy as np
        from ..physconsts import EV2ERG
        energy = np.atleast_1d(np.asarray(energy, float))
        theta = np.atleast_1d(np.asarray(theta, float))
        psi = np.atleast_1d(np.asarray(psi, float))
        try:
            dtheta, dpsi, dE = (theta[1] - theta[0], psi[1] - psi[0],
                                energy[1] - energy[0])
        except IndexError:
            dtheta, dpsi, dE = 1.0, 1.0, 1.0
        powers = []
        for K in Ks:
            src = self.replace(Ky=jnp.asarray(K, self.Ky.dtype))
            I0 = np.asarray(src.intensities_on_mesh(
                energy=energy, theta=theta, psi=psi)[0])
            I0 = I0 * energy[:, None, None]  # distE 'eV' -> power density
            powers.append(I0.sum() * dtheta * dpsi * dE * EV2ERG * 1e-7)
        return np.array(powers)
