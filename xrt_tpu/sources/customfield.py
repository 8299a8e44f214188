"""Source from an arbitrary tabulated magnetic field B(z).

TPU-native re-implementation of the reference SourceFromField
(xrt/backends/raycing/sources/synchr.py:603-1330): the electron trajectory
is integrated by RK4 over the tabulated field (host-side float64 numpy,
cf. _build_trajectory_conv:1032-1130; the scaled, gamma-independent form is
used for non-filament beams so one trajectory serves all rays), and the
retarded-potential integral runs on device as a chunked ``lax.scan`` with
per-ray emcg scaling (cf. _sp_sum:871-980, _build_I_map_custom_field_conv
:1257-1330; OpenCL analog cl/undulator.cl get_trajectory:918 /
custom_field:1001).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from scipy.interpolate import interp1d

from .. import config
from ..physconsts import (PI, PI2, SIE0, SIM0, C, EMC, E2WC, FINE_STR, K2B,
                          EV2ERG, M0, CHeVcm)
from .synchrotron import _SynchrotronBase
from .undulator import clenshaw_curtis, NODE_CHUNK

_SPL_KW = dict(kind='cubic', bounds_error=False, fill_value='extrapolate')


def _fwhm(z, a):
    dz = z[1] - z[0]
    args = np.argwhere(a >= a.max() * 0.5)
    return z[int(np.max(args))] - z[int(np.min(args))] + dz


@struct.dataclass
class SourceFromField(_SynchrotronBase):
    """Synchrotron source given by a tabulated field: columns
    (z[mm], {Bx,} By {, Bz}) in T, or a periodic test field via Kx/Ky."""
    # node arrays (leaves)
    tg: jnp.ndarray = None
    ag: jnp.ndarray = None
    Bxt: jnp.ndarray = None
    Byt: jnp.ndarray = None
    Bzt: jnp.ndarray = None
    betax_t: jnp.ndarray = None
    betay_t: jnp.ndarray = None
    trajx_t: jnp.ndarray = None
    trajy_t: jnp.ndarray = None
    trajz_t: jnp.ndarray = None
    betam: jnp.ndarray = None
    dstep: float = struct.field(pytree_node=False, default=0.0)
    deviceLength: float = struct.field(pytree_node=False, default=0.0)
    quadm: int = struct.field(pytree_node=False, default=0)
    gIntervals: int = struct.field(pytree_node=False, default=2)
    # near-field observation distance [mm] (None = far field); cf. the
    # reference R0 mode of SourceFromField (synchr.py:1302-1318, _sp
    # R0 branch :811-846) used e.g. for IR edge radiation.  NB the
    # near-field phase is formed in the working dtype: float64-grade on
    # CPU; on the f32 TPU it is adequate for long wavelengths (IR/THz,
    # wc*LRS << 1e6 rad) — hard-x-ray near-field work at wide acceptance
    # should run the f64 CPU path (the undulator's dedicated near-field
    # mode keeps its wrapped-phase discipline instead)
    R0: Optional[float] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, name='', center=(0, 0, 0), nrays=None, eE=6.0, eI=0.1,
               eEspread=0.0, eEpsilonX=1.0, eEpsilonZ=0.01, betaX=9.0,
               betaZ=2.0, eSigmaX=None, eSigmaZ=None, customField=None,
               eMin=5000.0, eMax=15000.0, xPrimeMax=0.5, zPrimeMax=0.5,
               distE='eV', gNodes=2000, gIntervals=None, oversample=2,
               pitch=0.0, yaw=0.0, R0=None,
               # periodic test field (customField=None):
               K=4.4, period=53.96, n=41):
        dt = config.dtype()
        if customField is not None:
            if isinstance(customField, (tuple, list)):
                fname, readkw = customField
                data = np.loadtxt(fname, **readkw)
            elif isinstance(customField, np.ndarray):
                data = np.asarray(customField, float)
            else:
                data = np.loadtxt(customField)
        else:
            # periodic test field (cf. synchr.py:645-656)
            L0, Np = period, n
            zg = np.linspace(-L0 * Np * 0.5, L0 * Np * 0.5, 1000 * Np)
            B0y = K2B * K / L0
            data = np.vstack([zg, B0y * np.sin(2 * np.pi * zg / L0)]).T
        dataz = data[:, 0]
        Bcols = np.abs(data[:, 1:]).max(axis=1)
        deviceLength = _fwhm(dataz, Bcols)

        # field interpolants on the RK grid (synchr.py:716-760)
        lenmm = abs(dataz[-1] - dataz[0])
        wtGrid = np.linspace(dataz[0], dataz[-1], int(lenmm * 10))
        BGrid = np.linspace(dataz[0], dataz[-1], 2 * len(wtGrid) - 1)

        def field_at(z):
            ncol = data.shape[1]
            if ncol == 2:
                By = interp1d(dataz, data[:, 1], **_SPL_KW)(z)
                return np.zeros_like(By), By, np.zeros_like(By)
            if ncol == 3:
                Bx = interp1d(dataz, data[:, 1], **_SPL_KW)(z)
                By = interp1d(dataz, data[:, 2], **_SPL_KW)(z)
                return Bx, By, np.zeros_like(By)
            Bx = interp1d(dataz, data[:, 1], **_SPL_KW)(z)
            By = interp1d(dataz, data[:, 2], **_SPL_KW)(z)
            Bz = interp1d(dataz, data[:, 3], **_SPL_KW)(z)
            return Bx, By, Bz

        Bx, By, Bz = field_at(BGrid)

        # scaled RK4 trajectory (emcg=1; cf. _build_trajectory_conv)
        betax, betay, betam, trajx, trajy, trajz = _rk4_trajectory(
            wtGrid, Bx, By, Bz)

        # composite quadrature grid over the field range
        # (cf. SourceFromField._build_integration_grid, synchr.py:1004-1018)
        if gIntervals is None:
            gIntervals = 2
        tg_n, ag_n = clenshaw_curtis(int(gNodes))
        dstep = (dataz[-1] - dataz[0]) / float(gIntervals)
        dI = np.arange(0.5 * dstep + dataz[0], dataz[-1], dstep)
        tg = (dI[:, None] + 0.5 * dstep * tg_n).ravel()
        ag = (dI[:, None] * 0 + ag_n).ravel()

        Bxt, Byt, Bzt = field_at(tg)
        betaxTg = interp1d(wtGrid, betax, **_SPL_KW)(tg)
        betayTg = interp1d(wtGrid, betay, **_SPL_KW)(tg)
        trajxTg = interp1d(wtGrid, trajx, **_SPL_KW)(tg)
        trajyTg = interp1d(wtGrid, trajy, **_SPL_KW)(tg)
        trajzTg = interp1d(wtGrid, trajz, **_SPL_KW)(tg)

        # pad to NODE_CHUNK with zero weights
        npad = (-len(tg)) % NODE_CHUNK

        def pad(v):
            return np.concatenate([v, np.zeros(npad)]) if npad else v
        arrays = dict(
            tg=pad(tg), ag=pad(ag), Bxt=pad(Bxt), Byt=pad(Byt),
            Bzt=pad(Bzt), betax_t=pad(betaxTg), betay_t=pad(betayTg),
            trajx_t=pad(trajxTg), trajy_t=pad(trajyTg),
            trajz_t=pad(trajzTg))

        # e-beam sizes
        epsX = eEpsilonX * 1e-6
        epsZ = eEpsilonZ * 1e-6
        dx = eSigmaX * 1e-3 if eSigmaX is not None else \
            (math.sqrt(epsX * betaX * 1e3) if betaX else 0.0)
        dz = eSigmaZ * 1e-3 if eSigmaZ is not None else \
            (math.sqrt(epsZ * betaZ * 1e3) if betaZ else 0.0)
        return cls(center=jnp.asarray(center, dt), eE=eE,
                   eI=jnp.asarray(eI, dt), eEspread=eEspread,
                   dx=jnp.asarray(dx, dt), dz=jnp.asarray(dz, dt),
                   dxprime=jnp.asarray(epsX / dx if dx > 0 else 0.0, dt),
                   dzprime=jnp.asarray(epsZ / dz if dz > 0 else 0.0, dt),
                   eMin=eMin, eMax=eMax, xPrimeMax=xPrimeMax * 1e-3,
                   zPrimeMax=zPrimeMax * 1e-3, distE=distE, nrays=nrays,
                   oversample=oversample, pitch=float(pitch),
                   yaw=float(yaw), name=name,
                   betam=jnp.asarray(betam, dt), dstep=float(dstep),
                   deviceLength=float(deviceLength),
                   quadm=int(gNodes), gIntervals=int(gIntervals),
                   R0=None if R0 is None else float(R0),
                   **{k: jnp.asarray(v, dt) for k, v in arrays.items()})

    def get_sigma_r02(self, E):
        """cf. synchr.py:701-705 (uses the field FWHM device length)."""
        return 2 * CHeVcm / E * 10 * self.deviceLength / PI2 ** 2

    def get_SIGMA(self, E, onlyOddHarmonics=True):
        s2 = self.get_sigma_r02(E)
        return (jnp.sqrt(self.dx ** 2 + s2), jnp.sqrt(self.dz ** 2 + s2))

    def _sample_positions(self, key, E, Theta0, nrays, dt):
        k1, k2 = jax.random.split(key)
        sx, sz = self.get_SIGMA(E)
        return (sx * jax.random.normal(k1, (nrays,), dt),
                jnp.zeros((nrays,), dt),
                sz * jax.random.normal(k2, (nrays,), dt))

    def build_I_map(self, key, w, ddtheta, ddpsi, harmonic=None,
                    dgamma=None):
        """(flux, amp_s, amp_p) from the tabulated-field trajectory
        (cf. _build_I_map_custom_field_conv, synchr.py:1257-1330)."""
        w = jnp.asarray(w)
        dt = w.dtype
        gamma0 = self.gamma
        if self.eEspread > 0:
            gamma = gamma0 * (1 + self.eEspread *
                              jax.random.normal(key, w.shape, dt))
        else:
            gamma = jnp.full(w.shape, gamma0, dt)
        revgamma2 = 1.0 / gamma ** 2
        emcg = SIE0 / SIM0 / C / 10. / gamma
        betam = self.betam
        wc = w * E2WC / (1. + (betam * EMC ** 2 - 0.5) * revgamma2)

        dirx = ddtheta
        diry = ddpsi
        dirz = jnp.sqrt(1. - ddtheta ** 2 - ddpsi ** 2)

        nearField = self.R0 is not None
        if nearField:
            # observation point per ray (synchr.py:1302-1306); the wc*R0z
            # carrier phase is per-ray constant at fixed w, computed once
            R0x = jnp.tan(ddtheta) * self.R0
            R0y = jnp.tan(ddpsi) * self.R0
            R0z = jnp.full_like(ddpsi, self.R0)
            sinr0z = jnp.sin(wc * R0z)
            cosr0z = jnp.cos(wc * R0z)

        nchunks = self.tg.shape[0] // NODE_CHUNK
        rsh = lambda v: v.reshape(nchunks, NODE_CHUNK)
        inputs = tuple(rsh(v) for v in (
            self.tg, self.ag, self.Bxt, self.Byt, self.Bzt, self.betax_t,
            self.betay_t, self.trajx_t, self.trajy_t, self.trajz_t))

        def body(carry, inp):
            Bs_acc, Bp_acc = carry
            tg, ag, Bx, By, Bz, bx, by, tx, ty, tz = inp
            # per-ray scaling of the universal trajectory (synchr.py:945-960)
            betax_ = emcg[:, None] * bx[None, :]
            betay_ = emcg[:, None] * by[None, :]
            trajx_ = emcg[:, None] * tx[None, :]
            trajy_ = emcg[:, None] * ty[None, :]
            trajz_ = tg[None, :] * (1. - 0.5 * revgamma2[:, None]) + \
                EMC ** 2 * revgamma2[:, None] * tz[None, :]
            wcb = wc[:, None]
            if nearField:
                # exact-geometry phase: wc*(tg + |R0 - r(z)| - R0z) with
                # |dr| - drz expanded stably (LRS, synchr.py:819-833); the
                # carrier wc*R0z enters via the precomputed sin/cos and the
                # three pieces combine by angle addition
                drx = R0x[:, None] - trajx_
                dry = R0y[:, None] - trajy_
                drz = R0z[:, None] - trajz_
                dist = jnp.sqrt(drx ** 2 + dry ** 2 + drz ** 2)
                rdrz = 1. / drz
                drs = (drx ** 2 + dry ** 2) * rdrz
                LRS = 0.5 * drs - 0.125 * drs ** 2 * rdrz + \
                    0.0625 * drs ** 3 * rdrz ** 2
                sinzloc = jnp.sin(wcb * (tg[None, :] - trajz_))
                coszloc = jnp.cos(wcb * (tg[None, :] - trajz_))
                sindrs = jnp.sin(wcb * LRS)
                cosdrs = jnp.cos(wcb * LRS)
                sz = sinr0z[:, None]
                cz = cosr0z[:, None]
                eucos = ((-sz * sinzloc * cosdrs - sz * coszloc * sindrs -
                          cz * sinzloc * sindrs + cz * coszloc * cosdrs) +
                         1j * (-sz * sinzloc * sindrs +
                               sz * coszloc * cosdrs +
                               cz * sinzloc * cosdrs +
                               cz * coszloc * sindrs))
                # per-node observation directions
                rdist = 1. / dist
                dirx_n = drx * rdist
                diry_n = dry * rdist
                # 1 - dirz = (dist - drz)/dist, with dist - drz = LRS
                A1m = LRS * rdist
                dirz_n = 1. - A1m
            else:
                phz = wcb * (tg[None, :] - dirz[:, None] * trajz_)
                phxy = wcb * (dirx[:, None] * trajx_ +
                              diry[:, None] * trajy_)
                sinphz, cosphz = jnp.sin(phz), jnp.cos(phz)
                sinphxy, cosphxy = jnp.sin(phxy), jnp.cos(phxy)
                eucos = (sinphz * cosphxy - cosphz * sinphxy) + \
                    1j * (cosphz * cosphxy + sinphz * sinphxy)
                # 1 - dirz = (theta^2+psi^2)/(1+dirz) exactly
                # (dirz = sqrt(1-theta^2-psi^2))
                A1m = ((ddtheta ** 2 + ddpsi ** 2) / (1. + dirz))[:, None]
                dirx_n = dirx[:, None]
                diry_n = diry[:, None]
                dirz_n = dirz[:, None]
            smTerm = revgamma2[:, None] + betax_ ** 2 + betay_ ** 2
            # B1m := 1 - betaz kept exactly (float32: forming betaz ~ 1 and
            # subtracting later would cancel the ~1e-8 result to zero)
            B1m = 0.5 * smTerm + 0.125 * smTerm ** 2 + 0.0625 * smTerm ** 3
            betaz = 1 - B1m
            betaPx = betay_ * Bz[None, :] - betaz * By[None, :]
            betaPy = -betax_ * Bz[None, :] + betaz * Bx[None, :]
            betaPz = betax_ * By[None, :] - betay_ * Bx[None, :]
            one_minus_nb = (B1m + betaz * A1m -
                            dirx_n * betax_ - diry_n * betay_)
            rkrel = 1. / one_minus_nb
            eucos = eucos * ag[None, :] * rkrel ** 2
            bnx = dirx_n - betax_
            bny = diry_n - betay_
            bnz = B1m - A1m
            dirDotBetaP = dirx_n * betaPx + diry_n * betaPy \
                + dirz_n * betaPz
            dirDotDmB = dirx_n * bnx + diry_n * bny + \
                dirz_n * bnz
            Bs = jnp.sum(eucos * emcg[:, None] *
                         (bnx * dirDotBetaP - betaPx * dirDotDmB), axis=1)
            Bp = jnp.sum(eucos * emcg[:, None] *
                         (bny * dirDotBetaP - betaPy * dirDotDmB), axis=1)
            return (Bs_acc + Bs, Bp_acc + Bp), None

        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        from .. import config as _config
        init = (_config.czeros(w.shape, cdt), _config.czeros(w.shape, cdt))
        (Is, Ip), _ = jax.lax.scan(body, init, inputs)

        ab = 0.5 / PI / (1. - 0.5 * revgamma2 +
                         betam * EMC ** 2 * revgamma2)
        bwFact = 0.001 if self.distE == 'BW' else 1. / w
        Amp2Flux = FINE_STR * bwFact * self.eI / SIE0
        integralField = jnp.abs(Is) ** 2 + jnp.abs(Ip) ** 2
        return (Amp2Flux * 0.25 * self.dstep ** 2 * ab ** 2 * integralField,
                jnp.sqrt(Amp2Flux) * Is * 0.5 * self.dstep * ab,
                jnp.sqrt(Amp2Flux) * Ip * 0.5 * self.dstep * ab)


def _rk4_trajectory(wtGrid, Bx, By, Bz):
    """Scaled (emcg=1) electron trajectory by RK4 over the doubled field
    grid (cf. reference _build_trajectory_conv, synchr.py:1032-1130)."""
    def f_beta(B, beta):
        return np.array((beta[1] * B[2] - B[1], B[0] - beta[0] * B[2]))

    def f_traj(beta):
        betaz = -0.5 * (beta[0] ** 2 + beta[1] ** 2)
        return np.array((beta[0], beta[1], betaz))

    n = len(wtGrid)
    beta_next = np.zeros(2)
    beta0 = np.zeros(2)
    for i in range(n - 1):
        h = wtGrid[i + 1] - wtGrid[i]
        B0 = (Bx[2 * i], By[2 * i], Bz[2 * i])
        B1 = (Bx[2 * i + 1], By[2 * i + 1], Bz[2 * i + 1])
        B2 = (Bx[2 * i + 2], By[2 * i + 2], Bz[2 * i + 2])
        k1 = h * f_beta(B0, beta_next)
        k2 = h * f_beta(B1, beta_next + 0.5 * k1)
        k3 = h * f_beta(B1, beta_next + 0.5 * k2)
        k4 = h * f_beta(B2, beta_next + k3)
        beta_next = beta_next + (k1 + 2 * k2 + 2 * k3 + k4) / 6.
        beta0 += h * beta_next
    beta0 /= -(wtGrid[-1] - wtGrid[0])

    beta_next = beta0.copy()
    traj_next = np.zeros(3)
    traj0 = np.zeros(3)
    betam_int = 0.0
    for i in range(n - 1):
        h = wtGrid[i + 1] - wtGrid[i]
        B0 = (Bx[2 * i], By[2 * i], Bz[2 * i])
        B1 = (Bx[2 * i + 1], By[2 * i + 1], Bz[2 * i + 1])
        B2 = (Bx[2 * i + 2], By[2 * i + 2], Bz[2 * i + 2])
        k1b = h * f_beta(B0, beta_next)
        k1t = h * f_traj(beta_next)
        k2b = h * f_beta(B1, beta_next + 0.5 * k1b)
        k2t = h * f_traj(beta_next + 0.5 * k1b)
        k3b = h * f_beta(B1, beta_next + 0.5 * k2b)
        k3t = h * f_traj(beta_next + 0.5 * k2b)
        k4b = h * f_beta(B2, beta_next + k3b)
        k4t = h * f_traj(beta_next + k3b)
        beta_next = beta_next + (k1b + 2 * k2b + 2 * k3b + k4b) / 6.
        traj_next = traj_next + (k1t + 2 * k2t + 2 * k3t + k4t) / 6.
        traj0 += h * traj_next
        betam_int += beta_next[0] ** 2 + beta_next[1] ** 2
    traj0 /= -(wtGrid[-1] - wtGrid[0])
    betam_int *= -0.5 / (n - 1)

    beta_next = beta0.copy()
    traj_next = traj0.copy()
    betax = [beta0[0]]
    betay = [beta0[1]]
    trajx = [traj0[0]]
    trajy = [traj0[1]]
    trajz = [traj0[2]]
    for i in range(n - 1):
        h = wtGrid[i + 1] - wtGrid[i]
        B0 = (Bx[2 * i], By[2 * i], Bz[2 * i])
        B1 = (Bx[2 * i + 1], By[2 * i + 1], Bz[2 * i + 1])
        B2 = (Bx[2 * i + 2], By[2 * i + 2], Bz[2 * i + 2])
        k1b = h * f_beta(B0, beta_next)
        k1t = h * f_traj(beta_next)
        k2b = h * f_beta(B1, beta_next + 0.5 * k1b)
        k2t = h * f_traj(beta_next + 0.5 * k1b)
        k3b = h * f_beta(B1, beta_next + 0.5 * k2b)
        k3t = h * f_traj(beta_next + 0.5 * k2b)
        k4b = h * f_beta(B2, beta_next + k3b)
        k4t = h * f_traj(beta_next + k3b)
        beta_next = beta_next + (k1b + 2 * k2b + 2 * k3b + k4b) / 6.
        traj_next = traj_next + (k1t + 2 * k2t + 2 * k3t + k4t) / 6.
        betax.append(beta_next[0])
        betay.append(beta_next[1])
        trajx.append(traj_next[0])
        trajy.append(traj_next[1])
        trajz.append(traj_next[2])
    return (np.array(betax), np.array(betay), betam_int,
            np.array(trajx), np.array(trajy), np.array(trajz))
