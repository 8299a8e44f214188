"""Synchrotron sources: bending magnet and (multipole) wiggler.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/sources/synchr.py (BendingMagnet:68 with
build_I_map:184-224 — modified Bessel K_{1/3}, K_{2/3} amplitudes — and the
Monte-Carlo shine loop :227-500; Wiggler:503) plus the e-beam parameter
handling of sources/sybase.py (SourceBase:29).

Design difference (deliberate, for XLA static shapes): the reference's
rejection-sampling while-loop ("sample (E, theta, psi) uniform, accept if
Imax*rand < I", sybase.py:1476-1813) is replaced by sampling-importance
resampling: a fixed batch of candidates is evaluated once, then exactly
``nrays`` rays are drawn with probability proportional to intensity.  This
produces the same ray density with a *fixed* number of ``build_I_map``
evaluations (the reference needs ~nrays/acceptance evaluations) and identical
flux bookkeeping semantics: ``accepted/seeded -> mean(I)*xzE``.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..beam import Beam
from ..physconsts import (PI, PI2, SQ3, SIE0, SIM0, M0, C, E0, K2B, E2W,
                          FINE_STR, EV2ERG, CHeVcm, SIE0 as _SIE0)
from ..transforms import rotate_xyz, virgin_local_to_global


def _besseli_series(nu, x, nterms=40):
    """I_nu(x) by its power series; jit-compatible, fixed term count."""
    import scipy.special as _sp
    x = jnp.asarray(x)
    half = x / 2
    k = np.arange(nterms)
    # 1 / (k! * Gamma(k + nu + 1)) as static coefficients
    coeffs = jnp.asarray(np.exp(-_sp.gammaln(k + 1) -
                                _sp.gammaln(k + nu + 1)))
    q = half[..., None] ** 2
    powers = q ** k
    return half ** nu * jnp.sum(powers * coeffs, axis=-1)


def _kv_nu(nu, x):
    """Modified Bessel K_nu(x) for fractional nu (1/3, 2/3), vectorized and
    jit-compatible; ~1e-8 relative accuracy over the synchrotron spectral
    range in float64.

    Small x (< 8): K_nu = pi/2 (I_-nu - I_nu)/sin(pi nu);
    large x: asymptotic expansion K_nu ~ sqrt(pi/2x) e^-x sum a_k(nu)/x^k.
    """
    x = jnp.asarray(x)
    xs = jnp.clip(x, 1e-12, 8.0)
    small = (PI / 2) * (_besseli_series(-nu, xs) - _besseli_series(nu, xs)) \
        / math.sin(PI * nu)

    xl = jnp.maximum(x, 8.0)
    mu = 4 * nu * nu
    term = jnp.ones_like(xl)
    acc = jnp.ones_like(xl)
    for k in range(1, 14):
        term = term * (mu - (2 * k - 1) ** 2) / (8 * k * xl)
        acc = acc + term
    large = jnp.sqrt(PI / (2 * xl)) * jnp.exp(-xl) * acc

    return jnp.where(x < 8.0, small, large)


def _nonzero(v):
    """Static-if-possible branch guard: True when *v* is a jit tracer
    (the branch must then be compiled in; adding a zero-scaled term is
    exact), else the concrete comparison."""
    try:
        return float(v) > 0
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return True


def _scalar(v):
    """float(v) when concrete, the traced value itself under jit."""
    try:
        return float(v)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return v


@struct.dataclass
class _SynchrotronBase:
    """Shared e-beam / acceptance-window parameters
    (cf. reference SourceBase, sybase.py:29-575)."""
    center: jnp.ndarray = None
    eE: float = struct.field(pytree_node=False, default=6.0)      # GeV
    eI: jnp.ndarray = None                                        # A
    eEspread: float = struct.field(pytree_node=False, default=0.0)
    dx: jnp.ndarray = None        # e-beam sigma x, mm
    dz: jnp.ndarray = None        # e-beam sigma z, mm
    dxprime: jnp.ndarray = None   # e-beam divergence, rad
    dzprime: jnp.ndarray = None
    eMin: float = struct.field(pytree_node=False, default=5000.0)
    eMax: float = struct.field(pytree_node=False, default=15000.0)
    xPrimeMax: float = struct.field(pytree_node=False, default=0.5e-3)
    zPrimeMax: float = struct.field(pytree_node=False, default=0.5e-3)
    xPrimeMin: float = struct.field(pytree_node=False, default=None)
    zPrimeMin: float = struct.field(pytree_node=False, default=None)
    distE: str = struct.field(pytree_node=False, default='eV')
    nrays: int = struct.field(pytree_node=False, default=None)
    oversample: int = struct.field(pytree_node=False, default=2)
    pitch: jnp.ndarray = None
    yaw: jnp.ndarray = None
    name: str = struct.field(pytree_node=False, default='')
    # filled by create():
    Imax_hint: float = struct.field(pytree_node=False, default=0.0)

    @property
    def gamma(self):
        return self.eE * 1e9 * EV2ERG / (M0 * C ** 2)

    @property
    def gamma2(self):
        return self.gamma ** 2

    @property
    def Theta_min(self):
        return (self.xPrimeMin if self.xPrimeMin is not None
                else -self.xPrimeMax) - _scalar(self.dxprime)

    @property
    def Theta_max(self):
        return self.xPrimeMax + _scalar(self.dxprime)

    @property
    def Psi_min(self):
        return (self.zPrimeMin if self.zPrimeMin is not None
                else -self.zPrimeMax) - _scalar(self.dzprime)

    @property
    def Psi_max(self):
        return self.zPrimeMax + _scalar(self.dzprime)

    @property
    def xzE(self):
        """Acceptance-volume factor (sybase.py:572-574)."""
        return (self.eMax - self.eMin) * (self.Theta_max - self.Theta_min) \
            * (self.Psi_max - self.Psi_min)

    # ------------------------------------------------------------------
    def _sample_gamma(self, key, gamma, shape, dtype):
        if self.eEspread > 0:
            return gamma * (1 + self.eEspread *
                            jax.random.normal(key, shape, dtype))
        return jnp.full(shape, gamma, dtype)

    # ---- field maps on angular meshes --------------------------------
    def _auto_meshes(self, energy, theta, psi, nE=65, nTheta=33, nPsi=33):
        if energy is None or isinstance(energy, str):
            energy = np.linspace(self.eMin, self.eMax, nE)
        if theta is None or isinstance(theta, str):
            theta = np.linspace(self.Theta_min, self.Theta_max, nTheta)
        if psi is None or isinstance(psi, str):
            psi = np.linspace(self.Psi_min, self.Psi_max, nPsi)
        return (np.atleast_1d(np.asarray(energy, float)),
                np.atleast_1d(np.asarray(theta, float)),
                np.atleast_1d(np.asarray(psi, float)))

    def _I_map_kwargs(self, harmonic, dgamma):
        import inspect
        params = inspect.signature(self.build_I_map).parameters
        kw = {}
        if 'harmonic' in params:
            kw['harmonic'] = harmonic
        if 'dgamma' in params and dgamma is not None:
            kw['dgamma'] = dgamma
        return kw

    def multi_electron_stack(self, key=None, energy='auto', theta='auto',
                             psi='auto', harmonic=None,
                             withElectronDivergence=True):
        """Es and Ep shaped (energy, theta, psi, [harmonic]) where axis 0
        holds "macro-electrons" with individual random angular offsets and
        gamma shifts (sybase.py:704-767)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        energy, theta, psi = self._auto_meshes(energy, theta, psi)
        nmacro = len(energy)
        tomesh = [energy, theta, psi]
        if harmonic is not None:
            tomesh.append(np.atleast_1d(np.asarray(harmonic, float)))
        mesh = [jnp.asarray(m, config.dtype())
                for m in np.meshgrid(*tomesh, indexing='ij')]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        expand = (slice(None),) + (None,) * (len(tomesh) - 1)
        if withElectronDivergence and _nonzero(self.dxprime):
            dthe = self.dxprime * jax.random.normal(
                k1, (nmacro,), config.dtype())
            mesh[1] = mesh[1] + dthe[expand]
        if withElectronDivergence and _nonzero(self.dzprime):
            dpsi = self.dzprime * jax.random.normal(
                k2, (nmacro,), config.dtype())
            mesh[2] = mesh[2] + dpsi[expand]
        dgamma = None
        if self.eEspread > 0:
            spr = self.gamma * self.eEspread * jax.random.normal(
                k3, (nmacro,), config.dtype())
            dgamma = jnp.broadcast_to(spr[expand], mesh[0].shape).ravel()
        sh = tuple(len(m) for m in tomesh)
        xH = mesh[3].ravel() if harmonic is not None else None
        kw = self._I_map_kwargs(xH, dgamma)
        res = self.build_I_map(k4, mesh[0].ravel(), mesh[1].ravel(),
                               mesh[2].ravel(), **kw)
        return res[1].reshape(sh), res[2].reshape(sh)

    def intensities_on_mesh(self, key=None, energy='auto', theta='auto',
                            psi='auto', harmonic=None, eSpreadSigmas=3.5,
                            eSpreadNSamples=36, mode='constant',
                            resultKind='Stokes'):
        """Stokes parameters [s0, s1/s0, s2/s0, s3/s0] (or
        [Is, Ip, OAMs, OAMp, Es, Ep] for resultKind='vortex') on the
        (energy, theta, psi, [harmonic]) mesh, incoherently averaged over
        energy spread and convolved with the electron divergence
        (sybase.py:768-958)."""
        assert resultKind in ('Stokes', 'vortex')
        if key is None:
            key = jax.random.PRNGKey(0)
        energy, theta, psi = self._auto_meshes(energy, theta, psi)
        tomesh = [energy, theta, psi]
        sh = [len(energy), len(theta), len(psi)]
        ispread = None
        if harmonic is not None:
            harmonic = np.atleast_1d(np.asarray(harmonic, float))
            tomesh.append(harmonic)
            sh.append(len(harmonic))
        supports_dgamma = 'dgamma' in self._I_map_kwargs(
            None, jnp.zeros(1))
        if self.eEspread > 0 and supports_dgamma:
            spr = np.linspace(-eSpreadSigmas, eSpreadSigmas,
                              eSpreadNSamples)
            dgamma_1d = float(self.gamma) * spr * self.eEspread
            wspr = np.exp(-0.5 * spr ** 2)
            wspr /= wspr.sum()
            tomesh.append(dgamma_1d)
            ispread = len(tomesh) - 1
            sh.append(len(dgamma_1d))
        mesh = np.meshgrid(*tomesh, indexing='ij')
        dt = config.dtype()
        xE = jnp.asarray(mesh[0].ravel(), dt)
        xT = jnp.asarray(mesh[1].ravel(), dt)
        xP = jnp.asarray(mesh[2].ravel(), dt)
        xH = jnp.asarray(mesh[3].ravel(), dt) if harmonic is not None \
            else None
        xG = jnp.asarray(mesh[ispread].ravel(), dt) if ispread else None
        kw = self._I_map_kwargs(xH, xG)
        res = self.build_I_map(key, xE, xT, xP, **kw)
        Es = np.asarray(res[1]).reshape(sh)
        Ep = np.asarray(res[2]).reshape(sh)

        Is = (Es * Es.conj()).real.astype(float)
        Ip = (Ep * Ep.conj()).real.astype(float)
        if resultKind == 'Stokes':
            Isp = Es * Ep.conj()
        else:  # vortex: OAM matrix elements (sybase.py:855-875)
            dEsdth, dEsdps = np.gradient(Es, theta, psi, axis=(1, 2))
            dEpdth, dEpdps = np.gradient(Ep, theta, psi, axis=(1, 2))
            th_b = theta.reshape((1, -1) + (1,) * (Es.ndim - 2))
            ps_b = psi.reshape((1, 1, -1) + (1,) * (Es.ndim - 3))
            lsy = 1j * (dEsdth * ps_b - dEsdps * th_b)
            lpy = 1j * (dEpdth * ps_b - dEpdps * th_b)
            OAMs = (Es.conj() * lsy).real.astype(float)
            OAMp = (Ep.conj() * lpy).real.astype(float)

        if ispread:
            ws = wspr.reshape((1,) * (len(sh) - 1) + (-1,))
            Is = (Is * ws).sum(axis=-1)
            Ip = (Ip * ws).sum(axis=-1)
            if resultKind == 'Stokes':
                Isp = (Isp * ws).sum(axis=-1)
            else:
                OAMs = (OAMs * ws).sum(axis=-1)
                OAMp = (OAMp * ws).sum(axis=-1)
                Es = (Es * ws).sum(axis=-1)
                Ep = (Ep * ws).sum(axis=-1)

        if resultKind == 'Stokes':
            s0 = Is + Ip
            s1 = Is - Ip
            s2 = 2.0 * np.real(Isp)
            s3 = -2.0 * np.imag(Isp)
            ss = [s0, s1, s2, s3]
        else:
            ss = [Is, Ip, OAMs, OAMp, Es, Ep]

        if (float(self.dxprime) > 0 or float(self.dzprime) > 0) and \
                len(theta) > 1 and len(psi) > 1:
            from scipy.ndimage import gaussian_filter
            Sx = float(self.dxprime) / (theta[1] - theta[0])
            Sz = float(self.dzprime) / (psi[1] - psi[0])

            def filt(a2):
                if np.iscomplexobj(a2):
                    return (gaussian_filter(a2.real, [Sx, Sz], mode=mode) +
                            1j * gaussian_filter(a2.imag, [Sx, Sz],
                                                 mode=mode))
                return gaussian_filter(a2, [Sx, Sz], mode=mode)

            for arr in ss:
                if harmonic is None:
                    for ie in range(len(energy)):
                        arr[ie, :, :] = filt(arr[ie, :, :])
                else:
                    for ie in range(len(energy)):
                        for ih in range(len(harmonic)):
                            arr[ie, :, :, ih] = filt(arr[ie, :, :, ih])

        if resultKind == 'Stokes':
            with np.errstate(divide='ignore', invalid='ignore'):
                return [s0,
                        np.where(s0, s1 / s0, s0),
                        np.where(s0, s2 / s0, s0),
                        np.where(s0, s3 / s0, s0)]
        return ss

    def shine(self, key, toGlobal=True, withAmplitudes=True,
              fixedEnergy=False) -> Beam:
        """Monte-Carlo source beam by importance resampling (see module
        docstring; cf. reference shine synchr.py:227-500)."""
        dt = config.dtype()
        cdt = config.cdtype()
        nrays = self.nrays or config.NRAYS
        M = nrays * self.oversample
        keys = jax.random.split(key, 10)

        rE = jax.random.uniform(keys[0], (M,), dt, self.eMin, self.eMax)
        if fixedEnergy:
            rE = jnp.full((M,), fixedEnergy, dt)
        rTheta = jax.random.uniform(keys[1], (M,), dt, self.Theta_min,
                                    self.Theta_max)
        rPsi = jax.random.uniform(keys[2], (M,), dt, self.Psi_min,
                                  self.Psi_max)
        Intensity, mJss, mJpp = self.build_I_map(keys[3], rE, rTheta, rPsi)

        # resample ~ Intensity (the TPU-native equivalent of the rejection
        # loop at synchr.py:317-358)
        sumI = jnp.sum(Intensity)
        p = Intensity / jnp.maximum(sumI, 1e-300)
        idx = jax.random.choice(keys[4], M, (nrays,), replace=True, p=p)
        rE = rE[idx]
        Theta0 = rTheta[idx]
        Psi0 = rPsi[idx]
        mJss = mJss[idx]
        mJpp = mJpp[idx]

        dtheta = jnp.zeros((nrays,), dt)
        dpsi = jnp.zeros((nrays,), dt)
        if _nonzero(self.dxprime):
            dtheta = dtheta + self.dxprime * jax.random.normal(keys[5],
                                                               (nrays,), dt)
        if getattr(self, '_smear_1_over_gamma', False):
            # BM only: natural vertical-like opening in theta
            # (synchr.py:381-382)
            dtheta = dtheta + jax.random.normal(keys[6], (nrays,), dt) \
                / self.gamma
        if _nonzero(self.dzprime):
            dpsi = dpsi + self.dzprime * jax.random.normal(keys[7],
                                                           (nrays,), dt)

        a = jnp.tan(Theta0 + dtheta)
        c = jnp.tan(Psi0 + dpsi)

        intensS = (mJss * jnp.conj(mJss)).real
        intensP = (mJpp * jnp.conj(mJpp)).real
        sSP = intensS + intensP
        safe = jnp.maximum(sSP, 1e-300)

        x, y, z = self._sample_positions(keys[8], rE, Theta0, nrays, dt)

        Jss = jnp.where(sSP > 0, intensS / safe, 0.0)
        Jpp = jnp.where(sSP > 0, intensP / safe, 0.0)
        if getattr(self, 'isMPW', False):
            from .. import config as _config
            Jsp = _config.czeros((nrays,), cdt)
        else:
            Jsp = jnp.where(sSP > 0, mJss * jnp.conj(mJpp) / safe,
                            0.0).astype(cdt)

        norm = jnp.sqrt(a ** 2 + 1.0 + c ** 2)
        beam = Beam(
            x=x, y=y, z=z, a=a / norm, b=1.0 / norm, c=c / norm, E=rE,
            state=jnp.ones((nrays,), jnp.int32),
            path=jnp.zeros((nrays,), dt),
            Jss=Jss, Jpp=Jpp, Jsp=Jsp,
            Es=mJss.astype(cdt) if withAmplitudes else None,
            Ep=mJpp.astype(cdt) if withAmplitudes else None,
            accepted=sumI / M * nrays * self.xzE,
            acceptedE=jnp.sum(rE) * sumI / M * self.xzE * SIE0,
            seeded=jnp.asarray(float(nrays), dt),
            seededI=sumI / M * nrays * self.xzE,
        )
        if not (isinstance(self.pitch, float) and self.pitch == 0):
            x2, y2, z2 = rotate_xyz(beam.x, beam.y, beam.z,
                                    pitch=self.pitch, yaw=self.yaw,
                                    skip_zero=False)
            a2, b2, c2 = rotate_xyz(beam.a, beam.b, beam.c,
                                    pitch=self.pitch, yaw=self.yaw,
                                    skip_zero=False)
            beam = beam.replace(x=x2, y=y2, z=z2, a=a2, b=b2, c=c2)
        if toGlobal:
            beam = virgin_local_to_global(beam, self.center)
        return beam


@struct.dataclass
class BendingMagnet(_SynchrotronBase):
    """Bending magnet source (synchr.py:68-500).  Analytic amplitudes via
    modified Bessel functions; spectral flux per 0.1% b.w. or per eV."""
    B0: jnp.ndarray = None     # T

    @classmethod
    def create(cls, name='', center=(0, 0, 0), nrays=None, eE=6.0, eI=0.1,
               eEspread=0.0, eSigmaX=None, eSigmaZ=None, eEpsilonX=1.0,
               eEpsilonZ=0.01, betaX=9.0, betaZ=2.0, B0=1.0, rho=None,
               eMin=5000.0, eMax=15000.0, xPrimeMax=0.5, zPrimeMax=0.5,
               distE='eV', pitch=0.0, yaw=0.0, oversample=2):
        dt = config.dtype()
        gamma = eE * 1e9 * EV2ERG / (M0 * C ** 2)
        if rho is not None and not B0:
            B0 = M0 * C ** 2 * gamma / rho / E0 / 1e6
        # e-beam sizes (sybase.py:254-293): eSigma* in um, eEpsilon* in
        # nm*rad, beta* in m
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
        return cls(center=jnp.asarray(center, dt), eE=eE,
                   eI=jnp.asarray(eI, dt), eEspread=eEspread,
                   dx=jnp.asarray(dx, dt), dz=jnp.asarray(dz, dt),
                   dxprime=jnp.asarray(dxprime, dt),
                   dzprime=jnp.asarray(dzprime, dt),
                   eMin=eMin, eMax=eMax,
                   xPrimeMax=xPrimeMax * 1e-3, zPrimeMax=zPrimeMax * 1e-3,
                   distE=distE, nrays=nrays, oversample=oversample,
                   pitch=float(pitch), yaw=float(yaw), name=name,
                   B0=jnp.asarray(B0, dt))

    isMPW = False
    Np = 0.5
    _smear_1_over_gamma = True

    @property
    def ro(self):
        """Curvature radius in m."""
        return M0 * C ** 2 * self.gamma / self.B0 / E0 / 1e6

    def build_I_map(self, key, dde, ddtheta, ddpsi):
        """(flux, amp_s, amp_p) of BM radiation at (E, theta, psi)
        (cf. synchr.py:184-224)."""
        gamma = self.gamma
        if self.eEspread > 0:
            gamma = gamma * (1 + self.eEspread *
                             jax.random.normal(key, jnp.shape(dde),
                                               jnp.asarray(dde).dtype))
        gamma2 = gamma ** 2
        w_cr = 1.5 * gamma2 * self.B0 * SIE0 / SIM0
        if self.isMPW:
            s = jnp.clip(ddtheta * gamma / self.K, -1.0, 1.0)
            w_cr = w_cr * jnp.sin(jnp.arccos(s))
        w_cr = jnp.where(jnp.isfinite(w_cr) & (w_cr != 0), w_cr, 1e-30)

        gammapsi = gamma * ddpsi
        gamma2psi2p1 = gammapsi ** 2 + 1
        eta = 0.5 * dde * E2W / w_cr * gamma2psi2p1 ** 1.5

        ampSP = -0.5j * SQ3 / PI * gamma * dde * E2W / w_cr * gamma2psi2p1
        ampS = ampSP * _kv_nu(2. / 3., eta)
        ampP = 1j * gammapsi * ampSP * _kv_nu(1. / 3., eta) / \
            jnp.sqrt(gamma2psi2p1)
        ampS = jnp.where(jnp.isfinite(jnp.abs(ampS)), ampS, 0.0)
        ampP = jnp.where(jnp.isfinite(jnp.abs(ampP)), ampP, 0.0)

        bwFact = 0.001 if self.distE == 'BW' else 1. / dde
        Amp2Flux = FINE_STR * bwFact * self.eI / SIE0 * 2 * self.Np
        return (Amp2Flux * (jnp.abs(ampS) ** 2 + jnp.abs(ampP) ** 2),
                jnp.sqrt(Amp2Flux) * ampS,
                jnp.sqrt(Amp2Flux) * ampP)

    def _sample_positions(self, key, E, Theta0, nrays, dt):
        """Ray origins on the nominal arc (synchr.py:418-427)."""
        k1, k2 = jax.random.split(key)
        z = self.dz * jax.random.normal(k1, (nrays,), dt)
        R1 = self.ro * 1e3 + self.dx * jax.random.normal(k2, (nrays,), dt)
        x = -R1 * jnp.cos(Theta0) + self.ro * 1000.
        y = R1 * jnp.sin(Theta0)
        return x, y, z


@struct.dataclass
class Wiggler(BendingMagnet):
    """Multipole wiggler = BM amplitudes with per-pole longitudinal position
    sampling (synchr.py:503-570)."""
    K: jnp.ndarray = None
    L0: float = struct.field(pytree_node=False, default=50.0)   # mm
    n: int = struct.field(pytree_node=False, default=40)        # periods

    isMPW = True
    _smear_1_over_gamma = False

    @classmethod
    def create(cls, name='', K=10.0, period=50.0, n=40, B0=None, **kwargs):
        dt = config.dtype()
        eE = kwargs.get('eE', 6.0)
        if B0 is not None:
            K = B0 * period / K2B
        B = K2B * K / period
        kwargs.setdefault('xPrimeMax', 1.0)
        src = super(Wiggler, cls).create(name=name, B0=B, **kwargs)
        # auto-reduce xPrimeMax to K/gamma (sybase.py:402-414)
        gamma = src.gamma
        xpm = min(src.xPrimeMax, (K if K > 0 else 2.0) / gamma)
        return src.replace(K=jnp.asarray(K, dt), L0=float(period),
                           n=int(n), xPrimeMax=xpm)

    @property
    def Np(self):
        return self.n

    @property
    def X0(self):
        """Amplitude of the wiggling motion, mm (synchr.py:91)."""
        return 0.5 * float(self.K) * self.L0 / self.gamma / PI

    def _sample_positions(self, key, E, Theta0, nrays, dt):
        """Per-pole y sampling (synchr.py:400-412)."""
        k1, k2, k3 = jax.random.split(key, 3)
        sigma_r2 = 2 * (CHeVcm / E * 10 * self.L0 * self.Np) / PI2 ** 2
        sourceSIGMAx = jnp.sqrt(self.dx ** 2 + sigma_r2)
        sourceSIGMAz = jnp.sqrt(self.dz ** 2 + sigma_r2)
        s = jnp.clip(Theta0 * self.gamma / self.K, -1.0, 1.0)
        y = ((jnp.arccos(s) / PI) +
             jax.random.randint(k1, (nrays,), -int(self.Np), int(self.Np))
             - 0.5) * 0.5 * self.L0
        x = self.X0 * jnp.sin(PI2 * y / self.L0) + \
            sourceSIGMAx * jax.random.normal(k2, (nrays,), dt)
        z = sourceSIGMAz * jax.random.normal(k3, (nrays,), dt)
        return x, y, z

    def power_vs_K(self, K=None):
        """Total radiated power in W vs K (cf. synchr.py:572-600):
        P[W] = 0.633 * E^2[GeV] * B^2[T] * L[m] * I[A]."""
        Kv = self.K if K is None else jnp.asarray(K)
        B = K2B * Kv / self.L0
        length = self.L0 * self.Np * 1e-3  # m
        return 0.633 * (self.eE ** 2) * (B ** 2) * length * self.eI * 1e3
