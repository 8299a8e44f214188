"""Analytic coherent beams (Gaussian, Laguerre-Gaussian, Hermite-Gaussian)
and mesh sources.

TPU-native re-implementation of the analytic sources of
xrt/backends/raycing/sources/geoms.py (GaussianBeam:445,
LaguerreGaussianBeam:667, HermiteGaussianBeam:689, MeshSource:709,
NESWSource:849, CollimatedMeshSource:889).

The Gaussian beams evaluate complex fields on wave sample points created by
``prepare_wave`` of a downstream element; Hermite and generalized Laguerre
polynomials are computed by their recurrences (static order) on device.
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
from ..physconsts import CHBAR
from ..transforms import rotate_xyz, virgin_local_to_global
from .geometric import make_energy, polarization_matrix


def hermite_poly(n, x):
    """Physicists' Hermite H_n(x) by recurrence (static n)."""
    if n == 0:
        return jnp.ones_like(x)
    h0 = jnp.ones_like(x)
    h1 = 2 * x
    for k in range(1, n):
        h0, h1 = h1, 2 * x * h1 - 2 * k * h0
    return h1


def genlaguerre_poly(p, alpha, x):
    """Generalized Laguerre L_p^alpha(x) by recurrence (static p)."""
    if p == 0:
        return jnp.ones_like(x)
    l0 = jnp.ones_like(x)
    l1 = 1 + alpha - x
    for k in range(1, p):
        l0, l1 = l1, ((2 * k + 1 + alpha - x) * l1 -
                      (k + alpha) * l0) / (k + 1)
    return l1


@struct.dataclass
class GaussianBeam:
    """Analytic Gaussian beam evaluated at wave sample points
    (cf. geoms.py:445-663).  *w0* is the waist (scalar or (wx, wz))."""
    center: jnp.ndarray = None
    w0: jnp.ndarray = None             # scalar or (2,)
    energies: jnp.ndarray = None
    energyWeights: Optional[jnp.ndarray] = None
    pitch: jnp.ndarray = None
    roll: jnp.ndarray = None
    yaw: jnp.ndarray = None
    distE: str = struct.field(pytree_node=False, default='lines')
    polarization: object = struct.field(pytree_node=False,
                                        default='horizontal')
    vortex: Optional[Tuple[int, int]] = struct.field(pytree_node=False,
                                                     default=None)
    tem: Optional[Tuple[int, int]] = struct.field(pytree_node=False,
                                                  default=None)
    name: str = struct.field(pytree_node=False, default='')

    @classmethod
    def create(cls, name='', center=(0, 0, 0), w0=0.1, distE='lines',
               energies=(config.DEFAULT_ENERGY,), energyWeights=None,
               polarization='horizontal', pitch=0.0, roll=0.0, yaw=0.0,
               vortex=None, TEM=None):
        dt = config.dtype()
        if distE == 'lines' and isinstance(energies, (int, float)):
            energies = (energies,)
        return cls(center=jnp.asarray(center, dt),
                   w0=jnp.asarray(w0, dt),
                   energies=jnp.asarray(energies, dt),
                   energyWeights=None if energyWeights is None
                   else jnp.asarray(energyWeights, dt),
                   pitch=jnp.asarray(pitch, dt),
                   roll=jnp.asarray(roll, dt), yaw=jnp.asarray(yaw, dt),
                   distE=distE, polarization=polarization,
                   vortex=None if vortex is None else tuple(vortex),
                   tem=None if TEM is None else tuple(TEM), name=name)

    def rayleigh_range(self, E, w0=None):
        if w0 is None:
            w0 = self.w0[0] if self.w0.ndim else self.w0
        k = E / CHBAR * 1e7
        return k / 2 * w0 ** 2

    def w(self, y, E=None, yR=None, w0=None):
        if w0 is None:
            w0 = self.w0[0] if self.w0.ndim else self.w0
        if yR is None:
            yR = self.rayleigh_range(E, w0)
        return w0 * jnp.sqrt(1 + (y / yR) ** 2)

    def shine(self, key, wave, toGlobal=True):
        """Fill *wave* (from a prepare_wave) with the analytic field
        (cf. geoms.py shine:540-663).  Returns the beam at the receiving
        points."""
        dt = wave.xDiffr.dtype
        n = wave.xDiffr.shape[0]
        kE, kpol = jax.random.split(key)
        E = make_energy(kE, self.distE, self.energies, n,
                        self.energyWeights, dt) if self.distE else wave.E
        Jss0, Jpp0, Jsp0, Es0, Ep0 = polarization_matrix(self.polarization)
        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        # complex constants via config.cfull: eager complex transfers are
        # unimplemented on some TPU transports (axon tunnel)
        from .. import config as _config
        Es = _config.cfull((n,), 0.0 if Es0 is None else Es0, cdt)
        if Ep0 is None and Es0 is not None:
            Ep = (jax.random.uniform(kpol, (n,), dt) *
                  2 ** -0.5).astype(cdt)
        else:
            Ep = _config.cfull((n,), 0.0 if Ep0 is None else Ep0, cdt)
        Jss = jnp.full((n,), Jss0, dt)
        Jpp = jnp.full((n,), Jpp0, dt)
        Jsp = _config.cfull((n,), Jsp0, cdt)

        if self.vortex is not None:
            l, p = self.vortex
            gouy = abs(l) + 2 * p
        elif self.tem is not None:
            m, nn = self.tem
            gouy = m + nn
        else:
            gouy = 0
        k = E / CHBAR * 1e7
        yD = wave.yDiffr
        if self.w0.ndim:  # separate x/z waists (astigmatic Gaussian)
            amp = jnp.sqrt(2 / math.pi) * jnp.exp(1j * k * yD)
            ws = []
            for iw in range(2):
                w0 = self.w0[iw]
                yR = k / 2 * w0 ** 2
                invR = yD / (yD ** 2 + yR ** 2)
                psi = (gouy + 1) * jnp.arctan2(yD, yR) * 0.5
                wloc = self.w(yD, yR=yR, w0=w0)
                rSquare = wave.xDiffr ** 2 if iw == 0 else wave.zDiffr ** 2
                ws.append(wloc)
                amp = amp * wloc ** (-0.5) * jnp.exp(
                    -rSquare / wloc ** 2 + 0.5j * k * rSquare * invR -
                    1j * psi)
            wx, wz = ws
            w_ = wx
            rSquare = wave.zDiffr ** 2  # matches the reference loop end
        else:
            yR = k / 2 * self.w0 ** 2
            invR = yD / (yD ** 2 + yR ** 2)
            psi = (gouy + 1) * jnp.arctan2(yD, yR)
            w_ = self.w(yD, yR=yR)
            wx = wz = w_
            rSquare = wave.xDiffr ** 2 + wave.zDiffr ** 2
            amp = jnp.sqrt(2 / math.pi) / w_ * jnp.exp(
                -rSquare / w_ ** 2 +
                1j * k * (yD + 0.5 * rSquare * invR) - 1j * psi)

        if self.vortex is not None:
            phi = jnp.arctan2(wave.zDiffr, wave.xDiffr)
            clp = math.sqrt(math.factorial(p) /
                            math.factorial(abs(l) + p))
            amp = amp * clp * (jnp.sqrt(rSquare * 2) / w_) ** abs(l) * \
                jnp.exp(1j * l * phi)
            if p > 0:
                amp = amp * genlaguerre_poly(p, abs(l),
                                             2 * rSquare / w_ ** 2)
        elif self.tem is not None:
            clp = (2 ** (m + nn) * math.factorial(m) *
                   math.factorial(nn)) ** (-0.5)
            amp = amp * clp
            if m > 0:
                amp = amp * hermite_poly(m, math.sqrt(2) * wave.xDiffr / wx)
            if nn > 0:
                amp = amp * hermite_poly(nn, math.sqrt(2) *
                                         wave.zDiffr / wz)

        amp = amp * jnp.sqrt(wave.dS)
        Es = Es * amp
        Ep = Ep * amp
        amp2 = jnp.abs(amp) ** 2
        # ray directions from the wavefront curvature, formulated with
        # invR directly (a 1/invR sentinel squared overflows float32 at
        # the waist, where invR == 0, and NaN'd the whole chain):
        # (a, b, c) ~ (x*invR, sqrt(1 - (x^2+z^2)*invR^2), z*invR)
        a = wave.xDiffr * invR
        c = wave.zDiffr * invR
        b = jnp.sqrt(jnp.clip(1.0 - a ** 2 - c ** 2, 1e-30, None))
        norm = jnp.sqrt(a ** 2 + b ** 2 + c ** 2)
        out = wave.replace(
            E=E, Es=Es, Ep=Ep,
            Jss=Jss * amp2, Jpp=Jpp * amp2, Jsp=Jsp * amp2,
            a=a / norm, b=b / norm, c=c / norm,
            x=wave.xDiffr, y=wave.yDiffr, z=wave.zDiffr,
            path=jnp.sqrt(wave.xDiffr ** 2 + wave.yDiffr ** 2 +
                          wave.zDiffr ** 2))
        if toGlobal:
            x2, y2, z2 = rotate_xyz(out.x, out.y, out.z, pitch=self.pitch,
                                    roll=self.roll, yaw=self.yaw,
                                    skip_zero=False)
            a2, b2, c2 = rotate_xyz(out.a, out.b, out.c, pitch=self.pitch,
                                    roll=self.roll, yaw=self.yaw,
                                    skip_zero=False)
            out = out.replace(x=x2, y=y2, z=z2, a=a2, b=b2, c=c2)
            out = virgin_local_to_global(out, self.center)
        return out


def LaguerreGaussianBeam(vortex=(1, 0), **kwargs):
    """Laguerre-Gaussian beam (geoms.py:667-686): vortex=(l, p)."""
    return GaussianBeam.create(vortex=vortex, **kwargs)


def HermiteGaussianBeam(TEM=(0, 0), **kwargs):
    """Hermite-Gaussian beam of order TEM=(m, n) (geoms.py:689-706)."""
    return GaussianBeam.create(TEM=TEM, **kwargs)


@struct.dataclass
class MeshSource:
    """Point source emitting a rectangular angular mesh of rays
    (cf. geoms.py:709-846); useful for matching divergences to element
    sizes.  *withCentralRay* makes ray 0 axial."""
    center: jnp.ndarray = None
    minxprime: float = struct.field(pytree_node=False, default=-1e-4)
    maxxprime: float = struct.field(pytree_node=False, default=1e-4)
    minzprime: float = struct.field(pytree_node=False, default=-1e-4)
    maxzprime: float = struct.field(pytree_node=False, default=1e-4)
    nx: int = struct.field(pytree_node=False, default=11)
    nz: int = struct.field(pytree_node=False, default=11)
    energies: jnp.ndarray = None
    energyWeights: Optional[jnp.ndarray] = None
    distE: str = struct.field(pytree_node=False, default='lines')
    polarization: object = struct.field(pytree_node=False,
                                        default='horizontal')
    withCentralRay: bool = struct.field(pytree_node=False, default=True)
    compass: bool = struct.field(pytree_node=False, default=False)
    fluxes: Optional[jnp.ndarray] = None   # per-node flux, else 1

    @classmethod
    def create(cls, name='', center=(0, 0, 0), minxprime=-1e-4,
               maxxprime=1e-4, minzprime=-1e-4, maxzprime=1e-4, nx=11,
               nz=11, distE='lines', energies=(config.DEFAULT_ENERGY,),
               energyWeights=None, polarization='horizontal',
               withCentralRay=True, fluxes=None, compass=False):
        dt = config.dtype()
        if distE == 'lines' and isinstance(energies, (int, float)):
            energies = (energies,)
        return cls(center=jnp.asarray(center, dt),
                   minxprime=float(minxprime), maxxprime=float(maxxprime),
                   minzprime=float(minzprime), maxzprime=float(maxzprime),
                   nx=int(nx), nz=int(nz),
                   energies=jnp.asarray(energies, dt),
                   energyWeights=None if energyWeights is None
                   else jnp.asarray(energyWeights, dt),
                   distE=distE, polarization=polarization,
                   withCentralRay=withCentralRay, compass=compass,
                   fluxes=None if fluxes is None
                   else jnp.asarray(fluxes, dt))

    @property
    def nrays(self):
        if self.compass:
            return 4 + int(self.withCentralRay)
        return self.nx * self.nz + int(self.withCentralRay)

    def shine(self, key, toGlobal=True) -> Beam:
        dt = self.center.dtype
        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        if self.compass:
            # N, E, S, W rays (reference NESWSource, geoms.py:849-886)
            a = jnp.asarray([0.0, self.maxxprime, 0.0, self.minxprime], dt)
            c = jnp.asarray([self.maxzprime, 0.0, self.minzprime, 0.0], dt)
        else:
            xp = np.linspace(self.minxprime, self.maxxprime, self.nx)
            zp = np.linspace(self.minzprime, self.maxzprime, self.nz)
            XP, ZP = np.meshgrid(xp, zp)
            a = jnp.asarray(XP.ravel(), dt)
            c = jnp.asarray(ZP.ravel(), dt)
        if self.withCentralRay:
            a = jnp.concatenate([jnp.zeros((1,), dt), a])
            c = jnp.concatenate([jnp.zeros((1,), dt), c])
        n = a.shape[0]
        b = jnp.sqrt(jnp.clip(1 - a ** 2 - c ** 2, 0.0, None))
        E = make_energy(key, self.distE, self.energies, n,
                        self.energyWeights, dt) if self.distE else \
            jnp.full((n,), config.DEFAULT_ENERGY, dt)
        Jss0, Jpp0, Jsp0, _, _ = polarization_matrix(self.polarization)
        flux = jnp.ones((n,), dt) if self.fluxes is None else self.fluxes
        beam = Beam(
            x=jnp.zeros((n,), dt), y=jnp.zeros((n,), dt),
            z=jnp.zeros((n,), dt), a=a, b=b, c=c, E=E,
            state=jnp.ones((n,), jnp.int32), path=jnp.zeros((n,), dt),
            Jss=flux * Jss0, Jpp=flux * Jpp0,
            Jsp=(flux * Jsp0).astype(cdt))
        if toGlobal:
            beam = virgin_local_to_global(beam, self.center)
        return beam


def NESWSource(name='', center=(0, 0, 0), dxprime=1e-4, dzprime=1e-4,
               **kwargs):
    """Four rays: N(up), E(right), S(down), W(left)
    (cf. geoms.py:849-886); used for aperture auto-fitting."""
    return MeshSource.create(
        name=name, center=center, minxprime=-dxprime, maxxprime=dxprime,
        minzprime=-dzprime, maxzprime=dzprime, nx=2, nz=2,
        withCentralRay=False, compass=True, **kwargs)


@struct.dataclass
class CollimatedMeshSource:
    """Collimated source of a rectangular positional mesh of parallel rays
    (cf. geoms.py:889-976)."""
    center: jnp.ndarray = None
    dx: float = struct.field(pytree_node=False, default=1.0)
    dz: float = struct.field(pytree_node=False, default=1.0)
    nx: int = struct.field(pytree_node=False, default=11)
    nz: int = struct.field(pytree_node=False, default=11)
    energies: jnp.ndarray = None
    distE: str = struct.field(pytree_node=False, default='lines')
    polarization: object = struct.field(pytree_node=False,
                                        default='horizontal')

    @classmethod
    def create(cls, name='', center=(0, 0, 0), dx=1.0, dz=1.0, nx=11,
               nz=11, distE='lines', energies=(config.DEFAULT_ENERGY,),
               polarization='horizontal'):
        dt = config.dtype()
        if distE == 'lines' and isinstance(energies, (int, float)):
            energies = (energies,)
        return cls(center=jnp.asarray(center, dt), dx=float(dx),
                   dz=float(dz), nx=int(nx), nz=int(nz),
                   energies=jnp.asarray(energies, dt), distE=distE,
                   polarization=polarization)

    def shine(self, key, toGlobal=True) -> Beam:
        dt = self.center.dtype
        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        xs = np.linspace(-self.dx / 2, self.dx / 2, self.nx)
        zs = np.linspace(-self.dz / 2, self.dz / 2, self.nz)
        X, Z = np.meshgrid(xs, zs)
        x = jnp.asarray(X.ravel(), dt)
        z = jnp.asarray(Z.ravel(), dt)
        n = x.shape[0]
        E = make_energy(key, self.distE, self.energies, n, None, dt)
        Jss0, Jpp0, Jsp0, _, _ = polarization_matrix(self.polarization)
        beam = Beam(
            x=x, y=jnp.zeros((n,), dt), z=z,
            a=jnp.zeros((n,), dt), b=jnp.ones((n,), dt),
            c=jnp.zeros((n,), dt), E=E,
            state=jnp.ones((n,), jnp.int32), path=jnp.zeros((n,), dt),
            Jss=jnp.full((n,), Jss0, dt), Jpp=jnp.full((n,), Jpp0, dt),
            Jsp=jnp.full((n,), Jsp0, cdt))
        if toGlobal:
            beam = virgin_local_to_global(beam, self.center)
        return beam


def shrink_source(trace_fn, beams, minxprime, maxxprime, minzprime,
                  maxzprime, nx, nz, center=(0, 0, 0), key=None):
    """Shrink a mesh source's divergence window until the footprint(s) fit
    the optical surfaces (the reference utility geoms.py:1041-1146).

    *trace_fn(source) -> {name: Beam}* traces the beamline with the given
    source; *beams* names the footprint beams whose ``state`` must become
    all-good.  Returns the fitted :class:`MeshSource`.

    Functional adaptation of the reference: instead of swapping
    ``beamLine.sources[0]`` in place, the caller's *trace_fn* closes over
    the beamline and receives the probe source."""
    import jax as _jax
    if key is None:
        key = _jax.random.PRNGKey(0)
    if not isinstance(beams, (tuple, list)):
        beams = (beams,)
    mesh = None
    for ibeam in beams:
        # sanity probe: the four compass rays must land on the surface
        # (the reference also uses them for footprint-orientation
        # discovery, which the direct-space trim below does not need)
        nesw = NESWSource(center=center, dxprime=maxxprime * 0.1,
                          dzprime=maxzprime * 0.1)
        beam = trace_fn(nesw)[ibeam]
        state = np.asarray(beam.state)
        if (state != 1).any():
            raise ValueError('cannot shrink the source: the NESW probe '
                             'rays miss the surface')
        mesh = MeshSource.create(
            center=center, minxprime=minxprime, maxxprime=maxxprime,
            minzprime=minzprime, maxzprime=maxzprime, nx=nx, nz=nz)
        beam = trace_fn(mesh)[ibeam]
        state = np.asarray(beam.state)
        badNum = (state[1:] if mesh.withCentralRay else state) \
            .reshape(nz, nx) != 1
        # trim the divergence window by peeling grid edges: the grid IS
        # the (z', x') source space (row 0 = minzprime, col 0 =
        # minxprime), so edge trims map directly to the window bounds.
        # (The reference deletes interior rows through footprint-side
        # bookkeeping, geoms.py:1072-1140; edge peeling converges to the
        # same all-good window without the index-shift pitfalls.)
        dxp = (maxxprime - minxprime) / (nx - 1)
        dzp = (maxzprime - minzprime) / (nz - 1)
        view = badNum
        nxLo = nxHi = nzLo = nzHi = 0
        while view.size and view.sum() > 0:
            cand = {'zlo': view[0].sum() / view.shape[1],
                    'zhi': view[-1].sum() / view.shape[1],
                    'xlo': view[:, 0].sum() / view.shape[0],
                    'xhi': view[:, -1].sum() / view.shape[0]}
            side = max(cand, key=cand.get)
            if side == 'zlo':
                nzLo += 1
                view = view[1:]
            elif side == 'zhi':
                nzHi += 1
                view = view[:-1]
            elif side == 'xlo':
                nxLo += 1
                view = view[:, 1:]
            else:
                nxHi += 1
                view = view[:, :-1]
        # one extra step of safety margin, like the reference
        if nxLo > 1:
            nxLo += 1
        if nxHi > 1:
            nxHi += 1
        if nzLo > 1:
            nzLo += 1
        if nzHi > 1:
            nzHi += 1
        minxprime += nxLo * dxp
        maxxprime -= nxHi * dxp
        minzprime += nzLo * dzp
        maxzprime -= nzHi * dzp
        mesh = MeshSource.create(
            center=center, minxprime=minxprime, maxxprime=maxxprime,
            minzprime=minzprime, maxzprime=maxzprime, nx=nx, nz=nz)
    return mesh
