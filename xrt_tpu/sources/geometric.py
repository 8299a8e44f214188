"""Geometric (sampled-distribution) sources.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/sources/geoms.py (make_energy:16, make_polarization:37,
GeometricSource:156 with shine:330-445): ray origins, divergences and
energies sampled from normal/flat/annulus/lines laws with explicit
``jax.random`` keys, polarization encoded in the coherency matrix.
Everything is jit-compatible with static shapes.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..beam import Beam
from ..physconsts import PI2
from ..transforms import rotate_xyz, virgin_local_to_global


def make_energy(key, distE, energies, nrays, energyWeights=None, dtype=None):
    """Sample the energy distribution (cf. geoms.py:16-33).  *distE* is
    'normal' ((center, sigma)), 'flat' ((min, max)) or 'lines' (sequence of
    E with optional weights)."""
    dt = dtype or config.dtype()
    energies = jnp.asarray(energies, dt)
    if distE == 'normal':
        return energies[0] + energies[1] * jax.random.normal(key, (nrays,),
                                                             dt)
    if distE == 'flat':
        return jax.random.uniform(key, (nrays,), dt, energies[0],
                                  energies[1])
    if distE == 'lines':
        if energyWeights is not None:
            w = jnp.asarray(energyWeights, dt)
            p = w / jnp.sum(w)
        else:
            p = jnp.ones((energies.shape[0],), dt) / energies.shape[0]
        idx = jax.random.choice(key, energies.shape[0], (nrays,), p=p)
        return energies[idx]
    raise ValueError(f'unknown distE {distE!r}')


def polarization_matrix(polarization):
    """(Jss, Jpp, Jsp, Es, Ep) scalars for the named polarization
    (cf. geoms.py:37-155).  For unpolarized the amplitudes are not
    meaningful; Es=1/sqrt(2), Ep carries a random phase applied by the
    caller when amplitudes are requested."""
    if polarization is None:
        return 0.5, 0.5, 0j, 2 ** -0.5, None
    if isinstance(polarization, (tuple, list)) and len(polarization) == 4:
        Jss, Jpp, ReJsp, ImJsp = polarization
        return float(Jss), float(Jpp), ReJsp + 1j * ImJsp, None, None
    if isinstance(polarization, str):
        p = polarization.lower()
        if p.startswith('un'):
            return 0.5, 0.5, 0j, 2 ** -0.5, None
        if p.startswith('r'):
            return 0.5, 0.5, 0.5j, 2 ** -0.5, -1j * 2 ** -0.5
        if p.startswith('l'):
            return 0.5, 0.5, -0.5j, 2 ** -0.5, 1j * 2 ** -0.5
        if p.startswith('h'):
            angle = 0.0
        elif p.startswith('v'):
            angle = math.pi / 2
        else:
            angle = math.radians(float(p))
    else:
        angle = math.radians(float(polarization))
    Es = math.cos(angle)
    Ep = math.sin(angle)
    return Es * Es, Ep * Ep, complex(Es * Ep), Es, Ep


@struct.dataclass
class GeometricSource:
    """A source with sampled origin, divergence and energy distributions.

    *distx/disty/distz* in {'normal', 'flat', 'annulus', None};
    *distxprime/distzprime* likewise; *distE* in {'normal', 'flat', 'lines',
    None}.  Sizes: for 'normal' sigma (or (sigma, cut) with
    uniformRayDensity), for 'flat' full width or (min, max), for 'annulus'
    (rMin, rMax) on the radial member and optionally (phiMin, phiMax) on the
    other."""
    center: jnp.ndarray = None
    dx: jnp.ndarray = None
    dy: jnp.ndarray = None
    dz: jnp.ndarray = None
    dxprime: jnp.ndarray = None
    dzprime: jnp.ndarray = None
    energies: jnp.ndarray = None
    energyWeights: Optional[jnp.ndarray] = None
    pitch: jnp.ndarray = None
    roll: jnp.ndarray = None
    yaw: jnp.ndarray = None
    nrays: int = struct.field(pytree_node=False, default=None)
    distx: str = struct.field(pytree_node=False, default='normal')
    disty: Optional[str] = struct.field(pytree_node=False, default=None)
    distz: str = struct.field(pytree_node=False, default='normal')
    distxprime: str = struct.field(pytree_node=False, default='normal')
    distzprime: str = struct.field(pytree_node=False, default='normal')
    distE: str = struct.field(pytree_node=False, default='lines')
    polarization: object = struct.field(pytree_node=False,
                                        default='horizontal')
    uniformRayDensity: bool = struct.field(pytree_node=False, default=False)
    filamentBeam: bool = struct.field(pytree_node=False, default=False)
    name: str = struct.field(pytree_node=False, default='')

    @classmethod
    def create(cls, name='', center=(0, 0, 0), nrays=None,
               distx='normal', dx=0.32, disty=None, dy=0.0, distz='normal',
               dz=0.018, distxprime='normal', dxprime=1e-3,
               distzprime='normal', dzprime=1e-4, distE='lines',
               energies=(config.DEFAULT_ENERGY,), energyWeights=None,
               polarization='horizontal', filamentBeam=False,
               uniformRayDensity=False, pitch=0.0, roll=0.0, yaw=0.0):
        dt = config.dtype()
        if nrays is None:
            nrays = config.NRAYS

        def arr(v):
            return jnp.asarray(v, dt)
        if distE == 'lines' and isinstance(energies, (int, float)):
            energies = (energies,)
        return cls(center=arr(center), dx=arr(dx), dy=arr(dy), dz=arr(dz),
                   dxprime=arr(dxprime), dzprime=arr(dzprime),
                   energies=arr(energies),
                   energyWeights=None if energyWeights is None
                   else arr(energyWeights),
                   pitch=arr(pitch), roll=arr(roll), yaw=arr(yaw),
                   nrays=int(nrays), distx=distx, disty=disty, distz=distz,
                   distxprime=distxprime, distzprime=distzprime, distE=distE,
                   polarization=polarization,
                   uniformRayDensity=uniformRayDensity,
                   filamentBeam=filamentBeam, name=name)

    # ------------------------------------------------------------------
    def _sample_axis(self, key, dist, d, nrays, dt):
        """Returns (samples, amplitude_factor or None)."""
        if dist == 'normal':
            if self.uniformRayDensity:
                sigma, cut = d[0], d[1]
                x = jax.random.uniform(key, (nrays,), dt, -cut, cut)
                amp = jnp.exp(-x ** 2 / sigma ** 2 / 2) / \
                    PI2 ** 0.5 / sigma * 2 * cut
                return x, amp
            sigma = d[0] if d.ndim > 0 else d
            return sigma * jax.random.normal(key, (nrays,), dt), None
        if dist == 'flat':
            if d.ndim > 0:
                aMin, aMax = d[0], d[1]
            else:
                aMin, aMax = -d * 0.5, d * 0.5
            return jax.random.uniform(key, (nrays,), dt, aMin, aMax), None
        return jnp.zeros((nrays,), dt), None

    def _sample_annulus(self, key, dr, dphi, nrays, dt):
        """Uniform-in-area annulus (geoms.py:322-330)."""
        kr, kphi = jax.random.split(key)
        rMin, rMax = dr[0], dr[1]
        u = jax.random.uniform(kr, (nrays,), dt)
        r = jnp.sqrt(u * (rMax ** 2 - rMin ** 2) + rMin ** 2)
        if dphi is not None and dphi.ndim > 0:
            phiMin, phiMax = dphi[0], dphi[1]
        else:
            phiMin, phiMax = 0.0, PI2
        phi = jax.random.uniform(kphi, (nrays,), dt, phiMin, phiMax)
        return r * jnp.cos(phi), r * jnp.sin(phi)

    def shine(self, key, toGlobal=True, withAmplitudes=False) -> Beam:
        """Generate the source beam (cf. geoms.py:330-445).  *key* is a
        jax PRNG key; pure and jittable."""
        dt = self.center.dtype
        cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        nrays = self.nrays
        if self.uniformRayDensity:
            withAmplitudes = True
        (kx, ky, kz, kxp, kzp, kE, kpol) = jax.random.split(key, 7)

        Jss0, Jpp0, Jsp0, Es0, Ep0 = polarization_matrix(self.polarization)
        # complex fills go through config.cfull: an eager complex
        # jnp.full is a doomed host->device transfer on some TPU
        # transports (axon tunnel)
        from .. import config as _config
        Jss = jnp.full((nrays,), Jss0, dt)
        Jpp = jnp.full((nrays,), Jpp0, dt)
        Jsp = _config.cfull((nrays,), Jsp0, cdt)
        if withAmplitudes:
            Es = _config.cfull((nrays,), 0.0 if Es0 is None else Es0, cdt)
            if Ep0 is None and Es0 is not None:  # unpolarized: random Ep
                Ep = (jax.random.uniform(kpol, (nrays,), dt) *
                      2 ** -0.5).astype(cdt)
            else:
                Ep = _config.cfull((nrays,), 0.0 if Ep0 is None else Ep0,
                                   cdt)
        else:
            Es = Ep = None

        y, _ = self._sample_axis(ky, self.disty, self.dy, nrays, dt)

        ampTot = None

        def mul_amp(ampTot, amp):
            if amp is None:
                return ampTot
            return amp if ampTot is None else ampTot * amp

        if 'annulus' in (self.distx, self.distz):
            x, z = self._sample_annulus(kx, self.dx, self.dz, nrays, dt)
        else:
            x, ax = self._sample_axis(kx, self.distx, self.dx, nrays, dt)
            z, az = self._sample_axis(kz, self.distz, self.dz, nrays, dt)
            ampTot = mul_amp(mul_amp(ampTot, ax), az)

        if 'annulus' in (self.distxprime, self.distzprime):
            a, c = self._sample_annulus(kxp, self.dxprime, self.dzprime,
                                        nrays, dt)
        else:
            a, aa = self._sample_axis(kxp, self.distxprime, self.dxprime,
                                      nrays, dt)
            c, ac = self._sample_axis(kzp, self.distzprime, self.dzprime,
                                      nrays, dt)
            ampTot = mul_amp(mul_amp(ampTot, aa), ac)

        if ampTot is not None:
            Jss = Jss * ampTot
            Jpp = Jpp * ampTot
            Jsp = Jsp * ampTot
            if withAmplitudes:
                sqrtAmp = jnp.sqrt(ampTot)
                Es = Es * sqrtAmp
                Ep = Ep * sqrtAmp

        # normalize direction (geoms.py:408-416)
        ac2 = a ** 2 + c ** 2
        big = ac2 > 1
        bnorm = jnp.where(big, jnp.sqrt(ac2 + 1), 1.0)
        b = jnp.where(big, 1.0 / bnorm, jnp.sqrt(jnp.clip(1 - ac2, 0.0,
                                                          None)))
        a = jnp.where(big, a / bnorm, a)
        c = jnp.where(big, c / bnorm, c)

        if self.distE is not None:
            E = make_energy(kE, self.distE, self.energies, nrays,
                            self.energyWeights, dt)
        else:
            E = jnp.full((nrays,), config.DEFAULT_ENERGY, dt)

        beam = Beam(x=x, y=y, z=z, a=a, b=b, c=c, E=E,
                    state=jnp.full((nrays,), config.STATE_GOOD, jnp.int32),
                    path=jnp.zeros((nrays,), dt),
                    Jss=Jss, Jpp=Jpp, Jsp=Jsp, Es=Es, Ep=Ep)
        x2, y2, z2 = rotate_xyz(beam.x, beam.y, beam.z, pitch=self.pitch,
                                roll=self.roll, yaw=self.yaw,
                                skip_zero=False)
        a2, b2, c2 = rotate_xyz(beam.a, beam.b, beam.c, pitch=self.pitch,
                                roll=self.roll, yaw=self.yaw,
                                skip_zero=False)
        beam = beam.replace(x=x2, y=y2, z=z2, a=a2, b=b2, c=c2)
        if toGlobal:
            beam = virgin_local_to_global(beam, self.center)
        return beam
