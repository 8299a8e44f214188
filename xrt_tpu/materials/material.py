"""Amorphous materials: refractive index, absorption, Fresnel amplitudes.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/materials/material.py:14-493 (class Material) as a
functional pytree: all numeric state is jnp leaves, all methods are pure and
jittable, and the whole object is differentiable (e.g. d(reflectivity)/d(rho)
works by construction).
"""
from __future__ import annotations

from typing import Tuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..physconsts import PI2, CH, CHBAR, R0, AVOGADRO
from .element import Element

_MIRROR_KINDS = ('mirror', 'thin mirror', 'grating')
_TRANSMIT_KINDS = ('plate', 'lens', 'FZP')


@struct.dataclass
class Material:
    """A material given by chemical formula and density.

    *kind* is one of 'mirror', 'thin mirror', 'plate', 'lens', 'grating',
    'FZP' ('auto' resolves to the hosting optical element's preference).
    *rho* is density in g/cm^3, *t* thickness in mm (needed for
    'thin mirror').
    """
    elements: Tuple[Element, ...]
    quantities: jnp.ndarray
    rho: jnp.ndarray
    t: Optional[jnp.ndarray] = None
    kind: str = struct.field(pytree_node=False, default='auto')
    name: str = struct.field(pytree_node=False, default='')
    table: str = struct.field(pytree_node=False, default='Chantler total')
    # constant (energy-independent) refractive index override, or None;
    # tabulated override: (nE,) energy grid + complex n values
    refractiveIndex: Optional[jnp.ndarray] = None
    riE: Optional[jnp.ndarray] = None
    riN: Optional[jnp.ndarray] = None
    # grating efficiency: static orders tuple + per-order efficiency;
    # either constant values (efficiency_E is None) or energy tables
    # (material.py:26-27, 78-98, get_grating_efficiency:391)
    efficiency_orders: Tuple[int, ...] = struct.field(pytree_node=False,
                                                      default=())
    efficiency_I: Optional[jnp.ndarray] = None   # (n_orders,) or (n_orders, nE)
    efficiency_E: Optional[jnp.ndarray] = None   # (nE,) or None

    @staticmethod
    def read_ri_file(fname):
        """Tabulated refractive index file (e.g. refractiveindex.info CSV
        with sparse k column, material.py:284-331).  Returns (E [eV],
        complex n) numpy arrays."""
        import numpy as np
        En, Ek, n, k = [], [], [], []
        with open(fname) as f:
            for li in f:
                fields = li.split(',')
                try:
                    float(fields[0])
                except ValueError:
                    continue
                if len(fields) < 3:
                    En.append(float(fields[0]))
                    n.append(float(fields[-1]))
                else:
                    Ek.append(float(fields[0]))
                    k.append(float(fields[-1]))
                    if len(fields[1].strip()) > 0:
                        En.append(float(fields[0]))
                        n.append(float(fields[1]))
        En = np.asarray(En)
        kk = np.interp(En, np.asarray(Ek), np.asarray(k)) if Ek else \
            np.zeros_like(En)
        return En, np.asarray(n) + 1j * kk

    @classmethod
    def create(cls, elements, quantities=None, kind='auto', rho=0.0, t=None,
               table='Chantler total', name='', refractiveIndex=None,
               refractiveIndexFile=None,
               efficiency=None, efficiencyFile=None):
        from .. import config
        dt = config.dtype()
        if isinstance(elements, str):
            elements = (elements,)
        els = tuple(Element.create(e, table) for e in elements)
        if quantities is None:
            quantities = [1.0] * len(els)
        if name == '':
            name = ''.join(el.name for el in els)
        ri = None if refractiveIndex is None else jnp.asarray(
            refractiveIndex, config.cdtype())
        riE = riN = None
        if refractiveIndexFile is not None:
            E_tab, n_tab = cls.read_ri_file(refractiveIndexFile)
            riE = jnp.asarray(E_tab, dt)
            # complex table via lax.complex of two real transfers (eager
            # complex host->device is unimplemented on some transports)
            riN = jax.lax.complex(jnp.asarray(n_tab.real, dt),
                                  jnp.asarray(n_tab.imag, dt))
        eff_orders = ()
        eff_I = eff_E = None
        if efficiency is not None:
            import numpy as np
            eff_orders = tuple(int(o) for o, _ in efficiency)
            if efficiencyFile is None:
                eff_I = jnp.asarray([float(v) for _, v in efficiency], dt)
            else:
                # text table: 0th column energy, others per-order
                # efficiencies selected by the 1-based column index in
                # *efficiency* (material.py:84-98)
                data = np.loadtxt(efficiencyFile)
                eff_E = jnp.asarray(data[:, 0], dt)
                eff_I = jnp.asarray(
                    np.stack([data[:, int(v)] for _, v in efficiency]), dt)
        return cls(elements=els, quantities=jnp.asarray(quantities, dt),
                   rho=jnp.asarray(rho, dt),
                   t=None if t is None else jnp.asarray(t, dt),
                   kind=kind, name=name, table=table, refractiveIndex=ri,
                   riE=riE, riN=riN,
                   efficiency_orders=eff_orders, efficiency_I=eff_I,
                   efficiency_E=eff_E)

    @property
    def mass(self):
        """Molar mass of the formula unit, g/mol."""
        masses = jnp.asarray([e.mass for e in self.elements])
        return jnp.sum(self.quantities * masses)

    def resolved_kind(self, default='mirror') -> str:
        return default if self.kind == 'auto' else self.kind

    def get_grating_efficiency(self, E, order):
        """Per-ray amplitude from the tabulated grating efficiency
        (material.py:391-413): match each ray's diffraction *order* against
        the configured orders, optionally interpolating in energy.
        Returns (ampS, ampP)."""
        E = jnp.asarray(E)
        order = jnp.asarray(order)
        resI = jnp.zeros(E.shape, E.dtype)
        for i, o in enumerate(self.efficiency_orders):
            if self.efficiency_E is None:
                val = self.efficiency_I[i]
            else:
                from ..ops.interp import fast_interp
                val = fast_interp(E, self.efficiency_E,
                                  self.efficiency_I[i])
            resI = jnp.where(order == o, val, resI)
        amp = jnp.sqrt(jnp.clip(resI, 0.0, None))
        return amp, amp

    def get_refractive_index(self, E):
        r"""n(E) = 1 - r0*lambda^2*N_A*rho/(2 pi M) * sum_i x_i f_i(0)
        (cf. material.py:348-378)."""
        if self.refractiveIndex is not None:
            return jnp.broadcast_to(self.refractiveIndex,
                                    jnp.shape(E))
        if self.riE is not None:
            E = jnp.asarray(E)
            from ..ops.interp import fast_interp
            nr = fast_interp(E, self.riE, self.riN.real)
            ni = fast_interp(E, self.riE, self.riN.imag)
            # no "nr + 1j*ni": an eager complex scalar constant is a
            # doomed host->device transfer on some TPU transports
            return jax.lax.complex(nr, ni)
        E = jnp.asarray(E)
        from .. import config
        xf = config.czeros(E.shape, jnp.result_type(jnp.complex64,
                                                    E.dtype))
        for elem, xi in zip(self.elements,
                            [self.quantities[i]
                             for i in range(len(self.elements))]):
            xf = xf + (elem.Z + elem.get_f1f2(E)) * xi
        return 1 - 1e-24 * AVOGADRO * R0 / PI2 * (CH / E) ** 2 * \
            self.rho * xf / self.mass  # 1e-24 = A^3/cm^3

    def get_absorption_coefficient(self, E):
        r"""Linear absorption coefficient mu = 2*Im(n)*k in 1/cm
        (cf. material.py:380-389)."""
        return jnp.abs(self.get_refractive_index(E).imag) * E / CHBAR * 2e8

    def get_amplitude(self, E, beamInDotNormal, fromVacuum=True):
        r"""Fresnel amplitude reflectivity (kind mirror/'thin mirror'/grating)
        or transmittivity (plate/lens/FZP) for s and p; returns
        (rs, rp, abs_coeff[1/cm], n_real_phase[1/cm])
        (cf. material.py:415-493)."""
        kind = self.resolved_kind()
        if kind == 'FZP':
            one = jnp.ones_like(jnp.asarray(E))
            return one, one, jnp.zeros_like(one), jnp.zeros_like(one)
        n = self.get_refractive_index(E)
        # complex "1" built on device (see get_refractive_index note)
        one_c = jax.lax.complex(jnp.ones_like(n.real),
                                jnp.zeros_like(n.real))
        if fromVacuum:
            n1 = one_c
            n2 = n
        else:
            n1 = n
            n2 = one_c
        cosAlpha = jnp.abs(beamInDotNormal)
        sinAlpha2 = jnp.clip(1 - beamInDotNormal ** 2, 0.0, None)
        n1cosAlpha = n1 * cosAlpha
        q = (n1 / n2) ** 2 * sinAlpha2
        cosBeta = jnp.sqrt(jax.lax.complex(1 - q.real, -q.imag))
        n2cosBeta = n2 * cosBeta
        if kind in _MIRROR_KINDS:
            rs = (n1cosAlpha - n2cosBeta) / (n1cosAlpha + n2cosBeta)
            rp = (n2 * cosAlpha - n1 * cosBeta) / \
                 (n2 * cosAlpha + n1 * cosBeta)
            if kind == 'thin mirror':
                arg = 2 * E / CHBAR * n2cosBeta * self.t * 1e7
                p2 = jnp.exp(jax.lax.complex(-arg.imag, arg.real))
                rs = rs * (1 - p2) / (1 - rs ** 2 * p2)
                rp = rp * (1 - p2) / (1 - rp ** 2 * p2)
        elif kind in _TRANSMIT_KINDS:
            tf = jnp.sqrt((n2cosBeta * n1.conj()).real /
                          jnp.maximum(cosAlpha, 1e-300)) / jnp.abs(n1)
            rs = 2 * n1cosAlpha / (n1cosAlpha + n2cosBeta) * tf
            rp = 2 * n1cosAlpha / (n2 * cosAlpha + n1 * cosBeta) * tf
        else:
            raise ValueError(f'unknown material kind {kind!r} of {self.name}')
        return (rs, rp,
                jnp.abs(n.imag) * E / CHBAR * 2e8,   # mu, 1/cm
                n.real * E / CHBAR * 1e8)            # refraction phase, 1/cm


@struct.dataclass
class EmptyMaterial:
    """Geometry-only material for e.g. gratings with externally given
    efficiency (cf. reference materials/__init__.py:102)."""
    kind: str = struct.field(pytree_node=False, default='mirror')
    name: str = struct.field(pytree_node=False, default='None')

    def resolved_kind(self, default='mirror') -> str:
        return default if self.kind == 'auto' else self.kind

    def get_refractive_index(self, E):
        one = jnp.ones_like(jnp.asarray(E))
        return jax.lax.complex(one, jnp.zeros_like(one))

    def get_absorption_coefficient(self, E):
        return jnp.zeros_like(jnp.asarray(E))

    def get_amplitude(self, E, beamInDotNormal, fromVacuum=True):
        one = jnp.ones_like(jnp.asarray(E))
        zero = jnp.zeros_like(one)
        return one, one, zero, zero
