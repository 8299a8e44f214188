"""The Beam pytree — the central data structure of xrt_tpu.

A beam is a struct-of-arrays container of per-ray quantities, mirroring the
capability of the reference xrt ``Beam`` (xrt/backends/raycing/sources/
beams.py:46-153) but redesigned for XLA: shapes are static, rays are never
filtered by boolean indexing — instead the integer ``state`` array acts as a
mask and dead rays simply carry zero weight in downstream histograms.

Coordinates are in mm (x, y, z origin of each ray), (a, b, c) is the unit
direction, E the photon energy in eV, ``path`` the accumulated path length in
mm.  Polarization is carried by the coherency matrix (Jss, Jpp, Jsp with Jsp
complex) and optionally by complex field amplitudes (Es, Ep) for coherent
(wave) calculations.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import config
from .config import STATE_GOOD


@struct.dataclass
class Beam:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    E: jnp.ndarray
    state: jnp.ndarray
    path: jnp.ndarray
    Jss: jnp.ndarray
    Jpp: jnp.ndarray
    Jsp: jnp.ndarray
    Es: Optional[jnp.ndarray] = None
    Ep: Optional[jnp.ndarray] = None
    # incidence angle at the last OE (rad, from surface) and grating order
    theta: Optional[jnp.ndarray] = None
    order: Optional[jnp.ndarray] = None
    # number of reflections in multiple-reflection elements
    nRefl: Optional[jnp.ndarray] = None
    # parametric coordinates of the last impact point (parametric OEs)
    s: Optional[jnp.ndarray] = None
    phi: Optional[jnp.ndarray] = None
    r: Optional[jnp.ndarray] = None
    # accumulated flux bookkeeping for Monte-Carlo sources (scalars)
    accepted: Optional[jnp.ndarray] = None   # accepted flux, ph/s
    acceptedE: Optional[jnp.ndarray] = None  # accepted power-weighted flux
    seeded: Optional[jnp.ndarray] = None     # number of seeded samples
    seededI: Optional[jnp.ndarray] = None    # integrated seeded intensity
    # receiving-surface data for wave propagation (set by prepare_wave)
    area: Optional[jnp.ndarray] = None       # total receiving area, mm^2
    dS: Optional[jnp.ndarray] = None         # per-sample area elements, mm^2

    @property
    def nrays(self) -> int:
        return self.x.shape[0]

    @property
    def good(self) -> jnp.ndarray:
        """Boolean mask of alive-and-good rays."""
        return self.state == STATE_GOOD

    @property
    def alive(self) -> jnp.ndarray:
        """Mask of rays that still carry flux (good or out-of-optical-limits)."""
        return self.state > 0

    @property
    def intensity(self) -> jnp.ndarray:
        return self.Jss + self.Jpp

    @property
    def flux_good(self) -> jnp.ndarray:
        """Total intensity carried by good rays."""
        return jnp.sum(jnp.where(self.good, self.intensity, 0.0))

    @property
    def degree_of_polarization(self) -> jnp.ndarray:
        I = self.Jss + self.Jpp
        det = self.Jss * self.Jpp - jnp.abs(self.Jsp) ** 2
        return jnp.sqrt(jnp.clip(1.0 - 4.0 * det / jnp.maximum(I, 1e-300) ** 2,
                                 0.0, 1.0))

    def with_amplitudes(self) -> "Beam":
        """Attach zero field amplitudes if absent."""
        if self.Es is not None:
            return self
        cdt = jnp.result_type(self.Jsp)
        if isinstance(self.x, jax.core.Tracer):
            zeros = jnp.zeros_like(self.x, dtype=cdt)
        else:
            # eager: materialize device-side — some TPU transports cannot
            # transfer complex host constants (see config.czeros)
            from . import config
            zeros = config.czeros(self.x.shape, cdt)
        return self.replace(Es=zeros, Ep=zeros)

    def masked_replace(self, mask: jnp.ndarray, **fields) -> "Beam":
        """Return a beam where listed fields are replaced only where ``mask``."""
        updates = {}
        for name, val in fields.items():
            cur = getattr(self, name)
            updates[name] = jnp.where(mask, val, cur)
        return self.replace(**updates)


def new_beam(nrays: int = None, energy: float = None, withAmplitudes=False,
             dtype=None) -> Beam:
    """A fresh beam of ``nrays`` rays pointing along +y with s-polarization."""
    if nrays is None:
        nrays = config.NRAYS
    if energy is None:
        energy = config.DEFAULT_ENERGY
    dt = dtype or config.dtype()
    cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
    z = jnp.zeros(nrays, dt)
    beam = Beam(
        x=z, y=z, z=z,
        a=z, b=jnp.ones(nrays, dt), c=z,
        E=jnp.full((nrays,), energy, dt),
        state=jnp.full((nrays,), STATE_GOOD, jnp.int32),
        path=z,
        Jss=jnp.ones(nrays, dt), Jpp=z, Jsp=config.czeros(nrays, cdt),
        Es=config.czeros(nrays, cdt) if withAmplitudes else None,
        Ep=config.czeros(nrays, cdt) if withAmplitudes else None,
    )
    return beam


def concatenate(b1: Beam, b2: Beam) -> Beam:
    """Concatenate two beams (both shapes static), cf. reference
    Beam.concatenate (beams.py:196)."""
    def cat(u, v):
        if u is None or v is None:
            return None
        if u.ndim == 0:
            return u + v
        return jnp.concatenate([u, v])
    leaves = {}
    for name in Beam.__dataclass_fields__:
        leaves[name] = cat(getattr(b1, name), getattr(b2, name))
    return Beam(**leaves)


def filter_by_index(beam: Beam, indarr) -> Beam:
    """Leave only rays indexed/masked by *indarr* (cf. reference
    Beam.filter_by_index, beams.py:244).

    Host-side utility: the output length is data-dependent, so this cannot
    run under jit — inside compiled code use the ``state`` mask instead
    (masked compute is the TPU-native form of ray filtering)."""
    indarr = jnp.asarray(indarr)
    return jax.tree_util.tree_map(
        lambda a: a[indarr] if a.ndim else a, beam)


def filter_good(beam: Beam) -> Beam:
    """Leave only rays with state == 1 (cf. Beam.filter_good, beams.py:258).
    Host-side; see :func:`filter_by_index`."""
    import numpy as np
    return filter_by_index(beam, np.asarray(beam.state) == 1)


def replace_by_index(beam: Beam, indarr, source: Beam) -> Beam:
    """Replace rays at *indarr* with the same-indexed rays of *source*
    (cf. Beam.replace_by_index, beams.py:263).  Jit-compatible when *indarr*
    is a boolean mask of static shape."""
    indarr = jnp.asarray(indarr)
    if indarr.dtype == bool:
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(indarr, b, a) if a.ndim else a,
            beam, source)
    return jax.tree_util.tree_map(
        lambda a, b: a.at[indarr].set(b[indarr]) if a.ndim else a,
        beam, source)


def copy_beam(beam: Beam) -> Beam:
    """Independent copy of a beam (cf. reference copy_beam, beams.py:355).

    JAX arrays are immutable, so sharing leaves is always safe; this exists
    for API parity and for detaching a beam from donated/aliased buffers."""
    return jax.tree_util.tree_map(jnp.array, beam)


def rotate_coherency_matrix(Jss, Jpp, Jsp, roll):
    """Rotate the 2x2 coherency matrix by angle ``roll`` about the beam axis,
    J' = R J R^-1 (cf. reference beams.py:394-425)."""
    c = jnp.cos(roll)
    s = jnp.sin(roll)
    c2, s2, cs = c * c, s * s, c * s
    JssN = Jss * c2 + Jpp * s2 + 2 * Jsp.real * cs
    JppN = Jss * s2 + Jpp * c2 - 2 * Jsp.real * cs
    # lax.complex instead of "+ 1j * imag": no host complex constant, which
    # some TPU transports cannot transfer in eager mode
    JspN = jax.lax.complex((Jpp - Jss) * cs + Jsp.real * (c2 - s2),
                           Jsp.imag)
    return JssN, JppN, JspN


def absorb_intensity(outBeam: Beam, inBeam: Beam, sign=1.0) -> Beam:
    """Coherency matrix of the power ABSORBED at an element: incoming minus
    outgoing (beams.py:318-322).  Use with fluxKind='power' plots of OE
    footprints to display absorbed power."""
    return outBeam.replace(
        Jss=(inBeam.Jss - outBeam.Jss) * sign,
        Jpp=(inBeam.Jpp - outBeam.Jpp) * sign,
        Jsp=(inBeam.Jsp - outBeam.Jsp) * sign)


def project_energy_to_band(beam: Beam, EnewMin, EnewMax) -> Beam:
    """Uniformly map the energy array onto a new band (beams.py:331)."""
    EoldMin = jnp.min(beam.E)
    EoldMax = jnp.max(beam.E)
    scale = jnp.where(EoldMax > EoldMin, (EnewMax - EnewMin) /
                      jnp.maximum(EoldMax - EoldMin, 1e-300), 0.0)
    return beam.replace(E=EnewMin + (beam.E - EoldMin) * scale)


def make_uniform_energy_band(beam: Beam, key, EnewMin, EnewMax) -> Beam:
    E = jax.random.uniform(key, beam.E.shape, beam.E.dtype, EnewMin, EnewMax)
    return beam.replace(E=E)


def add_wave(beam: Beam, wave: Beam, sign=1.0) -> Beam:
    """Add wave amplitudes and refresh the coherency matrix (beams.py:324)."""
    Es = beam.Es + sign * wave.Es
    Ep = beam.Ep + sign * wave.Ep
    return beam.replace(
        Es=Es, Ep=Ep,
        Jss=(Es * Es.conj()).real, Jpp=(Ep * Ep.conj()).real,
        Jsp=Es * Ep.conj())
