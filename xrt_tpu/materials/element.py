"""Chemical elements with their x-ray scattering factors as a jit-friendly
pytree (cf. reference xrt/backends/raycing/materials/element.py:106-263).

``Element`` carries the f0 parameterization coefficients and the tabulated
(E, f1, f2) arrays as jnp leaves so that materials are differentiable pytrees
and interpolation happens on-device.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import data as _data


@struct.dataclass
class Element:
    Z: int = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False)
    mass: float = struct.field(pytree_node=False)
    f0coeffs: jnp.ndarray = None       # [a1..a5, c, b1..b5]
    Etable: jnp.ndarray = None         # tabulated energies, eV (sorted)
    f1table: jnp.ndarray = None
    f2table: jnp.ndarray = None

    @classmethod
    def create(cls, elem, table='Chantler total') -> "Element":
        Z = _data.element_z(elem)
        name = _data.element_name(elem)
        E, f1, f2 = _data.f1f2_arrays(elem, table)
        return cls(Z=Z, name=name, mass=_data.atomic_mass(elem),
                   f0coeffs=jnp.asarray(_data.f0_coefficients(elem)),
                   Etable=jnp.asarray(E), f1table=jnp.asarray(f1),
                   f2table=jnp.asarray(f2))

    def get_f0(self, qOver4pi=0.0):
        """f0(q/4pi) with q/4pi = sin(theta)/lambda [1/A]
        (Waasmaier-Kirfel parameterization, cf. element.py:203-207)."""
        c = self.f0coeffs[5]
        a = self.f0coeffs[0:5]
        b = self.f0coeffs[6:11]
        q2 = jnp.asarray(qOver4pi) ** 2
        return c + jnp.sum(a * jnp.exp(-b * q2[..., None]), axis=-1)

    def get_f1f2(self, E):
        """Complex anomalous scattering factor f1 + i*f2 interpolated at E [eV]
        (cf. element.py:252-263).  Out-of-table energies are clamped (the
        reference raises; in jit-land we clamp and rely on host-side
        validation)."""
        from ..ops.interp import fast_interp
        f1 = fast_interp(E, self.Etable, self.f1table)
        f2 = fast_interp(E, self.Etable, self.f2table)
        # lax.complex instead of "+ 1j*f2": no host complex constant, which
        # some TPU transports cannot transfer in eager mode
        import jax
        return jax.lax.complex(f1, f2)
