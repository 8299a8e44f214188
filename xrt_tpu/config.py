"""Global configuration for xrt_tpu.

xrt_tpu is dtype-polymorphic: every computation inherits the dtype of the
beam/element arrays.  ``dtype()`` returns the default floating dtype that new
beams and elements are created with — float64 when JAX x64 is enabled
(golden-accuracy CPU tests), float32 otherwise (TPU production path).
"""
import jax
import jax.numpy as jnp

#: default number of rays in a generated beam (cf. reference raycing nrays,
#: xrt/backends/raycing/__init__.py:252)
NRAYS = 100000

#: tolerance of the ray-surface intersection solver, mm
#: (cf. reference zEps, xrt/backends/raycing/__init__.py:247)
Z_EPS = 1e-12

#: maximum number of Newton/bisection iterations of the intersection solver
#: (cf. reference maxIteration=100, xrt/backends/raycing/__init__.py:253)
MAX_INTERSECTION_ITERATIONS = 64

#: default photon energy, eV
DEFAULT_ENERGY = 9.0e3

# ray state codes (cf. reference xrt/backends/raycing/__init__.py:84-97)
STATE_GOOD = 1       # ray hits within optical limits
STATE_OUT = 2        # outside optical limits but within physical limits
STATE_OVER = 3       # outside physical limits (missed the element)
STATE_DEAD = -1      # absorbed / lost (reference uses -ordinal of the OE)


def dtype():
    """Default floating dtype: float64 iff jax x64 is enabled."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def cdtype():
    """Default complex dtype matching :func:`dtype`."""
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _czeros_fn(shape, dtname):
    return jax.jit(lambda: jnp.zeros(shape, dtname))


def czeros(shape, dtype=None):
    """Complex zeros materialized device-side.

    Some TPU transports (e.g. remote tunnels) do not implement complex
    host<->device transfers, so an eager ``jnp.zeros(shape, complex64)``
    enqueues a doomed transfer that surfaces at the next sync point.
    Compiling the constant instead keeps it on the device.  On CPU this
    is a plain ``jnp.zeros``."""
    dtype = dtype or cdtype()
    if jax.default_backend() == 'cpu':
        return jnp.zeros(shape, dtype)
    if isinstance(shape, int):
        shape = (shape,)
    return _czeros_fn(tuple(shape), jnp.dtype(dtype).name)()


def cfull(shape, value, dtype=None):
    """Complex ``full`` materialized device-side (see :func:`czeros`):
    an eager ``jnp.full(shape, 0.5j, complex64)`` would enqueue a complex
    host->device transfer that some TPU transports don't implement; two
    real fills + ``lax.complex`` stay on the device."""
    dtype = dtype or cdtype()
    value = complex(value)
    if jax.default_backend() == 'cpu':
        return jnp.full(shape, value, dtype)
    rdt = jnp.finfo(dtype).dtype
    return jax.lax.complex(jnp.full(shape, value.real, rdt),
                           jnp.full(shape, value.imag, rdt))


def parse_energy(value):
    """'8000 eV' / '8 keV' -> eV as float, else None (reference
    parse_energy_string, _flow_utils.py:106-115).  Used wherever an
    angle-like parameter may instead carry an alignment energy
    (bragg='8000 eV')."""
    if not isinstance(value, str):
        return None
    import re
    m = re.match(r'^([-+0-9.eE]+)\s*(ev|kev|mev)$', value.strip().lower())
    if m is None:
        return None
    return float(m.group(1)) * {'ev': 1.0, 'kev': 1e3,
                                'mev': 1e6}[m.group(2)]


def auto_units_angle(angle, defaultFactor=1.0):
    """Parse angle values given as strings with units — '0.2 deg',
    '4 mrad', '250 urad', '10 nrad', '0.004 rad' — into radians
    (reference _flow_utils.py:74-98).  Plain numbers pass through scaled
    by *defaultFactor*; None and 'auto' pass through unchanged."""
    if angle is None or not isinstance(angle, str):
        if isinstance(angle, (int, float)) and defaultFactor != 1.0:
            return angle * defaultFactor
        return angle
    import math
    t = angle.strip().lower()
    if 'auto' in t:
        return angle
    if 'mrad' in t:
        return float(t.split('m')[0]) * 1e-3
    if 'urad' in t:
        return float(t.split('u')[0]) * 1e-6
    if 'nrad' in t:
        return float(t.split('n')[0]) * 1e-9
    if 'rad' in t:
        return float(t.split('r')[0])
    if 'deg' in t:
        return math.radians(float(t.split('d')[0]))
    return float(t) * defaultFactor


def select_platform(default=None):
    """Honor the XRT_TPU_PLATFORM environment variable (e.g. 'cpu',
    'tpu') — needed on hosts whose sitecustomize pre-imports jax before
    JAX_PLATFORMS is read.  Call before any jax computation."""
    import os
    p = os.environ.get('XRT_TPU_PLATFORM', default)
    if p:
        import jax
        jax.config.update('jax_platforms', p)
        if p == 'cpu':
            jax.config.update('jax_enable_x64', True)
