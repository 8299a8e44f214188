"""float32 wave propagation vs float64 truth: the f64 low parts carried by
prepare_wave must reproduce the FIELD PHASE (which a pure-f32 geometry
scrambles through the ~1e-3 mm coordinate staircase at 10 m) — essential
for chained coherent hops on TPU hardware."""
import os
import subprocess
import sys

SETUP = r"""
import math
import numpy as np
import jax, jax.numpy as jnp

from xrt_tpu.physconsts import CH
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen
from xrt_tpu.waves import prepare_wave_on_screen, diffract, Wave
from xrt_tpu import config

E0 = 9000.0
d = 0.05
sep = 0.4
L = 10000.0
lam = CH / E0 * 1e-7

n = 3000
rng = np.random.default_rng(0)
z_src = np.concatenate([
    rng.uniform(-sep/2 - d/2, -sep/2 + d/2, n//2),
    rng.uniform(sep/2 - d/2, sep/2 + d/2, n//2)])
x_src = rng.uniform(-0.5, 0.5, n)
dt = config.dtype()
cdt = config.cdtype()
zero = jnp.zeros((n,), dt)
src = Wave(
    x=jnp.asarray(x_src, dt), y=zero, z=jnp.asarray(z_src, dt),
    a=zero, b=jnp.ones((n,), dt), c=zero,
    E=jnp.full((n,), E0, dt), state=jnp.ones((n,), jnp.int32),
    path=zero, Jss=jnp.ones((n,), dt), Jpp=zero,
    Jsp=jnp.zeros((n,), cdt),
    Es=jnp.ones((n,), cdt), Ep=jnp.zeros((n,), cdt),
    area=jnp.asarray(1.0 * 2 * d, dt))
slit = RectangularAperture.create(center=(0, 0, 0),
                                  opening=(-0.5, 0.5, -0.5, 0.5))
tilt = 0.3
screen = Screen.create(center=(0, L, 0),
                       z=(0, -math.sin(tilt), math.cos(tilt)))
period = lam * L / sep
zmax = 3 * period / math.cos(tilt)
zs = np.linspace(-zmax, zmax, 241)
wave = prepare_wave_on_screen(screen, slit, np.asarray([0.0]), zs)
"""

CODE64 = SETUP + r"""
assert jax.config.read('jax_enable_x64')
out = diffract(src, wave)
np.savez('{tmp}/truth.npz', Es=np.asarray(out.Es, np.complex128))
print('OK truth')
"""

CODE32 = SETUP + r"""
assert not jax.config.read('jax_enable_x64')
truth = np.load('{tmp}/truth.npz')['Es']
out = diffract(src, wave)
I = np.asarray(out.Jss + out.Jpp)
keep = I > 0.2 * I.max()

def phase_err(field):
    D = np.asarray(field)[keep] * np.conj(truth[keep])
    D = D * np.exp(-1j * np.angle(D.sum()))   # remove one global phase
    return np.std(np.angle(D))

e_lo = phase_err(out.Es)
out2 = diffract(src, wave.replace(xDiffr_lo=None, yDiffr_lo=None,
                                  zDiffr_lo=None))
e_nolo = phase_err(out2.Es)
print('phase err vs f64: with lo', e_lo, 'without', e_nolo)
assert e_lo < 0.05          # f32+lo reproduces the f64 field phase
assert e_nolo > 20 * e_lo   # without lo the staircase scrambles it
# intensities agree in both cases (dst phase is common per point)
I64 = np.abs(truth) ** 2
assert np.corrcoef(I, I64)[0, 1] > 0.999
print('OK f32 waves')
"""


def test_f32_wave_lo_parts(tmp_path):
    import tests.conftest as c
    env64 = dict(c.CLEAN_ENV)
    env32 = dict(c.CLEAN_ENV)
    env32['JAX_ENABLE_X64'] = '0'
    t = str(tmp_path)
    r = subprocess.run([sys.executable, '-c', CODE64.format(tmp=t)],
                       capture_output=True, text=True, timeout=600,
                       env=env64)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run([sys.executable, '-c', CODE32.format(tmp=t)],
                       capture_output=True, text=True, timeout=600,
                       env=env32)
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'OK f32 waves' in r.stdout


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
