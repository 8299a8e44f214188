"""The flagship wave chain executed SHARDED across a device mesh.

The reference's headline multi-GPU capability is the SoftiMAX chain itself
split across devices (myopencl.py:455-542 dst-dimension splitting used by
diffract; multi-GPU rows of tests/speed/3_Softi_CXIw2D_speed.py:20-50).
Here the same chain runs with ``WaveChain.build(mesh=...)``: every
Kirchhoff integral dst-sharded over an 8-device CPU mesh (zero
collectives), and again with ``ring=True`` (src shards rotating via
ppermute).  Both must reproduce the single-device chain: bit-exact in
float64 (the XLA path has no per-shard recentring), and at the f32
kernel's own accuracy floor in float32 (per-shard recentring moves the
reference points)."""

import pytest

CODE_F64 = r"""
import math
import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
assert jax.device_count() == 8, jax.devices()
import xrt_tpu.materials as xm
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GaussianBeam
from xrt_tpu.wavechain import WaveChain
from xrt_tpu.parallel import make_mesh

E0 = 500.0
P, Q, PITCH = 5000.0, 1000.0, 6e-3
mat = xm.Material.create('Au', rho=19.3, kind='mirror')
R = 2 * P * Q / (P + Q) / math.sin(PITCH)
r = 2 * P * Q / (P + Q) * math.sin(PITCH)
src = GaussianBeam.create(w0=0.05, distE='lines', energies=(E0,),
                          polarization='horizontal')
slit = RectangularAperture.create(center=(0, 0, 0),
                                  opening=(-0.3, 0.3, -0.15, 0.15))
tor = ToroidMirror.create(center=(0, P, 0), pitch=PITCH, R=R, r=r,
                          material=mat, limPhysX=(-3, 3),
                          limPhysY=(-40, 40))
scr = Screen.create(
    center=(0, P + Q * math.cos(2 * PITCH), Q * math.sin(2 * PITCH)),
    z=(0, -math.sin(2 * PITCH), math.cos(2 * PITCH)))
zs = np.linspace(-0.02, 0.02, 41)
key = jax.random.PRNGKey(5)


def build(**kw):
    # nrays=601: deliberately NOT a multiple of 8 (exercises edge-padding)
    return (WaveChain(src, nrays=601, fixedEnergy=E0)
            .through_aperture(slit)
            .through_oe(tor)
            .to_screen(scr, np.asarray([0.0]), zs)).build(key, **kw)


ref_run = build()
wave, logs = ref_run()
I_ref = WaveChain.absolute_intensity(wave, logs)
assert I_ref.max() > 0

mesh = make_mesh()
for kw in (dict(mesh=mesh), dict(mesh=mesh, ring=True)):
    run = build(**kw)
    w2, l2 = run()
    I = WaveChain.absolute_intensity(w2, l2)
    err = float(np.max(np.abs(I - I_ref)) / np.max(np.abs(I_ref)))
    assert err < 1e-12, (kw, err)
print('OK sharded chain matches single-device (f64, dst-sharded + ring)')
"""

CODE_F32 = CODE_F64.replace(
    "jax.config.update('jax_enable_x64', True)",
    "jax.config.update('jax_enable_x64', False)").replace(
    "err < 1e-12, (kw, err)",
    "err < 5e-3, (kw, err)").replace(
    "print('OK sharded chain matches single-device "
    "(f64, dst-sharded + ring)')",
    "print('OK sharded chain matches single-device "
    "(f32, dst-sharded + ring)')")


def test_wavechain_sharded_f64(clean_env_runner):
    out, _ = clean_env_runner(CODE_F64)
    assert 'OK sharded chain matches single-device (f64' in out


@pytest.mark.slow
def test_wavechain_sharded_f32(clean_env_runner):
    """float32 double-float path under shard_map: per-shard recentring
    reproduces the global result to the kernel's accuracy floor.
    (f32=True: XLA:CPU O1+ codegen breaks double-float exactness under
    jit — see conftest.run_in_clean_env.)  Slow-marked: the f64 variant
    covers the sharded chain in the fast gate; the O0-compiled f32
    subprocess is the expensive part."""
    out, _ = clean_env_runner(CODE_F32, f32=True)
    assert 'OK sharded chain matches single-device (f32' in out
