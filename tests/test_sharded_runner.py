"""run_ray_tracing with a device mesh: per-device tracing with psum'd
histograms must accumulate n_devices times the single-device flux."""

CODE = r"""
import math
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
assert jax.device_count() == 8

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing
from xrt_tpu.parallel import make_mesh

E0, P, Q, PITCH = 9000.0, 10000.0, 2000.0, 4e-3
src = GeometricSource.create(nrays=5000, dx=0.1, dz=0.05,
                             dxprime=3e-5, dzprime=3e-5,
                             energies=(E0,), distE='lines')
R = 2*P*Q/(P+Q)/math.sin(PITCH)
r = 2*P*Q/(P+Q)*math.sin(PITCH)
mirror = ToroidMirror.create(center=(0, P, 0), pitch=PITCH, R=R, r=r,
                             material=xm.Material.create('Rh', rho=12.41),
                             limPhysX=(-20, 20), limPhysY=(-300, 300))
screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))

def run_process(bl, key):
    beam = src.shine(key)
    glo, _ = mirror.reflect(beam)
    return {'screen': screen.expose(glo)}

def make_plot():
    return XYCPlot(beam='screen',
                   xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                   yaxis=XYCAxis('z', 'mm', limits=(-1, 1)),
                   caxis=XYCAxis('energy', 'eV', limits=(E0-10, E0+10)))

p1 = make_plot()
run_ray_tracing([p1], repeats=2, run_process=run_process,
                key=jax.random.PRNGKey(0))
p8 = make_plot()
run_ray_tracing([p8], repeats=2, run_process=run_process,
                key=jax.random.PRNGKey(0), mesh=make_mesh())
ratio = p8.intensity / p1.intensity
print('flux ratio 8dev/1dev =', ratio)
assert abs(ratio - 8.0) < 0.25, ratio
assert abs(p8.total2D.sum() / p1.total2D.sum() - 8.0) < 0.25
print('OK sharded runner')
"""


def test_sharded_run_ray_tracing(clean_env_runner):
    out, _ = clean_env_runner(CODE)
    assert 'OK sharded runner' in out


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
