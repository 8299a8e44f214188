"""Figure errors (warping) on a focusing mirror.

The xrt_tpu analog of the reference's 13_Warping family: the same
toroidal mirror is traced pristine and with a sinusoidal waviness /
random PSD roughness attached as a composable figure error
(local_z_distorted / local_n_distorted); slope errors broaden the focus.

Run: python examples/11_warping.py
     XRT_TPU_PLATFORM=cpu python examples/11_warping.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu import figure_error as fe
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

E0 = 9000.0
P, Q = 10000.0, 2000.0
PITCH = 4e-3


def build(distortion):
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    mirror = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r,
        material=xm.Material.create('Rh', rho=12.41),
        limPhysX=(-20, 20), limPhysY=(-300, 300))
    if distortion is not None:
        mirror = mirror.replace(figure_error=distortion)
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))
    return src, mirror, screen


def trace(distortion, tag):
    src, mirror, screen = build(distortion)

    def run_process(bl, key):
        beam = src.shine(key)
        glo, _ = mirror.reflect(beam)
        return {'screen': screen.expose(glo)}

    plot = XYCPlot(beam='screen',
                   xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                   yaxis=XYCAxis('z', 'mm', limits=(-1, 1)),
                   caxis=XYCAxis('energy', 'eV', limits=(E0 - 1, E0 + 1)),
                   saveName=None if SMOKE else f'11_{tag}.png')
    run_ray_tracing([plot], repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=False)
    return plot


def main():
    lims = dict(limPhysX=(-20, 20), limPhysY=(-300, 300))
    cases = [
        ('pristine', None),
        ('waviness', fe.waviness(amplitude=30.0, period=80.0,
                                 gridStep=1.0, **lims)),
        ('roughness', fe.random_roughness(rms=20.0, corrLength=15.0,
                                          seed=3, gridStep=1.0, **lims)),
    ]
    for tag, dist in cases:
        p = trace(dist, tag)
        print(f'{tag:>9}: dz(FWHM)={p.dy:.4g} mm  dx={p.dx:.4g} mm  '
              f'flux={p.intensity:.4g}')
    print('slope errors broaden the vertical focus (dz grows).')


if __name__ == '__main__':
    main()
