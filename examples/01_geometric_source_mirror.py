"""Minimal beamline: geometric source -> toroidal focusing mirror ->
detector screen, with the run loop, colored histograms and a saved figure.

The xrt_tpu analog of the reference's minimal withRaycing examples.
Run: python examples/01_geometric_source_mirror.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import math

import jax

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

E0 = 9000.0
P, Q = 10000.0, 2000.0
PITCH = 4e-3


def build():
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(E0 - 100, E0 + 100),
        polarization='horizontal')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    mirror = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r,
        material=xm.Material.create('Rh', rho=12.41),
        limPhysX=(-20, 20), limPhysY=(-300, 300))
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))
    return src, mirror, screen


def main():
    src, mirror, screen = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, footprint = mirror.reflect(beam)
        img = screen.expose(glo)
        return {'screen': img, 'footprint': footprint}

    plots = [
        XYCPlot(beam='screen',
                xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                yaxis=XYCAxis('z', 'mm', limits=(-1, 1)),
                caxis=XYCAxis('energy', 'eV',
                              limits=(E0 - 100, E0 + 100)),
                saveName=None if SMOKE else '01_screen.png'),
        XYCPlot(beam='footprint',
                xaxis=XYCAxis('x', 'mm', limits=(-22, 22)),
                yaxis=XYCAxis('y', 'mm', limits=(-320, 320)),
                caxis=XYCAxis('energy', 'eV',
                              limits=(E0 - 100, E0 + 100)),
                saveName=None if SMOKE else '01_footprint.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'screen: flux={p.intensity:.4g}, nGood={p.nRaysGood}, '
          f'dx={p.dx:.4g} mm, dz={p.dy:.4g} mm')


if __name__ == '__main__':
    main()
