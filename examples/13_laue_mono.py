"""Bent-Laue monochromator.

The xrt_tpu analog of the reference's 03_LaueMono family: a divergent
white beam passes through a thin bent Si(111) crystal in Laue
(transmission) geometry; the diffracted beam carries an energy band
selected by the rocking condition across the fan.

Run: python examples/13_laue_mono.py
     XRT_TPU_PLATFORM=cpu python examples/13_laue_mono.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import BentLaueCylinder
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

E0 = 60000.0       # hard x-rays, where Laue monos shine
P = 10000.0
R_BEND = 2000.0    # meridional bending radius


def build():
    cr = xm.CrystalSi.create(hkl=(1, 1, 1), t=0.7, geom='Laue reflected')
    thetaB = float(cr.get_Bragg_angle(E0))
    mono = BentLaueCylinder.create(
        R=R_BEND, center=(0, P, 0), pitch=math.pi / 2 + thetaB,
        material=cr, limPhysX=(-20, 20), limPhysY=(-20, 20))
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.1, dxprime=1e-5,
        distzprime='flat', dzprime=6e-4,
        distE='flat', energies=(E0 - 600, E0 + 600),
        polarization='horizontal')
    screen = Screen.create(center=(0, P + 2000.0 * math.cos(2 * thetaB),
                                   -2000.0 * math.sin(2 * thetaB)))
    return src, mono, screen, thetaB


def main():
    src, mono, screen, thetaB = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, loc = mono.reflect(beam)
        img = screen.expose(glo)
        return {'screen': img}

    plots = [
        XYCPlot(beam='screen',
                xaxis=XYCAxis('x', 'mm', limits=(-2, 2)),
                yaxis=XYCAxis('z', 'mm', limits=None),
                caxis=XYCAxis('energy', 'keV', limits=None),
                saveName=None if SMOKE else '13_laue_screen.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'Laue mono at {math.degrees(thetaB):.3f} deg: '
          f'flux={p.intensity:.4g} nGood={p.nRaysGood} '
          f'dE={p.dE * 1e3:.3g} eV across the bent fan')


if __name__ == '__main__':
    main()
