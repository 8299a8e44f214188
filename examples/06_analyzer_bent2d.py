"""Bent-crystal Johann analyzer on the Rowland circle.

The xrt_tpu analog of the reference's 07_AnalyzerBent2D example family
(examples/withRaycing/07_AnalyzerBent2D): a source with a vertical fan
illuminates a cylindrically bent Si(111) Johann crystal; the energy-
dispersed image is collected on a detector on the Rowland circle.

Run: python examples/06_analyzer_bent2d.py       (TPU if available)
     XRT_TPU_PLATFORM=cpu python examples/06_analyzer_bent2d.py
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
from xrt_tpu.oes import JohannCylinder
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 6

E0 = 9000.0
RM = 1000.0      # bending radius = Rowland-circle diameter


def build():
    cr = xm.CrystalSi.create(hkl=(1, 1, 1))
    thetaB = float(cr.get_Bragg_angle(E0))
    p = RM * math.sin(thetaB)            # source on the Rowland circle
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.0, dz=1.0, distx=None,
        distxprime='flat', dxprime=2e-3, distzprime='flat', dzprime=16e-3,
        distE='flat', energies=(E0 - 6, E0 + 6),
        polarization='horizontal')
    ana = JohannCylinder.create(
        Rm=RM, center=(0, p, 0), pitch=thetaB, material=cr,
        limPhysX=(-15, 15), limPhysY=(-30, 30))
    det = Screen.create(
        center=(0, p + p * math.cos(2 * thetaB), p * math.sin(2 * thetaB)),
        x=(1, 0, 0),
        z=(0, -math.sin(2 * thetaB), math.cos(2 * thetaB)))
    return src, ana, det, thetaB


def main():
    src, ana, det, thetaB = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, footprint = ana.reflect(beam)
        img = det.expose(glo)
        return {'det': img, 'crystal': footprint}

    plots = [
        XYCPlot(beam='det',
                xaxis=XYCAxis('x', 'mm', limits=(-6, 6)),
                yaxis=XYCAxis('z', 'mm', limits=(-4, 4)),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 6, E0 + 6)),
                saveName=None if SMOKE else '06_det.png'),
        XYCPlot(beam='crystal',
                xaxis=XYCAxis('x', 'mm', limits=(-16, 16)),
                yaxis=XYCAxis('y', 'mm', limits=(-32, 32)),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 6, E0 + 6)),
                saveName=None if SMOKE else '06_crystal.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'Bragg angle {math.degrees(thetaB):.3f} deg; '
          f'detector: flux={p.intensity:.4g}, nGood={p.nRaysGood}, '
          f'dE={p.dE:.3g} eV (energy-dispersed band)')


if __name__ == '__main__':
    main()
