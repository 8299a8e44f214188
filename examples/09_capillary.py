"""Multiple reflections inside an ellipsoidal capillary.

The xrt_tpu analog of the reference's 10_MultipleReflect family: an
annular beam enters an ellipsoidal capillary mirror and whispers to the
second focus via one or more grazing bounces (``multiple_reflect``,
a lax.scan over bounce index).  The image is colored by the number of
reflections each ray made.

Run: python examples/09_capillary.py
     XRT_TPU_PLATFORM=cpu python examples/09_capillary.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import EllipsoidCapillaryMirror
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 50000
REPEATS = 1 if SMOKE else 4

E0 = 9000.0
A, B = 5000.0, 2.0       # ellipse semi-axes (mm)
WD = 50.0                # working distance past the capillary exit


def build():
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    cap = EllipsoidCapillaryMirror.create(
        ellipseA=A, ellipseB=B, workingDistance=WD,
        center=(0, 1000.0, 0), material=mat,
        limPhysX=(-5, 5), limPhysY=(-100, 100))
    src = GeometricSource.create(
        nrays=NRAYS, distx='annulus', dx=(0.3, 0.8), dz=0.0, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    return src, cap


def main():
    src, cap = build()
    screen = Screen.create(center=(0, 1000.0 + 100.0 + WD, 0))

    def run_process(bl, key):
        beam = src.shine(key)
        glo, loc = cap.multiple_reflect(beam, maxReflections=8)
        img = screen.expose(glo)
        return {'exit': img, 'wall': loc}

    plots = [
        XYCPlot(beam='exit',
                xaxis=XYCAxis('x', 'mm', limits=(-1.5, 1.5)),
                yaxis=XYCAxis('z', 'mm', limits=(-1.5, 1.5)),
                caxis=XYCAxis('N reflections', '',
                              data='reflection_number',
                              limits=(0, 4), bins=5),
                saveName=None if SMOKE else '09_capillary_exit.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'capillary exit: flux={p.intensity:.4g} nGood={p.nRaysGood} '
          f'mean bounces={p.cE:.2f} (colored by reflection number)')


if __name__ == '__main__':
    main()
