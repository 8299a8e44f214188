"""Powder diffraction: Debye-Scherrer rings.

The xrt_tpu analog of the reference's 15_XRD family: a Cu K-alpha pencil
beam hits a silicon powder sample (randomly oriented crystallites over
multiple reflexes); the flat detector behind the sample shows the
diffraction rings, colored by the scattering angle.

Run: python examples/15_xrd_powder.py
     XRT_TPU_PLATFORM=cpu python examples/15_xrd_powder.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import numpy as np

from xrt_tpu.materials import Powder
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import FlatMirror
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing
from xrt_tpu.physconsts import CH

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 200000
REPEATS = 1 if SMOKE else 8

E0 = 8047.8          # Cu K-alpha1
A_SI = 5.430710      # Si lattice constant
P = 1000.0           # sample position
D = 150.0            # sample -> detector


def build():
    powder = Powder.create(hkl=(3, 3, 3), a=A_SI, name='Si')
    sample = FlatMirror.create(
        center=(0, P, 0), pitch=math.pi / 4, material=powder,
        limPhysX=(-2, 2), limPhysY=(-2, 2))
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.2, dz=0.2, distx='flat', distz='flat',
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    det = Screen.create(center=(0, P + D, 0))
    return src, sample, det


def main():
    src, sample, det = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, loc = sample.reflect(beam, key)
        img = det.expose(glo)
        return {'det': img}

    plots = [
        XYCPlot(beam='det',
                xaxis=XYCAxis('x', 'mm', limits=(-150, 150)),
                yaxis=XYCAxis('z', 'mm', limits=(-150, 150)),
                caxis=XYCAxis('theta', 'deg', data='theta',
                              factor=180 / math.pi, limits=(0, 90)),
                saveName=None if SMOKE else '15_rings.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    lam = CH / E0
    print('expected 2theta rings (deg):',
          ', '.join(f'{2 * math.degrees(math.asin(lam / (2 * d))):.1f}'
                    for d in (A_SI / math.sqrt(3), A_SI / math.sqrt(8),
                              A_SI / math.sqrt(11))))
    print(f'detector: flux={p.intensity:.4g} nGood={p.nRaysGood} '
          f'(rings colored by scattering angle)')


if __name__ == '__main__':
    main()
