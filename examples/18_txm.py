"""Transmission x-ray microscopy (TXM) through a voxelized object.

The xrt_tpu analog of the reference's 19_TXM family: a parallel beam
traverses a Plate carrying a TXMMaterial — a 3D multi-material voxel
grid (here a gold cross embedded in water) — and the detector records
the absorption-contrast shadow image.

Run: python examples/18_txm.py
     XRT_TPU_PLATFORM=cpu python examples/18_txm.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import numpy as np

from xrt_tpu.materials import Material, TXMMaterial
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import Plate
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 200000
REPEATS = 1 if SMOKE else 4

E0 = 9000.0
P = 1000.0
SIZE = 0.05        # 50 um object cube


def build():
    water = Material.create(('H', 'O'), quantities=(2, 1), rho=1.0,
                            kind='plate')
    gold = Material.create('Au', rho=19.3, kind='plate')
    # a gold cross in water
    n = 40
    grid = np.zeros((n, n, n), np.uint8)
    grid[:, n // 2 - 4:n // 2 + 4, n // 4:3 * n // 4] = 1
    grid[:, n // 4:3 * n // 4, n // 2 - 4:n // 2 + 4] = 1
    lim = {'x': (-SIZE / 2, SIZE / 2), 'y': (-SIZE / 2, SIZE / 2),
           'z': (-SIZE / 2, SIZE / 2)}
    txm = TXMMaterial.create(indexGrid=grid.transpose(2, 1, 0),
                             limits=lim, materialsIndex=(water, gold))
    plate = Plate.create(center=(0, P, 0), pitch=math.pi / 2,
                         t=SIZE, material=txm,
                         limPhysX=(-SIZE, SIZE), limPhysY=(-SIZE, SIZE))
    src = GeometricSource.create(
        nrays=NRAYS, distx='flat', dx=SIZE * 1.6,
        distz='flat', dz=SIZE * 1.6,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    det = Screen.create(center=(0, P + 100.0, 0))
    return src, plate, det


def main():
    src, plate, det = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, _, _ = plate.double_refract(beam)
        img = det.expose(glo)
        return {'det': img}

    plots = [
        XYCPlot(beam='det',
                xaxis=XYCAxis('x', 'um', limits=(-40, 40)),
                yaxis=XYCAxis('z', 'um', limits=(-40, 40)),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 1, E0 + 1)),
                saveName=None if SMOKE else '18_txm_shadow.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'TXM shadow: flux={p.intensity:.4g} of {p.nRaysGood} good rays '
          f'(gold cross absorbs, water passes)')


if __name__ == '__main__':
    main()
