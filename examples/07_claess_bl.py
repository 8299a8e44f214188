"""A full hard-x-ray beamline in the CLAESS/Balder style, built with the
auto-aligning BeamLine API.

The xrt_tpu analog of the reference's 08_CLAESS_BL / 02_Balder_BL full
beamlines: multipole-wiggler source -> front-end slit -> vertically
collimating mirror (VCM, deflects up) -> Si(111) double-crystal
monochromator with fixed exit (auto Bragg at alignE) -> vertically
focusing toroid (VFM, deflects down, auto-oriented on the tilted axis) ->
sample screen.  Every element is placed with ``bl.place(distance=...)``
so centers/pitches follow the deflected optical axis automatically (the
analog of the reference's auto-alignment, beamline.py:368-508).

Run: python examples/07_claess_bl.py
     XRT_TPU_PLATFORM=cpu python examples/07_claess_bl.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax

import xrt_tpu.materials as xm
from xrt_tpu.beamline import BeamLine
from xrt_tpu.sources.synchrotron import Wiggler
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.oes import BentFlatMirror, ToroidMirror
from xrt_tpu.oes.dcm import DCM
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 50000
REPEATS = 1 if SMOKE else 4

E0 = 9000.0
PITCH = 2.0e-3      # mirror grazing angle


def build():
    bl = BeamLine(alignE=E0)
    src = Wiggler.create(
        nrays=NRAYS, eE=3.0, eI=0.4, B0=2.1, period=61.0, n=41,
        eEpsilonX=5.0, eEpsilonZ=0.05, betaX=9.0, betaZ=2.0,
        eMin=E0 - 150, eMax=E0 + 150,
        xPrimeMax=0.3, zPrimeMax=0.06)
    bl.add('source', src)
    bl.place('feslit', RectangularAperture, distance=15000.0,
             opening=(-2.0, 2.0, -0.6, 0.6))
    si = xm.Material.create('Si', rho=2.33, kind='mirror')
    bl.place('vcm', BentFlatMirror, distance=4000.0, pitch=PITCH,
             deflection='up', R=2 * 19000.0 / math.sin(PITCH),
             material=si, limPhysX=(-10, 10), limPhysY=(-400, 400))
    cr = xm.CrystalSi.create(hkl=(1, 1, 1))
    bl.place('dcm', DCM, distance=2000.0, material=cr, alignE=E0,
             fixedOffset=20.0, limPhysX=(-15, 15), limPhysY=(-60, 60),
             limPhysX2=(-15, 15), limPhysY2=(-90, 90))
    q = 9000.0
    bl.place('vfm', ToroidMirror, distance=3000.0, pitch=PITCH,
             deflection='down', R=2 * q / math.sin(PITCH),
             r=2 * q * math.sin(PITCH) * 0.5,
             material=si, limPhysX=(-10, 10), limPhysY=(-400, 400))
    bl.place('sample', Screen, distance=q)
    return bl


def main():
    bl = build()

    def run_process(bl_, key):
        beams = bl.propagate_flow(key)
        return {'sample': beams['sample'], 'vfm': beams['vfm']}

    plots = [
        XYCPlot(beam='sample',
                xaxis=XYCAxis('x', 'mm', limits=(-3, 3)),
                yaxis=XYCAxis('z', 'mm', limits=None),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 8, E0 + 8)),
                saveName=None if SMOKE else '07_sample.png'),
        XYCPlot(beam='vfm',
                xaxis=XYCAxis('x', 'mm', limits=(-11, 11)),
                yaxis=XYCAxis('y', 'mm', limits=(-410, 410)),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 8, E0 + 8)),
                saveName=None if SMOKE else '07_vfm_footprint.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'sample: flux={p.intensity:.4g} nGood={p.nRaysGood} '
          f'dE={p.dE:.3g} eV dx={p.dx:.3g} mm dz={p.dy:.3g} mm '
          f'(DCM bandwidth through the full line)')


if __name__ == '__main__':
    main()
