"""Full hard-x-ray beamline: undulator -> Si(111) fixed-exit DCM ->
KB pair of elliptical cylinder mirrors -> micro-focus, built with
BeamLine.place auto-alignment (the second KB mirror is automatically
rotated into the deflected beam frame).

Run: python examples/02_undulator_dcm_kb.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import math
import os as _os

SMOKE = bool(_os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 50000
REPEATS = 1 if SMOKE else 2


import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import Undulator
from xrt_tpu.oes import EllipticalMirrorParam
from xrt_tpu.oes.dcm import DCM
from xrt_tpu.screens import Screen
from xrt_tpu.beamline import BeamLine
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

E0 = 9000.0
PITCH = 3.5e-3


def build():
    und = Undulator.create(
        nrays=NRAYS, eE=3.0, eI=0.5, period=18.0, n=111, targetE=(E0, 7),
        eEpsilonX=0.263, eEpsilonZ=0.008, betaX=9.0, betaZ=2.0,
        eMin=E0 - 40, eMax=E0 + 40, xPrimeMax=0.02, zPrimeMax=0.02)
    bl = BeamLine(alignE=E0)
    bl.add('source', und)
    bl.place('dcm', DCM, distance=30000.0,
             material=xm.CrystalSi.create(hkl=(1, 1, 1)), alignE=E0,
             fixedOffset=20.0, limPhysX=(-50, 50), limPhysY=(-500, 500))
    rh = xm.Material.create('Rh', rho=12.41)
    bl.place('vfm', EllipticalMirrorParam, distance=3000.0, pitch=PITCH,
             p=33000.0, q=1400.0, isCylindrical=True, material=rh,
             limPhysX=(-10, 10), limPhysY=(-150, 150), deflection='up')
    bl.place('hfm', EllipticalMirrorParam, distance=400.0, pitch=PITCH,
             p=33400.0, q=1000.0, positionRoll=-math.pi / 2,
             isCylindrical=True, material=rh,
             limPhysX=(-10, 10), limPhysY=(-150, 150), deflection='left')
    screen = Screen.create(center=tuple(bl.axis_point + bl.axis_dir *
                                        1000.0))
    bl.add('focus', screen)
    return bl


def main():
    bl = build()

    def run_process(_, key):
        beam = bl['source'].shine(key)
        mono, _, _ = bl['dcm'].double_reflect(beam)
        b1, _ = bl['vfm'].reflect(mono)
        b2, _ = bl['hfm'].reflect(b1)
        img = bl['focus'].expose(b2)
        return {'focus': img}

    sp = np.asarray(bl['focus'].center)
    plot = XYCPlot(beam='focus',
                   xaxis=XYCAxis('x', 'um', limits=(-20, 20), factor=1e3,
                                 offset=float(sp[0])),
                   yaxis=XYCAxis('z', 'um', limits=(-20, 20), factor=1e3,
                                 offset=float(sp[2])),
                   caxis=XYCAxis('energy', 'eV', limits=(E0 - 3, E0 + 3)),
                   saveName='02_focus.png')
    run_ray_tracing([plot], repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=True)
    print(f'focus: flux={plot.intensity:.4g}, '
          f'FWHM x={plot.dx:.3g} um, z={plot.dy:.3g} um')


if __name__ == '__main__':
    main()
