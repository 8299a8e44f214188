"""Grating monochromator (soft x-rays).

The xrt_tpu analog of the reference's 09_Gratings family: a geometric
source with two close emission lines hits a blazed grating; the first
diffraction order disperses them onto an exit-slit plane where the lines
separate.  (For the *wave* treatment of a real sawtooth profile see
BlazedGrating + the Kirchhoff integral, reference gratings.py:316-535.)

Run: python examples/08_grating_mono.py
     XRT_TPU_PLATFORM=cpu python examples/08_grating_mono.py
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
from xrt_tpu.oes import Grating
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing
from xrt_tpu.physconsts import CH

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

E0 = 280.0          # eV, carbon edge region
DE = 1.0            # line separation
P, Q = 10000.0, 4000.0
RHO = 600.0         # lines/mm
PITCH = math.radians(4.0)
ORDER = 1


def build():
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.05, dz=0.005, dxprime=2e-5, dzprime=5e-5,
        distE='lines', energies=(E0 - DE, E0 + DE),
        polarization='horizontal')
    gr = Grating.create(
        rho=RHO, order=ORDER, center=(0, P, 0), pitch=PITCH,
        material=xm.EmptyMaterial(kind='grating'),
        limPhysX=(-10, 10), limPhysY=(-60, 60))
    # exit direction of the center energy from the grating equation
    lam = CH / E0 * 1e-7
    alpha = math.pi / 2 - PITCH
    beta = math.asin(math.sin(alpha) - ORDER * RHO * lam)
    out_angle = math.pi / 2 - beta + PITCH  # from +y axis, upward
    screen = Screen.create(
        center=(0, P + Q * math.cos(out_angle), Q * math.sin(out_angle)),
        z=(0, -math.sin(out_angle), math.cos(out_angle)))
    return src, gr, screen


def main():
    src, gr, screen = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, foot = gr.reflect(beam)
        img = screen.expose(glo)
        return {'exit': img, 'grating': foot}

    plots = [
        XYCPlot(beam='exit',
                xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                yaxis=XYCAxis('z', 'mm', limits=None),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 2, E0 + 2)),
                saveName=None if SMOKE else '08_exit_slit.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    # dispersion: dz/dE = Q * rho * m * lam / E / cos(beta)
    lam = CH / E0 * 1e-7
    alpha = math.pi / 2 - PITCH
    beta = math.asin(math.sin(alpha) - ORDER * RHO * lam)
    disp = Q * RHO * ORDER * lam / E0 / math.cos(beta)
    print(f'exit plane: flux={p.intensity:.4g} nGood={p.nRaysGood}; '
          f'two lines {2 * DE} eV apart -> expected {disp * 2 * DE:.3f} mm '
          f'separation (dispersion {disp * 1e3:.3f} um/eV)')


if __name__ == '__main__':
    main()
