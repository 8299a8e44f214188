"""Compound refractive lens (CRL) stack focusing.

The xrt_tpu analog of the reference's 04_Lenses family: a parallel beam
passes a stack of Be paraboloid lenses (the lens count auto-computed from
the requested focal distance at E0) and focuses; the traced focal size
and transmission (absorption in the Be) are reported.

Run: python examples/14_lenses_crl.py
     XRT_TPU_PLATFORM=cpu python examples/14_lenses_crl.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ParaboloidFlatLens
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

E0 = 9000.0
P = 10000.0
F_TARGET = 3000.0


def build():
    mat = xm.Material.create('Be', rho=1.848, kind='lens')
    lens = ParaboloidFlatLens.create(
        focus=0.1, zmax=1.0, nCRL=(F_TARGET, E0), material=mat,
        center=(0, P, 0), t=0.05, limPhysX=(-2, 2), limPhysY=(-2, 2))
    # under jit: some TPU transports cannot move eager complex
    # intermediates (see .claude/skills/verify)
    delta = 1.0 - float(jax.jit(
        lambda: mat.get_refractive_index(jnp.asarray([E0]))[0].real)())
    f_real = 2 * 0.1 / (lens.nCRL * delta)
    src = GeometricSource.create(
        nrays=NRAYS, distx='flat', dx=0.5, distz='flat', dz=0.5,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    screen = Screen.create(center=(0, P + f_real, 0))
    return src, lens, screen, f_real


def main():
    src, lens, screen, f_real = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, l1, l2 = lens.multiple_refract(beam)
        img = screen.expose(glo)
        return {'focus': img}

    plots = [
        XYCPlot(beam='focus',
                xaxis=XYCAxis('x', 'um', limits=(-30, 30)),
                yaxis=XYCAxis('z', 'um', limits=(-30, 30)),
                caxis=XYCAxis('energy', 'eV', limits=(E0 - 1, E0 + 1)),
                saveName=None if SMOKE else '14_crl_focus.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    print(f'CRL: {lens.nCRL} lenses, f={f_real:.0f} mm; focus '
          f'dx={p.dx:.3g} um dz={p.dy:.3g} um, transmission '
          f'{p.intensity / max(p.nRaysAll, 1):.3f} (Be absorption)')


if __name__ == '__main__':
    main()
