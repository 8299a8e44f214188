"""W/Si multilayer mirror: traced reflectivity across the Bragg peak.

The xrt_tpu analog of the reference's 12_Multilayer family: a slightly
divergent beam hits a [W/Si]x40 multilayer near its first Bragg angle;
the footprint image colored by incidence angle shows the angular Bragg
selection, and the traced reflectivity is compared with the Parratt
recursion of the material itself.

Run: python examples/10_multilayer.py
     XRT_TPU_PLATFORM=cpu python examples/10_multilayer.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import jax.numpy as jnp
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import FlatMirror
from xrt_tpu.screens import Screen
from xrt_tpu.plotspec import XYCPlot, XYCAxis
from xrt_tpu.runner import run_ray_tracing
from xrt_tpu.physconsts import CH

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
REPEATS = 1 if SMOKE else 4

E0 = 8050.0
P, Q = 10000.0, 2000.0


def build():
    mSi = xm.Material.create('Si', rho=2.33)
    mW = xm.Material.create('W', rho=19.3)
    ml = xm.Multilayer.create(mSi, 27.0, mW, 18.0, 40, mSi)
    # first Bragg angle of the d=45 A period, refraction-shifted: find the
    # actual peak of the Parratt reflectivity around the kinematic angle
    d = 45.0e-7  # mm
    lam = CH / E0 * 1e-7
    theta0 = math.asin(lam / (2 * d))
    thetas = np.linspace(0.9 * theta0, 1.4 * theta0, 201)
    # under jit and |.|^2 before leaving the device: some TPU transports
    # cannot move complex arrays host<->device
    R = jax.jit(lambda th: jnp.abs(ml.get_amplitude(
        jnp.full(th.shape, E0), jnp.sin(th))[0]) ** 2)(
        jnp.asarray(thetas))
    thetaB = float(thetas[int(np.argmax(np.asarray(R)))])
    mirror = FlatMirror.create(center=(0, P, 0), pitch=thetaB, material=ml,
                               limPhysX=(-10, 10), limPhysY=(-60, 60))
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.01, dxprime=1e-5,
        distzprime='flat', dzprime=4e-3 * thetaB,
        distE='lines', energies=(E0,), polarization='horizontal')
    screen = Screen.create(center=(0, P + Q, 2 * thetaB * Q))
    return src, mirror, screen, thetaB


def main():
    src, mirror, screen, thetaB = build()

    def run_process(bl, key):
        beam = src.shine(key)
        glo, foot = mirror.reflect(beam)
        img = screen.expose(glo)
        return {'screen': img, 'footprint': foot}

    plots = [
        XYCPlot(beam='screen',
                xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                yaxis=XYCAxis('z', 'mm', limits=None),
                caxis=XYCAxis("z'", 'mrad', data='zprime', limits=None),
                saveName=None if SMOKE else '10_ml_screen.png'),
    ]
    run_ray_tracing(plots, repeats=REPEATS, run_process=run_process,
                    key=jax.random.PRNGKey(0), verbose=not SMOKE)
    p = plots[0]
    # peak reflectivity from the Parratt recursion at the nominal angle
    ml = mirror.material
    R0 = float(jax.jit(lambda: jnp.abs(ml.get_amplitude(
        jnp.asarray([E0]), math.sin(thetaB))[0][0]) ** 2)())
    print(f'traced flux={p.intensity:.4g} nGood={p.nRaysGood}; '
          f'Parratt |rs|^2 at thetaB={math.degrees(thetaB):.3f} deg: '
          f'{R0:.3f}')


if __name__ == '__main__':
    main()
