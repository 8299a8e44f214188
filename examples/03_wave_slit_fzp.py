"""Coherent wave optics: undulator filament field -> slit -> Fresnel zone
plate -> focal-plane intensity by chained Fresnel-Kirchhoff integrals.

Run: python examples/03_wave_slit_fzp.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import math
import os as _os

SMOKE = bool(_os.environ.get('XRT_TPU_SMOKE'))


import jax
import jax.numpy as jnp
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import Undulator
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.oes import NormalFZP
from xrt_tpu.screens import Screen
from xrt_tpu.waves import (prepare_wave_on_aperture, prepare_wave_on_oe,
                           prepare_wave_on_screen, diffract)
from xrt_tpu.physconsts import CH

E0 = 9000.0
F = 2000.0


def main():
    lam = CH / E0 * 1e-7
    und = Undulator.create(
        nrays=100, eE=3.0, eI=0.5, period=18.0, n=111, targetE=(E0, 7),
        eEpsilonX=0.263, eEpsilonZ=0.008, betaX=9.0, betaZ=2.0,
        eMin=E0 - 1, eMax=E0 + 1, xPrimeMax=0.02, zPrimeMax=0.02)
    slit = RectangularAperture.create(center=(0, 25000.0, 0),
                                      opening=(-0.04, 0.04, -0.04, 0.04))
    fzp = NormalFZP.create(f=F, E=E0, N=60, center=(0, 27000.0, 0),
                           pitch=math.pi / 2,
                           material=xm.Material.create('Au', rho=19.3,
                                                       kind='FZP'),
                           order=1)

    # coherent filament field at the slit
    wave_slit = prepare_wave_on_aperture(slit, und, 500 if SMOKE else 2000,
                                         key=jax.random.PRNGKey(0))
    wave_slit = und.shine_wave(jax.random.PRNGKey(1), wave_slit,
                               fixedEnergy=E0)

    # slit -> FZP
    wave_fzp = prepare_wave_on_oe(fzp, slit, 2000 if SMOKE else 8000,
                                  key=jax.random.PRNGKey(2))
    src = wave_slit.replace(state=jnp.ones_like(wave_slit.state))
    wave_fzp = diffract(src, wave_fzp)
    # the binary zone mask
    state = fzp.rays_good(wave_fzp.x, wave_fzp.y,
                          jnp.ones_like(wave_fzp.state))
    masked = wave_fzp.replace(state=state)

    # FZP -> focal plane
    screen = Screen.create(center=(0, 27000.0 + F, 0))
    rN = float(np.sqrt(60 * F * lam))
    zs = np.linspace(-0.15 * rN, 0.15 * rN, 101 if SMOKE else 301)
    wave_focus = prepare_wave_on_screen(screen, fzp, np.asarray([0.0]), zs)
    out = diffract(masked, wave_focus)
    I = np.asarray(out.Jss + out.Jpp)
    z = np.asarray(out.z)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure(figsize=(6, 4))
    plt.plot(z * 1e3, I / I.max())
    plt.xlabel('z at focus (um)')
    plt.ylabel('normalized intensity')
    plt.title('FZP focal line (coherent, Fresnel-Kirchhoff)')
    plt.savefig('03_fzp_focus.png', dpi=120)
    print(f'peak at z={z[np.argmax(I)]*1e3:.2f} um, '
          f'FWHM ~ {np.sum(I > I.max()/2) * (z[1]-z[0]) * 1e3:.2f} um')


if __name__ == '__main__':
    main()
