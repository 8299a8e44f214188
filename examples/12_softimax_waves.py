"""Coherent wave propagation through a focusing mirror surface
(SoftiMAX-style pipeline, scaled down).

The xrt_tpu analog of the reference's 14_SoftiMAX wave chain and of the
speed-test-3 workload shape: a coherent Gaussian source field is
propagated by Fresnel-Kirchhoff integrals onto the *curved surface* of an
elliptical mirror (wave samples on the OE carry the dS*(n.l) projection
factor), reflected with the mirror's complex amplitudes, and propagated
again to the focal plane, where the diffraction-limited line focus
appears.

Run: python examples/12_softimax_waves.py
     XRT_TPU_PLATFORM=cpu python examples/12_softimax_waves.py
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
from xrt_tpu.sources import GaussianBeam
from xrt_tpu.oes import EllipticalMirrorParam
from xrt_tpu.screens import Screen
from xrt_tpu.waves import (prepare_wave_on_oe, prepare_wave_on_screen,
                           diffract)
from xrt_tpu.physconsts import CH

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
N_OE = 1200 if SMOKE else 20000
N_SCR = 121 if SMOKE else 601

E0 = 500.0              # eV (soft x-rays)
P, Q = 10000.0, 1500.0  # mirror object/image distances
PITCH = math.radians(1.5)


def main():
    lam = CH / E0 * 1e-7
    w0 = 0.05
    src = GaussianBeam.create(w0=w0, distE='lines', energies=(E0,),
                              polarization='horizontal')
    mat = xm.Material.create('Au', rho=19.3, kind='mirror')
    mirror = EllipticalMirrorParam.create(
        p=P, q=Q, pitch=PITCH, center=(0, P, 0), material=mat,
        limPhysX=(-8, 8), limPhysY=(-150, 150))

    # analytic source field sampled directly on the mirror surface
    wave_oe = prepare_wave_on_oe(mirror, src, N_OE,
                                 key=jax.random.PRNGKey(1))
    # under jit: eager complex constants don't transfer on some TPU
    # transports (see .claude/skills/verify)
    beam_oe = jax.jit(src.shine)(jax.random.PRNGKey(0), wave_oe)

    # reflect on the surface (no intersection search: the samples are on
    # the surface already) and diffract to the focal plane
    _, refl = jax.jit(
        lambda b: mirror.reflect(b, noIntersectionSearch=True))(beam_oe)
    focus = Screen.create(center=(0, P + Q * math.cos(2 * PITCH),
                                  Q * math.sin(2 * PITCH)),
                          z=(0, -math.sin(2 * PITCH),
                             math.cos(2 * PITCH)))
    # the image waist of the focused Gaussian: w' = lam*Q/(pi*w(P))
    yR = float(src.rayleigh_range(E0))
    wP = w0 * math.sqrt(1 + (P / yR) ** 2)
    w_img = lam * Q / (math.pi * wP)
    fwhm_expect = w_img * math.sqrt(2 * math.log(2))
    zs = np.linspace(-4 * w_img, 4 * w_img, N_SCR)
    wave_focus = prepare_wave_on_screen(focus, mirror, np.asarray([0.0]),
                                        zs)
    out = diffract(refl, wave_focus)
    I = np.asarray(out.Jss + out.Jpp)
    z = np.asarray(out.z)
    # FWHM of the contiguous above-half-max interval around the peak (MC
    # noise in the far tails must not count)
    above = I > I.max() / 2
    ipk = int(np.argmax(I))
    il = ipk
    while il > 0 and above[il - 1]:
        il -= 1
    ir = ipk
    while ir < len(I) - 1 and above[ir + 1]:
        ir += 1
    fwhm = float((ir - il + 1) * (z[1] - z[0]))
    print(f'focal line: peak at z={z[np.argmax(I)]*1e3:.3f} um, '
          f'FWHM={fwhm*1e3:.3f} um '
          f'(demagnified Gaussian waist ~{fwhm_expect*1e3:.3f} um)')
    if not SMOKE:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.figure(figsize=(6, 4))
        plt.plot(z * 1e3, I / I.max())
        plt.xlabel('z at focus (um)')
        plt.ylabel('normalized intensity')
        plt.title('Elliptical-mirror wave focus (Fresnel-Kirchhoff)')
        plt.savefig('12_wave_focus.png', dpi=120)


if __name__ == '__main__':
    main()
