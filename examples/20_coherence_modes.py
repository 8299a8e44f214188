"""Coherent-mode decomposition of a partially coherent undulator beam.

The xrt_tpu analog of the reference's coherence workflow (11_Waves +
coherence.py/modes.py): many single-electron (filament) fields are
computed on a grid at the first aperture, the mutual intensity is
eigendecomposed by PCA, and the mode gallery + degree of transverse
coherence are reported.  With a small electron beam the lowest mode
dominates (high coherent fraction); emittance populates higher modes.

Run: python examples/20_coherence_modes.py
     XRT_TPU_PLATFORM=cpu python examples/20_coherence_modes.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from xrt_tpu.sources import Undulator
from xrt_tpu.screens import Screen
from xrt_tpu.waves import prepare_wave_on_screen
from xrt_tpu.coherence import (calc_eigen_modes_PCA,
                               calc_degree_of_transverse_coherence_PCA)

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NE = 8 if SMOKE else 64          # electrons (field realizations)
NX = NZ = 16 if SMOKE else 32    # sampling grid
E0 = 9000.0
L = 25000.0


def main():
    und = Undulator.create(
        nrays=16, eE=3.0, eI=0.5, period=18.0, n=111, targetE=(E0, 7),
        eEpsilonX=0.263, eEpsilonZ=0.008, betaX=9.0, betaZ=2.0,
        eMin=E0 - 1, eMax=E0 + 1, xPrimeMax=0.02, zPrimeMax=0.02,
        gNodes=96, gIntervals=2)
    screen = Screen.create(center=(0, L, 0))
    half = 0.25   # mm at 25 m
    xs = np.linspace(-half, half, NX)
    zs = np.linspace(-half, half, NZ)
    wave = prepare_wave_on_screen(screen, und, xs, zs)

    shine = jax.jit(lambda k: und.shine_wave(k, wave, fixedEnergy=E0))
    key = jax.random.PRNGKey(0)
    fields = []
    for i in range(NE):
        key, sub = jax.random.split(key)
        w = shine(sub)
        fields.append(np.asarray(w.Es))
    # (repeats, nx, nz): the screen grid flattens with dim2 (z) slow
    U = jnp.asarray(np.stack(fields).reshape(NE, NZ, NX).transpose(
        0, 2, 1))

    wPCA, modes = calc_eigen_modes_PCA(U, eigenN=4)
    wPCA = np.asarray(wPCA)
    dotc = float(calc_degree_of_transverse_coherence_PCA(U))
    tot = wPCA.sum() if wPCA.sum() > 0 else 1.0
    print(f'degree of transverse coherence (PCA): {dotc:.3f}')
    print('mode weights (descending):',
          ', '.join(f'{w:.1%}' for w in (wPCA / tot)[::-1]))
    if not SMOKE:
        from xrt_tpu.plotting import save_modes_plot
        save_modes_plot(wPCA, np.asarray(modes), (NX, NZ),
                        '20_modes.png')
        print('saved 20_modes.png (mode gallery)')
    assert (wPCA / tot)[::-1][0] > 0.2, 'lowest mode should dominate'


if __name__ == '__main__':
    main()
