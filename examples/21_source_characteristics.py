"""Undulator source characteristics — the capability of the reference's
examples/withRaycing/01_SynchrotronSources family (synchrotronSources.py,
fluxThroughAperture.py): flux through an on-axis aperture vs energy,
harmonic tuning curves vs K, total & through-aperture power vs K, and the
Tanaka-Kitamura effective source size/divergence vs energy.

Run: python examples/21_source_characteristics.py
     XRT_TPU_PLATFORM=cpu python examples/21_source_characteristics.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import numpy as np

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NE = 21 if SMOKE else 201
NTH = 7 if SMOKE else 21
KS = np.linspace(0.3, 1.9, 3 if SMOKE else 9)
HARMONICS = (1, 3, 5) if SMOKE else (1, 3, 5, 7, 9)

from xrt_tpu.sources import Undulator


def main():
    und = Undulator.create(
        nrays=1000, eE=3.0, eI=0.5, eEpsilonX=0.263, eEpsilonZ=0.008,
        betaX=9.0, betaZ=2.0, period=18.0, n=111, K=1.92,
        eMin=1000.0, eMax=20000.0, xPrimeMax=0.03, zPrimeMax=0.03,
        eEspread=8e-4)

    # 1) flux through a 0.06 x 0.06 mrad^2 on-axis aperture vs energy
    energy = np.linspace(2000.0, 18000.0, NE)
    theta = np.linspace(-0.03e-3, 0.03e-3, NTH)
    psi = np.linspace(-0.03e-3, 0.03e-3, NTH)
    I0 = np.asarray(und.intensities_on_mesh(energy=energy, theta=theta,
                                            psi=psi)[0])
    dth, dps = theta[1] - theta[0], psi[1] - psi[0]
    flux = I0.sum(axis=(1, 2)) * dth * dps   # ph/s/0.1%bw
    print(f'flux through 60x60 urad^2: peak {flux.max():.3e} ph/s/0.1%bw '
          f'at {energy[flux.argmax()]:.0f} eV')

    # 2) tuning curves: max flux of each odd harmonic vs K
    tunesE, tunesF = und.tuning_curves(energy, theta, psi, HARMONICS, KS)
    for ih, h in enumerate(HARMONICS):
        print(f'harmonic {h}: E {tunesE[0, ih]:.2f}..{tunesE[-1, ih]:.2f} '
              f'keV, peak flux {tunesF[:, ih].max():.3e}')

    # 3) power vs K: total and through the aperture
    ptot = np.asarray(und.power_vs_K(KS))
    paper = und.power_vs_K_through_aperture(energy, theta, psi, KS)
    for K, pt, pa in zip(KS, ptot, paper):
        print(f'K={K:.2f}: total {pt:8.1f} W, through aperture {pa:7.2f} W')

    # 4) Tanaka-Kitamura effective size/divergence at the first harmonics
    Eh = np.asarray([float(tunesE[-1, i]) * 1000 for i in
                     range(len(HARMONICS))])
    sig = np.asarray(und.get_SIGMA(Eh))
    sigP = np.asarray(und.get_SIGMAP(Eh))
    for h, e, sx, sz, spx, spz in zip(HARMONICS, Eh, sig[0] * 1e3,
                                      sig[1] * 1e3, sigP[0] * 1e6,
                                      sigP[1] * 1e6):
        print(f'harmonic {h} at {e:.0f} eV: size {sx:.1f} x {sz:.1f} um^2, '
              f'divergence {spx:.2f} x {spz:.2f} urad^2')

    if not SMOKE:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(2, 2, figsize=(11, 8))
        axs[0, 0].semilogy(energy / 1e3, flux)
        axs[0, 0].set(xlabel='energy (keV)', ylabel='flux (ph/s/0.1%bw)',
                      title='flux through 60x60 urad$^2$')
        for ih, h in enumerate(HARMONICS):
            axs[0, 1].loglog(tunesE[:, ih], tunesF[:, ih], '-o', ms=3,
                             label=f'n={h}')
        axs[0, 1].set(xlabel='energy (keV)', ylabel='flux (ph/s/0.1%bw)',
                      title='tuning curves')
        axs[0, 1].legend()
        axs[1, 0].plot(KS, ptot, '-o', label='total')
        axs[1, 0].plot(KS, paper, '-s', label='through aperture')
        axs[1, 0].set(xlabel='K', ylabel='power (W)', title='power vs K')
        axs[1, 0].legend()
        axs[1, 1].plot(HARMONICS, sig[0] * 1e3, '-o', label=r"$\Sigma_x$")
        axs[1, 1].plot(HARMONICS, sig[1] * 1e3, '-s', label=r"$\Sigma_z$")
        axs[1, 1].set(xlabel='harmonic', ylabel=r'size ($\mu$m)',
                      title='T-K effective source size')
        axs[1, 1].legend()
        fig.tight_layout()
        fig.savefig('source_characteristics.png', dpi=120)
        print('saved source_characteristics.png')


if __name__ == '__main__':
    main()
