"""Quarter-wave plate: circular polarization from a transmission crystal.

The xrt_tpu analog of the reference's 05_QWP family: a thin diamond
crystal in Bragg-transmission geometry, detuned slightly off the rocking
curve, retards the p-amplitude relative to s by ~pi/2 (the birefringence
of dynamical diffraction), turning linear 45-deg polarization into
circular.  The circular polarization rate (2 Im Jsp / (Jss+Jpp)) is
scanned across the detuning angle.

Run: python examples/19_qwp.py
     XRT_TPU_PLATFORM=cpu python examples/19_qwp.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import FlatMirror
from xrt_tpu.runner import get_beam_data

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 500 if SMOKE else 5000
NPTS = 9 if SMOKE else 41

E0 = 9000.0
T_CRYST = 0.05  # mm diamond thickness (-90 deg retardation ~60 urad off)


def main():
    cr = xm.CrystalDiamond.create(hkl=(1, 1, 1), t=T_CRYST,
                                  geom='Bragg transmitted')
    thetaB = float(cr.get_Bragg_angle(E0))
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.5, dz=0.5, distxprime=None, distzprime=None,
        dxprime=0.0, dzprime=0.0, distE='lines', energies=(E0,),
        polarization=45)   # linear +45 deg: equal s and p amplitudes
    offsets = np.linspace(-100e-6, 100e-6, NPTS)
    rates = []
    fluxes = []
    for off in offsets:
        qwp = FlatMirror.create(
            center=(0, 1000.0, 0), pitch=thetaB + off, material=cr,
            limPhysX=(-20, 20), limPhysY=(-20, 20))
        beam = src.shine(jax.random.PRNGKey(0))
        glo, _ = jax.jit(qwp.reflect)(beam)
        good = np.asarray(glo.state) == 1
        rate = np.asarray(get_beam_data(glo, 'circular_polarization_rate'))
        J = np.asarray(glo.Jss + glo.Jpp)
        rates.append(float((rate * J)[good].sum() / max(J[good].sum(),
                                                        1e-30)))
        fluxes.append(float(J[good].mean()))
    rates = np.asarray(rates)
    i = int(np.argmax(np.abs(rates)))
    print('detuning (urad) -> circular rate, transmission:')
    for o, r, f in zip(offsets[::max(NPTS // 9, 1)],
                       rates[::max(NPTS // 9, 1)],
                       fluxes[::max(NPTS // 9, 1)]):
        print(f'  {o*1e6:+7.1f}  {r:+6.3f}  {f:.3f}')
    print(f'best |circular rate| = {abs(rates[i]):.3f} at '
          f'{offsets[i]*1e6:+.1f} urad detuning '
          f'(diamond {T_CRYST} mm, Bragg-transmission QWP)')
    if not SMOKE:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax1 = plt.subplots(figsize=(6, 4))
        ax1.plot(offsets * 1e6, rates, 'o-', color='C0')
        ax1.set_xlabel('detuning from Bragg (urad)')
        ax1.set_ylabel('circular polarization rate', color='C0')
        ax2 = ax1.twinx()
        ax2.plot(offsets * 1e6, fluxes, 's-', color='C1')
        ax2.set_ylabel('transmission', color='C1')
        fig.tight_layout()
        fig.savefig('19_qwp.png', dpi=120)
    assert abs(rates[i]) > 0.3, 'QWP should produce substantial circularity'


if __name__ == '__main__':
    main()
