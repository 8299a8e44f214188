"""Bent-crystal reflectivity by the Takagi-Taupin solver, and its
derivative with respect to the bending radius (autodiff through the RK
integration) — the xrt_tpu analog of the reference's xrtBentXtal
calculator.

Run: python examples/04_bent_crystal_tt.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.materials import CrystalSi
from xrt_tpu.materials import tt

E0 = 9000.0


def main():
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.1)  # 100 um thick
    thetaB = float(si.get_Bragg_angle(E0))
    scan = np.linspace(-50e-6, 150e-6, 201)
    E = jnp.full(scan.shape, E0)
    bIn = -jnp.sin(thetaB + jnp.asarray(scan))

    curves = {}
    for Rm in (np.inf, 5000.0, 2000.0, 1000.0):
        rs, rp = si.get_amplitude_pytte(E, bIn, Ry=Rm, alphaAsym=0.0,
                                        nsteps=4000)
        curves[Rm] = np.abs(np.asarray(rs)) ** 2
        tag = 'flat' if np.isinf(Rm) else f'Rm={Rm/1000:g} m'
        print(f'{tag:>10}: peak R={curves[Rm].max():.3f}, integrated='
              f'{curves[Rm].sum() * (scan[1]-scan[0]) * 1e6:.3f} urad')

    # gradient of integrated reflectivity w.r.t. the inverse bending radius
    c1, c2, _ = tt.compute_tt_params(si, 0.0, Rm=2000.0, Rs=np.inf)

    def integrated(invR_um):
        rs, _ = tt.tt_amplitudes(E, bIn, None, None, si,
                                 c1 * invR_um * 2e6, c2 * invR_um * 2e6,
                                 invR_um, nsteps=1500, autoLimits=False)
        return jnp.sum(jnp.abs(rs) ** 2)

    g = float(jax.grad(integrated)(5e-7))
    print(f'd(integrated R)/d(1/R) = {g:.4g} (autodiff through TT RK4)')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure(figsize=(6, 4))
    for Rm, R in curves.items():
        lbl = 'flat' if np.isinf(Rm) else f'Rm = {Rm/1000:g} m'
        plt.plot(scan * 1e6, R, label=lbl)
    plt.xlabel(r'$\theta - \theta_B$ (urad)')
    plt.ylabel('reflectivity')
    plt.legend()
    plt.title('Si(111), 100 um, 9 keV: bent-crystal rocking curves')
    plt.savefig('04_bent_rocking.png', dpi=120)


if __name__ == '__main__':
    main()
