"""Infrared edge radiation from two bending-magnet edges.

The capability of the reference's
examples/withRaycing/01_SynchrotronSources/edge_radiation.py: a
SourceFromField with a tabulated two-dipole field whose four narrow edge
regions emit the IR "edge radiation".  The two inner edges flank the
straight section and radiate into the front end; the radiation is
*radially* polarized, so the s-polarized image is suppressed on the
vertical axis and the p-polarized image on the horizontal axis.

Computed at lambda = 10 um (E0 = 0.124 eV) in the near field at
R0 = 1.3 m (the new SourceFromField R0 mode), like the reference's
'2-near-field' case.

Run: python examples/22_edge_radiation.py
     XRT_TPU_PLATFORM=cpu python examples/22_edge_radiation.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import numpy as np
import jax
import jax.numpy as jnp

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NPT = 15 if SMOKE else 101          # image pixels per axis
GNODES = 600 if SMOKE else 3000

from xrt_tpu.sources import SourceFromField
from xrt_tpu.physconsts import CH

E0 = CH / 1e5            # 10 um = 1e5 A -> 0.124 eV
R0 = 2500.0              # observation distance, mm (near field)
B0 = 1.4                 # dipole field, T
LBM, LS, W = 600.0, 300.0, 20.0    # magnet length, straight, edge width


def two_dipole_field():
    y = np.linspace(-(LS / 2 + LBM + 150), LS / 2 + LBM + 150, 8000)
    edge = lambda y0: 0.5 * (1 + np.tanh((y - y0) / W))
    By = B0 * (edge(-LS / 2 - LBM) - edge(-LS / 2) +
               edge(LS / 2) - edge(LS / 2 + LBM))
    return np.vstack([y, By]).T


def main():
    field = two_dipole_field()
    src = SourceFromField.create(
        nrays=100, eE=2.75, eI=0.5, eEpsilonX=0.0, eEpsilonZ=0.0,
        customField=field, eMin=E0 * 0.98, eMax=E0 * 1.02,
        xPrimeMax=15.0, zPrimeMax=15.0,   # mrad
        gNodes=GNODES, gIntervals=6, R0=R0)

    # near-field image on an (x, z) grid at R0: angles = atan(pos / R0)
    lim = 20.0    # mm, like the reference limx/limy
    xs = np.linspace(-lim, lim, NPT)
    th, ps = np.meshgrid(np.arctan(xs / R0), np.arctan(xs / R0),
                         indexing='ij')
    E = jnp.full(th.size, E0)
    I, Es, Ep = jax.jit(src.build_I_map)(
        jax.random.PRNGKey(0), E, jnp.asarray(th.ravel()),
        jnp.asarray(ps.ravel()))
    Is = np.asarray(jnp.abs(Es) ** 2).reshape(NPT, NPT)
    Ip = np.asarray(jnp.abs(Ep) ** 2).reshape(NPT, NPT)

    # radial polarization signature: the p-polarized (vertical-E) channel
    # is concentrated on the vertical axis and vanishes on the horizontal
    # one; the s channel keeps a sigma background from the dipole bodies
    # (tangent points inside the window), as in the reference example
    ih = Is[:, NPT // 2].sum() / max(Ip[:, NPT // 2].sum(), 1e-30)
    pv = Ip[NPT // 2, :].sum() / max(Ip[:, NPT // 2].sum(), 1e-30)
    print(f'E0 = {E0:.4f} eV (lambda = 10 um), R0 = {R0} mm')
    print(f's/p along the horizontal axis: {ih:.3g} (expect >> 1)')
    print(f'p(vertical axis)/p(horizontal axis): {pv:.3g} (expect >> 1)')
    assert ih > 3 and pv > 10, 'radial polarization pattern expected'

    if not SMOKE:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(2, 2, figsize=(10, 8))
        axs[0, 0].plot(field[:, 0] * 1e-3, field[:, 1])
        axs[0, 0].set(xlabel='y (m)', ylabel='By (T)',
                      title='two-dipole field (4 edges)')
        ext = (-lim, lim, -lim, lim)
        for ax, img, t in ((axs[1, 0], Is.T, 'horizontal (s) polarization'),
                           (axs[1, 1], Ip.T, 'vertical (p) polarization'),
                           (axs[0, 1], (Is + Ip).T, 'total')):
            ax.imshow(img, extent=ext, origin='lower', cmap='inferno')
            ax.set(xlabel='x (mm)', ylabel='z (mm)', title=t)
        fig.suptitle('IR edge radiation at R0 = 1.3 m, $\\lambda$ = 10 um')
        fig.tight_layout()
        fig.savefig('edge_radiation.png', dpi=120)
        print('saved edge_radiation.png')


if __name__ == '__main__':
    main()
