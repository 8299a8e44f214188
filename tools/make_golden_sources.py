"""Golden source-intensity maps from the reference xrt (pure numpy).
Run: python tools/make_golden_sources.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing as raycing  # noqa: E402
import xrt.backends.raycing.sources as rs  # noqa: E402

out = {}
bl = raycing.BeamLine()

# Bending magnet, ESRF-like
bm = rs.BendingMagnet(bl=bl, name='bm', nrays=100, eE=6.0, eI=0.2, B0=0.85,
                      eMin=10000, eMax=60000, xPrimeMax=1.0, zPrimeMax=0.3)
E, theta, psi = np.meshgrid(np.linspace(10000, 60000, 11),
                            np.linspace(-1e-3, 1e-3, 7),
                            np.linspace(-3e-4, 3e-4, 9), indexing='ij')
I, Es, Ep = bm.build_I_map(E.ravel(), theta.ravel(), psi.ravel())
out['bm_E'] = E.ravel()
out['bm_theta'] = theta.ravel()
out['bm_psi'] = psi.ravel()
out['bm_I'] = I
out['bm_Es'] = Es
out['bm_Ep'] = Ep

# Wiggler
wig = rs.Wiggler(bl=bl, name='wig', nrays=100, eE=3.0, eI=0.5, K=13.0, period=150.,
                 n=10, eMin=1000, eMax=30000, xPrimeMax=1.0, zPrimeMax=0.3)
Ew, thw, psw = np.meshgrid(np.linspace(1000, 30000, 11),
                           np.linspace(-1e-3, 1e-3, 7),
                           np.linspace(-3e-4, 3e-4, 9), indexing='ij')
Iw, Esw, Epw = wig.build_I_map(Ew.ravel(), thw.ravel(), psw.ravel())
out['wig_E'] = Ew.ravel()
out['wig_theta'] = thw.ravel()
out['wig_psi'] = psw.ravel()
out['wig_I'] = Iw
out['wig_Es'] = Esw
out['wig_Ep'] = Epw
out['wig_K'] = wig.K
out['wig_B'] = wig.B
out['wig_X0'] = wig.X0
out['wig_dx'] = wig.dx
out['wig_dz'] = wig.dz
out['wig_dxprime'] = wig.dxprime
out['wig_dzprime'] = wig.dzprime
out['bm_dx'] = bm.dx
out['bm_dz'] = bm.dz
out['bm_dxprime'] = bm.dxprime
out['bm_dzprime'] = bm.dzprime
out['bm_gamma'] = bm.gamma
out['bm_ro'] = bm.ro

dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_sources.npz')
np.savez_compressed(os.path.abspath(dest), **out)
print('wrote', os.path.abspath(dest))
