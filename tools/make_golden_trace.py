"""Golden end-to-end detector statistics from the reference xrt raycing
run (BASELINE config: GeometricSource -> toroidal mirror -> screen).

Run: python tools/make_golden_trace.py
Writes tests/golden/ref_trace_config1.npz with flux, weighted moments and
a 32x32 detector histogram.
"""
import sys
import math

sys.path.insert(0, '/root/reference')
import numpy as np
import matplotlib
matplotlib.use('Agg')

import xrt.backends.raycing as raycing  # noqa
import xrt.backends.raycing.sources as rs  # noqa
import xrt.backends.raycing.oes as roe  # noqa
import xrt.backends.raycing.screens as rsc  # noqa
import xrt.backends.raycing.materials as rm  # noqa

np.random.seed(1)
E0, P, Q, PITCH = 9000.0, 10000.0, 2000.0, 4e-3
NRAYS = 200000

bl = raycing.BeamLine()
src = rs.GeometricSource(
    bl, 'src', (0, 0, 0), nrays=NRAYS, dx=0.1, dz=0.05,
    dxprime=3e-5, dzprime=3e-5, distE='flat',
    energies=(E0 - 100, E0 + 100), polarization='horizontal')
mat = rm.Material('Rh', rho=12.41)
R = 2 * P * Q / (P + Q) / math.sin(PITCH)
r = 2 * P * Q / (P + Q) * math.sin(PITCH)
tor = roe.ToroidMirror(bl, 'tor', center=(0, P, 0), pitch=PITCH, R=R, r=r,
                       material=mat, limPhysX=(-20, 20),
                       limPhysY=(-300, 300))
scr = rsc.Screen(bl, 'scr', center=(0, P + Q, 2 * PITCH * Q))

beam = src.shine()
glo, loc = tor.reflect(beam)
img = scr.expose(glo)
good = glo.state == 1
I = (img.Jss + img.Jpp)[good]
x = img.x[good]
z = img.z[good]
xm_ = np.average(x, weights=I)
zm_ = np.average(z, weights=I)
np.savez('tests/golden/ref_trace_config1.npz',
         ngood_frac=good.mean(), flux=I.sum(), nrays=NRAYS,
         x_mean=xm_,
         x_std=np.sqrt(np.average((x - xm_) ** 2, weights=I)),
         z_mean=zm_,
         z_std=np.sqrt(np.average((z - zm_) ** 2, weights=I)),
         hist=np.histogram2d(x, z, bins=32, range=[[-1, 1], [-1, 1]],
                             weights=I)[0])
print('saved tests/golden/ref_trace_config1.npz')
