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

# --- DCM parity golden -----------------------------------------------------
np.random.seed(2)
bl2 = raycing.BeamLine()
src2 = rs.GeometricSource(
    bl2, 'src', (0, 0, 0), nrays=100000, dx=0.1, dz=0.05,
    dxprime=1e-5, dzprime=1e-5, distE='flat',
    energies=(E0 - 8, E0 + 8), polarization='horizontal')
cr = rm.CrystalSi(hkl=(1, 1, 1))
thetaB = float(cr.get_Bragg_angle(E0) - cr.get_dtheta_symmetric_Bragg(E0))
dcm = roe.DCM(bl2, 'dcm', center=(0, 30000.0, 0), material=cr,
              material2=cr, bragg=thetaB,
              cryst2perpTransl=20.0 / 2 / math.cos(thetaB),
              limPhysX=(-50, 50), limPhysY=(-500, 500))
beam2 = src2.shine()
glo2, _, _ = dcm.double_reflect(beam2)
good2 = glo2.state == 1
I2 = (glo2.Jss + glo2.Jpp)[good2]
E2 = glo2.E[good2]
Em2 = np.average(E2, weights=I2)
np.savez('tests/golden/ref_trace_dcm.npz',
         flux_per_ray=I2.sum() / 100000, E_mean=Em2,
         E_std=np.sqrt(np.average((E2 - Em2) ** 2, weights=I2)),
         nrays=100000, thetaB=thetaB)
print('saved tests/golden/ref_trace_dcm.npz')
