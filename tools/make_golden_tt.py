"""Golden Takagi-Taupin curves from the reference's pure-python pyTTE
solver (xrt/backends/raycing/pyTTE_x/pyTTE_rkpy.py), for validating
xrt_tpu.materials.tt against bent-crystal dynamical diffraction.

Run: python tools/make_golden_tt.py   (writes tests/golden/ref_tt.npz)
"""
import sys
import numpy as np

sys.path.insert(0, '/root/reference')
import matplotlib
matplotlib.use('Agg')

from xrt.backends.raycing.pyTTE_x import TTcrystal, TTscan, Quantity  # noqa
from xrt.backends.raycing.pyTTE_x.pyTTE_rkpy import TakagiTaupin  # noqa
import xrt.backends.raycing.materials as rm  # noqa

E0 = 9000.0
T_MM = 0.1
RM_MM = 2000.0
SCAN = np.linspace(-50, 100, 61) * 1e-6  # rad relative to thetaB

out = {'scan': SCAN, 'E0': E0, 't_mm': T_MM, 'Rm_mm': RM_MM}

si = rm.CrystalSi(hkl=(1, 1, 1), t=T_MM)
out['thetaB'] = float(si.get_Bragg_angle(E0))

# bend configurations: meridional cylinder (the original golden),
# spherical (finite Rs == Rm, the 2D-bent case the OpenCL
# tt_*_spherical kernels cover, materials.cl:1861-1953), anticlastic
# (Rs = -Rm, the free-bending cross curvature shape)
BENDS = {'': (RM_MM, np.inf),
         '_sph': (RM_MM, RM_MM),
         '_acl': (RM_MM, -RM_MM)}

for geomtag, asym in (('bragg', 0.0), ('laue', np.pi / 2)):
    for pol in ('sigma', 'pi'):
        for bendtag, (Rx_mm, Ry_mm) in BENDS.items():
            tx = TTcrystal(crystal='Si', hkl=[1, 1, 1],
                           thickness=Quantity(T_MM * 1e3, 'um'),
                           debye_waller=1, xrt_crystal=si,
                           Rx=Quantity(Rx_mm * 1e3, 'um'),
                           Ry=Quantity(Ry_mm * 1e3, 'um'),
                           asymmetry=Quantity(asym, 'rad'))
            ts = TTscan(constant=Quantity(E0, 'eV'),
                        scan=Quantity(SCAN, 'rad'), polarization=pol)
            tt = TakagiTaupin(tx, ts, need_transmission=False)
            res = tt.run()
            sol = tt.solution
            print(geomtag, pol, bendtag or '_cyl',
                  'geometry =', sol['geometry'])
            key = f'{geomtag}_{pol}{bendtag}'
            if sol['geometry'] == 'bragg':
                out[key + '_R'] = np.asarray(sol['reflectivity'], float)
            else:
                out[key + '_R'] = np.asarray(sol['diffraction'], float)
            out[key + '_amps'] = np.asarray(
                sol.get('complex_amplitude', sol.get('complex_amps', 0)))

np.savez('tests/golden/ref_tt.npz', **out)
print('saved tests/golden/ref_tt.npz')
