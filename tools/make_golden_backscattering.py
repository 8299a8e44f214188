"""Golden near-backscattering rocking data from the reference CrystalSi
(the regime of tests/raycing/test_backcattering_xtal_Shvydko.py):
Si(888) at theta = 89.9 deg, energy scan across the back-reflection."""
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing.materials as rm  # noqa

cr = rm.CrystalSi(hkl=(8, 8, 8))
Eb = rm.ch / (2 * cr.d)
theta = math.radians(89.9)
E = Eb / math.sin(theta) * (1 + np.linspace(-40e-6, 80e-6, 241))
one = np.ones_like(E)
rs, rp = cr.get_amplitude(E, -math.sin(theta) * one,
                          math.sin(theta) * one,
                          -math.sin(theta) * one)[0:2]
dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_backscattering.npz')
np.savez(os.path.abspath(dest), E=E, theta=theta, rs=rs, rp=rp, Eb=Eb,
         d=float(cr.d))
print('wrote', os.path.abspath(dest), '| Eb =', Eb)
