"""Golden Kirchhoff-integral values from the reference implementation
(_diffraction_integral_conv) on a synthetic slit->screen case."""
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
from xrt.backends.raycing.waves import _diffraction_integral_conv  # noqa


class NS:
    pass


rng = np.random.RandomState(7)
Ns = 400
Nd = 120
E0 = 9000.0

oeLocal = NS()
oeLocal.x = rng.uniform(-0.05, 0.05, Ns)
oeLocal.y = np.zeros(Ns)
oeLocal.z = rng.uniform(-0.02, 0.02, Ns)
oeLocal.E = np.ones(Ns) * E0
oeLocal.Es = np.exp(1j * rng.uniform(0, 2 * np.pi, Ns)) * \
    rng.uniform(0.5, 1.0, Ns)
oeLocal.Ep = np.exp(1j * rng.uniform(0, 2 * np.pi, Ns)) * \
    rng.uniform(0.1, 0.3, Ns)
oeLocal.a = np.zeros(Ns)
oeLocal.b = np.ones(Ns)
oeLocal.c = np.zeros(Ns)

wave = NS()
wave.xDiffr = rng.uniform(-0.5, 0.5, Nd)
wave.yDiffr = np.ones(Nd) * 5000.0
wave.zDiffr = rng.uniform(-0.3, 0.3, Nd)

n = [0, 1, 0]
nl = oeLocal.a * n[0] + oeLocal.b * n[1] + oeLocal.c * n[2]
good = np.ones(Ns, bool)
good[::7] = False   # some dead samples

Es, Ep, aE, bE, cE = _diffraction_integral_conv(oeLocal, n, nl, wave, good)
dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_kirchhoff.npz')
np.savez_compressed(
    os.path.abspath(dest),
    src_x=oeLocal.x, src_y=oeLocal.y, src_z=oeLocal.z, src_E=oeLocal.E,
    src_Es=oeLocal.Es, src_Ep=oeLocal.Ep, good=good,
    dst_x=wave.xDiffr, dst_y=wave.yDiffr, dst_z=wave.zDiffr,
    Es=Es, Ep=Ep, aE=aE, bE=bE, cE=cE)
print('wrote', os.path.abspath(dest))
