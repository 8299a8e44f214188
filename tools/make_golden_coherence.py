"""Golden coherence-analysis outputs from the reference implementation."""
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import matplotlib
matplotlib.use('Agg')
from xrt.backends.raycing import coherence as rc  # noqa

rng = np.random.RandomState(5)
repeats, nx, ny = 20, 16, 12
# correlated gaussian field stack
x = np.linspace(-1, 1, nx)[:, None]
y = np.linspace(-1, 1, ny)[None, :]
U = np.zeros((repeats, nx, ny), complex)
for r in range(repeats):
    amp = rng.normal() + 1j * rng.normal()
    amp2 = 0.3 * (rng.normal() + 1j * rng.normal())
    U[r] = amp * np.exp(-(x**2 + y**2)) + \
        amp2 * np.exp(-(x**2 + y**2)) * x * 2

axis = np.linspace(-1, 1, nx)
J, II, Jd, varI, varJd, limJd, cohFr = rc.calc_1D_coherent_fraction(
    U, 'x', axis)
dotc4 = rc.calc_degree_of_transverse_coherence_4D(
    np.dot(U.reshape(repeats, -1).T.conj(), U.reshape(repeats, -1)))
dotcPCA = rc.calc_degree_of_transverse_coherence_PCA(U)
wPCA, vPCA = rc.calc_eigen_modes_PCA(U, eigenN=4)

dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_coherence.npz')
np.savez_compressed(os.path.abspath(dest), U=U, axis=axis, J=J, II=II,
                    Jd=Jd, varI=varI, varJd=varJd,
                    limJd=np.nan if limJd is None else limJd,
                    cohFr=cohFr, dotc4=dotc4, dotcPCA=dotcPCA,
                    wPCA=wPCA, vPCA=vPCA)
print('wrote', os.path.abspath(dest))
