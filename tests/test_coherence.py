"""Coherence analysis vs the reference implementation."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from xrt_tpu import coherence as xc

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


@pytest.fixture(scope='module')
def ref():
    return np.load(os.path.join(GOLDEN, 'ref_coherence.npz'))


def test_1d_coherent_fraction(ref):
    J, II, Jd, varI, varJd, limJd, cohFr = xc.calc_1D_coherent_fraction(
        jnp.asarray(ref['U']), 'x', jnp.asarray(ref['axis']))
    np.testing.assert_allclose(J, ref['J'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(II, ref['II'], rtol=1e-9)
    np.testing.assert_allclose(Jd, ref['Jd'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(varI), ref['varI'], rtol=1e-9)
    np.testing.assert_allclose(float(varJd), ref['varJd'], rtol=1e-9)
    np.testing.assert_allclose(float(cohFr), ref['cohFr'], rtol=1e-9)
    if np.isnan(ref['limJd']):
        assert limJd is None
    else:
        np.testing.assert_allclose(limJd, ref['limJd'], rtol=1e-9)


def test_dotc(ref):
    U = jnp.asarray(ref['U'])
    np.testing.assert_allclose(
        float(xc.calc_degree_of_transverse_coherence_PCA(U)),
        ref['dotcPCA'], rtol=1e-9)
    # 4D from the mutual intensity built the same way as in the golden file
    repeats = U.shape[0]
    D = np.asarray(U).reshape(repeats, -1)
    J = np.dot(D.T.conj(), D)
    np.testing.assert_allclose(
        float(xc.calc_degree_of_transverse_coherence_4D(jnp.asarray(J))),
        ref['dotc4'], rtol=1e-9)
    # PCA and 4D views agree
    np.testing.assert_allclose(ref['dotc4'], ref['dotcPCA'], rtol=1e-9)


def test_eigen_modes_pca(ref):
    w, v = xc.calc_eigen_modes_PCA(jnp.asarray(ref['U']), eigenN=4)
    np.testing.assert_allclose(w, ref['wPCA'], rtol=1e-7, atol=1e-12)
    # eigenvectors defined up to phase; compare projectors column-wise
    # (only for modes with non-negligible weight: the test stack has rank 2)
    wmax = np.asarray(w).max()
    for i in range(4):
        if np.asarray(w)[i] < 1e-8 * wmax:
            continue
        a = np.asarray(v[:, i])
        b = ref['vPCA'][:, i]
        ip = np.vdot(b, a)
        na = np.vdot(a, a).real
        nb = np.vdot(b, b).real
        # collinearity: |<a,b>|^2 = |a|^2 |b|^2
        np.testing.assert_allclose(abs(ip) ** 2, na * nb, rtol=1e-6)
        np.testing.assert_allclose(na, nb, rtol=1e-6)


def test_eigen_modes_4d_vs_pca(ref):
    U = np.asarray(ref['U'])
    repeats = U.shape[0]
    D = U.reshape(repeats, -1)
    J = np.dot(D.T.conj(), D) / repeats
    w4, v4 = xc.calc_eigen_modes_4D(jnp.asarray(J), eigenN=3)
    wp, vp = xc.calc_eigen_modes_PCA(jnp.asarray(U), eigenN=3)
    # eigenvalue ratios agree between the two formulations (significant
    # modes only; the rank-2 stack leaves trailing modes at noise level)
    w4 = np.asarray(w4)
    wp = np.asarray(wp)
    sig = wp > 1e-8 * wp.max()
    np.testing.assert_allclose((w4 / w4.sum())[sig], (wp / wp.sum())[sig],
                               rtol=1e-6, atol=1e-10)


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
