"""Golden tests of the synchrotron sources vs the reference implementation
(tests/golden/ref_sources.npz from tools/make_golden_sources.py) plus
statistical checks of the Monte-Carlo shine."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xrt_tpu.sources.synchrotron import BendingMagnet, Wiggler

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


@pytest.fixture(scope='module')
def ref():
    return np.load(os.path.join(GOLDEN, 'ref_sources.npz'))


def make_bm(nrays=50000, oversample=2):
    return BendingMagnet.create(
        nrays=nrays, eE=6.0, eI=0.2, B0=0.85, eMin=10000, eMax=60000,
        xPrimeMax=1.0, zPrimeMax=0.3, oversample=oversample)


def make_wiggler(nrays=50000):
    return Wiggler.create(
        nrays=nrays, eE=3.0, eI=0.5, K=13.0, period=150.0, n=10,
        eMin=1000, eMax=30000, xPrimeMax=1.0, zPrimeMax=0.3)


def test_bm_parameters(ref):
    bm = make_bm()
    np.testing.assert_allclose(bm.gamma, ref['bm_gamma'], rtol=1e-12)
    np.testing.assert_allclose(bm.ro, ref['bm_ro'], rtol=1e-10)
    np.testing.assert_allclose(float(bm.dx), ref['bm_dx'], rtol=1e-10)
    np.testing.assert_allclose(float(bm.dz), ref['bm_dz'], rtol=1e-10)
    np.testing.assert_allclose(float(bm.dxprime), ref['bm_dxprime'],
                               rtol=1e-10)
    np.testing.assert_allclose(float(bm.dzprime), ref['bm_dzprime'],
                               rtol=1e-10)


def test_bm_intensity_map(ref):
    bm = make_bm()
    I, Es, Ep = bm.build_I_map(jax.random.PRNGKey(0),
                               jnp.asarray(ref['bm_E']),
                               jnp.asarray(ref['bm_theta']),
                               jnp.asarray(ref['bm_psi']))
    np.testing.assert_allclose(I, ref['bm_I'], rtol=3e-8)
    np.testing.assert_allclose(Es, ref['bm_Es'], rtol=3e-8, atol=1e-10)
    np.testing.assert_allclose(Ep, ref['bm_Ep'], rtol=3e-8, atol=1e-10)


def test_wiggler_parameters(ref):
    wig = make_wiggler()
    np.testing.assert_allclose(float(wig.K), ref['wig_K'], rtol=1e-10)
    np.testing.assert_allclose(float(wig.B0), ref['wig_B'], rtol=1e-10)
    np.testing.assert_allclose(wig.X0, ref['wig_X0'], rtol=1e-8)


def test_wiggler_intensity_map(ref):
    wig = make_wiggler()
    I, Es, Ep = wig.build_I_map(jax.random.PRNGKey(0),
                                jnp.asarray(ref['wig_E']),
                                jnp.asarray(ref['wig_theta']),
                                jnp.asarray(ref['wig_psi']))
    np.testing.assert_allclose(I, ref['wig_I'], rtol=3e-8, atol=1e-3)
    np.testing.assert_allclose(Es, ref['wig_Es'], rtol=3e-8, atol=1e-10)
    np.testing.assert_allclose(Ep, ref['wig_Ep'], rtol=3e-8, atol=1e-10)


def test_bm_shine_statistics(ref):
    """The resampled MC beam must have the reference's density: compare the
    marginal psi histogram vs the exact intensity marginal."""
    bm = make_bm(nrays=200000, oversample=2)
    beam = bm.shine(jax.random.PRNGKey(42))
    psi = np.arctan2(np.asarray(beam.c), np.asarray(beam.b))
    # exact marginal over the acceptance grid
    E, th, ps = np.meshgrid(np.linspace(10000, 60000, 24),
                            np.linspace(bm.Theta_min, bm.Theta_max, 16),
                            np.linspace(bm.Psi_min, bm.Psi_max, 41),
                            indexing='ij')
    I = np.asarray(bm.build_I_map(jax.random.PRNGKey(0), jnp.asarray(
        E.ravel()), jnp.asarray(th.ravel()), jnp.asarray(ps.ravel()))[0])
    I = I.reshape(E.shape)
    marg = I.sum(axis=(0, 1))
    marg /= marg.sum()
    edges = np.linspace(bm.Psi_min, bm.Psi_max, 42)
    h, _ = np.histogram(psi, bins=edges)
    h = h / h.sum()
    # the e-beam divergence convolution smears slightly; loose comparison
    assert np.abs(h - marg).max() < 0.15 * marg.max()
    # total flux estimate from bookkeeping: accepted/seeded ~ mean(I)*xzE
    flux = float(beam.accepted) / float(beam.seeded)
    meanI = I.mean() * bm.xzE
    np.testing.assert_allclose(flux, meanI, rtol=0.05)


def test_bm_energy_spectrum_shape():
    """Spectral density of sampled rays follows the BM spectrum."""
    bm = make_bm(nrays=200000, oversample=2)
    beam = bm.shine(jax.random.PRNGKey(1))
    E = np.asarray(beam.E)
    h, edges = np.histogram(E, bins=10, range=(10000, 60000))
    h = h / h.sum()
    centers = 0.5 * (edges[:-1] + edges[1:])
    # exact marginal
    Eg, th, ps = np.meshgrid(centers,
                             np.linspace(bm.Theta_min, bm.Theta_max, 16),
                             np.linspace(bm.Psi_min, bm.Psi_max, 21),
                             indexing='ij')
    I = np.asarray(bm.build_I_map(jax.random.PRNGKey(0),
                                  jnp.asarray(Eg.ravel()),
                                  jnp.asarray(th.ravel()),
                                  jnp.asarray(ps.ravel()))[0])
    marg = I.reshape(Eg.shape).sum(axis=(1, 2))
    marg = marg / marg.sum()
    np.testing.assert_allclose(h, marg, atol=0.02)


def test_wiggler_shine_positions():
    wig = make_wiggler(nrays=50000)
    beam = wig.shine(jax.random.PRNGKey(3))
    y = np.asarray(beam.y)
    x = np.asarray(beam.x)
    L = wig.L0 * wig.Np
    assert (np.abs(y) < L / 2 + wig.L0).all()
    assert np.abs(x).max() < wig.X0 * 1.5 + 5 * float(wig.dx)
    # directions within the acceptance
    a = np.asarray(beam.a)
    assert np.abs(a).max() < wig.Theta_max * 1.5 + 3e-4


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
