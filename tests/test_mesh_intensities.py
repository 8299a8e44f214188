"""intensities_on_mesh / multi_electron_stack on BM and undulator."""
import numpy as np
import jax

from xrt_tpu.sources.synchrotron import BendingMagnet
from xrt_tpu.sources.undulator import Undulator


def _bm():
    return BendingMagnet.create(
        eE=3.0, eI=0.5, B0=1.7, eEpsilonX=0.0, eEpsilonZ=0.0,
        eMin=9000.0, eMax=11000.0, xPrimeMax=1e-3, zPrimeMax=0.3e-3)


def _und(**kw):
    return Undulator.create(
        eE=3.0, eI=0.5, K=1.45, period=29.0, n=40,
        eEpsilonX=0.0, eEpsilonZ=0.0, eMin=3000.0, eMax=3200.0, xPrimeMax=0.05e-3, zPrimeMax=0.05e-3,
        **kw)


def test_bm_stokes_on_mesh():
    bm = _bm()
    energy = np.array([10000.0])
    theta = np.linspace(-5e-4, 5e-4, 5)
    psi = np.linspace(-3e-4, 3e-4, 21)
    s0, s1, s2, s3 = bm.intensities_on_mesh(energy=energy, theta=theta,
                                            psi=psi)
    assert s0.shape == (1, 5, 21)
    assert np.all(s0 > 0)
    # on-axis BM radiation is fully s-polarized: s1 -> +1
    mid = s0.shape[2] // 2
    assert s1[0, 2, mid] > 0.95
    # circular polarization flips sign across the orbit plane
    assert s3[0, 2, 2] * s3[0, 2, -3] < 0
    assert abs(s3[0, 2, 2]) > 0.05
    # intensity decays away from the plane
    assert s0[0, 2, mid] > 2 * s0[0, 2, 0]


def test_undulator_mesh_with_harmonic_axis():
    und = _und()
    energy = np.array([float(und.E1)])  # exactly the on-axis fundamental
    theta = np.linspace(-2e-5, 2e-5, 5)
    psi = np.linspace(-2e-5, 2e-5, 5)
    s0, s1, s2, s3 = und.intensities_on_mesh(energy=energy, theta=theta,
                                             psi=psi)
    assert s0.shape == (1, 5, 5)
    # on-axis odd-harmonic radiation is linearly polarized along x
    assert s1[0, 2, 2] > 0.95
    assert s0[0, 2, 2] == s0.max()
    # restricting to the first harmonic reproduces the same map here
    s0h = und.intensities_on_mesh(energy=energy, theta=theta, psi=psi,
                                  harmonic=[1])[0]
    assert s0h.shape == (1, 5, 5, 1)
    np.testing.assert_allclose(s0h[..., 0], s0, rtol=1e-12)


def test_undulator_espread_averaging_smooths():
    theta = np.linspace(-2e-5, 2e-5, 3)
    psi = np.linspace(-2e-5, 2e-5, 3)
    energy = np.linspace(3050.0, 3150.0, 7)
    s0_mono = _und().intensities_on_mesh(energy=energy, theta=theta,
                                         psi=psi)[0]
    s0_spread = _und(eEspread=2e-3).intensities_on_mesh(
        energy=energy, theta=theta, psi=psi, eSpreadNSamples=8)[0]
    # same shape; the spread widens/lowers the on-axis spectral peak
    assert s0_spread.shape == s0_mono.shape
    peak_mono = s0_mono[:, 1, 1].max()
    peak_spread = s0_spread[:, 1, 1].max()
    assert peak_spread < peak_mono


def test_multi_electron_stack_shapes_and_determinism():
    und = _und()
    theta = np.linspace(-2e-5, 2e-5, 4)
    psi = np.linspace(-2e-5, 2e-5, 3)
    energy = np.array([3099.0, 3100.0])
    Es, Ep = und.multi_electron_stack(jax.random.PRNGKey(1), energy=energy,
                                      theta=theta, psi=psi)
    assert Es.shape == (2, 4, 3) and Ep.shape == (2, 4, 3)
    # zero emittance & no spread: macro-electrons are deterministic
    Es2, _ = und.multi_electron_stack(jax.random.PRNGKey(2), energy=energy,
                                      theta=theta, psi=psi)
    assert np.allclose(np.asarray(Es), np.asarray(Es2))
    assert np.all(np.isfinite(np.asarray(Es)))


def test_mesh_divergence_convolution_widens():
    bm0 = _bm()
    energy = np.array([10000.0])
    theta = np.linspace(-5e-4, 5e-4, 3)
    psi = np.linspace(-3e-4, 3e-4, 41)
    s0 = bm0.intensities_on_mesh(energy=energy, theta=theta, psi=psi)[0]
    import jax.numpy as jnp
    bmd = bm0.replace(dzprime=jnp.asarray(5e-5))
    s0d = bmd.intensities_on_mesh(energy=energy, theta=theta, psi=psi)[0]
    # FWHM along psi grows after convolution
    prof = s0[0, 1]
    profd = s0d[0, 1]

    def fwhm(p):
        h = p.max() / 2
        return (p > h).sum()

    assert fwhm(profd) >= fwhm(prof)


def test_undulator_tuning_curves_and_power():
    und = _und()
    theta = np.linspace(-2e-5, 2e-5, 5)
    psi = np.linspace(-2e-5, 2e-5, 5)
    Ks = [1.3, 1.45]
    E1s = [float(und.replace(Ky=und.Ky * 0 + K).E1) for K in Ks]
    energy = np.linspace(min(E1s) - 150, max(E1s) + 50, 25)
    tE, tF = und.tuning_curves(energy, theta, psi, [1], Ks)
    assert tE.shape == (2, 1) and tF.shape == (2, 1)
    # the peak energy tracks the fundamental: higher K -> lower E1
    assert tE[0, 0] > tE[1, 0]
    assert np.allclose(tE[:, 0] * 1000, E1s, rtol=0.02)
    assert np.all(tF > 0)
    p = und.power_vs_K_through_aperture(energy, theta, psi, Ks)
    assert p.shape == (2,) and np.all(p > 0) and np.all(np.isfinite(p))


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
