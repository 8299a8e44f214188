"""Takagi-Taupin bent-crystal solver vs the reference pyTTE golden data."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xrt_tpu.materials import CrystalSi
from xrt_tpu.materials import tt

import os
GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'golden', 'ref_tt.npz')


def _gold():
    return np.load(GOLD)


def test_params_match_pytte():
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.1, geom='Laue reflected')
    c1, c2, ir1 = tt.compute_tt_params(si, 0.0, Rm=2000.0, Rs=np.inf)
    # pyTTE djparams for this configuration (anisotropic fixed-shape)
    assert np.isclose(c1, 1.4841915771268e-07, rtol=1e-10)
    assert np.isclose(c2, 6.075509038890e-09, rtol=1e-9)
    assert np.isclose(ir1, 5e-07, rtol=1e-12)


def test_isotropic_params():
    c1, c2, ir1 = tt.isotropic_plate_params(2e6, math.inf, 0.22)
    assert np.isclose(c1, 0.22 / 0.78 / 2e6)
    assert c2 == 0.0 and ir1 == 5e-7


def test_unbent_bragg_matches_closed_form():
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.1)
    E = jnp.full((101,), 9000.0)
    thetaB = float(si.get_Bragg_angle(9000.0))
    dth = np.linspace(-50e-6, 100e-6, 101)
    bIn = -jnp.sin(thetaB + jnp.asarray(dth))
    rs_ref, rp_ref = si.get_amplitude(E, bIn)
    rs, rp = tt.tt_amplitudes(E, bIn, None, None, si, 0.0, 0.0, 0.0,
                              nsteps=3000)
    assert np.allclose(np.abs(np.asarray(rs)), np.abs(np.asarray(rs_ref)),
                       atol=1e-4)
    assert np.allclose(np.abs(np.asarray(rp)), np.abs(np.asarray(rp_ref)),
                       atol=1e-4)


def test_bent_bragg_vs_pytte_golden():
    g = _gold()
    scan = g['scan']
    thetaB = float(g['thetaB'])
    E = jnp.full(scan.shape, float(g['E0']))
    bIn = -jnp.sin(thetaB + jnp.asarray(scan))
    si = CrystalSi.create(hkl=(1, 1, 1), t=float(g['t_mm']))
    rs, rp = si.get_amplitude_pytte(E, bIn, Ry=float(g['Rm_mm']),
                                    alphaAsym=0.0, nsteps=4000)
    assert np.allclose(np.abs(np.asarray(rs)) ** 2, g['bragg_sigma_R'],
                       atol=1e-4)
    assert np.allclose(np.abs(np.asarray(rp)) ** 2, g['bragg_pi_R'],
                       atol=1e-4)


def test_bent_laue_vs_pytte_golden():
    g = _gold()
    scan = g['scan']
    thetaB = float(g['thetaB'])
    E = jnp.full(scan.shape, float(g['E0']))
    th = thetaB + jnp.asarray(scan)
    bIn = -jnp.cos(th)
    bOut = -jnp.cos(th)
    bInH = jnp.sin(th)
    si = CrystalSi.create(hkl=(1, 1, 1), t=float(g['t_mm']),
                          geom='Laue reflected')
    rs, rp = si.get_amplitude_pytte(E, bIn, bOut, bInH,
                                    Ry=float(g['Rm_mm']), alphaAsym=0.0,
                                    nsteps=8000)
    # rapid Pendelloesung fringes: pointwise tolerance ~1% of the peak
    assert np.allclose(np.abs(np.asarray(rs)) ** 2,
                       g['laue_sigma_R'].real, atol=1e-2)
    assert np.allclose(np.abs(np.asarray(rp)) ** 2,
                       g['laue_pi_R'].real, atol=1e-2)


@pytest.mark.parametrize('bendtag,Rs_sign', [('_sph', 1.0), ('_acl', -1.0)])
def test_bent_bragg_finite_Rs_vs_pytte_golden(bendtag, Rs_sign):
    """2D-bent (finite sagittal radius) Bragg: spherical Rs=Rm and
    anticlastic Rs=-Rm vs the reference pyTTE solver (the python twin of
    the OpenCL spherical-bent kernels, materials.cl:1861-1953)."""
    g = _gold()
    scan = g['scan']
    thetaB = float(g['thetaB'])
    Rm = float(g['Rm_mm'])
    E = jnp.full(scan.shape, float(g['E0']))
    bIn = -jnp.sin(thetaB + jnp.asarray(scan))
    si = CrystalSi.create(hkl=(1, 1, 1), t=float(g['t_mm']))
    rs, rp = si.get_amplitude_pytte(E, bIn, Ry=Rm, Rx=Rs_sign * Rm,
                                    alphaAsym=0.0, nsteps=4000)
    assert np.allclose(np.abs(np.asarray(rs)) ** 2,
                       g[f'bragg_sigma{bendtag}_R'], atol=1e-4)
    assert np.allclose(np.abs(np.asarray(rp)) ** 2,
                       g[f'bragg_pi{bendtag}_R'], atol=1e-4)


@pytest.mark.parametrize('bendtag,Rs_sign', [('_sph', 1.0), ('_acl', -1.0)])
def test_bent_laue_finite_Rs_vs_pytte_golden(bendtag, Rs_sign):
    """2D-bent Laue (spherical / anticlastic) vs the reference pyTTE
    solver — exercises the c2 (sagittal curvature) strain term that the
    cylindrical goldens cannot see."""
    g = _gold()
    scan = g['scan']
    thetaB = float(g['thetaB'])
    Rm = float(g['Rm_mm'])
    E = jnp.full(scan.shape, float(g['E0']))
    th = thetaB + jnp.asarray(scan)
    bIn = -jnp.cos(th)
    bOut = -jnp.cos(th)
    bInH = jnp.sin(th)
    si = CrystalSi.create(hkl=(1, 1, 1), t=float(g['t_mm']),
                          geom='Laue reflected')
    rs, rp = si.get_amplitude_pytte(E, bIn, bOut, bInH, Ry=Rm,
                                    Rx=Rs_sign * Rm, alphaAsym=0.0,
                                    nsteps=8000)
    assert np.allclose(np.abs(np.asarray(rs)) ** 2,
                       g[f'laue_sigma{bendtag}_R'].real, atol=1e-2)
    assert np.allclose(np.abs(np.asarray(rp)) ** 2,
                       g[f'laue_pi{bendtag}_R'].real, atol=1e-2)


def test_bending_broadens_and_boosts_integrated_reflectivity():
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.1)
    E = jnp.full((151,), 9000.0)
    thetaB = float(si.get_Bragg_angle(9000.0))
    dth = np.linspace(-50e-6, 150e-6, 151)
    bIn = -jnp.sin(thetaB + jnp.asarray(dth))
    I_flat = np.abs(np.asarray(
        si.get_amplitude_pytte(E, bIn, Ry=math.inf)[0])) ** 2
    I_bent = np.abs(np.asarray(
        si.get_amplitude_pytte(E, bIn, Ry=1000.0, nsteps=4000)[0])) ** 2
    assert I_bent.sum() > 1.3 * I_flat.sum()
    assert (I_bent > I_bent.max() / 2).sum() > \
        (I_flat > I_flat.max() / 2).sum()


def test_tt_gradient_wrt_curvature():
    """The solver is differentiable through the deformation parameters."""
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.05)
    E = jnp.full((21,), 9000.0)
    thetaB = float(si.get_Bragg_angle(9000.0))
    dth = np.linspace(0, 60e-6, 21)
    bIn = -jnp.sin(thetaB + jnp.asarray(dth))
    c1_0, c2_0, _ = tt.compute_tt_params(si, 0.0, Rm=2000.0, Rs=np.inf)

    def integrated(invR):
        rs, _ = tt.tt_amplitudes(E, bIn, None, None, si,
                                 c1_0 * invR * 2e6, c2_0 * invR * 2e6,
                                 invR, nsteps=800, autoLimits=False)
        return jnp.sum(jnp.abs(rs) ** 2)

    gfun = jax.grad(integrated)
    gval = float(gfun(5e-7))
    assert np.isfinite(gval) and gval != 0.0
    # finite-difference cross-check
    h = 1e-9
    fd = (float(integrated(5e-7 + h)) - float(integrated(5e-7 - h))) / (2*h)
    # the FD step is necessarily coarse (h/x ~ 2e-3) on this oscillatory
    # functional; 2% agreement confirms the AD path
    assert np.isclose(gval, fd, rtol=2e-2)


def test_bent_laue_cylinder_oe_with_tt():
    """End-to-end: BentLaueCylinder with a useTT crystal produces finite
    diffracted intensity near the Bragg condition."""
    from xrt_tpu.oes import BentLaueCylinder
    from xrt_tpu.sources.geometric import GeometricSource
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.1, geom='Laue reflected',
                          useTT=True)
    thetaB = float(si.get_Bragg_angle(40000.0))
    oe = BentLaueCylinder.create(
        R=5000.0, center=(0, 1000.0, 0), pitch=thetaB + math.pi / 2,
        material=si, limPhysX=(-10, 10), limPhysY=(-10, 10))
    src = GeometricSource.create(nrays=300, dzprime=5e-5,
                                 energies=(40000.0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, loc = oe.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    I = np.asarray(glo.Jss + glo.Jpp)[good]
    assert np.all(np.isfinite(I))
    assert I.max() > 1e-3  # some rays inside the bent rocking curve


def test_thick_bent_bragg_is_stable():
    """Thick bent crystals: the plain-RK4 Riccati exploded (NaN -> zeros)
    once dz*|c0s| crossed RK4's imaginary-axis stability bound; the Lawson
    integrating-factor step integrates the linear phase exactly and must
    reproduce the saturated thick-crystal reflectivity at any thickness."""
    E0 = 9000.0
    scan = np.array([0.0, 15e-6, 30e-6])
    R_by_t = {}
    for t_mm in (0.15, 0.3, 1.0):
        si = CrystalSi.create(hkl=(1, 1, 1), t=t_mm)
        thetaB = float(si.get_Bragg_angle(E0))
        E = jnp.full(scan.shape, E0)
        bIn = -jnp.sin(thetaB + jnp.asarray(scan))
        c1, c2, ir1 = tt.compute_tt_params(si, 0.0, Rm=2000.0, Rs=np.inf)
        rs, _ = tt.tt_amplitudes(E, bIn, None, None, si, c1, c2, ir1,
                                 nsteps=4000, autoLimits=False)
        R_by_t[t_mm] = np.abs(np.asarray(rs)) ** 2
        assert np.all(np.isfinite(R_by_t[t_mm]))
        assert R_by_t[t_mm].max() > 0.9    # Darwin-band reflectivity
    # saturation: deeper crystal changes nothing at the 1e-3 level
    np.testing.assert_allclose(R_by_t[0.3], R_by_t[0.15], atol=1e-3)
    np.testing.assert_allclose(R_by_t[1.0], R_by_t[0.15], atol=1e-3)


def test_thick_bent_laue_is_stable():
    E0 = 9000.0
    si = CrystalSi.create(hkl=(1, 1, 1), t=0.3, geom='Laue reflected')
    thetaB = float(si.get_Bragg_angle(E0))
    scan = np.linspace(-100e-6, 100e-6, 5)
    E = jnp.full(scan.shape, E0)
    th = thetaB + jnp.asarray(scan)
    c1, c2, ir1 = tt.compute_tt_params(si, 0.0, Rm=2000.0, Rs=np.inf)
    rs, _ = tt.tt_amplitudes(E, -jnp.cos(th), -jnp.cos(th), jnp.sin(th),
                             si, c1, c2, ir1, nsteps=8000,
                             autoLimits=False)
    R = np.abs(np.asarray(rs)) ** 2
    assert np.all(np.isfinite(R)) and R.max() > 1e-3


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
