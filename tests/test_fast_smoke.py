"""Fast physics smoke for the <5-min gate.

34 of the test modules carry a module-level ``slow`` mark, so the fast
gate (``pytest -m "not slow"``) used to contain zero crystal, TT,
trace-parity or qook coverage — a regression in materials/crystal.py
would sail through.  This module runs ONE representative golden case per
slow family at reduced size, unmarked, so the gate catches physics
regressions.  The full-accuracy versions stay in their slow modules
(test_materials.py, test_tt.py, test_trace_parity.py, test_qook.py)."""
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.physconsts import CH

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


def _rocking(cr, alphaDeg, dtheta, E0=10000.):
    """Same geometry helper as tests/test_materials.py."""
    thetaCenter = math.asin(CH / (2 * float(cr.d) * E0))
    theta = dtheta + thetaCenter
    alpha = math.radians(alphaDeg)
    s0 = (np.zeros_like(theta), np.cos(theta + alpha),
          -np.sin(theta + alpha))
    sh = (np.zeros_like(theta), np.cos(theta - alpha),
          np.sin(theta - alpha))
    n = (0, 0, 1) if cr.geom.startswith('Bragg') else (0, -1, 0)
    hn = (0, math.sin(alpha), math.cos(alpha))
    gamma0 = sum(i * j for i, j in zip(n, s0))
    gammah = sum(i * j for i, j in zip(n, sh))
    hns0 = sum(i * j for i, j in zip(hn, s0))
    return cr.get_amplitude(jnp.full(dtheta.shape, E0),
                            jnp.asarray(gamma0), jnp.asarray(gammah),
                            jnp.asarray(hns0))


def test_crystal_rocking_smoke():
    """Thick Bragg Si111 dynamical-diffraction curve vs the reference
    golden (every 8th point of test_materials.py's full case)."""
    ref = np.load(os.path.join(GOLDEN, 'ref_materials.npz'))
    cr = xm.CrystalDiamond.create(hkl=(1, 1, 1), d=3.13562,
                                  geom='Bragg reflected')
    dth = ref['rc_braggSi111_thick_0_dtheta'][::8]
    curS, curP = _rocking(cr, 0., dth)
    np.testing.assert_allclose(curS, ref['rc_braggSi111_thick_0_s'][::8],
                               rtol=1e-4, atol=3e-6)
    np.testing.assert_allclose(curP, ref['rc_braggSi111_thick_0_p'][::8],
                               rtol=1e-4, atol=3e-6)


def test_tt_rocking_smoke():
    """Bent-crystal Takagi-Taupin rocking curve vs the pyTTE golden
    (every 6th scan angle of test_tt.py's full case)."""
    from xrt_tpu.materials import CrystalSi
    g = np.load(os.path.join(GOLDEN, 'ref_tt.npz'))
    scan = g['scan'][::6]
    thetaB = float(g['thetaB'])
    E = jnp.full(scan.shape, float(g['E0']))
    bIn = -jnp.sin(thetaB + jnp.asarray(scan))
    si = CrystalSi.create(hkl=(1, 1, 1), t=float(g['t_mm']))
    rs, _ = si.get_amplitude_pytte(E, bIn, Ry=float(g['Rm_mm']),
                                   alphaAsym=0.0, nsteps=4000)
    assert np.allclose(np.abs(np.asarray(rs)) ** 2,
                       g['bragg_sigma_R'][::6], atol=1e-4)


def test_trace_parity_smoke():
    """The config-1 toroid trace at 1/10 the golden ray count: good-ray
    fraction and flux per ray (Rh reflectivity) at MC tolerance."""
    from xrt_tpu.sources import GeometricSource
    from xrt_tpu.oes import ToroidMirror
    from xrt_tpu.screens import Screen

    g = np.load(os.path.join(GOLDEN, 'ref_trace_config1.npz'))
    nrays = int(g['nrays']) // 10
    E0, P, Q, PITCH = 9000.0, 10000.0, 2000.0, 4e-3
    src = GeometricSource.create(
        nrays=nrays, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(E0 - 100, E0 + 100),
        polarization='horizontal')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    toroid = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r,
        material=xm.Material.create('Rh', rho=12.41),
        limPhysX=(-20, 20), limPhysY=(-300, 300))
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))
    beam = src.shine(jax.random.PRNGKey(7))
    glo, _ = toroid.reflect(beam)
    img = screen.expose(glo)
    good = np.asarray(glo.state) == 1
    I = np.asarray(img.Jss + img.Jpp)[good]
    assert abs(good.mean() - float(g['ngood_frac'])) < 6e-3
    flux_per_ray = I.sum() / nrays
    ref_flux_per_ray = float(g['flux']) / int(g['nrays'])
    assert abs(flux_per_ray - ref_flux_per_ray) / ref_flux_per_ray < 0.02
    # image z size (the focusing quality) at MC tolerance
    z = np.asarray(img.z)[good]
    zs_ = np.sqrt(np.average((z - np.average(z, weights=I)) ** 2,
                             weights=I))
    assert abs(zs_ - float(g['z_std'])) / float(g['z_std']) < 0.08


def test_qook_smoke():
    """One reference xrtQook project loads and traces (the 1-crystal
    project at reduced rays; full sweep in test_qook.py)."""
    from xrt_tpu.qook import load_qook_project
    prj = load_qook_project(
        os.path.join(os.path.dirname(__file__), 'data', 'qook',
                     '1crystal.xml'), nrays=500)
    assert len(prj.beamline.flow) >= 3
    beams = prj.beamline.propagate_flow(jax.random.PRNGKey(0))
    last = list(beams)[-1]
    ngood = int((np.asarray(beams[last].state) == 1).sum())
    assert ngood > 250


def test_softimax_stage_smoke():
    """One SoftiMAX golden hop (slit -> M1) at reduced receiver count:
    integrated reflected |Es| within MC tolerance of the reference
    (full per-hop + chained parity in test_softimax_chain*.py)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    from xrt_tpu import config
    from xrt_tpu.beam import Beam
    from xrt_tpu.waves import prepare_wave_on_oe, diffract, wave_to_global
    from xrt_tpu.oes import ToroidMirror

    ref = np.load(os.path.join(GOLDEN, 'ref_softimax.npz'))
    dt = config.dtype()
    cdt = config.cdtype()
    E0 = float(ref['E0'])
    n = len(ref['slit_x'])
    Es = jnp.asarray(ref['slit_Es'], cdt)
    Ep = jnp.asarray(ref['slit_Ep'], cdt)
    lb = Beam(
        x=jnp.asarray(ref['slit_x'], dt), y=jnp.asarray(ref['slit_y'], dt),
        z=jnp.asarray(ref['slit_z'], dt), a=jnp.asarray(ref['slit_a'], dt),
        b=jnp.asarray(ref['slit_b'], dt), c=jnp.asarray(ref['slit_c'], dt),
        E=jnp.full((n,), E0, dt),
        state=jnp.asarray(ref['slit_state'], jnp.int32),
        path=jnp.zeros((n,), dt), Es=Es, Ep=Ep,
        Jss=(Es * jnp.conj(Es)).real, Jpp=(Ep * jnp.conj(Ep)).real,
        Jsp=Es * jnp.conj(Ep),
        area=jnp.asarray(float(ref['slit_area']), dt))
    # the same FE-slit / M1 geometry as tools/bench_softimax.py
    mAu = xm.Material.create('Au', rho=19.32, kind='mirror')
    P_FE, P_M1, PITCH = 19250.0, 24000.0, math.radians(1.0)
    from xrt_tpu.apertures import RectangularAperture
    slitFE = RectangularAperture.create(
        center=(0, P_FE, 0), opening=[-2.2e-4 * P_FE / 2, 2.2e-4 * P_FE / 2,
                                      -4.2e-4 * P_FE / 2, 4.2e-4 * P_FE / 2])
    m1 = ToroidMirror.create(
        center=(0, P_M1, 0), pitch=PITCH, positionRoll=math.pi / 2,
        R=1e22, r=2.0 * P_M1 * math.sin(PITCH), material=mAu,
        limPhysX=(-5, 5), limPhysY=(-150, 150))
    # same receiver count as the golden: |Es| per sample scales with
    # dS = area/n, so parity needs matched n
    w = prepare_wave_on_oe(m1, slitFE, n, key=jax.random.PRNGKey(3))
    b = diffract(lb, w, monochromatic=True)
    _, loc = m1.reflect(wave_to_global(b), jax.random.PRNGKey(0),
                        noIntersectionSearch=True)
    ours = float(jnp.mean(jnp.abs(loc.Es)))
    refv = np.abs(ref['m1_Es']).mean()
    assert abs(ours / refv - 1) < 0.15, (ours, refv)
