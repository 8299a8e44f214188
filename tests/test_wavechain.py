"""WaveChain: the one-object wave-chain builder (capability analog of
hand-written run_process wave chains like the reference's
Softi_CXIw2D.py run_process_wave)."""
import math

import numpy as np
import jax
import pytest

import xrt_tpu.materials as xm
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GaussianBeam
from xrt_tpu.wavechain import WaveChain
from xrt_tpu.waves import diffract, wave_to_global

E0 = 500.0
P, Q, PITCH = 5000.0, 1000.0, 6e-3


def _elements():
    mat = xm.Material.create('Au', rho=19.3, kind='mirror')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    src = GaussianBeam.create(w0=0.05, distE='lines', energies=(E0,),
                              polarization='horizontal')
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.3, 0.3, -0.15, 0.15))
    tor = ToroidMirror.create(center=(0, P, 0), pitch=PITCH, R=R, r=r,
                              material=mat, limPhysX=(-3, 3),
                              limPhysY=(-40, 40))
    scr = Screen.create(
        center=(0, P + Q * math.cos(2 * PITCH), Q * math.sin(2 * PITCH)),
        z=(0, -math.sin(2 * PITCH), math.cos(2 * PITCH)))
    return src, slit, tor, scr


def test_wavechain_matches_manual():
    """chain.build() reproduces the hand-written prepare/diffract/reflect
    sequence on identical prepared geometry."""
    src, slit, tor, scr = _elements()
    zs = np.linspace(-0.02, 0.02, 41)
    key = jax.random.PRNGKey(5)
    run = (WaveChain(src, nrays=600, fixedEnergy=E0)
           .through_aperture(slit)
           .through_oe(tor)
           .to_screen(scr, np.asarray([0.0]), zs)).build(key)
    wave, logs = run()
    I = WaveChain.absolute_intensity(wave, logs)

    wvs = run.waves
    cur = src.shine(key, wvs[0])
    b1 = diffract(cur, wvs[1], phase_mode=run.modes[1][0],
                  monochromatic=True, accumulate=run.modes[1][1])
    _, l1 = tor.reflect(wave_to_global(b1), key,
                        noIntersectionSearch=True)
    out = diffract(l1, wvs[2], phase_mode=run.modes[2][0],
                   monochromatic=True, accumulate=run.modes[2][1])
    Iman = np.asarray(out.Jss, np.float64) + \
        np.asarray(out.Jpp, np.float64)
    np.testing.assert_allclose(I, Iman, rtol=1e-5)
    # a real focus: peaked in the central half of the window
    assert I.argmax() in range(10, 31)


def test_wavechain_mode_selection():
    """Per-hop kernel modes come from the concrete geometry."""
    src, slit, tor, scr = _elements()
    zs = np.linspace(-0.02, 0.02, 21)
    run = (WaveChain(src, nrays=300, fixedEnergy=E0)
           .through_aperture(slit)
           .through_oe(tor)
           .to_screen(scr, np.asarray([0.0]), zs)).build(
               jax.random.PRNGKey(0))
    assert run.modes[0] is None
    # both hops are long-distance/compact: recentred phase on the MXU
    # (the two-term 'mxu2' series once e <= SERIES_E2_MAX)
    for m in (run.modes[1], run.modes[2]):
        assert m[0] == 'recentred' and m[1].startswith('mxu'), m


def test_wavechain_grating_area_fraction():
    """through_oe applies a blazed grating's illuminated-period fraction
    automatically (reference beamPGlocal.areaFraction)."""
    from xrt_tpu.oes import BlazedGrating
    src, slit, tor, scr = _elements()
    mat = xm.Material.create('Au', rho=19.3, kind='mirror')
    pg = BlazedGrating.create(center=(0, P, 0), pitch=0.05,
                              blaze=math.radians(0.6), rho=300.0,
                              material=mat, limPhysX=(-3, 3),
                              limPhysY=(-20, 20))
    ch = WaveChain(src, nrays=200, fixedEnergy=E0)
    ch.through_aperture(slit).through_oe(pg)
    kind, el, af = ch._hops[1]
    assert kind == 'oe'
    assert af is not None and 0.0 < af <= 1.0
    assert np.isclose(af, float(pg.get_grating_area_fraction()))


def test_mode_chooser_error_budget():
    """choose_kirchhoff_mode picks the 33%-faster single-pass bf16
    'mxu-fast' only when the caller's error budget covers its ~2e-3
    incoherent field error (VERDICT r4 #3: spend the accuracy budget
    per stage); phase/direction treatment (the sensitivity-critical
    parts) are identical, so chained parity tests are untouched."""
    import numpy as np
    from xrt_tpu.waves import choose_kirchhoff_mode, MXU_FAST_FIELD_ERR

    rng = np.random.default_rng(0)
    dst = (rng.normal(0, .5, 100), np.full(100, 5000.0),
           rng.normal(0, .5, 100))
    src = (rng.normal(0, .5, 100), rng.normal(0, .5, 100),
           rng.normal(0, .5, 100))
    assert choose_kirchhoff_mode(dst, src) == ('recentred', 'mxu2')
    assert choose_kirchhoff_mode(dst, src, error_budget=1e-4) == \
        ('recentred', 'mxu2')
    assert choose_kirchhoff_mode(dst, src,
                                 error_budget=MXU_FAST_FIELD_ERR) == \
        ('recentred', 'mxu-fast')
    # the standard 2e5-sample chain's MC floor admits mxu-fast
    assert 3.0 / np.sqrt(2e5) > MXU_FAST_FIELD_ERR
    # envelopes still dominate: a long footprint stays on 'mxu', a
    # broken envelope on 'vpu', regardless of budget
    src_long = (src[0], rng.uniform(-300, 300, 100), src[2])
    pm, am = choose_kirchhoff_mode(dst, src_long, error_budget=1.0)
    assert (pm, am)[0] in ('recentred', 'fast')
