"""Loading the reference xrtQook's own saved projects
(tests/data/qook/*.xml, copied verbatim from the reference repo)."""
import math
import os

import numpy as np
import pytest
import jax

from xrt_tpu.qook import load_qook_project

QOOK = os.path.join(os.path.dirname(__file__), 'data', 'qook')
# every saved project shipped with the reference, including the 4-crystal
# 88-degree monochromator, the 6-mirror alignment torture test and the
# 14-element BioXAS beamline; min_good is the fraction of 3000 rays that
# must reach the final screen (BioXAS has real apertures)
FILES = (('1crystal.xml', 0.5), ('toroid_focus.xml', 0.5),
         ('testGrating.xml', 0.3), ('lens1.xml', 0.5),
         ('4crystals.xml', 0.5), ('testAlignment.xml', 0.5),
         ('BioXAS_Main.xml', 0.05), ('canted_undulators.xml', 0.5),
         ('mask_tests.xml', 0.5))


@pytest.mark.parametrize('fn,min_good', FILES,
                         ids=[f[0] for f in FILES])
def test_qook_project_loads_and_traces(fn, min_good):
    prj = load_qook_project(os.path.join(QOOK, fn), nrays=3000)
    assert len(prj.beamline.flow) >= 3
    beams = prj.beamline.propagate_flow(jax.random.PRNGKey(0))
    last = list(beams)[-1]
    ngood = int((np.asarray(beams[last].state) == 1).sum())
    assert ngood > 3000 * min_good, \
        f'{fn}: only {ngood} good rays at {last}'


def test_qook_auto_alignment_1crystal():
    """pitch='auto' resolves to the Si111 Bragg angle at alignE =
    (eMin + eMax)/2 = 10 keV; the screen's 'auto' z lands on the
    deflected axis."""
    prj = load_qook_project(os.path.join(QOOK, '1crystal.xml'),
                            nrays=2000)
    bl = prj.beamline
    crystal = bl['oe01']
    thetaB = float(crystal.material.get_Bragg_angle(10000.0))
    assert math.isclose(float(crystal.pitch), thetaB, rel_tol=2e-3)
    # screen at y=21000, 1000 mm past the crystal at y=20000: the axis
    # deflected up by 2*pitch puts it at z ~ 1000*tan(2 thetaB)
    z_expected = 1000.0 * math.tan(2 * float(crystal.pitch))
    assert abs(float(bl['screen01'].center[2]) - z_expected) < 2.0
    # the traced beam actually hits that screen center
    beams = bl.propagate_flow(jax.random.PRNGKey(1))
    img = beams['screen01']
    good = np.asarray(img.state) == 1
    assert abs(np.asarray(img.z)[good].mean()) < 1.0  # local coords


def test_qook_plots_and_run_card():
    prj = load_qook_project(os.path.join(QOOK, '1crystal.xml'),
                            nrays=2000)
    assert prj.run_kwargs.get('repeats') == 1
    assert len(prj.plots) == 1
    plot = prj.plots[0]
    assert plot.beam == 'screen01'      # beam name mapped to element
    assert plot.xaxis.bins == 128


def test_qook_grating_density_on_any_oe():
    """gratingDensity=['y', rho, P0, ...] turns any OE into a (VLS)
    grating, like the reference (base.py:213-229); the Qook grating
    project distributes rays over np.linspace(-2, 2, 5) orders."""
    prj = load_qook_project(os.path.join(QOOK, 'testGrating.xml'),
                            nrays=4000)
    beams = prj.beamline.propagate_flow(jax.random.PRNGKey(0))
    lg = beams['LaminarGrating']
    good = np.asarray(lg.state) == 1
    orders = np.unique(np.asarray(lg.order)[good])
    assert set(orders) == {-2.0, -1.0, 0.0, 1.0, 2.0}

    # equivalence with the dedicated Grating class at fixed order
    import jax.numpy as jnp
    from xrt_tpu.oes import OE, Grating
    import xrt_tpu.materials as xm
    mat = xm.EmptyMaterial(kind='grating')
    kw = dict(center=(0, 10000, 0), pitch=5e-2, material=mat, order=1)
    g1 = OE.create(gratingDensity=['y', 300, 1], **kw)
    g2 = Grating.create(rho=300.0, **kw)
    from xrt_tpu.sources import GeometricSource
    src = GeometricSource.create(nrays=500, distE='lines',
                                 energies=(90.0,), dxprime=1e-5,
                                 dzprime=1e-5)
    beam = src.shine(jax.random.PRNGKey(2))
    o1, _ = g1.reflect(beam)
    o2, _ = g2.reflect(beam)
    np.testing.assert_allclose(np.asarray(o1.c), np.asarray(o2.c),
                               atol=1e-12)


def test_qook_local_beam_plots_map_to_local_keys():
    """Plots of OE footprints (beam='...beamLocal...') must address the
    LOCAL beam in propagate_flow's dict, not the global one."""
    prj = load_qook_project(os.path.join(QOOK, 'testAlignment.xml'),
                            nrays=500)
    local_plots = [p for p in prj.plots if p.beam.endswith('_local')]
    assert local_plots, 'expected local-footprint plots in testAlignment'
    beams = prj.beamline.propagate_flow(jax.random.PRNGKey(0))
    for p in prj.plots:
        assert p.beam in beams, p.beam


def test_qook_branched_flow_survives_json_roundtrip():
    """'_input' branch wiring must serialize with the layout: both
    branches of mask_tests feed off the source directly."""
    prj = load_qook_project(os.path.join(QOOK, 'mask_tests.xml'),
                            nrays=1000)
    from xrt_tpu.beamline import BeamLine
    bl2 = BeamLine.load_from_json(prj.beamline.export_to_json())
    b1 = prj.beamline.propagate_flow(jax.random.PRNGKey(3))
    b2 = bl2.propagate_flow(jax.random.PRNGKey(3))
    last = list(b1)[-1]
    np.testing.assert_allclose(np.asarray(b1[last].x),
                               np.asarray(b2[last].x))
    assert any('_input' in kw for *_, kw in bl2.flow)


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
