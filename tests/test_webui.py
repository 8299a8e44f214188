"""Browser control surface (webui.py): the Qook/Glow capability analog.

Drives the HTTP API end to end: element tree listing, live histogram,
3D scene, and the VERDICT acceptance criterion — editing the mirror
pitch over the API moves the focus in the refreshed histogram."""
import json
import math
import urllib.request

import numpy as np
import jax
import pytest

import xrt_tpu.materials as xm
from xrt_tpu.beamline import BeamLine
from xrt_tpu.flow import record_flow
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GeometricSource
from xrt_tpu.webui import WebUI

P, Q, PITCH = 10000.0, 2000.0, 4e-3


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(url, json.dumps(body).encode(),
                                 method='POST')
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture(scope='module')
def ui():
    bl = BeamLine(alignE=9000.0)
    src = GeometricSource.create(
        nrays=4000, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(8900.0, 9100.0),
        polarization='horizontal')
    bl.add('source', src)
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    bl.add('mirror', ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r, material=mat,
        limPhysX=(-20, 20), limPhysY=(-300, 300)))
    bl.add('screen', Screen.create(center=(0, P + Q, 2 * PITCH * Q)))
    with record_flow(bl) as flow:
        bl.propagate_flow(jax.random.PRNGKey(0))
    srv = WebUI(bl, flow, port=0).start()
    yield srv
    srv.stop()


def test_page_and_elements(ui):
    base = f'http://{ui.host}:{ui.port}'
    with urllib.request.urlopen(base + '/', timeout=60) as r:
        html = r.read().decode()
    assert '/api/elements' in html and 'canvas' in html
    els = _get(base + '/api/elements')
    assert set(els) == {'source', 'mirror', 'screen'}
    assert np.isclose(els['mirror']['pitch'], PITCH)
    # every numeric create() parameter is editable
    assert 'R' in els['mirror'] and 'r' in els['mirror']


def test_hist_and_scene(ui):
    base = f'http://{ui.host}:{ui.port}'
    beams = _get(base + '/api/beams')
    assert any('screen' in b for b in beams)
    d = _get(base + '/api/hist')
    assert d['nGood'] > 1000 and d['flux'] > 0
    assert len(d['h']) == ui.bins
    scene = _get(base + '/api/scene')
    names = [e['name'] for e in scene['elements']]
    assert 'mirror' in names and 'screen' in names
    assert scene['segments'], 'ray polylines missing'


def test_set_pitch_moves_focus(ui):
    """The VERDICT r2 acceptance: edit the pitch in the browser API and
    watch the focus move (2*dpitch*Q on the screen)."""
    base = f'http://{ui.host}:{ui.port}'
    d0 = _get(base + '/api/hist')
    dpitch = 2e-4
    r = _post(base + '/api/set', {'element': 'mirror', 'param': 'pitch',
                                  'value': PITCH + dpitch})
    assert r.get('ok'), r
    d1 = _get(base + '/api/hist')
    moved = d1['cz'] - d0['cz']
    assert np.isclose(moved, 2 * dpitch * Q, rtol=0.15), (d0['cz'],
                                                          d1['cz'])
    # restore for other tests
    _post(base + '/api/set', {'element': 'mirror', 'param': 'pitch',
                              'value': PITCH})


def test_inspect(ui):
    """The xrtGlow instance-inspector analog: full params, derived
    material optics, footprint ray categories and flux transmission."""
    base = f'http://{ui.host}:{ui.port}'
    d = _get(base + '/api/inspect?element=mirror')
    assert d['class'] == 'ToroidMirror'
    assert d['params']['pitch'] == pytest.approx(PITCH)
    assert d['params']['material'] == 'Material'     # nested struct name
    # material card: a Rh/Si mirror reports delta/beta at alignE
    assert d['material']['kind'] == 'mirror'
    assert 0 < d['material']['delta'] < 1e-4
    assert d['material']['beta'] > 0
    # footprint on the surface + the outgoing beam + transmission
    fp = d['footprint']
    assert fp['nGood'] > 1000 and fp['flux'] > 0
    assert fp['fwhm_y'] > fp['fwhm_x'] > 0   # grazing-incidence stretch
    assert d['beamOut']['nGood'] == fp['nGood']
    assert d['fluxIn'] >= d['beamOut']['flux'] > 0
    assert 0 < d['transmission'] <= 1.0
    # categories add up to the ray budget
    n = sum(fp[k] for k in ('nGood', 'nOut', 'nOver', 'nDead'))
    assert n == 4000
    # the source inspects too (no upstream, no transmission key)
    s = _get(base + '/api/inspect?element=source')
    assert s['class'] == 'GeometricSource'
    assert 'transmission' not in s
    assert s['beamOut']['flux'] > 0
    # unknown element -> a 500 with an error payload, not a crash
    try:
        e = _get(base + '/api/inspect?element=nope')
    except urllib.error.HTTPError as exc:
        e = json.loads(exc.read())
    assert 'error' in e and 'nope' in e['error']


def test_set_material_from_catalog(ui):
    """xrtQook's material combo box: swap an existing element's material
    over the API from the catalogs and watch the physics change."""
    base = f'http://{ui.host}:{ui.port}'
    f_si = _get(base + '/api/hist')['flux']
    # Au critical angle at 9 keV (~6.9 mrad) exceeds the 4 mrad pitch,
    # Si's (~3.5 mrad) does not: reflected flux must jump
    r = _post(base + '/api/set', {'element': 'mirror',
                                  'param': 'material',
                                  'value': {'catalog': 'elemental',
                                            'name': 'Au',
                                            'kind': 'mirror'}})
    assert r.get('ok'), r
    d = _get(base + '/api/inspect?element=mirror')
    assert d['material']['name'] == 'Au'
    f_au = _get(base + '/api/hist')['flux']
    assert f_au > 2 * f_si, (f_si, f_au)
    _post(base + '/api/set', {'element': 'mirror', 'param': 'material',
                              'value': {'catalog': 'elemental',
                                        'name': 'Si', 'kind': 'mirror'}})


@pytest.fixture(scope='module')
def asmui():
    """An EMPTY beamline served in assembly mode (flow=None)."""
    srv = WebUI(BeamLine(alignE=9000.0, name='assembled'), port=0).start()
    yield srv
    srv.stop()


@pytest.mark.slow   # ~70 s of per-add re-jits (undulator + DCM traces);
                    # the DAG assembly test below is the fast-gate smoke
def test_assemble_flagship_beamline(asmui):
    """VERDICT r3 #4 acceptance: build the flagship undulator -> DCM ->
    toroid -> screen beamline from an empty page over the HTTP API
    (class registry + catalog materials + auto-alignment), trace it
    live, save the layout, reload it."""
    base = f'http://{asmui.host}:{asmui.port}'
    reg = _get(base + '/api/registry')
    assert 'Undulator' in reg['classes'] and 'DCM' in reg['classes']
    # the full placeable class set is addable (sources, mirrors,
    # gratings, crystal optics, refractive, apertures, screens)
    assert len(reg['classes']) >= 50
    for cls in ('BentLaue2D', 'SiemensStar', 'VLSLaminarGrating',
                'EllipsoidCapillaryMirror', 'HemisphericScreen'):
        assert cls in reg['classes'], cls
    assert 'Si' in reg['materials']['crystals']
    assert 'Rh' in reg['materials']['elemental']
    assert 'period' in reg['classes']['Undulator']

    r = _post(base + '/api/add', {
        'name': 'src', 'class': 'Undulator',
        'params': {'nrays': 2000, 'eE': 3.0, 'eI': 0.5, 'period': 18.0,
                   'n': 111, 'targetE': [9000.0, 7],
                   'eMin': 8996.0, 'eMax': 9004.0,
                   'xPrimeMax': 0.02, 'zPrimeMax': 0.02,
                   'eEpsilonX': 0.263, 'eEpsilonZ': 0.008,
                   'betaX': 9.0, 'betaZ': 2.0, 'gNodes': 32}})
    assert r.get('ok'), r
    r = _post(base + '/api/add', {
        'name': 'dcm', 'class': 'DCM', 'distance': 30000.0,
        'autoBragg': True,
        'material': {'catalog': 'crystals', 'name': 'Si',
                     'hkl': [1, 1, 1]},
        'params': {'fixedOffset': 20.0, 'limPhysX': [-50, 50],
                   'limPhysY': [-500, 500], 'alignE': 9000.0}})
    assert r.get('ok'), r
    p_t, q_t, pitch_t = 36000.0, 12000.0, 4e-3
    R = 2 * p_t * q_t / (p_t + q_t) / math.sin(pitch_t)
    rr = 2 * p_t * q_t / (p_t + q_t) * math.sin(pitch_t)
    r = _post(base + '/api/add', {
        'name': 'toroid', 'class': 'ToroidMirror', 'distance': 6000.0,
        'pitch': pitch_t,
        'material': {'catalog': 'elemental', 'name': 'Rh'},
        'params': {'R': R, 'r': rr, 'limPhysX': [-20, 20],
                   'limPhysY': [-400, 400]}})
    assert r.get('ok'), r
    r = _post(base + '/api/add', {
        'name': 'det', 'class': 'Screen', 'distance': 12000.0})
    assert r.get('ok'), r
    assert r['elements'] == ['src', 'dcm', 'toroid', 'det']

    # live trace: monochromatized flux reaches the detector
    d = _get(base + '/api/hist?beam=det')
    assert d['nGood'] > 100 and d['flux'] > 0
    scene = _get(base + '/api/scene')
    assert {'src', 'dcm', 'toroid', 'det'} <= {
        e['name'] for e in scene['elements']}

    # inspector on the assembled DCM: auto-Bragg pitch and both crystal
    # footprints are live
    ins = _get(base + '/api/inspect?element=dcm')
    assert ins['material']['braggAngle_deg'] == pytest.approx(12.69,
                                                              abs=0.05)
    assert ins['material']['darwinWidth_urad'] > 0
    assert ins['footprint']['nGood'] > 0
    assert ins['footprint2']['nGood'] > 0

    # probe slider (xrtGlow draggable screen): the beam focuses toward
    # q=12000 mm downstream of the toroid
    d_far = _get(base + '/api/probe?beam=toroid&d=11500')
    d_near = _get(base + '/api/probe?beam=toroid&d=3000')
    assert d_far['fwhm_z'] < d_near['fwhm_z']

    # save -> reload round trip
    with urllib.request.urlopen(base + '/api/layout', timeout=60) as rr_:
        layout = rr_.read().decode()
    assert '"Undulator"' in layout and '"DCM"' in layout
    with urllib.request.urlopen(base + '/api/codegen', timeout=60) as rc:
        script = rc.read().decode()
    assert 'Undulator' in script and 'run_process' in script
    r = _post(base + '/api/load', {'json': layout})
    assert r.get('ok'), r
    assert set(r['elements']) == {'src', 'dcm', 'toroid', 'det'}
    d2 = _get(base + '/api/hist?beam=det')
    assert d2['nGood'] > 100 and d2['flux'] > 0

    # remove + re-add is an UNDO: the placement axis rewinds, so the
    # re-added screen lands at the ORIGINAL center (a missing rewind
    # would put it 12 m further downstream)
    det_center = _get(base + '/api/elements')['det']['center']
    r = _post(base + '/api/remove', {'name': 'det'})
    assert r.get('ok') and 'det' not in r['elements']
    r = _post(base + '/api/add', {
        'name': 'det', 'class': 'Screen', 'distance': 12000.0})
    assert r.get('ok'), r
    det_center2 = _get(base + '/api/elements')['det']['center']
    assert np.allclose(det_center, det_center2), (det_center, det_center2)
    r = _post(base + '/api/reorder',
              {'order': ['src', 'dcm', 'toroid', 'det']})
    assert r.get('ok'), r


def test_assemble_dag_beamline():
    """VERDICT r4 #7 acceptance: branched (DAG) beamlines from the
    browser — one mirror feeds TWO screens via the input-beam selector
    (reference Qook wires arbitrary beam DAGs, qookbase.py:2-31); both
    histograms live-update and the layout JSON round-trips the wiring."""
    srv = WebUI(BeamLine(alignE=9000.0, name='dag'), port=0).start()
    try:
        _dag_assembly_checks(srv)
    finally:
        srv.stop()


def _dag_assembly_checks(asmui):
    base = f'http://{asmui.host}:{asmui.port}'
    r = _post(base + '/api/add', {
        'name': 'src', 'class': 'GeometricSource',
        'params': {'nrays': 3000, 'dx': 0.1, 'dz': 0.05,
                   'dxprime': 3e-5, 'dzprime': 3e-5,
                   'energies': [9000.0], 'distE': 'lines'}})
    assert r.get('ok'), r
    p_t, q_t, pitch_t = 10000.0, 2000.0, 4e-3
    R = 2 * p_t * q_t / (p_t + q_t) / math.sin(pitch_t)
    rr = 2 * p_t * q_t / (p_t + q_t) * math.sin(pitch_t)
    r = _post(base + '/api/add', {
        'name': 'm1', 'class': 'ToroidMirror', 'distance': 10000.0,
        'pitch': pitch_t,
        'material': {'catalog': 'elemental', 'name': 'Rh'},
        'params': {'R': R, 'r': rr, 'limPhysX': [-20, 20],
                   'limPhysY': [-300, 300]}})
    assert r.get('ok'), r
    r = _post(base + '/api/add', {
        'name': 'near', 'class': 'Screen', 'distance': 1000.0})
    assert r.get('ok'), r
    # the second screen BRANCHES off m1 (input selector): distance is
    # measured from m1 along its outgoing axis, not from 'near'
    r = _post(base + '/api/add', {
        'name': 'focus', 'class': 'Screen', 'distance': 2000.0,
        'input': 'm1'})
    assert r.get('ok'), r
    els = _get(base + '/api/elements')
    assert els['focus'].get('_input') == 'm1'
    # focus sits 2000 mm beyond m1 (not beyond 'near')
    assert np.isclose(els['focus']['center'][1],
                      p_t + 2000.0 * math.cos(2 * pitch_t), rtol=1e-6)

    # both branches live-update, and the focus branch is sharper
    d_near = _get(base + '/api/hist?beam=near')
    d_focus = _get(base + '/api/hist?beam=focus')
    assert d_near['nGood'] > 100 and d_focus['nGood'] > 100
    assert d_focus['fwhm_z'] < d_near['fwhm_z']

    # the inspector resolves the DAG upstream: focus is fed by m1
    ins = _get(base + '/api/inspect?element=focus')
    assert 'fluxIn' in ins and ins['fluxIn'] > 0

    # JSON round-trip keeps the wiring and both histograms
    with urllib.request.urlopen(base + '/api/layout', timeout=60) as rr_:
        layout = rr_.read().decode()
    assert '"_input": "m1"' in layout
    r = _post(base + '/api/load', {'json': layout})
    assert r.get('ok'), r
    els2 = _get(base + '/api/elements')
    assert els2['focus'].get('_input') == 'm1'
    d2 = _get(base + '/api/hist?beam=focus')
    assert d2['nGood'] > 100
