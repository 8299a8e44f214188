"""Headless glow export (xrt_tpu/glow.py) — capability analog of the
reference's Qt/OpenGL xrtGlow viewer (gui/xrtGlow/widgets/main.py):
beamline layout + traced beams to standalone HTML and PNG."""
import json
import math
import re

import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.beamline import BeamLine
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GeometricSource
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.glow import build_scene, export_html, export_png


def _beamline():
    pitch = 4e-3
    p, q = 10000.0, 2000.0
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    bl = BeamLine(name='glow-test')
    bl.add('src', GeometricSource.create(
        nrays=500, center=(0, 0, 0), dx=0.1, dz=0.05, dxprime=3e-5,
        dzprime=3e-5, distE='flat', energies=(8900.0, 9100.0),
        polarization='horizontal'))
    R = 2 * p * q / (p + q) / math.sin(pitch)
    r = 2 * p * q / (p + q) * math.sin(pitch)
    bl.add('m1', ToroidMirror.create(center=(0, p, 0), pitch=pitch, R=R,
                                     r=r, material=mat,
                                     limPhysX=(-20, 20),
                                     limPhysY=(-300, 300)))
    bl.add('slit', RectangularAperture.create(
        center=(0, p + 500, 2 * pitch * 500), opening=(-5, 5, -5, 5)))
    bl.add('scr', Screen.create(center=(0, p + q, 2 * pitch * q)))
    return bl


def test_scene_and_html_export(tmp_path):
    bl = _beamline()
    beams = bl.propagate_flow(jax.random.PRNGKey(0))
    scene = build_scene(bl, beams=beams)
    names = {e['name'] for e in scene['elements']}
    assert {'src', 'm1', 'slit', 'scr'} <= names
    # mirror wireframe reaches the mirror position (y ~ 10000)
    m1 = next(e for e in scene['elements'] if e['name'] == 'm1')
    ys = np.asarray([p[1] for line in m1['lines'] for p in line])
    assert abs(ys.mean() - 10000) < 400
    # beam segments connect consecutive flow elements
    pairs = [(s['from'], s['to']) for s in scene['segments']]
    assert ('src', 'm1') in pairs and ('m1', 'slit') in pairs
    seg = scene['segments'][0]
    assert len(seg['p']) == len(seg['rgb']) == len(seg['good'])

    out = export_html(bl, beams=beams,
                      fileName=str(tmp_path / 'bl.html'))
    html = open(out).read()
    assert html.startswith('<!DOCTYPE html>')
    assert 'glow-test' in html
    # embedded scene is valid JSON
    m = re.search(r'const SCENE = (\{.*?\});\n', html, re.S)
    embedded = json.loads(m.group(1))
    assert len(embedded['segments']) == 3


def test_png_export(tmp_path):
    bl = _beamline()
    beams = bl.propagate_flow(jax.random.PRNGKey(0))
    out = bl.glow(beams=beams, save=str(tmp_path / 'bl.png'), maxRays=50)
    data = open(out, 'rb').read()
    assert data[:8] == b'\x89PNG\r\n\x1a\n'
    assert len(data) > 10000


def test_scan_player(tmp_path):
    """bl.glow(scan=...) writes a play-slider HTML whose frames move with
    the swept parameter (reference xrtGlow scan player,
    gui/xrtGlow/widgets/scan.py)."""
    import json as _json
    import math
    import jax
    import xrt_tpu.materials as xm
    from xrt_tpu.beamline import BeamLine
    from xrt_tpu.oes import ToroidMirror
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GeometricSource
    P, Q, PITCH = 10000.0, 2000.0, 4e-3
    bl = BeamLine(alignE=9000.0)
    bl.add('source', GeometricSource.create(
        nrays=500, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(8900.0, 9100.0),
        polarization='horizontal'))
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)
    r = 2 * P * Q / (P + Q) * math.sin(PITCH)
    bl.add('mirror', ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH, R=R, r=r, material=mat,
        limPhysX=(-20, 20), limPhysY=(-300, 300)))
    bl.add('screen', Screen.create(center=(0, P + Q, 2 * PITCH * Q)))
    fn = str(tmp_path / 'scan.html')
    out = bl.glow(scan={'element': 'mirror', 'param': 'pitch',
                        'values': [PITCH, PITCH + 3e-4, PITCH + 6e-4]},
                  save=fn, maxRays=50)
    assert out == fn
    html = open(fn).read()
    assert 'SCENES' in html and 'id="play"' in html
    scenes = _json.loads(
        html.split('const SCENES = ')[1].split(';\n')[0])
    labels = _json.loads(
        html.split('const LABELS = ')[1].split(';\n')[0])
    assert len(scenes) == 3 and len(labels) == 3
    assert 'mirror.pitch' in labels[0]
    # the post-mirror ray segments move up as the pitch grows
    def mean_end_z(scene):
        seg = [s for s in scene['segments'] if s['to'].startswith(
            'screen')][0]
        import numpy as np
        return np.mean([p[1][2] for p in seg['p']])
    z0, z2 = mean_end_z(scenes[0]), mean_end_z(scenes[2])
    assert z2 - z0 > 1.0, (z0, z2)


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
