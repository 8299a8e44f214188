"""Automatic flow capture + restart-from-element (xrt_tpu/flow.py) vs the
reference's transparent flow recording (_flow_utils.py:157-211) and
restart-from-modified-element propagation (_flow.py:13)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import xrt_tpu.materials as xm
from xrt_tpu.flow import record_flow
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GeometricSource
from xrt_tpu.apertures import RectangularAperture


def _setup():
    pitch = 4e-3
    p, q = 10000.0, 2000.0
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    src = GeometricSource.create(
        nrays=2000, center=(0, 0, 0), dx=0.1, dz=0.05,
        dxprime=3e-5, dzprime=3e-5, distE='flat',
        energies=(8900.0, 9100.0), polarization='horizontal')
    R = 2 * p * q / (p + q) / math.sin(pitch)
    r = 2 * p * q / (p + q) * math.sin(pitch)
    mirror = ToroidMirror.create(center=(0, p, 0), pitch=pitch, R=R, r=r,
                                 material=mat, limPhysX=(-20, 20),
                                 limPhysY=(-300, 300))
    slit = RectangularAperture.create(center=(0, p + 500, 2 * pitch * 500),
                                      opening=(-5, 5, -5, 5))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))
    return src, mirror, slit, screen


def _run(src, mirror, slit, screen, key):
    k1, k2 = jax.random.split(key)
    beam = src.shine(k1)
    glo, lo = mirror.reflect(beam, k2)
    loc = slit.propagate(glo)
    img = screen.expose(glo)
    return beam, glo, lo, loc, img


def test_capture_and_bitwise_replay():
    src, mirror, slit, screen = _setup()
    key = jax.random.PRNGKey(7)
    with record_flow() as flow:
        beam, glo, lo, loc, img = _run(src, mirror, slit, screen, key)
    # every call captured, in order, with auto names
    assert [s.method for s in flow.steps] == \
        ['shine', 'reflect', 'propagate', 'expose']

    # modify the mirror pitch and replay from it
    mirror2 = mirror.replace(pitch=mirror.pitch + 2e-5)
    mname = flow.steps[1].name
    out = flow.replay(replace={mname: mirror2})

    # truth: full re-trace with the same key
    beam_t, glo_t, lo_t, loc_t, img_t = _run(src, mirror2, slit, screen,
                                             key)
    sname = flow.steps[0].name
    scname = flow.steps[3].name
    apname = flow.steps[2].name
    # upstream beam comes from cache — identical object
    assert out[f'{sname}.shine'] is flow.steps[0].out
    # downstream results bitwise equal to the full re-trace
    np.testing.assert_array_equal(np.asarray(out[f'{scname}.expose'].x),
                                  np.asarray(img_t.x))
    np.testing.assert_array_equal(np.asarray(out[f'{scname}.expose'].Jss),
                                  np.asarray(img_t.Jss))
    np.testing.assert_array_equal(np.asarray(out[f'{apname}.propagate'].state),
                                  np.asarray(loc_t.state))
    # and they differ from the original (the pitch change had an effect)
    assert not np.array_equal(np.asarray(out[f'{scname}.expose'].z),
                              np.asarray(img.z))


def test_replay_without_changes_is_identity():
    src, mirror, slit, screen = _setup()
    with record_flow() as flow:
        _run(src, mirror, slit, screen, jax.random.PRNGKey(1))
    out = flow.replay()
    for s, (kname, val) in zip(flow.steps, out.items()):
        ref = s.out
        leaves_a = jax.tree_util.tree_leaves(ref)
        leaves_b = jax.tree_util.tree_leaves(val)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_named_elements_via_beamline():
    from xrt_tpu.beamline import BeamLine
    src, mirror, slit, screen = _setup()
    bl = BeamLine()
    bl.add('src', src)
    bl.add('m1', mirror)
    bl.add('slit', slit)
    bl.add('scr', screen)
    with record_flow(bl) as flow:
        _run(bl['src'], bl['m1'], bl['slit'], bl['scr'],
             jax.random.PRNGKey(0))
    assert [s.name for s in flow.steps] == ['src', 'm1', 'slit', 'scr']
    out = flow.replay(replace={'m1': mirror.replace(pitch=4.2e-3)})
    assert 'scr.expose' in out


def test_replay_unknown_name_raises():
    src, mirror, slit, screen = _setup()
    with record_flow() as flow:
        _run(src, mirror, slit, screen, jax.random.PRNGKey(0))
    with pytest.raises(KeyError):
        flow.replay(replace={'nope': mirror})


def test_recording_is_scoped():
    """Calls outside the context must not be captured."""
    src, mirror, slit, screen = _setup()
    with record_flow() as flow:
        src.shine(jax.random.PRNGKey(0))
    n = len(flow.steps)
    src.shine(jax.random.PRNGKey(1))
    assert len(flow.steps) == n


def test_server_set_replays_from_element():
    """A `set` on the control server with a recorded flow re-traces from
    the modified element and publishes updated readbacks (the analog of
    the reference EPICS AutoUpdate + restart-from-element,
    epics/device.py + _flow.py:31-40)."""
    import json
    import socket
    from xrt_tpu.beamline import BeamLine
    from xrt_tpu.server import BeamLineServer

    src, mirror, slit, screen = _setup()
    bl = BeamLine()
    bl.add('src', src)
    bl.add('m1', mirror)
    bl.add('slit', slit)
    bl.add('scr', screen)
    with record_flow(bl) as flow:
        _run(bl['src'], bl['m1'], bl['slit'], bl['scr'],
             jax.random.PRNGKey(3))
    srv = BeamLineServer(bl, flow=flow, port=0)
    srv.start()
    try:
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        f = s.makefile('rw')

        def rpc(**req):
            f.write(json.dumps(req) + '\n')
            f.flush()
            return json.loads(f.readline())

        r0 = rpc(cmd='acquire')['result']
        new_pitch = float(np.asarray(mirror.pitch)) + 5e-5
        r1 = rpc(cmd='set', pv='m1:pitch', value=new_pitch)['result']
        # the screen centroid moved by ~ 2*dpitch*q
        assert r1['scr.expose']['cz'] > r0['scr.expose']['cz'] + 0.1
        # source readback unchanged (cached upstream)
        assert r1['src.shine'] == r0['src.shine']
        # and the partial replay equals a full re-trace
        _, _, _, _, img_t = _run(src, mirror.replace(pitch=new_pitch),
                                 slit, screen, jax.random.PRNGKey(3))
        w = np.where(np.asarray(img_t.state) == 1,
                     np.asarray(img_t.Jss) + np.asarray(img_t.Jpp), 0)
        cz_t = float((np.asarray(img_t.z) * w).sum() / w.sum())
        assert abs(r1['scr.expose']['cz'] - cz_t) < 1e-9
        rpc(cmd='shutdown')
    finally:
        srv.server.shutdown()
