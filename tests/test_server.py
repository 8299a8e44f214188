"""Beamline control server (EPICS-layer equivalent): get/set/acquire over
the TCP JSON protocol drives a live re-trace."""
import math

import numpy as np
import jax

from xrt_tpu.server import BeamLineServer, BeamLineClient
from xrt_tpu.sources.geometric import GeometricSource
from xrt_tpu.oes import FlatMirror
from xrt_tpu.screens import Screen


def _make():
    src = GeometricSource.create(nrays=500, dzprime=1e-5,
                                 energies=(9000.0,), distE='lines')
    mirror = FlatMirror.create(center=(0, 1000.0, 0), pitch=4e-3,
                               limPhysX=(-20, 20), limPhysY=(-200, 200))
    screen = Screen.create(center=(0, 2000.0, 0))

    def trace(elements):
        beam = elements['source'].shine(jax.random.PRNGKey(0))
        glo, _ = elements['mirror'].reflect(beam)
        img = elements['screen'].expose(glo)
        good = np.asarray(glo.state) == 1
        return {'z_mean': float(np.asarray(img.z)[good].mean()),
                'ngood': int(good.sum())}

    return {'source': src, 'mirror': mirror, 'screen': screen}, trace


def test_server_get_set_acquire():
    elements, trace = _make()
    srv = BeamLineServer(elements, trace_fn=trace).start()
    try:
        cli = BeamLineClient(srv.host, srv.port)
        pvs = cli.list()
        assert 'mirror' in pvs and 'pitch' in pvs['mirror']
        assert np.isclose(cli.get('mirror:pitch'), 4e-3)
        r0 = cli.acquire()
        assert r0['ngood'] > 400
        # the beam lands at z ~ 2*pitch*(q) above axis
        z0 = r0['z_mean']
        assert np.isclose(z0, 2 * 4e-3 * 1000.0, rtol=0.05)
        # write a new pitch: autoUpdate re-traces and the spot moves
        r1 = cli.set('mirror:pitch', 5e-3)['result']
        assert np.isclose(r1['z_mean'], 2 * 5e-3 * 1000.0, rtol=0.05)
        assert np.isclose(cli.get('mirror:pitch'), 5e-3)
        # unknown pv errors without killing the server
        bad = cli.request(cmd='get', pv='mirror:nope')
        assert 'error' in bad
        assert np.isclose(cli.get('mirror:pitch'), 5e-3)
        cli.close()
    finally:
        srv.stop()


def test_server_with_beamline_object():
    from xrt_tpu.beamline import BeamLine
    elements, trace = _make()
    bl = BeamLine()
    for name, el in elements.items():
        bl.add(name, el)
    srv = BeamLineServer(bl, trace_fn=trace, autoUpdate=False).start()
    try:
        cli = BeamLineClient(srv.host, srv.port)
        out = cli.set('mirror:pitch', 6e-3)
        assert out.get('ok')
        # BeamLine sees the replaced element
        assert np.isclose(float(np.asarray(bl['mirror'].pitch)), 6e-3)
        r = cli.acquire()
        assert np.isclose(r['z_mean'], 2 * 6e-3 * 1000.0, rtol=0.05)
        cli.close()
    finally:
        srv.stop()
