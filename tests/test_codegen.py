"""Layout material serialization + script generation (the headless
analog of xrtQook's save-layout / generate-script cycle, reference
gui/xrtQook/widgets/qookbase.py)."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

import xrt_tpu.materials as xm
from xrt_tpu.beamline import BeamLine
from xrt_tpu.codegen import generate_script
from xrt_tpu.materials.serialize import material_to_dict, material_from_dict
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.oes.dcm import DCM
from xrt_tpu.screens import Screen
from xrt_tpu.sources import GeometricSource


def _beamline():
    cr = xm.CrystalSi.create(hkl=(1, 1, 1), tK=300.0)
    mat = xm.Material.create('Rh', rho=12.41, kind='mirror')
    bl = BeamLine(name='codegen_bl', alignE=9000.0)
    bl.add('source', GeometricSource.create(
        nrays=200, dx=0.1, dz=0.05, dxprime=2e-5, dzprime=2e-5,
        distE='flat', energies=(8995.0, 9005.0)))
    bl.add('dcm', DCM.create(center=(0, 10000, 0), material=cr,
                             alignE=9000.0, fixedOffset=20.0))
    bl.add('mirror', ToroidMirror.create(
        center=(0, 20000, 20), pitch=4e-3, R=1.2e6, r=60.0, material=mat,
        limPhysX=(-20, 20), limPhysY=(-300, 300)))
    bl.add('screen', Screen.create(center=(0, 30000, 20 + 4e-3 * 2e4)))
    return bl


def test_materials_survive_json_roundtrip():
    bl = _beamline()
    bl2 = BeamLine.load_from_json(bl.export_to_json())
    assert bl2['dcm'].material.hkl == (1, 1, 1)
    assert bl2['dcm'].material.tK == 300.0
    assert bl2['dcm'].material2.hkl == (1, 1, 1)
    assert np.isclose(float(bl2['mirror'].material.rho), 12.41, rtol=1e-6)
    E = jnp.linspace(8990.0, 9010.0, 7)
    g = jnp.full(7, -0.7)
    r1 = bl['dcm'].material.get_amplitude(E, g, -g, g)[0]
    r2 = bl2['dcm'].material.get_amplitude(E, g, -g, g)[0]
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_materials_survive_xml_roundtrip():
    bl = _beamline()
    bl2 = BeamLine.load_from_xml(bl.export_to_xml())
    assert bl2['dcm'].material.hkl == (1, 1, 1)
    assert np.isclose(float(bl2['mirror'].material.rho), 12.41, rtol=1e-6)


def test_multilayer_roundtrip_with_raw_fields():
    ml = xm.Multilayer.create(
        tLayer=xm.Material.create('Mo', rho=10.22), tThickness=30.0,
        bLayer=xm.Material.create(('B', 'C'), quantities=(4, 1), rho=2.52),
        bThickness=25.0, nPairs=40, tThicknessLow=25.0, bThicknessLow=20.0,
        substrate=xm.Material.create('Si', rho=2.33))
    d = material_to_dict(ml)
    assert json.loads(json.dumps(d))  # JSON-safe
    ml2 = material_from_dict(d)
    np.testing.assert_allclose(np.asarray(ml.dti), np.asarray(ml2.dti))
    E = jnp.linspace(9000.0, 9100.0, 5)
    a1 = ml.get_amplitude(E, jnp.full(5, -0.02))[0]
    a2 = ml2.get_amplitude(E, jnp.full(5, -0.02))[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


def test_txm_material_is_rejected_with_guidance():
    vol = xm.TXMMaterial.create(
        indexGrid=np.zeros((2, 2, 2), int),
        limits={ax: (0.0, 1.0) for ax in 'xyz'},
        materialsIndex=[xm.Material.create('Si', rho=2.33)])
    with pytest.raises(ValueError, match='materials='):
        material_to_dict(vol)


def test_generated_script_runs():
    bl = _beamline()
    layout = bl.export_to_json()
    text = generate_script(layout, repeats=1)
    # the script is importable python that rebuilds and traces the line
    ns = {'__name__': 'generated_script'}
    exec(compile(text, 'generated_script.py', 'exec'), ns)
    plot = ns['main'](repeats=1, save=None)
    assert plot.nRaysGood > 0
    assert plot.intensity > 0
    # the rebuilt beamline has the serialized materials
    assert ns['bl']['dcm'].material.hkl == (1, 1, 1)


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
