"""Property/introspection contract over the full class registry.

The xrt_tpu analog of the reference's unittest suite in
tests/raycing/auto/ (_property_test_helpers.py:38-50), which asserts for
every public class that its constructor kwargs are complete, hidden
params stay hidden, and instances serialize.  Here the contract is:

1. every element class creates with documented defaults (plus the minimal
   physics kwargs listed in FACTORIES) and its parameters materialize;
2. ``replace()`` works on every tunable scalar field — the control server
   and the differentiable-optimization path depend on it;
3. a BeamLine JSON round-trip (export_to_json -> load_from_json)
   reproduces the element's serialized parameters exactly.
"""
import json
import math

import numpy as np
import jax.numpy as jnp
import pytest

import xrt_tpu.materials as xm
from xrt_tpu import apertures as ap
from xrt_tpu import oes
from xrt_tpu import screens as sc
from xrt_tpu import sources as src
from xrt_tpu.beamline import BeamLine, _element_params


def _mat():
    return xm.Material.create('Si', rho=2.33, kind='mirror')


def _cr():
    return xm.CrystalSi.create(hkl=(1, 1, 1))


# class -> minimal creation kwargs (None = skip with reason)
FACTORIES = {
    # mirrors
    oes.OE: {},
    oes.FlatMirror: {},
    oes.BentFlatMirror: {'R': 1.0e6},
    oes.SphericalMirror: {'R': 1.0e6},
    oes.CylindricalMirror: {'r': 50.0},
    oes.ToroidMirror: {'R': 1.0e6, 'r': 50.0},
    oes.ConicalMirror: {'L0': 1000.0, 'theta': 0.5},
    oes.SimpleVCM: {'R': 1.0e6},
    oes.VCM: {'R': 1.0e6},
    oes.SimpleVFM: {'R': 1.0e6, 'r': 50.0},
    oes.VFM: {'R': 1.0e6, 'r': 50.0},
    oes.DualVFM: {'r1': 70.0, 'r2': 35.0},
    # parametric
    oes.EllipticalMirrorParam: {'p': 1000.0, 'q': 500.0, 'pitch': 5e-3},
    oes.EllipticalMirror: {'p': 1000.0, 'q': 500.0, 'pitch': 5e-3},
    oes.ParabolicalMirrorParam: {'p': 1000.0, 'pitch': 5e-3},
    oes.ParabolicMirror: {'p': 1000.0, 'pitch': 5e-3},
    oes.HyperbolicMirrorParam: {'p': 1000.0, 'q': 500.0, 'pitch': 5e-3},
    oes.HyperbolicMirror: {'p': 1000.0, 'q': 500.0, 'pitch': 5e-3},
    oes.EllipsoidCapillaryMirror: {'ellipseA': 5000.0, 'ellipseB': 2.0,
                                   'workingDistance': 50.0},
    oes.ParaboloidCapillaryMirror: {'q': 500.0, 'r0': 2.5},
    oes.HyperboloidCapillaryMirror: {'hyperbolaA': 5000.0,
                                     'hyperbolaB': 2.0,
                                     'workingDistance': 50.0},
    # bragg / laue
    oes.DicedOE: {},
    oes.JohannCylinder: {'Rm': 1000.0, 'material': _cr},
    oes.JohanssonCylinder: {'Rm': 1000.0, 'material': _cr},
    oes.JohannToroid: {'Rm': 1000.0, 'Rs': 500.0, 'material': _cr},
    oes.JohanssonToroid: {'Rm': 1000.0, 'Rs': 500.0, 'material': _cr},
    oes.GeneralBraggToroid: {'Rm': 1000.0, 'Rs': 500.0, 'material': _cr},
    oes.DicedJohannToroid: {'Rm': 1000.0, 'Rs': 500.0, 'material': _cr},
    oes.DicedJohanssonToroid: {'Rm': 1000.0, 'Rs': 500.0,
                               'material': _cr},
    oes.LauePlate: {'material': _cr},
    oes.BentLaueCylinder: {'R': 2000.0, 'material': _cr},
    oes.GroundBentLaueCylinder: {'R': 2000.0, 'material': _cr},
    oes.BentLaueSphere: {'R': 2000.0, 'material': _cr},
    oes.BentLaue2D: {'Rm': 2000.0, 'Rs': -5000.0, 'material': _cr},
    # dcm / refractive
    oes.DCM: {'bragg': 0.25, 'material': _cr},
    oes.DCMwithSagittalFocusing: {'Rs': 1000.0, 'bragg': 0.25,
                                  'material': _cr},
    oes.Plate: {'t': 0.5, 'pitch': math.pi / 2},
    oes.ParaboloidFlatLens: {'focus': 1.0, 'zmax': 1.0, 'nCRL': 2,
                             'pitch': math.pi / 2},
    oes.ParabolicCylinderFlatLens: {'focus': 1.0, 'zmax': 1.0, 'nCRL': 2,
                                    'pitch': math.pi / 2},
    oes.DoubleParaboloidLens: {'focus': 1.0, 'zmax': 1.0, 'nCRL': 2,
                               'pitch': math.pi / 2},
    oes.DoubleParabolicCylinderLens: {'focus': 1.0, 'zmax': 1.0,
                                      'nCRL': 2, 'pitch': math.pi / 2},
    # gratings
    oes.Grating: {'rho': 300.0},
    oes.BlazedGrating: {'blaze': math.radians(0.6), 'rho': 300.0},
    oes.LaminarGrating: {'rho': 300.0},
    oes.VLSLaminarGrating: {'rho': 300.0, 'coeffs': (1.0, 1e-4, 0.0)},
    oes.NormalFZP: {'f': 50.0, 'E': 1000.0, 'N': 30},
    oes.GeneralFZPin0YZ: {'f1': (0, 0, -50.0), 'f2': (0, 0, 50.0),
                          'E': 1000.0},
    # apertures
    ap.RectangularAperture: {},
    ap.RoundAperture: {'r': 1.0},
    ap.RoundBeamStop: {'r': 1.0},
    ap.RectangularBeamStop: {},
    ap.PolygonalAperture: {'opening': [(-1, -1), (1, -1), (0, 1)]},
    ap.DoubleSlit: {'shadeFraction': (0.3, 0.7)},
    ap.GridAperture: {},
    ap.SiemensStar: {},
    # screens
    sc.Screen: {},
    sc.HemisphericScreen: {'R': 1000.0},
    # sources
    src.GeometricSource: {'nrays': 64},
    src.MeshSource: {},
    src.CollimatedMeshSource: {},
    src.GaussianBeam: {},
    src.BendingMagnet: {'nrays': 64, 'B0': 1.0, 'eMin': 8990.0,
                        'eMax': 9010.0, 'xPrimeMax': 0.05,
                        'zPrimeMax': 0.05},
    src.Wiggler: {'nrays': 64, 'K': 10.0, 'period': 50.0, 'n': 5,
                  'eMin': 8990.0, 'eMax': 9010.0, 'xPrimeMax': 0.1,
                  'zPrimeMax': 0.05},
    src.Undulator: {'nrays': 64, 'K': 1.5, 'period': 33.0, 'n': 10,
                    'eMin': 9000.0, 'eMax': 9600.0, 'gNodes': 12,
                    'gIntervals': 2, 'xPrimeMax': 0.02,
                    'zPrimeMax': 0.02},
}

IDS = [c.__name__ for c in FACTORIES]


def _build(cls):
    kwargs = {}
    for k, v in FACTORIES[cls].items():
        kwargs[k] = v() if callable(v) and not isinstance(v, type) else v
    # factory functions (RoundBeamStop, RectangularBeamStop, ...) are part
    # of the registry too: they return a configured instance directly
    if not hasattr(cls, 'create'):
        return cls(**kwargs)
    return cls.create(**kwargs)


@pytest.mark.parametrize('cls', list(FACTORIES), ids=IDS)
def test_create_and_materialize(cls):
    el = _build(cls)
    # every array field materializes without NaN
    for fname in type(el).__dataclass_fields__:
        v = getattr(el, fname)
        if hasattr(v, 'dtype') and np.issubdtype(v.dtype, np.floating):
            # +-inf is a legitimate open limit; NaN is not
            assert not np.isnan(np.asarray(v)).any(), \
                f'{cls.__name__}.{fname} has NaN values'


@pytest.mark.parametrize('cls', list(FACTORIES), ids=IDS)
def test_replace_tunables(cls):
    """replace() must take every scalar float field (the server's `set`
    path and the gradient path both go through it)."""
    el = _build(cls)
    n = 0
    for fname in type(el).__dataclass_fields__:
        v = getattr(el, fname)
        if hasattr(v, 'dtype') and np.issubdtype(v.dtype, np.floating) \
                and getattr(v, 'ndim', None) == 0:
            el2 = el.replace(**{fname: jnp.asarray(v) + 1e-3})
            assert abs(float(getattr(el2, fname)) - float(v) - 1e-3) \
                < 1e-9, f'{cls.__name__}.{fname} replace failed'
            n += 1
    # at least the placement scalars must be tunable on real elements
    if hasattr(el, 'pitch'):
        assert n >= 1


# JSON round-trip over geometry elements (materials are passed by
# reference, as load_from_json documents)
JSON_SKIP = {
    src.GeometricSource, src.MeshSource, src.CollimatedMeshSource,
    src.GaussianBeam, src.BendingMagnet, src.Wiggler, src.Undulator,
}


@pytest.mark.parametrize(
    'cls', [c for c in FACTORIES if c not in JSON_SKIP],
    ids=[c.__name__ for c in FACTORIES if c not in JSON_SKIP])
def test_json_roundtrip(cls):
    el = _build(cls)
    bl = BeamLine(name='prop')
    bl.add('el', el)
    text = bl.export_to_json()
    json.loads(text)   # valid JSON
    mats = {}
    if getattr(el, 'material', None) is not None:
        mats['el'] = el.material
    bl2 = BeamLine.load_from_json(text, materials=mats)
    el2 = bl2['el']
    assert type(el2) is type(el)
    p1 = _element_params(el)
    p2 = _element_params(el2)
    assert set(p1) == set(p2), (
        f'{cls.__name__}: params changed in round-trip: '
        f'{set(p1) ^ set(p2)}')
    for k in p1:
        try:
            a = np.asarray(p1[k], dtype=float)
            b = np.asarray(p2[k], dtype=float)
        except (TypeError, ValueError):
            assert p1[k] == p2[k], \
                f'{cls.__name__}.{k} differs after round-trip'
            continue
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-12,
            err_msg=f'{cls.__name__}.{k} differs after round-trip')


def test_xml_roundtrip_beamline():
    """The Qook XML layout format round-trips like JSON
    (reference beamline.py:1549-1640)."""
    from xrt_tpu.oes import ToroidMirror
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GeometricSource
    bl = BeamLine(name='xmltest', alignE=9000.0)
    bl.add('src', GeometricSource.create(nrays=100))
    bl.add('m1', _build(oes.ToroidMirror))
    bl.add('scr', Screen.create(center=(0, 1000, 0)))
    text = bl.export_to_xml()
    assert text.lstrip().startswith('<?xml')
    bl2 = BeamLine.load_from_xml(text)
    assert [n for n, *_ in bl2.flow] == ['src', 'm1', 'scr']
    p1 = _element_params(bl['m1'])
    p2 = _element_params(bl2['m1'])
    assert set(p1) == set(p2)
    for k in p1:
        try:
            a = np.asarray(p1[k], dtype=float)
            b = np.asarray(p2[k], dtype=float)
        except (TypeError, ValueError):
            assert p1[k] == p2[k]
            continue
        np.testing.assert_allclose(a, b, rtol=1e-12)
