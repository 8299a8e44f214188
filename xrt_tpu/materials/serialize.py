"""Material (de)serialization for beamline layouts.

The reference Qook saves material definitions inside its beamline
layouts (reference beamline.py:1549-1640 walks ``materialsDict`` next to
the element tree); here every material is reduced to
``{'__material__': True, 'class', 'module', 'params', 'raw'}`` where
*params* are the JSON-safe ``create()`` keyword arguments recoverable
from the frozen pytree fields and *raw* are extra dataclass fields that
``create()`` cannot take directly (tabulated refractive indices, grating
efficiency tables, per-pair multilayer thicknesses) applied by
``replace()`` after creation.  Nested materials (multilayer tLayer /
bLayer / substrate) recurse.
"""
from __future__ import annotations

import importlib

import jax.numpy as jnp

from ..beamline import _create_signature_names
from .material import Material, EmptyMaterial
from .multilayer import Multilayer

_RENAMES = {'b_': 'b', 'atoms_Z': 'atoms'}
# fields create() cannot accept but that carry user data; restored via
# replace() after create().  Complex arrays are JSON-tagged.
_RAW_FIELDS = ('riE', 'riN', 'efficiency_orders', 'efficiency_I',
               'efficiency_E', 'dti', 'dbi')


def _encode(val):
    if hasattr(val, 'tolist'):
        val = val.tolist()
    if isinstance(val, complex):
        return {'__complex__': [val.real, val.imag]}
    if isinstance(val, (list, tuple)):
        return [_encode(v) for v in val]
    return val


def _decode(val):
    if isinstance(val, dict) and '__complex__' in val:
        return complex(*val['__complex__'])
    if isinstance(val, dict) and val.get('__material__'):
        return material_from_dict(val)
    if isinstance(val, list):
        return [_decode(v) for v in val]
    return val


def material_to_dict(mat):
    """JSON-safe description of a material sufficient to rebuild it."""
    if mat is None:
        return None
    cls = type(mat)
    if cls.__name__ == 'TXMMaterial':
        raise ValueError(
            'TXMMaterial holds voxel volumes and is not layout-'
            'serializable; rebuild it from its source images and pass it '
            'via the materials= argument of load_from_json/load_from_xml')
    accepted = _create_signature_names(cls)
    from .crystal import Crystal
    if isinstance(mat, Crystal):
        accepted.discard('kind')   # Crystal.create sets kind='crystal'
    params, raw = {}, {}
    for fname in getattr(cls, '__dataclass_fields__', {}):
        val = getattr(mat, fname)
        if val is None:
            continue
        cname = _RENAMES.get(fname, fname)
        if cname not in accepted:
            enc = _encode(val) if fname in _RAW_FIELDS else None
            if enc is not None and enc != []:
                raw[fname] = enc
            continue
        if isinstance(val, (Material, EmptyMaterial, Multilayer)):
            params[cname] = material_to_dict(val)
        elif fname == 'elements':
            params[cname] = [el.name for el in val]
        else:
            params[cname] = _encode(val)
    if isinstance(mat, Multilayer):
        # uniform stacks round-trip through create(tThickness=, bThickness=)
        # directly; only genuinely graded profiles need the raw arrays
        import numpy as _np
        for fname, pname in (('dti', 'tThickness'), ('dbi', 'bThickness')):
            v = _np.asarray(raw.get(fname, ()))
            if v.size and _np.all(v == v.flat[0]):
                params[pname] = float(v.flat[0])
                del raw[fname]
    return {'__material__': True, 'class': cls.__name__,
            'module': cls.__module__, 'params': params, 'raw': raw}


def material_from_dict(d):
    """Inverse of :func:`material_to_dict`."""
    if d is None:
        return None
    from .. import config
    mod = importlib.import_module(d['module'])
    cls = getattr(mod, d['class'])
    params = {k: _decode(v) for k, v in d['params'].items()}
    mat = cls.create(**params) if hasattr(cls, 'create') else cls(**params)
    raw = d.get('raw') or {}
    if raw:
        upd = {}
        for fname, val in raw.items():
            val = _decode(val)
            field = cls.__dataclass_fields__[fname]
            if not field.metadata.get('pytree_node', True):
                upd[fname] = tuple(val) if isinstance(val, list) else val
            elif isinstance(val, (list, float, int)) and _has_complex(val):
                import numpy as _np
                import jax as _jax
                arr = _np.asarray(val, complex)
                dt = config.dtype()
                upd[fname] = _jax.lax.complex(jnp.asarray(arr.real, dt),
                                              jnp.asarray(arr.imag, dt))
            else:
                upd[fname] = jnp.asarray(val, config.dtype())
        mat = mat.replace(**upd)
    return mat


def _has_complex(val):
    if isinstance(val, list):
        return any(_has_complex(v) for v in val)
    return isinstance(val, complex)
