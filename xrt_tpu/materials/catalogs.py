"""Predefined material catalogs.

Equivalents of xrt/backends/raycing/materials/{crystals,elemental,
compounds}.py (38 crystals / 92 elemental materials / 76 compounds,
auto-generated there from XOP data).  Here the numeric data lives in
xrt_tpu/data/catalogs.json (extracted by tools/make_catalogs.py) and
factory functions build the pytree material objects on demand:

    >>> from xrt_tpu.materials import catalogs
    >>> si = catalogs.crystal('Si', hkl=(1, 1, 1))
    >>> au = catalogs.elemental('Au')
    >>> ag2o = catalogs.compound('AgBehenate') if available else ...
    >>> catalogs.list_crystals(), catalogs.list_elemental(), ...
"""
from __future__ import annotations

import functools
import json
import os

from .crystal import CrystalFromCell, CrystalDiamond, CrystalFcc
from .material import Material

_JSON = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data',
                     'catalogs.json')


@functools.lru_cache(maxsize=None)
def _data():
    with open(_JSON) as f:
        return json.load(f)


def list_crystals():
    return sorted(_data()['crystals'])


def list_elemental():
    return sorted(_data()['elemental'])


def list_compounds():
    return sorted(_data()['compounds'])


def crystal(name, hkl=(1, 1, 1), **kwargs):
    """A predefined crystal by catalog name (cf. materials.crystals)."""
    d = dict(_data()['crystals'][name])
    base = d.pop('base', 'CrystalFromCell')
    if 'atoms' in d:
        return CrystalFromCell.create(
            name=name, hkl=hkl, a=d['a'], b=d['b'], c=d['c'],
            alpha=d['alpha'], beta=d['beta'], gamma=d['gamma'],
            atoms=d['atoms'], atomsXYZ=d['atomsXYZ'],
            atomsFraction=d['atomsFraction'], **kwargs)
    cls = CrystalDiamond if base in ('CrystalDiamond', 'CrystalSi') \
        else CrystalFcc
    return cls.create(hkl=hkl, a=d['a'], elements=tuple(d['elements']),
                      rho=d.get('rho', 0.0), name=name, **kwargs)


def elemental(name, kind='auto', **kwargs):
    """A predefined elemental material (cf. materials.elemental)."""
    d = _data()['elemental'][name]
    return Material.create(tuple(d['elements']), tuple(d['quantities']),
                           kind=kind, rho=d['rho'], table=d['table'],
                           name=name, **kwargs)


def compound(name, kind='auto', **kwargs):
    """A predefined compound material (cf. materials.compounds)."""
    d = _data()['compounds'][name]
    return Material.create(tuple(d['elements']), tuple(d['quantities']),
                           kind=kind, rho=d['rho'], table=d['table'],
                           name=name, **kwargs)


class _CatalogNamespace:
    """Attribute access into a catalog: ``crystals.Si(hkl=(1,1,1))``,
    ``elemental.Au(kind='mirror')`` — the ergonomic analog of the
    reference's generated materials.crystals/elemental/compounds classes."""

    def __init__(self, factory, lister):
        self._factory = factory
        self._lister = lister

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        avail = self._lister()
        if name not in avail:
            raise AttributeError(
                f'{name!r} not in catalog; available: {sorted(avail)[:8]}...')
        import functools
        return functools.partial(self._factory, name)

    def __dir__(self):
        return sorted(self._lister())


crystals = _CatalogNamespace(crystal, list_crystals)
elements = _CatalogNamespace(elemental, list_elemental)
compounds = _CatalogNamespace(compound, list_compounds)
