"""Extract the predefined material catalogs (crystal cells, elemental and
compound materials) from the reference into JSON data files.

The numeric content (lattice constants, atomic positions, densities) is
public crystallographic/XOP data; only the data is taken, no code.
"""
import inspect
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing.materials as rm  # noqa
from xrt.backends.raycing.materials import crystals, elemental, compounds  # noqa

out = {'crystals': {}, 'elemental': {}, 'compounds': {}}

for name, cls in inspect.getmembers(crystals, inspect.isclass):
    if cls.__module__ != crystals.__name__:
        continue
    try:
        obj = cls()
    except Exception as e:
        print('skip crystal', name, e)
        continue
    entry = dict(base=type(obj).__mro__[1].__name__)
    if hasattr(obj, 'atoms'):   # CrystalFromCell-like
        entry.update(
            a=float(obj.a), b=float(obj.b), c=float(obj.c),
            alpha=float(obj.alpha), beta=float(obj.beta),
            gamma=float(obj.gamma),
            atoms=[int(z) if not isinstance(z, str) else z
                   for z in obj.atoms],
            atomsXYZ=[[float(v) for v in xyz] for xyz in obj.atomsXYZ],
            atomsFraction=[float(f) for f in obj.atomsFraction])
    else:   # CrystalDiamond/CrystalFcc-like: a + elements
        entry.update(
            a=float(obj.a),
            elements=[el.name for el in obj.elements],
            quantities=[float(q) for q in obj.quantities],
            rho=float(obj.rho))
    out['crystals'][name] = entry

for name, cls in inspect.getmembers(elemental, inspect.isclass):
    if cls.__module__ != elemental.__name__:
        continue
    try:
        obj = cls()
    except Exception as e:
        print('skip elemental', name, e)
        continue
    out['elemental'][name] = dict(
        elements=[el.name for el in obj.elements],
        quantities=[float(q) for q in obj.quantities],
        rho=float(obj.rho), kind=str(obj.kind), table=str(obj.table))

for name, cls in inspect.getmembers(compounds, inspect.isclass):
    if cls.__module__ != compounds.__name__:
        continue
    try:
        obj = cls()
    except Exception as e:
        print('skip compound', name, e)
        continue
    out['compounds'][name] = dict(
        elements=[el.name for el in obj.elements],
        quantities=[float(q) for q in obj.quantities],
        rho=float(obj.rho), kind=str(obj.kind), table=str(obj.table))

dest = os.path.join(os.path.dirname(__file__), '..', 'xrt_tpu', 'data',
                    'catalogs.json')
with open(os.path.abspath(dest), 'w') as f:
    json.dump(out, f, indent=1, sort_keys=True)
print('wrote', os.path.abspath(dest), 'crystals:', len(out['crystals']),
      'elemental:', len(out['elemental']),
      'compounds:', len(out['compounds']))
