"""Atomic data tables: scattering factors f0 (Waasmaier-Kirfel
parameterization of Kissel's calculations, from XOP's f0_xop.dat) and
f1/f2 vs E from the Henke / Chantler / Brennan-Cowan tabulations.

The tables are public scientific data, bundled as in the reference xrt
(xrt/backends/raycing/data/).  Loaded once into host numpy at import of this
module; converted to jnp arrays lazily per-element by the Element class
(cf. reference xrt/backends/raycing/materials/element.py:23-70).
"""
import os
import functools

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data')

ELEMENTS_LIST = (
    'none', 'H', 'He', 'Li', 'Be', 'B', 'C', 'N', 'O', 'F', 'Ne',
    'Na', 'Mg', 'Al', 'Si', 'P', 'S', 'Cl', 'Ar', 'K', 'Ca', 'Sc', 'Ti', 'V',
    'Cr', 'Mn', 'Fe', 'Co', 'Ni', 'Cu', 'Zn', 'Ga', 'Ge', 'As', 'Se', 'Br',
    'Kr', 'Rb', 'Sr', 'Y', 'Zr', 'Nb', 'Mo', 'Tc', 'Ru', 'Rh', 'Pd', 'Ag',
    'Cd', 'In', 'Sn', 'Sb', 'Te', 'I', 'Xe', 'Cs', 'Ba', 'La', 'Ce', 'Pr',
    'Nd', 'Pm', 'Sm', 'Eu', 'Gd', 'Tb', 'Dy', 'Ho', 'Er', 'Tm', 'Yb', 'Lu',
    'Hf', 'Ta', 'W', 'Re', 'Os', 'Ir', 'Pt', 'Au', 'Hg', 'Tl', 'Pb', 'Bi',
    'Po', 'At', 'Rn', 'Fr', 'Ra', 'Ac', 'Th', 'Pa', 'U')


@functools.lru_cache(maxsize=None)
def _f0_table():
    """Parse f0_xop.dat into {symbol: [a1..a5, c, b1..b5]}."""
    f0data = {}
    symbol = None
    with open(os.path.join(DATA_DIR, 'f0_xop.dat')) as f:
        it = iter(f)
        for line in it:
            if line.startswith('#S'):
                symbol = line.split()[-1].strip()
            elif line.startswith('#UP') and symbol is not None:
                coeffs = [float(v) for v in next(it).split()]
                f0data[symbol] = coeffs
                symbol = None
    return f0data


@functools.lru_cache(maxsize=None)
def _f1f2_table(table_name: str):
    path = os.path.join(DATA_DIR, table_name + '.npz')
    with open(path, 'rb') as f:
        res = np.load(f)
        return {k: np.array(v) for k, v in res.items()}


@functools.lru_cache(maxsize=None)
def _atomic_mass_table():
    masses = {}
    with open(os.path.join(DATA_DIR, 'AtomicData.dat')) as f:
        for line in f:
            fields = line.split()
            if fields and int(fields[0]) > 0:
                masses[int(fields[0])] = float(fields[3])
    return masses


def element_z(elem) -> int:
    if isinstance(elem, str):
        return ELEMENTS_LIST.index(elem)
    return int(elem)


def element_name(elem) -> str:
    if isinstance(elem, str):
        return elem
    return ELEMENTS_LIST[int(elem)]


def atomic_mass(elem) -> float:
    return _atomic_mass_table()[element_z(elem)]


def f0_coefficients(elem) -> np.ndarray:
    """[a1..a5, c, b1..b5] of the Waasmaier-Kirfel f0 parameterization."""
    return np.asarray(_f0_table()[element_name(elem)])


def f1f2_arrays(elem, table='Chantler total'):
    """(E, f1, f2) arrays for the element from the named tabulation.
    'total' in the table name selects total (not only photoelectric)
    absorption cross-sections where available."""
    table_fn = table.split()[0]
    f2key = '_f2tot' if 'total' in table else '_f2'
    data = _f1f2_table(table_fn)
    name = element_name(elem)
    return (np.array(data[name + '_E']), np.array(data[name + '_f1']),
            np.array(data[name + f2key]))
