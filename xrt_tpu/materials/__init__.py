"""Materials: elements, amorphous materials, crystals, multilayers.

TPU-native equivalents of xrt/backends/raycing/materials/: all material
objects are flax pytree dataclasses whose methods are pure jnp functions.
"""
from .element import Element
from .material import Material, EmptyMaterial
from .crystal import (Crystal, CrystalFcc, CrystalDiamond, CrystalSi,
                      CrystalFromCell)
from .multilayer import Multilayer, GradedMultilayer, Coated
from .polycrystal import Powder, CrystalHarmonics, MonoCrystal
from .volume import TXMMaterial
from . import data
from . import catalogs

__all__ = ['Element', 'Material', 'EmptyMaterial', 'Crystal', 'CrystalFcc',
           'CrystalDiamond', 'CrystalSi', 'CrystalFromCell', 'Multilayer',
           'GradedMultilayer', 'Coated', 'Powder', 'CrystalHarmonics',
           'MonoCrystal', 'TXMMaterial', 'data', 'catalogs']
