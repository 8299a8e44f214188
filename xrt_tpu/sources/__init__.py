"""Sources.

TPU-native equivalents of xrt/backends/raycing/sources/.
"""
from .geometric import GeometricSource, make_energy, polarization_matrix
from .synchrotron import BendingMagnet, Wiggler
from .undulator import Undulator, clenshaw_curtis, tanaka_kitamura_Qa2
from .customfield import SourceFromField
from .gaussian import (GaussianBeam, LaguerreGaussianBeam,
                       HermiteGaussianBeam, MeshSource, NESWSource, shrink_source,
                       CollimatedMeshSource, hermite_poly,
                       genlaguerre_poly)
from ..beamio import BeamFromFile

__all__ = ['GeometricSource', 'make_energy', 'polarization_matrix',
           'BendingMagnet', 'Wiggler', 'Undulator', 'SourceFromField',
           'GaussianBeam', 'LaguerreGaussianBeam', 'HermiteGaussianBeam',
           'MeshSource', 'NESWSource', 'shrink_source', 'CollimatedMeshSource',
           'clenshaw_curtis',
           'tanaka_kitamura_Qa2', 'BeamFromFile']
