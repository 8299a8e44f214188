"""Sources.

TPU-native equivalents of xrt/backends/raycing/sources/.
"""
from .geometric import GeometricSource, make_energy, polarization_matrix

__all__ = ['GeometricSource', 'make_energy', 'polarization_matrix']
