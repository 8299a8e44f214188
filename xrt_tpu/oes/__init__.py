"""Optical elements.

TPU-native equivalents of xrt/backends/raycing/oes/.
"""
from .base import OE, find_intersection
from .dcm import DCM, DCMwithSagittalFocusing
from .parametric import (EllipticalMirrorParam, EllipticalMirror,
                         ParabolicalMirrorParam, ParabolicMirror,
                         HyperbolicMirrorParam, HyperbolicMirror,
                         EllipsoidCapillaryMirror,
                         ParaboloidCapillaryMirror,
                         HyperboloidCapillaryMirror)
from .gratings import (Grating, NormalFZP, GeneralFZPin0YZ, BlazedGrating,
                       LaminarGrating, VLSLaminarGrating)
from .refractive import (Plate, ParaboloidFlatLens,
                         ParabolicCylinderFlatLens, DoubleParaboloidLens,
                         DoubleParabolicCylinderLens)
from .mirrors import (FlatMirror, BentFlatMirror, SphericalMirror,
                      ToroidMirror, CylindricalMirror, ConicalMirror,
                      SimpleVCM, VCM, SimpleVFM, VFM,
                      rmer_from_coddington, rsag_from_coddington)

__all__ = ['OE', 'find_intersection', 'Plate', 'ParaboloidFlatLens',
           'ParabolicCylinderFlatLens', 'DoubleParaboloidLens',
           'DoubleParabolicCylinderLens', 'Grating', 'NormalFZP',
           'GeneralFZPin0YZ', 'BlazedGrating', 'LaminarGrating',
           'VLSLaminarGrating', 'DCM', 'DCMwithSagittalFocusing',
           'EllipticalMirrorParam', 'EllipticalMirror',
           'ParabolicalMirrorParam', 'ParabolicMirror',
           'HyperbolicMirrorParam', 'HyperbolicMirror',
           'EllipsoidCapillaryMirror', 'ParaboloidCapillaryMirror',
           'HyperboloidCapillaryMirror', 'FlatMirror', 'BentFlatMirror',
           'SphericalMirror', 'ToroidMirror', 'CylindricalMirror',
           'ConicalMirror', 'SimpleVCM', 'VCM', 'SimpleVFM', 'VFM',
           'rmer_from_coddington', 'rsag_from_coddington']
