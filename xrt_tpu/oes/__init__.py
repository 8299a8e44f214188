"""Optical elements.

TPU-native equivalents of xrt/backends/raycing/oes/.
"""
from .base import OE, find_intersection
from .dcm import DCM, DCMwithSagittalFocusing, DCMOnTripodWithOneXStage
from .parametric import (EllipticalMirrorParam, EllipticalMirror,
                         ParabolicalMirrorParam, ParabolicMirror,
                         HyperbolicMirrorParam, HyperbolicMirror,
                         SurfaceOfRevolution,
                         EllipsoidCapillaryMirror,
                         ParaboloidCapillaryMirror,
                         HyperboloidCapillaryMirror)
from .gratings import (Grating, NormalFZP, GeneralFZPin0YZ, BlazedGrating,
                       LaminarGrating, VLSLaminarGrating)
from .refractive import (Plate, ParaboloidFlatLens,
                         ParabolicCylinderFlatLens, DoubleParaboloidLens,
                         DoubleParabolicCylinderLens)
from .bragg import (DicedOE, JohannCylinder, JohanssonCylinder,
                    JohannToroid, JohanssonToroid, GeneralBraggToroid,
                    DicedJohannToroid, DicedJohanssonToroid)
from .laue import (LauePlate, BentLaueCylinder, GroundBentLaueCylinder,
                   BentLaueSphere, BentLaue2D)
from .mirrors import (FlatMirror, BentFlatMirror, SphericalMirror,
                      ToroidMirror, CylindricalMirror, ConicalMirror,
                      SimpleVCM, VCM, SimpleVFM, VFM, DualVFM,
                      MirrorOnTripodWithTwoXStages,
                      rmer_from_coddington, rsag_from_coddington)
from .mesh3d import MeshOE, read_stl

__all__ = ['OE', 'find_intersection', 'DicedOE', 'JohannCylinder',
           'JohanssonCylinder', 'JohannToroid', 'JohanssonToroid',
           'GeneralBraggToroid', 'DicedJohannToroid',
           'DicedJohanssonToroid', 'LauePlate', 'BentLaueCylinder',
           'GroundBentLaueCylinder', 'BentLaueSphere', 'BentLaue2D', 'Plate', 'ParaboloidFlatLens',
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
           'ConicalMirror', 'SimpleVCM', 'VCM', 'SimpleVFM', 'VFM', 'DualVFM',
           'MirrorOnTripodWithTwoXStages', 'DCMOnTripodWithOneXStage',
           'SurfaceOfRevolution',
           'rmer_from_coddington', 'rsag_from_coddington',
           'MeshOE', 'read_stl']
