"""Optical elements.

TPU-native equivalents of xrt/backends/raycing/oes/.
"""
from .base import OE, find_intersection
from .mirrors import (FlatMirror, BentFlatMirror, SphericalMirror,
                      ToroidMirror, CylindricalMirror, ConicalMirror,
                      SimpleVCM, VCM, SimpleVFM, VFM,
                      rmer_from_coddington, rsag_from_coddington)

__all__ = ['OE', 'find_intersection', 'FlatMirror', 'BentFlatMirror',
           'SphericalMirror', 'ToroidMirror', 'CylindricalMirror',
           'ConicalMirror', 'SimpleVCM', 'VCM', 'SimpleVFM', 'VFM',
           'rmer_from_coddington', 'rsag_from_coddington']
