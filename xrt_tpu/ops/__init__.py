"""Compute kernels (XLA and Pallas)."""
from . import dd, kirchhoff
