"""Beam persistence and file-based sources.

Equivalent of the beam save/load paths in
xrt/backends/raycing/sources/beams.py (Beam.__init__ copyFrom branch:88-118,
export_beam:154-192) and the BeamFromFile source
(xrt/backends/raycing/sources/geoms.py:979-1039).

Formats: numpy ``.npy`` (a pickled dict of arrays — the round-trip format),
Matlab ``.mat`` (via scipy.io; arrays come back 2-D from Matlab so we squeeze
on load) and python ``.pickle``.
"""
from __future__ import annotations

import dataclasses
import pickle

import numpy as np
import jax.numpy as jnp
from flax import struct

from .beam import Beam


def beam_to_dict(beam: Beam) -> dict:
    """Materialize a Beam pytree to a plain dict of numpy arrays, dropping
    ``None`` fields."""
    out = {}
    for f in dataclasses.fields(beam):
        v = getattr(beam, f.name)
        if v is None:
            continue
        out[f.name] = np.asarray(v)
    return out


def beam_from_dict(d: dict) -> Beam:
    """Inverse of :func:`beam_to_dict`; ignores unknown keys (so reference
    xrt beam files load too — their extra attributes are dropped)."""
    names = {f.name for f in dataclasses.fields(Beam)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            continue
        v = np.squeeze(np.asarray(v))   # .mat round-trip makes (1, n)
        if v.ndim == 0 and k in ('x', 'y', 'z', 'a', 'b', 'c', 'E', 'state',
                                 'path', 'Jss', 'Jpp', 'Jsp', 'Es', 'Ep'):
            v = v[None]
        kwargs[k] = jnp.asarray(v)
    return Beam(**kwargs)


def export_beam(beam: Beam, fileName: str, fformat: str = 'npy') -> str:
    """Save *beam* to *fileName*; returns the actual path written
    (beams.py:154-192)."""
    outputDict = beam_to_dict(beam)
    fmt = str(fformat).lower()
    if fmt in ('npy', 'np', 'numpy'):
        if not fileName.endswith('npy'):
            fileName += '.npy'
        np.save(fileName, outputDict)  # stored as a 0-d object array
    elif fmt in ('mat', 'matlab'):
        import scipy.io as io
        if not fileName.endswith('mat'):
            fileName += '.mat'
        io.savemat(fileName, outputDict)
    else:
        if not fileName.endswith('pickle'):
            fileName += '.pickle'
        with open(fileName, 'wb') as f:
            pickle.dump(outputDict, f)
    return fileName


def load_beam(fileName: str) -> Beam:
    """Load a beam saved by :func:`export_beam` (or by the reference's
    ``Beam.export_beam``) in any of the three formats."""
    if fileName.endswith('mat'):
        import scipy.io as io
        d = {k: v for k, v in io.loadmat(fileName).items()
             if not k.startswith('__')}
    elif fileName.endswith('npy'):
        d = np.load(fileName, allow_pickle=True).item()
    else:
        with open(fileName, 'rb') as f:
            d = pickle.load(f)
    return beam_from_dict(d)


@struct.dataclass
class BeamFromFile:
    """A source that replays a previously exported beam
    (geoms.py:979-1039).  ``shine()`` returns the stored beam; the file is
    read once at ``create`` time."""
    fbeam: Beam
    name: str = struct.field(pytree_node=False, default='')

    @classmethod
    def create(cls, fileName: str, name: str = ''):
        return cls(fbeam=load_beam(fileName), name=name)

    def shine(self, key=None) -> Beam:
        return self.fbeam
