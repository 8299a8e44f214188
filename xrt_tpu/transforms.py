"""Coordinate rotations and global<->local frame transforms.

Functional (pure) equivalents of the reference in-place helpers
(xrt/backends/raycing/_rotate.py and beamline.py:52-130).  The coordinate
conventions are identical to xrt raycing: y is along the beam, z is up,
x makes a right-handed system; *pitch* is rotation about x, *roll* about y,
*yaw* about z.  A leading '-' in *rotationSequence* reverses the sequence.
"""
from __future__ import annotations

import jax.numpy as jnp


def rotate_x(y, z, cosangle, sinangle):
    """Rotation about x (pitch); returns (yNew, zNew)."""
    return cosangle * y - sinangle * z, sinangle * y + cosangle * z


def rotate_y(x, z, cosangle, sinangle):
    """Rotation about y (roll); returns (xNew, zNew)."""
    return cosangle * x + sinangle * z, -sinangle * x + cosangle * z


def rotate_z(x, y, cosangle, sinangle):
    """Rotation about z (yaw); returns (xNew, yNew)."""
    return cosangle * x - sinangle * y, sinangle * x + cosangle * y


def _seq_letters(rotationSequence: str):
    if rotationSequence[0] == '-':
        return (rotationSequence[6], rotationSequence[4], rotationSequence[2])
    return (rotationSequence[1], rotationSequence[3], rotationSequence[5])


def rotate_xyz(x, y, z, rotationSequence='RzRyRx', pitch=0., roll=0., yaw=0.,
               skip_zero=True):
    """Rotate vectors (x, y, z) by pitch/roll/yaw in the given sequence.

    Unlike the reference, this is pure: returns new (x, y, z).  ``skip_zero``
    keeps the trace small by omitting rotations with a (python-level) zero
    angle; pass False when angles are traced values.
    """
    angles = {'z': yaw, 'y': roll, 'x': pitch}
    for s in _seq_letters(rotationSequence):
        angle = angles[s]
        if skip_zero and isinstance(angle, (int, float)) and angle == 0:
            continue
        cA = jnp.cos(angle)
        sA = jnp.sin(angle)
        if s == 'x':
            y, z = rotate_x(y, z, cA, sA)
        elif s == 'y':
            x, z = rotate_y(x, z, cA, sA)
        else:
            x, y = rotate_z(x, y, cA, sA)
    return x, y, z


def rotate_point(point, rotationSequence='RzRyRx', pitch=0., roll=0., yaw=0.):
    x, y, z = rotate_xyz(point[0], point[1], point[2], rotationSequence,
                         pitch, roll, yaw)
    return [x, y, z]


def rotate_beam(beam, rotationSequence='RzRyRx', pitch=0., roll=0., yaw=0.,
                skip_xyz=False, skip_abc=False, skip_zero=True):
    """Rotate the position and/or direction arrays of a Beam; returns a new
    Beam (cf. reference _rotate.rotate_beam)."""
    updates = {}
    if not skip_xyz:
        x, y, z = rotate_xyz(beam.x, beam.y, beam.z, rotationSequence,
                             pitch, roll, yaw, skip_zero)
        updates.update(x=x, y=y, z=z)
    if not skip_abc:
        a, b, c = rotate_xyz(beam.a, beam.b, beam.c, rotationSequence,
                             pitch, roll, yaw, skip_zero)
        updates.update(a=a, b=b, c=c)
    return beam.replace(**updates)


def global_to_virgin_local(beam, center=None, sinAzimuth=0.0, cosAzimuth=1.0):
    """Transform a beam from the global to the virgin-local system of an
    element placed at *center* in a beamline with the given azimuth
    (cf. beamline.py:52-87).  Pure: returns a new Beam."""
    x = beam.x
    y = beam.y
    z = beam.z
    if center is not None:
        x = x - center[0]
        y = y - center[1]
        z = z - center[2]
    a, b = beam.a, beam.b
    if not (isinstance(sinAzimuth, float) and sinAzimuth == 0.0):
        x, y = rotate_z(x, y, cosAzimuth, sinAzimuth)
        a, b = rotate_z(a, b, cosAzimuth, sinAzimuth)
    return beam.replace(x=x, y=y, z=z, a=a, b=b)


def virgin_local_to_global(beam, center=None, sinAzimuth=0.0, cosAzimuth=1.0,
                           skip_xyz=False, skip_abc=False):
    """Inverse of :func:`global_to_virgin_local` (cf. beamline.py:89-117)."""
    updates = {}
    x, y, z = beam.x, beam.y, beam.z
    a, b = beam.a, beam.b
    if not (isinstance(sinAzimuth, float) and sinAzimuth == 0.0):
        if not skip_abc:
            a, b = rotate_z(a, b, cosAzimuth, -sinAzimuth)
            updates.update(a=a, b=b)
        if not skip_xyz:
            x, y = rotate_z(x, y, cosAzimuth, -sinAzimuth)
    if center is not None and not skip_xyz:
        x = x + center[0]
        y = y + center[1]
        z = z + center[2]
    if not skip_xyz:
        updates.update(x=x, y=y, z=z)
    return beam.replace(**updates)
