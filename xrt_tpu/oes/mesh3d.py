"""Optical elements defined by triangulated (STL) meshes.

TPU-native re-implementation of xrt/backends/raycing/oes/_3d.py (MeshOE:16):
the top surface of an STL solid is identified by a normals-up flood fill
over shared vertices, then reconstructed either as a biquadratic polynomial
('quad'), a regular-grid height map ('spline'), or a plane ('flat').

The reference needs numpy-stl; here a self-contained reader handles both
binary and ASCII STL.  The reconstruction runs on the host at ``create``
time; ray tracing evaluates either the polynomial or a
``map_coordinates``-interpolated height/slope grid — both jit- and
grad-friendly, reusing the same device interpolation scheme as
:mod:`~xrt_tpu.figure_error`.
"""
from __future__ import annotations

import struct as _struct
from collections import defaultdict, deque
from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates
from flax import struct

from .. import config
from .base import OE


def read_stl(fileName):
    """Return (vectors (n, 3, 3), normals (n, 3)) from a binary or ASCII
    STL file (replaces the reference's numpy-stl dependency,
    _3d.py:9-13, 114-115)."""
    with open(fileName, 'rb') as f:
        raw = f.read()
    if raw[:5].lower() == b'solid' and b'facet' in raw[:500]:
        # ASCII
        text = raw.decode('ascii', errors='replace').split()
        normals, verts = [], []
        i = 0
        while i < len(text):
            tok = text[i]
            if tok == 'normal':
                normals.append([float(text[i + 1]), float(text[i + 2]),
                                float(text[i + 3])])
                i += 4
            elif tok == 'vertex':
                verts.append([float(text[i + 1]), float(text[i + 2]),
                              float(text[i + 3])])
                i += 4
            else:
                i += 1
        vectors = np.asarray(verts, float).reshape(-1, 3, 3)
        return vectors, np.asarray(normals, float)
    # binary: 80-byte header, uint32 count, 50 bytes per triangle
    n = _struct.unpack('<I', raw[80:84])[0]
    data = np.frombuffer(raw[84:84 + 50 * n], dtype=np.uint8)
    tri = data.reshape(n, 50)
    floats = tri[:, :48].copy().view('<f4').reshape(n, 12).astype(float)
    return floats[:, 3:12].reshape(n, 3, 3), floats[:, 0:3]


def _top_surface_vertices(vectors, normals, orientation='XYZ'):
    """Connected top-surface extraction: triangles with normal z > 0.1,
    flood-filled over shared vertices from the highest one
    (_3d.py:117-163)."""
    ax = {'X': 0, 'Y': 1, 'Z': 2}
    ix = ax[orientation[0].upper()]
    iy = ax[orientation[1].upper()]
    iz = ax[orientation[2].upper()]
    nz = normals[:, iz]
    top = np.where(nz > 0.1)[0]
    if len(top) == 0:
        raise ValueError('no upward-looking triangles in the mesh')
    izmax = top[np.argmax(vectors[top, 2, iz])]

    def pkey(p):
        return tuple(np.round(p, 8))

    tri_keys = [[pkey(p) for p in v] for v in vectors]
    point_to_tri = defaultdict(set)
    for ti, pts in enumerate(tri_keys):
        for pt in pts:
            point_to_tri[pt].add(ti)
    allowed = set(top.tolist()) - {izmax}
    surf = [izmax]
    queue = deque([izmax])
    while queue:
        tsi = queue.popleft()
        for pt in tri_keys[tsi]:
            for nei in point_to_tri[pt]:
                if nei in allowed:
                    allowed.remove(nei)
                    surf.append(nei)
                    queue.append(nei)
    v = vectors[surf]
    return v[:, :, ix].ravel(), v[:, :, iy].ravel(), v[:, :, iz].ravel()


@struct.dataclass
class MeshOE(OE):
    """STL-defined OE (_3d.py:16-244).  *surfaceHint* picks the surface
    model: 'flat' | 'quad' (biquadratic least squares) | 'spline'
    (regular-grid height map + slope maps)."""
    cpoly: Optional[jnp.ndarray] = None     # (6,) biquadratic coefficients
    zmap: Optional[jnp.ndarray] = None      # (ny, nx), mm
    dzdx: Optional[jnp.ndarray] = None
    dzdy: Optional[jnp.ndarray] = None
    gx0: Optional[jnp.ndarray] = None
    gy0: Optional[jnp.ndarray] = None
    gdx: Optional[jnp.ndarray] = None
    gdy: Optional[jnp.ndarray] = None
    surfaceHint: str = struct.field(pytree_node=False, default='quad')

    @classmethod
    def create(cls, fileName=None, orientation='XYZ', recenter=True,
               surfaceHint='quad', gridPointsPerMM=10.0, **kwargs):
        dt = config.dtype()
        vectors, normals = read_stl(fileName)
        xs, ys, zs = _top_surface_vertices(vectors, normals, orientation)
        limX = np.array([xs.min(), xs.max()])
        limY = np.array([ys.min(), ys.max()])
        if recenter:   # (_3d.py:166-176)
            dcx = 0.5 * (limX[0] + limX[1])
            dcy = 0.5 * (limY[0] + limY[1])
            xs = xs - dcx
            ys = ys - dcy
            zs = zs - zs.min()
            limX = limX - dcx
            limY = limY - dcy
        uxy, ui = np.unique(np.vstack((xs, ys)).T, axis=0,
                            return_index=True)
        ux, uy, uz = uxy[:, 0], uxy[:, 1], zs[ui]
        fields = {}
        if surfaceHint == 'quad':      # (_3d.py:186-193)
            A = np.c_[ux**2, uy**2, ux*uy, ux, uy, np.ones_like(ux)]
            cpoly, *_ = np.linalg.lstsq(A, uz, rcond=None)
            if recenter:
                cpoly[5] = 0.0         # dcz folded into the constant term
            fields['cpoly'] = jnp.asarray(cpoly, dt)
        elif surfaceHint == 'spline':  # (_3d.py:194-212)
            from scipy.interpolate import griddata
            nxg = max(int(gridPointsPerMM * (limX[1] - limX[0])), 4)
            nyg = max(int(gridPointsPerMM * (limY[1] - limY[0])), 4)
            xg = np.linspace(limX[0], limX[1], nxg)
            yg = np.linspace(limY[0], limY[1], nyg)
            xm, ym = np.meshgrid(xg, yg, indexing='ij')
            zm = griddata((ux, uy), uz, (xm, ym), method='cubic')
            bad = np.isnan(zm)
            if bad.any():
                zm[bad] = np.nanmean(zm)
            if recenter:
                zm = zm - zm.min()
            dzdxm, dzdym = np.gradient(zm, xg, yg)
            fields.update(
                zmap=jnp.asarray(zm, dt),
                dzdx=jnp.asarray(dzdxm, dt), dzdy=jnp.asarray(dzdym, dt),
                gx0=jnp.asarray(xg[0], dt), gy0=jnp.asarray(yg[0], dt),
                gdx=jnp.asarray(xg[1] - xg[0], dt),
                gdy=jnp.asarray(yg[1] - yg[0], dt))
        elif surfaceHint != 'flat':
            raise ValueError("surfaceHint must be 'flat', 'quad' or "
                             "'spline'")
        kwargs.setdefault('limPhysX', tuple(limX))
        kwargs.setdefault('limPhysY', tuple(limY))
        return super(MeshOE, cls).create(
            surfaceHint=surfaceHint, **fields, **kwargs)

    # surface models --------------------------------------------------------
    def _grid_eval(self, arr, x, y):
        cx = (x - self.gx0) / self.gdx
        cy = (y - self.gy0) / self.gdy
        return map_coordinates(arr, jnp.stack([cx, cy]), order=1,
                               mode='nearest')

    def local_z(self, x, y):
        if self.surfaceHint == 'quad':
            c = self.cpoly
            return (c[0]*x**2 + c[1]*y**2 + c[2]*x*y + c[3]*x + c[4]*y +
                    c[5])
        if self.surfaceHint == 'spline':
            return self._grid_eval(self.zmap, x, y)
        return jnp.zeros_like(x)

    def local_n(self, x, y):
        if self.surfaceHint == 'quad':
            c = self.cpoly
            a = 2*c[0]*x + c[2]*y + c[3]
            b = 2*c[1]*y + c[2]*x + c[4]
        elif self.surfaceHint == 'spline':
            a = self._grid_eval(self.dzdx, x, y)
            b = self._grid_eval(self.dzdy, x, y)
        else:
            a = b = jnp.zeros_like(x)
        norm = jnp.sqrt(a**2 + b**2 + 1.0)
        return [-a/norm, -b/norm, 1.0/norm]

    # radii implied by the quad fit (printed by the reference,
    # _3d.py:191-193)
    def fitted_radii(self):
        if self.cpoly is None:
            return None, None
        return 0.5 / self.cpoly[1], 0.5 / self.cpoly[0]  # (Rmer, Rsag)
