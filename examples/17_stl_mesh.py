"""Tracing a measured/CAD surface: an STL-mesh optical element.

The xrt_tpu analog of the reference's 17_STL family: a cylindrically
curved mirror surface is written to a binary STL file, read back into a
MeshOE (spline-interpolated height + normal maps) and traced; the mesh
mirror focuses like its analytic original.

Run: python examples/17_stl_mesh.py
     XRT_TPU_PLATFORM=cpu python examples/17_stl_mesh.py
"""
import os
import struct as _struct
import sys
import tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import numpy as np

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import MeshOE
from xrt_tpu.screens import Screen

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 50000

E0 = 9000.0
P, Q = 10000.0, 2000.0
PITCH = 4e-3


def write_cylinder_stl(path, R, lx=30.0, ly=500.0, nx=25, ny=201):
    """Binary STL of a meridional cylinder z = y^2/(2R) (plus walls)."""
    xs = np.linspace(-lx / 2, lx / 2, nx)
    ys = np.linspace(-ly / 2, ly / 2, ny)
    X, Y = np.meshgrid(xs, ys, indexing='ij')
    Z = Y ** 2 / (2 * R)
    tris = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            p = [[X[i, j], Y[i, j], Z[i, j]],
                 [X[i + 1, j], Y[i + 1, j], Z[i + 1, j]],
                 [X[i, j + 1], Y[i, j + 1], Z[i, j + 1]],
                 [X[i + 1, j + 1], Y[i + 1, j + 1], Z[i + 1, j + 1]]]
            tris.append([p[0], p[1], p[3]])
            tris.append([p[0], p[3], p[2]])
    # closing bottom (so the solid has a lowest surface to reject)
    zb = Z.min() - 2.0
    tris.append([[xs[0], ys[0], zb], [xs[-1], ys[0], zb],
                 [xs[-1], ys[-1], zb]])
    tris.append([[xs[0], ys[0], zb], [xs[-1], ys[-1], zb],
                 [xs[0], ys[-1], zb]])
    v = np.asarray(tris, float)
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    with open(path, 'wb') as f:
        f.write(b'\0' * 80)
        f.write(_struct.pack('<I', len(v)))
        for tri, nrm in zip(v, n):
            f.write(_struct.pack('<3f', *nrm))
            for pt in tri:
                f.write(_struct.pack('<3f', *pt))
            f.write(_struct.pack('<H', 0))


def main():
    R = 2 * P * Q / (P + Q) / math.sin(PITCH)   # meridional focusing
    with tempfile.TemporaryDirectory() as td:
        stl = os.path.join(td, 'mirror.stl')
        write_cylinder_stl(stl, R)
        mirror = MeshOE.create(
            fileName=stl, center=(0, P, 0), pitch=PITCH,
            material=xm.Material.create('Rh', rho=12.41),
            limPhysX=(-14, 14), limPhysY=(-240, 240))
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    screen = Screen.create(center=(0, P + Q, 2 * PITCH * Q))

    @jax.jit
    def trace(key):
        beam = src.shine(key)
        glo, _ = mirror.reflect(beam)
        return screen.expose(glo)

    img = trace(jax.random.PRNGKey(0))
    good = np.asarray(img.state) == 1
    z = np.asarray(img.z)[good]
    x = np.asarray(img.x)[good]
    print(f'STL mesh mirror: nGood={good.sum()}, image '
          f'z-rms={z.std():.4g} mm (meridional focus), '
          f'x-rms={x.std():.4g} mm (unfocused sagittal)')
    assert z.std() < 0.1 * x.std(), 'mesh mirror should focus vertically'


if __name__ == '__main__':
    main()
