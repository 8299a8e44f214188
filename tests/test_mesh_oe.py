"""STL mesh OE: file reading, top-surface extraction, quad/spline fits."""
import math
import struct as _struct

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.oes import MeshOE, read_stl


def _make_surface_mesh(zfun, nx=40, ny=40, lx=20.0, ly=20.0, thick=2.0):
    """A closed solid: top surface z = zfun(x, y), flat bottom, side walls.
    Returns (vectors, normals) triangles."""
    xs = np.linspace(-lx / 2, lx / 2, nx)
    ys = np.linspace(-ly / 2, ly / 2, ny)
    X, Y = np.meshgrid(xs, ys, indexing='ij')
    Z = zfun(X, Y)
    tris = []

    def quad(p00, p10, p01, p11):
        tris.append([p00, p10, p11])
        tris.append([p00, p11, p01])

    for i in range(nx - 1):
        for j in range(ny - 1):
            quad([X[i, j], Y[i, j], Z[i, j]],
                 [X[i+1, j], Y[i+1, j], Z[i+1, j]],
                 [X[i, j+1], Y[i, j+1], Z[i, j+1]],
                 [X[i+1, j+1], Y[i+1, j+1], Z[i+1, j+1]])
    zb = Z.min() - thick
    # bottom (normals down)
    quad([xs[0], ys[0], zb], [xs[0], ys[-1], zb],
         [xs[-1], ys[0], zb], [xs[-1], ys[-1], zb])
    vectors = np.asarray(tris, float)
    v1 = vectors[:, 1] - vectors[:, 0]
    v2 = vectors[:, 2] - vectors[:, 0]
    normals = np.cross(v1, v2)
    nn = np.linalg.norm(normals, axis=1, keepdims=True)
    normals /= np.where(nn == 0, 1, nn)
    return vectors, normals


def _write_binary_stl(path, vectors, normals):
    with open(path, 'wb') as f:
        f.write(b'\0' * 80)
        f.write(_struct.pack('<I', len(vectors)))
        for v, n in zip(vectors, normals):
            f.write(_struct.pack('<3f', *n))
            for p in v:
                f.write(_struct.pack('<3f', *p))
            f.write(_struct.pack('<H', 0))


def _write_ascii_stl(path, vectors, normals):
    with open(path, 'w') as f:
        f.write('solid test\n')
        for v, n in zip(vectors, normals):
            f.write(f'facet normal {n[0]} {n[1]} {n[2]}\n outer loop\n')
            for p in v:
                f.write(f'  vertex {p[0]} {p[1]} {p[2]}\n')
            f.write(' endloop\nendfacet\n')
        f.write('endsolid test\n')


R_SPHERE = 5000.0


def _sphere_sag(x, y):
    return R_SPHERE - np.sqrt(R_SPHERE ** 2 - x ** 2 - y ** 2)


def test_read_binary_and_ascii_equal(tmp_path):
    vec, nor = _make_surface_mesh(_sphere_sag, nx=8, ny=8)
    pb = str(tmp_path / 'm.stl')
    pa = str(tmp_path / 'm_ascii.stl')
    _write_binary_stl(pb, vec, nor)
    _write_ascii_stl(pa, vec, nor)
    vb, nb = read_stl(pb)
    va, na = read_stl(pa)
    assert vb.shape == vec.shape
    assert np.allclose(vb, va, atol=1e-5)
    assert np.allclose(vb, vec, rtol=1e-6)


def test_quad_fit_recovers_sphere_radius(tmp_path):
    vec, nor = _make_surface_mesh(_sphere_sag)
    path = str(tmp_path / 'sph.stl')
    _write_binary_stl(path, vec, nor)
    oe = MeshOE.create(fileName=path, center=(0, 1000, 0),
                       surfaceHint='quad')
    Rmer, Rsag = oe.fitted_radii()
    # quad fit of a R=5 m sphere over a 20 mm aperture
    assert abs(float(Rmer) - R_SPHERE) / R_SPHERE < 0.01
    assert abs(float(Rsag) - R_SPHERE) / R_SPHERE < 0.01
    # local_z matches the sag (recentered to min 0)
    x = jnp.asarray([0.0, 5.0])
    y = jnp.asarray([0.0, -5.0])
    z = np.asarray(oe.local_z(x, y))
    assert abs(z[0]) < 1e-3
    assert np.isclose(z[1], _sphere_sag(5.0, -5.0), atol=2e-3)


def test_spline_fit_wavy_surface(tmp_path):
    amp, per = 0.01, 5.0

    def wavy(x, y):
        return amp * np.sin(2 * np.pi * x / per)

    vec, nor = _make_surface_mesh(wavy, nx=80, ny=10)
    path = str(tmp_path / 'wavy.stl')
    _write_binary_stl(path, vec, nor)
    oe = MeshOE.create(fileName=path, center=(0, 1000, 0),
                       surfaceHint='spline')
    x = jnp.linspace(-8.0, 8.0, 33)
    y = jnp.zeros_like(x)
    z = np.asarray(oe.local_z(x, y))
    zexp = amp * np.sin(2 * np.pi * np.asarray(x) / per)
    zexp = zexp - (-amp)  # recentered so min(grid) = 0
    assert np.allclose(z, zexp, atol=2e-3)
    # slope from the normal agrees with the analytic derivative
    n = oe.local_n(x, y)
    slope = -np.asarray(n[0]) / np.asarray(n[2])
    sexp = amp * 2 * np.pi / per * np.cos(2 * np.pi * np.asarray(x) / per)
    assert np.allclose(slope, sexp, atol=3e-3)


def test_mesh_oe_traces_and_focuses(tmp_path):
    """A spherical MeshOE at grazing incidence focuses like a spherical
    mirror with the fitted radius."""
    from xrt_tpu.sources.geometric import GeometricSource
    from xrt_tpu.screens import Screen
    vec, nor = _make_surface_mesh(
        lambda x, y: 10000.0 - np.sqrt(10000.0**2 - x**2 - y**2),
        nx=30, ny=30, lx=30.0, ly=30.0)
    path = str(tmp_path / 'sph2.stl')
    _write_binary_stl(path, vec, nor)
    pitch = math.radians(1.0)
    p = 2000.0
    R = 10000.0
    q = 1.0 / (2.0 / (R * math.sin(pitch)) - 1.0 / p)
    oe = MeshOE.create(fileName=path, center=(0, p, 0), pitch=pitch,
                       surfaceHint='quad')
    src = GeometricSource.create(nrays=2000, dzprime=2e-5,
                                 energies=(9000.0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, _ = oe.reflect(beam)
    scr = Screen.create(center=(0, p + q * math.cos(2 * pitch),
                                q * math.sin(2 * pitch)),
                        z=(0, -math.sin(2 * pitch), math.cos(2 * pitch)))
    img = scr.expose(glo)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    z = np.asarray(img.z)[good]
    # meridional focus: rms size much smaller than the unfocused beam
    unfocused = 2e-5 * (p + q)
    assert z.std() < 0.1 * unfocused
