"""Powder / CrystalHarmonics / MonoCrystal multi-reflex diffraction."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.physconsts import CH
from xrt_tpu.materials import (CrystalFromCell, Powder, CrystalHarmonics,
                               MonoCrystal)
from xrt_tpu.materials.polycrystal import _d_spacing_table

A_SI = 5.430710


def _plateau_angle(crystal, E):
    """Bragg angle at the center of the Darwin plateau."""
    return float(crystal.get_Bragg_angle(E) - crystal.get_dtheta(E))


def test_d_spacing_table_cubic():
    tab = np.array([[1, 1, 1], [2, 2, 0], [4, 0, 0]], np.int32)
    d = _d_spacing_table(5.43, 5.43, 5.43, 90, 90, 90, tab)
    for row, dv in zip(tab, d):
        assert np.isclose(dv, 5.43 / np.linalg.norm(row), rtol=1e-12)


def test_harmonics_picks_fundamental_at_its_bragg_angle():
    mat = CrystalHarmonics.create(Nmax=3, hkl=(1, 1, 1), a=A_SI, name='Si')
    plain = CrystalFromCell.create(hkl=(1, 1, 1), a=A_SI, name='Si')
    theta = _plateau_angle(plain, 9000.0)
    E = jnp.full((64,), 9000.0)
    # beam in the yz plane hitting a surface with normal +z at theta
    a = jnp.zeros_like(E)
    b = jnp.full_like(E, math.cos(theta))
    c = jnp.full_like(E, -math.sin(theta))
    nb = (jnp.zeros_like(E), jnp.zeros_like(E), jnp.ones_like(E))
    aO, bO, cO, rs, rp = mat.reflect_multi_hkl(
        jax.random.PRNGKey(0), E, (a, b, c), nb, nb)
    # reflected upward at theta
    assert np.allclose(np.asarray(cO), math.sin(theta), atol=1e-6)
    # reflectivity matches the plain crystal with identical cell at the
    # same angle (on the Darwin plateau)
    ref_s, _ = plain.get_amplitude(E, -math.sin(theta) * jnp.ones_like(E))
    assert np.abs(np.asarray(rs)[0]) > 0.8
    assert np.allclose(np.abs(np.asarray(rs)), np.abs(np.asarray(ref_s)),
                       rtol=1e-6)


def test_harmonics_picks_third_harmonic():
    mat = CrystalHarmonics.create(Nmax=3, hkl=(1, 1, 1), a=A_SI, name='Si')
    plain333 = CrystalFromCell.create(hkl=(3, 3, 3), a=A_SI, name='Si')
    theta = _plateau_angle(plain333, 27000.0)
    # 3x the fundamental energy near the same geometric angle satisfies
    # Bragg for [333] only
    E = jnp.full((16,), 27000.0)
    a = jnp.zeros_like(E)
    b = jnp.full_like(E, math.cos(theta))
    c = jnp.full_like(E, -math.sin(theta))
    nb = (jnp.zeros_like(E), jnp.zeros_like(E), jnp.ones_like(E))
    aO, bO, cO, rs, rp = mat.reflect_multi_hkl(
        jax.random.PRNGKey(1), E, (a, b, c), nb, nb)
    assert np.allclose(np.asarray(cO), math.sin(theta), atol=1e-5)
    ref_s, _ = plain333.get_amplitude(E, -math.sin(theta) * jnp.ones_like(E))
    assert np.abs(np.asarray(rs)[0]) > 0.5
    assert np.allclose(np.abs(np.asarray(rs)), np.abs(np.asarray(ref_s)),
                       rtol=1e-6)


def test_powder_bragg_matched_crystallites():
    """Crystallites oriented exactly at the 111 Bragg condition scatter onto
    the Debye-Scherrer cone with plateau reflectivity."""
    mat = Powder.create(hkl=(1, 1, 1), a=A_SI, name='Si')
    plain = CrystalFromCell.create(hkl=(1, 1, 1), a=A_SI, name='Si')
    E0 = 8047.8  # Cu K-alpha
    theta = _plateau_angle(plain, E0)
    nrays = 256
    E = jnp.full((nrays,), E0)
    a = jnp.zeros_like(E)
    b = jnp.ones_like(E)
    c = jnp.zeros_like(E)
    # plane normals tilted so n.b = -sin(theta), random azimuth
    phi = jax.random.uniform(jax.random.PRNGKey(5), (nrays,), E.dtype,
                             0.0, 2 * math.pi)
    nx = jnp.cos(phi) * math.cos(theta)
    ny = jnp.full_like(E, -math.sin(theta))
    nz = jnp.sin(phi) * math.cos(theta)
    aO, bO, cO, rs, rp = mat.reflect_multi_hkl(
        jax.random.PRNGKey(6), E, (a, b, c), (nx, ny, nz), (nx, ny, nz))
    # outgoing on the cone: angle to the beam = 2 theta
    assert np.allclose(np.asarray(bO), math.cos(2 * theta), atol=1e-6)
    # strong reflectivity, equal to the plain crystal on its plateau
    ref_s, _ = plain.get_amplitude(E, -math.sin(theta) * jnp.ones_like(E))
    assert np.allclose(np.abs(np.asarray(rs)), np.abs(np.asarray(ref_s)),
                       rtol=1e-6)
    assert np.abs(np.asarray(rs)[0]) > 0.8


def test_powder_random_cone_clustering():
    """With fully random crystallites the intensity-weighted scattering
    angles cluster on the 111 Debye-Scherrer cone."""
    mat = Powder.create(hkl=(1, 1, 1), a=A_SI, name='Si')
    nrays = 20000
    E0 = 8047.8
    E = jnp.full((nrays,), E0)
    a = jnp.zeros_like(E)
    b = jnp.ones_like(E)
    c = jnp.zeros_like(E)
    key = jax.random.PRNGKey(2)
    rx, ry, rz = mat.random_orientation(key, nrays, E.dtype)
    aO, bO, cO, rs, rp = mat.reflect_multi_hkl(
        jax.random.fold_in(key, 1), E, (a, b, c), (rx, ry, rz), (rx, ry, rz))
    I = np.abs(np.asarray(rs)) ** 2 + np.abs(np.asarray(rp)) ** 2
    assert I.sum() > 0
    two_theta = np.arccos(np.clip(np.asarray(bO), -1, 1))
    lam = float(CH) / E0
    d111 = A_SI / math.sqrt(3)
    tt111 = 2 * math.asin(lam / (2 * d111))
    mean_tt = float((I * two_theta).sum() / I.sum())
    assert abs(mean_tt - tt111) < 0.05


def test_powder_random_orientation_chi_window():
    mat = Powder.create(hkl=(1, 1, 1), chi=(0.0, 0.1), a=A_SI, name='Si')
    rx, ry, rz = mat.random_orientation(jax.random.PRNGKey(3), 2000,
                                        jnp.float64)
    chi = np.arctan2(np.asarray(ry), np.asarray(rx))
    ok = np.asarray(rx) ** 2 + np.asarray(ry) ** 2 > 1e-12
    assert np.all(chi[ok] >= -1e-9) and np.all(chi[ok] <= 0.1 + 1e-9)
    assert np.all(np.asarray(rz) >= 0)


def test_monocrystal_symmetric_cut_matches_plain_crystal():
    mat = MonoCrystal.create(Nmax=1, hkl=(1, 1, 1), a=A_SI, name='Si')
    plain = CrystalFromCell.create(hkl=(1, 1, 1), a=A_SI, name='Si')
    theta = _plateau_angle(plain, 9000.0)
    E = jnp.full((128,), 9000.0)
    # surface normal = cut normal = +z; the cut rotation maps [111] onto
    # +z, so aiming the beam at theta to +z satisfies Bragg for that reflex
    a = jnp.zeros_like(E)
    b = jnp.full_like(E, math.cos(theta))
    c = jnp.full_like(E, -math.sin(theta))
    nb = (jnp.zeros_like(E), jnp.zeros_like(E), jnp.ones_like(E))
    aO, bO, cO, rs, rp = mat.reflect_multi_hkl(
        jax.random.PRNGKey(4), E, (a, b, c), nb, nb)
    # intensity-weighted sampling: essentially every ray picks the one
    # Bragg-matched reflex and reflects specularly
    sel = np.isclose(np.asarray(cO), math.sin(theta), atol=1e-5)
    assert sel.mean() > 0.95
    ref_s, _ = plain.get_amplitude(
        E[:1], -jnp.full((1,), math.sin(theta)))
    assert np.allclose(np.abs(np.asarray(rs))[sel],
                       np.abs(np.asarray(ref_s))[0], rtol=1e-3)


def test_powder_on_flat_plate_e2e():
    """Powder material on a flat OE through the full reflect() path."""
    from xrt_tpu.oes import FlatMirror
    from xrt_tpu.sources.geometric import GeometricSource
    plate = FlatMirror.create(
        center=(0, 1000.0, 0), pitch=math.pi / 2,  # normal incidence
        material=Powder.create(hkl=(1, 1, 1), a=A_SI, t=0.1, name='Si'),
        limPhysX=(-20, 20), limPhysY=(-20, 20))
    src = GeometricSource.create(nrays=5000, dx=0.5, dz=0.5,
                                 energies=(8047.8,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(7))
    glo, loc = plate.reflect(beam, jax.random.PRNGKey(8))
    state = np.asarray(glo.state)
    good = state == 1
    assert good.mean() > 0.95
    I = np.asarray(glo.Jss + glo.Jpp)[good]
    # scattered intensity concentrates on the 111 cone around the beam axis
    b_dir = np.asarray(glo.b)[good]
    # scattering angle measured from the incoming +y axis
    two_theta = np.arccos(np.clip(b_dir, -1, 1))
    lam = float(CH) / 8047.8
    tt111 = 2 * math.asin(lam / (2 * A_SI / math.sqrt(3)))
    mean_tt = float((I * two_theta).sum() / max(I.sum(), 1e-30))
    assert abs(mean_tt - tt111) < 0.1


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
