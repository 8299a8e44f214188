"""TXM indexed-volume material: voxel lookup, chord integrals, h5 IO."""
import numpy as np
import jax.numpy as jnp

from xrt_tpu.physconsts import CHBAR
from xrt_tpu.materials import Material, TXMMaterial


def _mats():
    water = Material.create(('H', 'O'), quantities=(2, 1), rho=1.0,
                            kind='plate')
    gold = Material.create('Au', rho=19.3, kind='plate')
    return water, gold


def _two_layer(water, gold):
    """Bottom half water, top half gold; 50 um cube at origin."""
    grid = np.zeros((10, 4, 4), np.uint8)
    grid[5:] = 1  # upper z half is gold
    lim = {'x': (-0.025, 0.025), 'y': (-0.025, 0.025), 'z': (0.0, 0.050)}
    return TXMMaterial.create(indexGrid=grid, limits=lim,
                              materialsIndex=(water, gold))


def test_voxel_lookup_and_refractive_index():
    water, gold = _mats()
    txm = _two_layer(water, gold)
    E = jnp.full((3,), 9000.0)
    x = jnp.zeros(3)
    y = jnp.zeros(3)
    z = jnp.asarray([0.01, 0.04, 0.049])
    idx = np.asarray(txm.get_material_indices(x, y, z))
    assert list(idx) == [0, 1, 1]
    n = np.asarray(txm.get_refractive_index(E, x, y, z))
    n_w = complex(np.asarray(water.get_refractive_index(9000.0)))
    n_g = complex(np.asarray(gold.get_refractive_index(9000.0)))
    assert np.isclose(n[0], n_w) and np.isclose(n[1], n_g)
    # background index without coordinates
    assert np.isclose(complex(np.asarray(
        txm.get_refractive_index(jnp.asarray(9000.0)))), n_w)


def test_volume_integrals_two_layers():
    water, gold = _mats()
    txm = _two_layer(water, gold)
    E = jnp.full((1,), 9000.0)
    # vertical ray straight up through both layers
    x = jnp.zeros(1)
    y = jnp.zeros(1)
    z = jnp.zeros(1)
    a = jnp.zeros(1)
    b = jnp.zeros(1)
    c = jnp.ones(1)
    tMax = jnp.full((1,), 0.050)
    mu, nk = txm.volume_integrals(E, x, y, z, a, b, c, tMax)
    mu_w = float(np.asarray(water.get_absorption_coefficient(9000.0)))
    mu_g = float(np.asarray(gold.get_absorption_coefficient(9000.0)))
    assert np.isclose(float(mu[0]), 0.5 * (mu_w + mu_g), rtol=1e-9)
    n_w = complex(np.asarray(water.get_refractive_index(9000.0)))
    n_g = complex(np.asarray(gold.get_refractive_index(9000.0)))
    nk_exp = 0.5 * (n_w.real + n_g.real) * 9000.0 / float(CHBAR) * 1e8
    assert np.isclose(float(nk[0]), nk_exp, rtol=1e-9)


def test_volume_integrals_partial_chord():
    """A chord covering only the water half averages to water only."""
    water, gold = _mats()
    txm = _two_layer(water, gold)
    E = jnp.full((1,), 9000.0)
    mu, nk = txm.volume_integrals(
        E, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
        jnp.zeros(1), jnp.zeros(1), jnp.ones(1), jnp.full((1,), 0.025))
    mu_w = float(np.asarray(water.get_absorption_coefficient(9000.0)))
    assert np.isclose(float(mu[0]), mu_w, rtol=1e-9)


def test_amplitude_exit_attenuation_matches_uniform():
    """A homogeneous voxel grid behaves like the plain material."""
    water, _ = _mats()
    grid = np.zeros((8, 8, 8), np.uint8)
    lim = {'x': (-1.0, 1.0), 'y': (-1.0, 1.0), 'z': (0.0, 0.1)}
    txm = TXMMaterial.create(indexGrid=grid, limits=lim,
                             materialsIndex=(water,))
    E = jnp.full((4,), 12000.0)
    bidn = jnp.full((4,), -1.0)  # normal incidence
    tMax = jnp.full((4,), 0.1)
    rs, rp, mu, nk = txm.get_amplitude(
        E, bidn, fromVacuum=False,
        x=jnp.zeros(4), y=jnp.zeros(4), z=jnp.zeros(4),
        a=jnp.zeros(4), b=jnp.zeros(4), c=jnp.ones(4), tMax=tMax)
    mu_w = float(np.asarray(water.get_absorption_coefficient(12000.0)))
    assert np.allclose(np.asarray(mu), mu_w, rtol=1e-9)
    # Fresnel exit amplitude equals the plain material's exit amplitude
    rs_ref = water.get_amplitude(E, bidn, fromVacuum=False)[0]
    assert np.allclose(np.asarray(rs), np.asarray(rs_ref), rtol=1e-9)


def test_h5_roundtrip(tmp_path):
    import h5py
    water, gold = _mats()
    grid = np.zeros((6, 5, 4), np.uint8)
    grid[3:] = 1
    path = str(tmp_path / 'sample.h5')
    with h5py.File(path, 'w') as h5:
        ds = h5.create_dataset('indexGrid', data=grid, dtype='u1')
        ds.attrs['axisOrder'] = 'zyx'
        ds.attrs['backgroundIndex'] = 0
        limits = h5.create_group('limits')
        limits.create_dataset('x', data=[-0.025, 0.025])
        limits.create_dataset('y', data=[-0.025, 0.025])
        limits.create_dataset('z', data=[0.0, 0.050])
    txm = TXMMaterial.create(fileName=path, materialsIndex={0: water,
                                                            1: gold})
    assert txm.grid_shape == (6, 5, 4)
    assert txm.backgroundIndex == 0
    idx = np.asarray(txm.get_material_indices(
        jnp.zeros(2), jnp.zeros(2), jnp.asarray([0.01, 0.04])))
    assert list(idx) == [0, 1]


def test_txm_through_plate_e2e():
    """A Plate carrying a TXM voxel material attenuates each ray by its
    chord.  Material-frame contract: entry surface at z=0, beam along +z,
    sample z in [0, t]; the Plate's exit-frame coordinates are mapped back
    internally (oes/base.py TXM branch)."""
    import math
    import jax
    from xrt_tpu.oes import Plate
    from xrt_tpu.sources.geometric import GeometricSource
    water, gold = _mats()
    grid = np.zeros((8, 8, 8), np.uint8)
    grid[:, :, 4:] = 1  # material x > 0 is gold (axis order z,y,x)
    lim = {'x': (-1.0, 1.0), 'y': (-1.0, 1.0), 'z': (0.0, 0.1)}
    txm = TXMMaterial.create(indexGrid=grid, limits=lim,
                             materialsIndex=(water, gold))
    plate = Plate.create(center=(0, 1000.0, 0), pitch=math.pi / 2,
                         material=txm, t=0.1,
                         limPhysX=(-2, 2), limPhysY=(-2, 2))
    src = GeometricSource.create(nrays=1000, distx='flat', dx=1.6,
                                 distz='flat', dz=0.5,
                                 distxprime=None, distzprime=None,
                                 dxprime=0.0, dzprime=0.0,
                                 energies=(9000.0,), distE='lines')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, l1, l2 = plate.double_refract(beam)
    good = np.asarray(glo.state) == 1
    assert good.mean() > 0.9
    I = np.asarray(glo.Jss + glo.Jpp)
    x0 = np.asarray(beam.x)
    water_side = good & (x0 < -0.1)
    gold_side = good & (x0 > 0.1)
    assert water_side.sum() > 100 and gold_side.sum() > 100
    mu_w = float(np.asarray(water.get_absorption_coefficient(9000.0)))
    mu_g = float(np.asarray(gold.get_absorption_coefficient(9000.0)))
    T_w = np.exp(-mu_w * 0.1 * 0.1)  # t=0.1 mm = 0.01 cm
    T_g = np.exp(-mu_g * 0.1 * 0.1)
    assert np.allclose(I[water_side], T_w, rtol=1e-6)
    assert np.allclose(I[gold_side], T_g, rtol=1e-5)


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
