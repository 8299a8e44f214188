"""Catalog materials vs the reference-extracted data."""
import numpy as np
import jax.numpy as jnp
import pytest

from xrt_tpu.materials import catalogs
import xrt_tpu.materials as xm


def test_catalog_counts():
    assert len(catalogs.list_crystals()) == 38
    assert len(catalogs.list_elemental()) == 92
    assert len(catalogs.list_compounds()) == 76


def test_catalog_crystal_ge():
    ge = catalogs.crystal('Ge', hkl=(1, 1, 1))
    # Ge diamond lattice a=5.6578 -> d111 = a/sqrt(3)
    np.testing.assert_allclose(float(ge.d), 5.6578 / np.sqrt(3), rtol=2e-3)
    E = jnp.asarray([10000.0])
    theta = ge.get_Bragg_angle(E) - ge.get_dtheta(E)
    rs, rp = ge.get_amplitude(E, -jnp.sin(theta))
    assert 0.5 < float(jnp.abs(rs[0]) ** 2) <= 1.0


def test_catalog_elemental_matches_direct():
    au_cat = catalogs.elemental('Au', kind='mirror')
    au_dir = xm.Material.create('Au', rho=au_cat.rho, kind='mirror',
                                table=au_cat.table)
    E = jnp.linspace(1000, 20000, 20)
    rs1 = au_cat.get_amplitude(E, 5e-3)[0]
    rs2 = au_dir.get_amplitude(E, 5e-3)[0]
    np.testing.assert_allclose(rs1, rs2, rtol=1e-12)


def test_catalog_compound():
    names = catalogs.list_compounds()
    assert len(names) > 0
    mat = catalogs.compound(names[0], kind='plate')
    E = jnp.asarray([9000.0])
    n = mat.get_refractive_index(E)
    assert 0.9 < float(n.real[0]) < 1.0


def test_catalog_attribute_namespaces():
    from xrt_tpu.materials.catalogs import crystals, elements, compounds
    si = crystals.Si(hkl=(1, 1, 1))
    assert abs(float(si.d) - 3.1354) < 1e-3
    au = elements.Au(kind='mirror')
    assert abs(float(au.rho) - 19.32) < 0.1
    assert 'Si' in dir(crystals)
    import pytest
    with pytest.raises(AttributeError):
        crystals.NotACrystal
