"""Grating and FZP tests: diffraction angle vs the grating equation and
zone-plate focusing."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import Grating, NormalFZP
import xrt_tpu.materials as xm
from xrt_tpu.physconsts import CH

E0 = 100.0   # eV (soft x-rays for a 300 l/mm grating)
P = 10000.0


def test_grating_equation():
    """sin(beta) = sin(alpha) - m rho lambda."""
    pitch = math.radians(5.0)
    rho = 300.0
    order = 1
    mat = xm.EmptyMaterial(kind='grating')
    gr = Grating.create(rho=rho, center=(0, P, 0), pitch=pitch,
                        material=mat, order=order,
                        limPhysX=(-20, 20), limPhysY=(-100, 100))
    src = GeometricSource.create(
        nrays=100, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, loc = gr.reflect(beam)
    good = np.asarray(glo.state) == 1
    assert good.all()
    # exit angle from the surface plane
    b = np.asarray(glo.b)[good][0]
    c = np.asarray(glo.c)[good][0]
    beta = math.atan2(c, b) - pitch  # angle above the grating surface
    lam = CH / E0 * 1e-7  # mm
    # grating equation with angles measured from the surface normal:
    # cos(alpha') = cos(alpha) ... xrt sign convention: sin(beta_out) =
    # sin(alpha_in) - m rho lambda with alpha from normal
    alpha = math.pi / 2 - pitch
    sinBeta = math.sin(alpha) - order * rho * lam
    beta_expected = math.pi / 2 - math.asin(sinBeta)
    np.testing.assert_allclose(beta, beta_expected, rtol=1e-6)
    # order recorded on the beam
    np.testing.assert_allclose(np.asarray(glo.order)[good], order)


def test_grating_multiple_orders_split():
    mat = xm.EmptyMaterial(kind='grating')
    gr = Grating.create(rho=300.0, center=(0, P, 0),
                        pitch=math.radians(5.0), material=mat,
                        order=(0, 1, 2), limPhysX=(-20, 20),
                        limPhysY=(-100, 100))
    src = GeometricSource.create(
        nrays=3000, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(1))
    glo, _ = gr.reflect(beam, key=jax.random.PRNGKey(7))
    orders = np.asarray(glo.order)
    counts = [np.sum(orders == m) for m in (0, 1, 2)]
    assert min(counts) > 700  # roughly uniform random order choice


def test_fzp_focuses():
    """A zone plate focuses a parallel beam to its focal distance."""
    f = 50.0
    E = 1000.0
    mat = xm.Material.create('Au', rho=19.3, kind='FZP')
    fzp = NormalFZP.create(f=f, E=E, N=500, center=(0, P, 0), pitch=0.0,
                           material=mat, order=1)
    # the FZP plane is x-y with optical axis z: point it along the beam
    # by pitch=pi/2 (surface normal along y)
    fzp = fzp.replace(pitch=jnp.asarray(math.pi / 2))
    rN = float(np.sqrt(500 * f * (CH / E * 1e-7)))
    src = GeometricSource.create(
        nrays=20000, distx='flat', dx=2 * rN * 0.9, distz='flat',
        dz=2 * rN * 0.9, distxprime=None, distzprime=None,
        dxprime=0.0, dzprime=0.0, distE='lines', energies=(E,),
        polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(3))
    glo, loc = fzp.reflect(beam, key=jax.random.PRNGKey(11))
    good = np.asarray(glo.state) == 1
    # about half of rays pass (transparent zones)
    assert 0.3 < good.mean() < 0.7
    screen = Screen.create(center=(0, P + f, 0))
    img = screen.expose(glo)
    x = np.asarray(img.x)[good]
    z = np.asarray(img.z)[good]
    r_rms = np.sqrt(x ** 2 + z ** 2).std()
    # focused spot much smaller than the FZP radius
    assert np.sqrt(x**2 + z**2).mean() < 0.1 * rN


def test_grating_tabulated_efficiency():
    """A grating material with tabulated per-order efficiency applies it as
    |amp|^2 per ray according to the sampled order."""
    import jax
    import jax.numpy as jnp
    mat = xm.Material.create('Au', rho=19.3, kind='grating',
                             efficiency=[(1, 0.36), (0, 0.04)])
    gr = Grating.create(rho=600.0, center=(0, P, 0), pitch=0.1,
                        material=mat, order=(0, 1),
                        limPhysX=(-20, 20), limPhysY=(-200, 200))
    src = GeometricSource.create(
        nrays=2000, dx=0.0, dz=0.0, distx=None, distz=None,
        distxprime=None, distzprime=None, dxprime=0.0, dzprime=0.0,
        distE='lines', energies=(E0,), polarization='horizontal')
    beam = src.shine(jax.random.PRNGKey(0))
    glo, _ = gr.reflect(beam, key=jax.random.PRNGKey(5))
    good = np.asarray(glo.state) == 1
    orders = np.asarray(glo.order)[good]
    I = np.asarray(glo.Jss + glo.Jpp)[good]
    assert np.allclose(I[orders == 1], 0.36, rtol=1e-6)
    assert np.allclose(I[orders == 0], 0.04, rtol=1e-6)


def test_grating_efficiency_energy_table(tmp_path):
    import jax
    # table: E, order0, order1 efficiencies
    tab = np.array([[8000.0, 0.10, 0.50], [10000.0, 0.30, 0.20]])
    f = str(tmp_path / 'eff.dat')
    np.savetxt(f, tab)
    mat = xm.Material.create('Au', rho=19.3, kind='grating',
                             efficiency=[(1, 2), (0, 1)], efficiencyFile=f)
    import jax.numpy as jnp
    ampS, ampP = mat.get_grating_efficiency(
        jnp.asarray([9000.0, 9000.0]), jnp.asarray([1.0, 0.0]))
    # linear interpolation at 9000: order1 -> 0.35, order0 -> 0.20
    assert np.allclose(np.asarray(ampS) ** 2, [0.35, 0.20], rtol=1e-12)


import pytest as _pytest  # noqa: E402
# full-physics module: excluded from the fast gate (`-m "not slow"`)
pytestmark = _pytest.mark.slow
