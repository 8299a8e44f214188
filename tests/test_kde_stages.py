"""KDE, positioning stages, dummy backend."""
import math

import numpy as np
import pytest

from xrt_tpu.kde import GaussianKDE
from xrt_tpu.stages import Tripod, OneXStage, TwoXStages
from xrt_tpu import dummy


def test_kde_matches_scipy_unweighted():
    from scipy.stats import gaussian_kde
    rng = np.random.default_rng(0)
    data = rng.normal(size=300)
    pts = np.linspace(-3, 3, 41)
    ours = np.asarray(GaussianKDE(data)(pts))
    ref = gaussian_kde(data)(pts)
    assert np.allclose(ours, ref, rtol=1e-6)


def test_kde_matches_scipy_2d_silverman():
    from scipy.stats import gaussian_kde
    rng = np.random.default_rng(1)
    data = rng.normal(size=(2, 200))
    pts = rng.normal(size=(2, 30))
    ours = np.asarray(GaussianKDE(data, bw_method='silverman')(pts))
    ref = gaussian_kde(data, bw_method='silverman')(pts)
    assert np.allclose(ours, ref, rtol=1e-6)


def test_kde_weighted_reduces_to_subset():
    # weight-0 points must not contribute; weight-1 points reproduce the
    # unweighted KDE over the kept subset (same neff => same bandwidth)
    rng = np.random.default_rng(2)
    data = rng.normal(size=100)
    w = np.zeros(100)
    w[:60] = 1.0
    pts = np.linspace(-2, 2, 21)
    a = np.asarray(GaussianKDE(data, weights=w)(pts))
    b = np.asarray(GaussianKDE(data[:60])(pts))
    assert np.allclose(a, b, rtol=1e-6)


def test_kde_scalar_bandwidth_and_integral():
    rng = np.random.default_rng(3)
    data = rng.normal(size=500)
    pts = np.linspace(-8, 8, 801)
    pdf = np.asarray(GaussianKDE(data, bw_method=0.3)(pts))
    assert abs(np.trapezoid(pdf, pts) - 1.0) < 1e-3


def test_tripod_roundtrip():
    jacks = [[-200.0, -300.0, 0.0], [200.0, -300.0, 0.0], [0.0, 350.0, 0.0]]
    center = [10.0, 20.0, 1400.0]
    t = Tripod(*[list(j) for j in jacks], center=list(center), height=1400.0)
    pitch0, roll0 = 4e-3, 1.5e-3
    t.set_jacks(pitch=pitch0, roll=roll0)
    # feed the resulting jack z's into get_orientation and recover the pose
    pitch, roll, z = t.get_orientation()
    # the forward/inverse formulas agree to second order in the angles
    # (residual ~ pitch*roll^2/2), same as the reference pair
    assert abs(pitch - pitch0) < 1e-7
    assert abs(roll - roll0) < 1e-7
    assert abs(z - center[2]) < 1e-5


def test_tripod_flat_is_nominal():
    jacks = [[-100.0, -100.0, 0.0], [100.0, -100.0, 0.0], [0.0, 100.0, 0.0]]
    t = Tripod(*jacks, center=[0.0, 0.0, 1000.0], height=1000.0)
    c1, c2, c3 = t.set_jacks(pitch=0.0, roll=0.0)
    # horizontal state: all jacks at z=0, calib readouts equal the offset sum
    assert abs(t.jack1[2]) < 1e-12 and abs(t.jack3[2]) < 1e-12
    assert c1 == c2 == c3


def test_one_x_stage_select_surface():
    s = OneXStage(surface=('Si', 'Rh', 'Pt'),
                  limPhysX=([-30, -10, 10], [-10, 10, 30]))
    dx = s.select_surface('Pt')
    assert dx == -20.0
    assert s.curSurface == 2


def test_two_x_stages_roundtrip():
    st = TwoXStages(tx1=[0.0, -250.0], tx2=[0.0, 250.0], dx=3.0)
    yaw0 = 2e-3
    st.set_x_stages(yaw=yaw0)
    dx, yaw = st.get_orientation()
    assert abs(dx - 3.0) < 1e-12
    assert abs(yaw - yaw0) < 1e-12


def test_dummy_backend():
    x, y, I, e, n = dummy.run_process(1000)
    assert x.shape == (1000,) and y.shape == (1000,)
    assert float(I.sum()) == 1000
    assert np.allclose(np.asarray(e), np.asarray(x) + 2 * np.asarray(y) + 5000)


def test_mirror_on_tripod_with_two_x_stages():
    from xrt_tpu.oes import MirrorOnTripodWithTwoXStages, BentFlatMirror
    jacks = [[-200.0, -300.0, 0.0], [200.0, -300.0, 0.0], [0.0, 350.0, 0.0]]
    center = [0.0, 20000.0, 1400.0]
    pitch0, roll0, yaw0, dx0 = 4e-3, 1.2e-3, 2e-3, 3.0
    # drive the supports to the wanted pose
    t = Tripod(*[list(j) for j in jacks], center=list(center), height=1400.0)
    t.set_jacks(pitch=pitch0, roll=roll0)
    st = TwoXStages(tx1=[0.0, -250.0], tx2=[0.0, 250.0], dx=dx0)
    st.set_x_stages(yaw=yaw0)
    # the factory reads the same motor positions back into an OE pose
    oe = MirrorOnTripodWithTwoXStages(
        BentFlatMirror, jack1=t.jack1, jack2=t.jack2, jack3=t.jack3,
        tx1=st.tx1, tx2=st.tx2, center=center, height=1400.0, R=1e6)
    assert abs(float(oe.pitch) - pitch0) < 1e-7
    assert abs(float(oe.roll) - roll0) < 1e-7
    assert abs(float(oe.yaw) - yaw0) < 1e-10
    assert abs(float(oe.center[0]) - dx0) < 1e-10
    assert abs(float(oe.center[2]) - center[2]) < 1e-5


def test_dcm_on_tripod_with_one_x_stage():
    from xrt_tpu.oes import DCMOnTripodWithOneXStage
    import xrt_tpu.materials as xm
    jacks = [[-100.0, -100.0, 0.0], [100.0, -100.0, 0.0], [0.0, 100.0, 0.0]]
    center = [0.0, 30000.0, 1000.0]
    t = Tripod(*[list(j) for j in jacks], center=list(center), height=1000.0)
    t.set_jacks(pitch=0.0, roll=0.0)
    cr = xm.CrystalSi.create(hkl=(1, 1, 1))
    dcm = DCMOnTripodWithOneXStage(
        jack1=t.jack1, jack2=t.jack2, jack3=t.jack3, dx=2.5,
        center=center, height=1000.0, material=cr, alignE=9000.0,
        fixedOffset=20.0)
    assert abs(float(dcm.center[0]) - 2.5) < 1e-12
    assert abs(float(dcm.center[2]) - 1000.0) < 1e-6
    assert float(dcm.braggAngle) > 0.2
