"""The `python -m xrt_tpu calc` x-ray calculator (the capability of the
reference's examples/withRaycing/00_xRayCalculator scripts): CSV curves
with physically-checked values."""
import io
import math
import contextlib

import numpy as np

from xrt_tpu.__main__ import main


def run_calc(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(['calc'] + args)
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l]
    header, rows = lines[0], lines[1:]
    data = np.asarray([[float(v) for v in r.split(',')] for r in rows])
    return header, data


def test_reflectivity_critical_angle():
    _, d = run_calc(['reflectivity', '--material', 'Rh', '--rho', '12.41',
                     '--E', '9000', '--theta', '1:10:40'])
    theta, Rs, Rp = d[:, 0], d[:, 1], d[:, 2]
    # total external reflection below the Rh critical angle (~5.6 mrad at
    # 9 keV), sharp drop above
    assert Rs[theta < 3].min() > 0.9
    assert Rs[theta > 9].max() < 0.1
    assert (np.abs(Rs - Rp) < 0.01).all()   # tiny s/p split at grazing


def test_transmission_beer_lambert():
    _, d = run_calc(['transmission', '--material', 'C', '--rho', '3.52',
                     '--t', '0.1', '--E', '5000:20000:4'])
    T = d[:, 1]
    assert (np.diff(T) > 0).all()           # more transparent at higher E
    assert 0.4 < T[0] < 0.6 and T[-1] > 0.97


def test_index_delta_beta():
    _, d = run_calc(['index', '--material', 'Be', '--rho', '1.848',
                     '--E', '9000'])
    E, delta, beta, mu = d[0]
    np.testing.assert_allclose(delta, 4.2e-6, rtol=0.05)
    assert 0 < beta < 1e-8
    np.testing.assert_allclose(mu, 1.45, rtol=0.05)   # 1/cm


def test_rocking_curve_darwin_plateau():
    _, d = run_calc(['rocking', '--material', 'Si', '--hkl', '111',
                     '--E', '9000', '--dtheta=-20:60:81'])
    dth, Rs = d[:, 0], d[:, 1]
    # the Darwin plateau sits above the kinematic angle by the refraction
    # shift (~30 urad for Si111 at 9 keV) with near-total reflectivity
    assert Rs.max() > 0.9
    peak = dth[np.argmax(Rs)]
    assert 10 < peak < 50
    # plateau width (Darwin width ~ 20-30 urad here)
    width = (Rs > 0.5).sum() * (dth[1] - dth[0])
    assert 15 < width < 60


def test_rocking_scan_sweep(tmp_path):
    """xrtBentXtal-style sweep: overlaid flat/bent rocking curves in one
    CLI call with PNG output (reference gui/xrtBentXtal.py:3-27)."""
    png = str(tmp_path / 'sweep.png')
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(['calc', 'rocking', '--material', 'Si', '--hkl', '111',
                   '--E', '9000', '--tc', '0.1',
                   '--scan', 'R=inf,2000,500',
                   '--dtheta=-50:150:120', '--save', png])
    assert rc == 0
    out = buf.getvalue()
    headers = [l for l in out.splitlines() if l.startswith('#') and
               'FWHM' in l]
    assert len(headers) == 3
    import re
    fwhms = [float(re.search(r'FWHM=([0-9.e+-]+)', h).group(1))
             for h in headers]
    # bending broadens the curve monotonically: flat < R=2000 < R=500
    assert fwhms[0] < fwhms[1] < fwhms[2]
    import os
    assert os.path.exists(png) and os.path.getsize(png) > 10000
