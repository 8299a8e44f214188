"""Generate golden material/crystal/multilayer curves from the reference xrt
implementation (pure numpy) for regression tests of xrt_tpu.

Run once with:  PYTHONPATH=/root/reference python tools/make_golden_materials.py
Outputs tests/golden/ref_materials.npz (arrays only — no code is reused).
"""
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing.materials as rm  # noqa: E402

out = {}

# ---- Fresnel mirror reflectivities vs E at fixed grazing angle ----------
E = np.logspace(1. + math.log10(3.), 4. + math.log10(5.), 500)
out['fresnel_E'] = E
for name, mat, theta in [
        ('Si05', rm.Material('Si', rho=2.33), math.radians(0.5)),
        ('Pt4mrad', rm.Material('Pt', rho=21.45), 4e-3),
        ('SiO205', rm.Material(('Si', 'O'), quantities=(1, 2), rho=2.2),
         math.radians(0.5)),
        ('Rh2mrad', rm.Material('Rh', rho=12.41), 2e-3)]:
    rs, rp = mat.get_amplitude(E, math.sin(theta))[0:2]
    out[f'fresnel_{name}_rs'] = rs
    out[f'fresnel_{name}_rp'] = rp

# ---- thin-mirror (slab) reflectivity vs angle at fixed E ----------------
theta_deg = np.linspace(0, 10, 500)
layerW = rm.Material('W', kind='thin mirror', rho=19.3, t=2.5e-6)
rs, rp = layerW.get_amplitude(1e4 * np.ones_like(theta_deg),
                              np.sin(np.deg2rad(theta_deg)))[0:2]
out['slabW_theta_deg'] = theta_deg
out['slabW_rs'] = rs
out['slabW_rp'] = rp

# ---- plate transmittivity -----------------------------------------------
diam = rm.Material('C', rho=3.52, kind='plate')
ts, tp = diam.get_amplitude(E, math.sin(math.radians(30.)))[0:2]
out['plateC_ts'] = ts
out['plateC_tp'] = tp
out['plateC_mu'] = diam.get_absorption_coefficient(E)
out['plateC_n'] = diam.get_refractive_index(E)

# ---- crystal rocking curves ---------------------------------------------
E0 = 10000.


def rocking(hklInd, dSpacing, t, geom, alphaDeg, dtheta):
    cr = rm.CrystalDiamond(hklInd, dSpacing, t=t, geom=geom)
    thetaCenter = math.asin(rm.ch / (2 * cr.d * E0))
    theta = dtheta + thetaCenter
    alpha = math.radians(alphaDeg)
    s0 = (np.zeros_like(theta), np.cos(theta + alpha),
          -np.sin(theta + alpha))
    sh = (np.zeros_like(theta), np.cos(theta - alpha),
          np.sin(theta - alpha))
    if geom.startswith('Bragg'):
        n = (0, 0, 1)
    else:
        n = (0, -1, 0)
    hn = (0, math.sin(alpha), math.cos(alpha))
    gamma0 = sum(i * j for i, j in zip(n, s0))
    gammah = sum(i * j for i, j in zip(n, sh))
    hns0 = sum(i * j for i, j in zip(hn, s0))
    curS, curP = cr.get_amplitude(np.ones_like(dtheta) * E0, gamma0, gammah,
                                  hns0)
    return curS, curP


dth_b = np.linspace(0, 100, 400) * 1e-6
dth_l = np.linspace(-50, 50, 400) * 1e-6
cases = [
    ('braggSi111_thick_0', (1, 1, 1), 3.13562, None, 'Bragg reflected', 0.,
     dth_b),
    ('braggSi111_thick_5', (1, 1, 1), 3.13562, None, 'Bragg reflected', 5.,
     dth_b),
    ('braggSi111_thick_m5', (1, 1, 1), 3.13562, None, 'Bragg reflected', -5.,
     dth_b),
    ('braggSi111_100mum_0', (1, 1, 1), 3.13562, 0.100, 'Bragg reflected', 0.,
     dth_b),
    ('braggSi111_007mum_0', (1, 1, 1), 3.13562, 0.007, 'Bragg reflected', 0.,
     dth_b),
    ('laueSi111_100mum_0', (1, 1, 1), 3.13562, 0.100, 'Laue reflected', 0.,
     dth_l),
    ('laueSi111_100mum_5', (1, 1, 1), 3.13562, 0.100, 'Laue reflected', 5.,
     dth_l),
    ('braggtSi111_100mum_0', (1, 1, 1), 3.13562, 0.100, 'Bragg transmitted',
     0., dth_b),
    ('lauetSi111_100mum_0', (1, 1, 1), 3.13562, 0.100, 'Laue transmitted',
     0., dth_l),
    ('braggSi333_thick_0', (3, 3, 3), 3.13562 / 3, None, 'Bragg reflected',
     0., np.linspace(0, 30, 400) * 1e-6),
]
for name, hklInd, dsp, t, geom, alphaDeg, dth in cases:
    curS, curP = rocking(hklInd, dsp, t, geom, alphaDeg, dth)
    out[f'rc_{name}_dtheta'] = dth
    out[f'rc_{name}_s'] = curS
    out[f'rc_{name}_p'] = curP

# ---- CrystalSi / CrystalFromCell structure factors ----------------------
siT = rm.CrystalSi(hkl=(1, 1, 1), tK=297.15)
out['crystalSi_d'] = siT.d
Es = np.linspace(2000, 30000, 50)
F0, Fhkl, Fhkl_ = siT.get_structure_factor(Es, 0.5 / siT.d)
out['crystalSi_F0'] = F0
out['crystalSi_Fhkl'] = Fhkl
out['crystalSi_E'] = Es
out['crystalSi_darwin_s'] = siT.get_Darwin_width(Es)
out['crystalSi_thetaB'] = siT.get_Bragg_angle(Es)
out['crystalSi_dtheta'] = siT.get_dtheta(Es, alpha=math.radians(5.))

xtalQu = rm.CrystalFromCell(
    'alphaQuartz', (1, 0, 2), a=4.91304, c=5.40463, gamma=120,
    atoms=[14] * 3 + [8] * 6,
    atomsXYZ=[[0.4697, 0., 0.], [-0.4697, -0.4697, 1. / 3],
              [0., 0.4697, 2. / 3], [0.4125, 0.2662, 0.1188],
              [-0.1463, -0.4125, 0.4521], [-0.2662, 0.1463, -0.2145],
              [0.1463, -0.2662, -0.1188], [-0.4125, -0.1463, 0.2145],
              [0.2662, 0.4125, 0.5479]])
out['quartz_d'] = xtalQu.d
out['quartz_V'] = xtalQu.V
F0q, Fhklq, Fhklq_ = xtalQu.get_structure_factor(Es, 0.5 / xtalQu.d)
out['quartz_F0'] = F0q
out['quartz_Fhkl'] = Fhklq
out['quartz_Fhkl_'] = Fhklq_

# ---- mosaic crystal ------------------------------------------------------
graphite = rm.CrystalFromCell(
    'graphite', (0, 0, 2), a=2.456, c=6.696, gamma=120,
    atoms=[6] * 4, atomsXYZ=[[0., 0., 0.], [0., 0., 0.5],
                             [1. / 3, 2. / 3, 0.], [2. / 3, 1. / 3, 0.5]],
    mosaicity=np.radians(0.4))
thetaB = float(graphite.get_Bragg_angle(E0))
dth = np.linspace(-3e-2, 3e-2, 201)
ms, mp = graphite.get_amplitude_mosaic(
    np.ones_like(dth) * E0, -np.sin(thetaB + dth), None, None)
out['mosaic_dtheta'] = dth
out['mosaic_s'] = ms
out['mosaic_p'] = mp

# ---- multilayers ---------------------------------------------------------
theta_ml = np.linspace(0, 1.6, 801)
EML = np.ones_like(theta_ml) * 8050.
mSi = rm.Material('Si', rho=2.33)
mW = rm.Material('W', rho=19.3)
mL = rm.Multilayer(mSi, 27, mW, 18, 40, mSi)
rs, rp = mL.get_amplitude(EML, np.sin(np.deg2rad(theta_ml)))[0:2]
out['mlWSi_theta_deg'] = theta_ml
out['mlWSi_rs'] = rs
out['mlWSi_rp'] = rp

# graded
mLg = rm.Multilayer(mSi, 45, mW, 27, 100, mSi, tThicknessLow=9,
                    bThicknessLow=5.4)
rs, rp = mLg.get_amplitude(EML, np.sin(np.deg2rad(theta_ml)))[0:2]
out['mlWSigraded_rs'] = rs
out['mlWSigraded_rp'] = rp

# transmission multilayer (free-standing, no substrate)
mSc = rm.Material('Sc', rho=2.98, table='Chantler')
mCr = rm.Material('Cr', rho=7.18, table='Chantler')
mLt = rm.Multilayer(tLayer=mSc, tThickness=15.48, bLayer=mCr,
                    bThickness=15.72, nPairs=100, geom='transmitted')
E_t = np.ones(801) * 398.0
th_t = np.linspace(30, 70, 801)
ts, tp = mLt.get_amplitude(E_t, np.sin(np.deg2rad(th_t)))[0:2]
out['mltScCr_theta_deg'] = th_t
out['mltScCr_ts'] = ts
out['mltScCr_tp'] = tp

# coated mirror
cRh = rm.Coated(coating=mW, cThickness=300, substrate=mSi,
                surfaceRoughness=0, substRoughness=0)
rs, rp = cRh.get_amplitude(EML, np.sin(np.deg2rad(theta_ml)))[0:2]
out['coatedW_rs'] = rs
out['coatedW_rp'] = rp

dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_materials.npz')
np.savez_compressed(os.path.abspath(dest), **out)
print('wrote', os.path.abspath(dest), 'with', len(out), 'arrays')
