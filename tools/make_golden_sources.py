"""Golden source-intensity maps from the reference xrt (pure numpy).
Run: python tools/make_golden_sources.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing as raycing  # noqa: E402
import xrt.backends.raycing.sources as rs  # noqa: E402

out = {}
bl = raycing.BeamLine()

# Bending magnet, ESRF-like
bm = rs.BendingMagnet(bl=bl, name='bm', nrays=100, eE=6.0, eI=0.2, B0=0.85,
                      eMin=10000, eMax=60000, xPrimeMax=1.0, zPrimeMax=0.3)
E, theta, psi = np.meshgrid(np.linspace(10000, 60000, 11),
                            np.linspace(-1e-3, 1e-3, 7),
                            np.linspace(-3e-4, 3e-4, 9), indexing='ij')
I, Es, Ep = bm.build_I_map(E.ravel(), theta.ravel(), psi.ravel())
out['bm_E'] = E.ravel()
out['bm_theta'] = theta.ravel()
out['bm_psi'] = psi.ravel()
out['bm_I'] = I
out['bm_Es'] = Es
out['bm_Ep'] = Ep

# Wiggler
wig = rs.Wiggler(bl=bl, name='wig', nrays=100, eE=3.0, eI=0.5, K=13.0, period=150.,
                 n=10, eMin=1000, eMax=30000, xPrimeMax=1.0, zPrimeMax=0.3)
Ew, thw, psw = np.meshgrid(np.linspace(1000, 30000, 11),
                           np.linspace(-1e-3, 1e-3, 7),
                           np.linspace(-3e-4, 3e-4, 9), indexing='ij')
Iw, Esw, Epw = wig.build_I_map(Ew.ravel(), thw.ravel(), psw.ravel())
out['wig_E'] = Ew.ravel()
out['wig_theta'] = thw.ravel()
out['wig_psi'] = psw.ravel()
out['wig_I'] = Iw
out['wig_Es'] = Esw
out['wig_Ep'] = Epw
out['wig_K'] = wig.K
out['wig_B'] = wig.B
out['wig_X0'] = wig.X0
out['wig_dx'] = wig.dx
out['wig_dz'] = wig.dz
out['wig_dxprime'] = wig.dxprime
out['wig_dzprime'] = wig.dzprime
out['bm_dx'] = bm.dx
out['bm_dz'] = bm.dz
out['bm_dxprime'] = bm.dxprime
out['bm_dzprime'] = bm.dzprime
out['bm_gamma'] = bm.gamma
out['bm_ro'] = bm.ro

dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_sources.npz')
np.savez_compressed(os.path.abspath(dest), **out)
print('wrote', os.path.abspath(dest))

# ---- Undulator far-field / taper / near-field maps ----------------------
und = rs.Undulator(bl=bl, name='und', nrays=100, eE=6.0, eI=0.1,
                   eEpsilonX=0., eEpsilonZ=0., period=33., n=50, K=1.5,
                   eMin=9000, eMax=9600, xPrimeMax=0.02, zPrimeMax=0.02,
                   gNodes=400, gIntervals=2, targetOpenCL=None)
Eu, thu, psu = np.meshgrid(np.linspace(9000, 9600, 7),
                           np.linspace(-2e-5, 2e-5, 5),
                           np.linspace(-2e-5, 2e-5, 5), indexing='ij')
Iu, Esu, Epu = und.build_I_map(Eu.ravel(), thu.ravel(), psu.ravel())
out2 = {}
out2['und_E'] = Eu.ravel(); out2['und_theta'] = thu.ravel()
out2['und_psi'] = psu.ravel()
out2['und_I'] = Iu; out2['und_Es'] = Esu; out2['und_Ep'] = Epu
out2['und_E1'] = und.E1
out2['und_sigma_r02'] = und.get_sigma_r02(Eu.ravel()[:5])
out2['und_sigmaP_r02'] = und.get_sigmaP_r02(Eu.ravel()[:5])

# tapered
undt = rs.Undulator(bl=bl, name='undt', nrays=100, eE=6.0, eI=0.1,
                    eEpsilonX=0., eEpsilonZ=0., period=33., n=10, K=1.5,
                    eMin=9000, eMax=9600, xPrimeMax=0.02, zPrimeMax=0.02,
                    gNodes=120, gIntervals=2, targetOpenCL=None,
                    taper=(1.09, 11.))
Iut, Esut, Eput = undt.build_I_map(Eu.ravel(), thu.ravel(), psu.ravel())
out2['undt_I'] = Iut; out2['undt_Es'] = Esut; out2['undt_Ep'] = Eput
out2['undt_taperVal'] = undt._taperVal

# near field
undn = rs.Undulator(bl=bl, name='undn', nrays=100, eE=6.0, eI=0.1,
                    eEpsilonX=0., eEpsilonZ=0., period=33., n=10, K=1.5,
                    eMin=9000, eMax=9600, xPrimeMax=0.02, zPrimeMax=0.02,
                    gNodes=120, gIntervals=2, targetOpenCL=None, R0=5000.)
Iun, Esun, Epun = undn.build_I_map(Eu.ravel(), thu.ravel(), psu.ravel())
out2['undn_I'] = Iun; out2['undn_Es'] = Esun; out2['undn_Ep'] = Epun

# elliptic with phase
unde = rs.Undulator(bl=bl, name='unde', nrays=100, eE=6.0, eI=0.1,
                    eEpsilonX=0., eEpsilonZ=0., period=33., n=50,
                    Kx=1.0, Ky=1.2, phaseDeg=30., eMin=4000, eMax=4500,
                    xPrimeMax=0.02, zPrimeMax=0.02,
                    gNodes=400, gIntervals=2, targetOpenCL=None)
Iue, Esue, Epue = unde.build_I_map(Eu.ravel()*0.5, thu.ravel(), psu.ravel())
out2['unde_I'] = Iue; out2['unde_Es'] = Esue; out2['unde_Ep'] = Epue

dest2 = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                     'ref_undulator.npz')
np.savez_compressed(os.path.abspath(dest2), **out2)
print('wrote', os.path.abspath(dest2))

# ---- SourceFromField (periodic test field), via the _sp path (<=10 rays;
# the _sp_sum path at >10 rays has a swapped filament conditional upstream)
from xrt.backends.raycing.physconsts import K2B
K_, L0_, Np_ = 4.4, 53.96, 41
zg_ = np.linspace(-L0_*Np_*0.5, L0_*Np_*0.5, 1000*Np_)
fieldData = np.vstack([zg_, K2B*K_/L0_*np.sin(2*np.pi*zg_/L0_)]).T
sff = rs.SourceFromField(bl=bl, name='sff', nrays=100, eE=6.0, eI=0.1,
                         eEpsilonX=0., eEpsilonZ=0.,
                         customField=fieldData,
                         eMin=5000, eMax=6500, xPrimeMax=0.05,
                         zPrimeMax=0.05,
                         gNodes=3000, gIntervals=2, targetOpenCL=None)
out3 = {}
Ef = np.linspace(5000, 6500, 8)
thf = np.array([0., 1e-5, -2e-5, 0., 1e-5, -1e-5, 2e-5, 0.])
psf = np.array([0., -1e-5, 1e-5, 2e-5, 0., 1e-5, -2e-5, 1e-5])
# evaluate one at a time to stay on the _sp path with dim=1
Isf = []; Essf = []; Epsf = []
for i in range(8):
    I, Es_, Ep_ = sff.build_I_map(np.array([Ef[i]]), np.array([thf[i]]),
                                  np.array([psf[i]]))
    Isf.append(I[0]); Essf.append(Es_[0]); Epsf.append(Ep_[0])
out3['sff_E'] = Ef; out3['sff_theta'] = thf; out3['sff_psi'] = psf
out3['sff_I'] = np.array(Isf)
out3['sff_Es'] = np.array(Essf)
out3['sff_Ep'] = np.array(Epsf)
out3['sff_deviceLength'] = sff.deviceLength
dest3 = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                     'ref_customfield.npz')
np.savez_compressed(os.path.abspath(dest3), **out3)
print('wrote', os.path.abspath(dest3))

# ---- SourceFromField near field (R0 set): the reference _sp R0 branch
# (synchr.py:811-846) — golden for the xrt_tpu near-field mode
sff.R0 = 5000.0   # mm, beyond the field span (+-1107 mm)
Isf = []; Essf = []; Epsf = []
for i in range(8):
    I, Es_, Ep_ = sff.build_I_map(np.array([Ef[i]]), np.array([thf[i]]),
                                  np.array([psf[i]]))
    Isf.append(I[0]); Essf.append(Es_[0]); Epsf.append(Ep_[0])
out4 = {'sff_E': Ef, 'sff_theta': thf, 'sff_psi': psf,
        'sff_I': np.array(Isf), 'sff_Es': np.array(Essf),
        'sff_Ep': np.array(Epsf), 'R0': 5000.0}
dest4 = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                     'ref_customfield_nf.npz')
np.savez_compressed(os.path.abspath(dest4), **out4)
print('wrote', os.path.abspath(dest4))
