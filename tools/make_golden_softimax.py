"""Golden SoftiMAX wave chain from the reference implementation.

Drives the reference's own speed-test-3 beamline
(examples/withRaycing/14_SoftiMAX/Softi_CXIw2D.py via
tests/speed/3_Softi_CXIw2D_speed.py) at a reduced sample count with the
numpy (non-OpenCL) Kirchhoff path, and records per-stage local fields so
tests/test_softimax_chain.py can pin our tools/bench_softimax.py port
stage by stage: undulator filament wave at the FE slit -> M1 -> M2 -> PG
-> M3 -> exit slit -> M4 -> M5 -> focal image.

Writes tests/golden/ref_softimax.npz.
"""
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.environ.get('XRT_REF', '/root/reference'))
import xrt.backends.raycing as raycing  # noqa
import xrt.backends.raycing.apertures as rap  # noqa
import xrt.backends.raycing.materials as rm  # noqa
import xrt.backends.raycing.oes as roe  # noqa
import xrt.backends.raycing.screens as rsc  # noqa
import xrt.backends.raycing.sources as rs  # noqa
import xrt.backends.raycing.waves as rw  # noqa

E0 = 280.0
dE = 0.5
acceptanceHor = 2.2e-4
acceptanceVer = 4.2e-4
pFE = 19250.0
pM1 = 24000.0
pPG = 2000.0
pM3 = 2800.0
qM3mer = 12000.0
qM3sag = 12000.0
dM4ES = 2200.0
dM45 = 3200.0
pExp = 1800.0
pitch = math.radians(1.0)
cff = 1.6
fixedExit = 20.0
rho = 300.0
blaze = math.radians(0.6)
ESdX = 2.0
ESdZ = 0.1
NRAYS = int(os.environ.get('SOFTIMAX_GOLDEN_N', 2000))
NSCR = 16

np.random.seed(0)

mAu = rm.Material('Au', rho=19.32)


def align_grating(E, m, cff):
    order = abs(m) if cff > 1 else -abs(m)
    f1 = cff ** 2 + 1
    f2 = cff ** 2 - 1
    ml_d = order * rho * rm.ch / E * 1e-7
    cosAlpha = np.sqrt(-ml_d ** 2 * f1 + 2 * abs(ml_d) *
                       np.sqrt(f2 ** 2 + cff ** 2 * ml_d ** 2)) / abs(f2)
    cosBeta = cff * cosAlpha
    return np.arccos(cosAlpha), -np.arccos(cosBeta)


bl = raycing.BeamLine(azimuth=-2 * pitch, height=0)
bl.source = rs.Undulator(
    bl, 'Softi53', nrays=NRAYS, eE=3.0, eI=0.5, eEspread=0.0,
    eEpsilonX=0.0, eEpsilonZ=0.0, betaX=9.0, betaZ=2.0,
    period=48.0, n=77, targetE=(E0, 1),
    eMin=E0 - dE, eMax=E0 + dE,
    xPrimeMax=acceptanceHor / 2 * 1e3, zPrimeMax=acceptanceVer / 2 * 1e3,
    xPrimeMaxAutoReduce=False, zPrimeMaxAutoReduce=False,
    uniformRayDensity=True, filamentBeam=True)
opening = [-acceptanceHor * pFE / 2, acceptanceHor * pFE / 2,
           -acceptanceVer * pFE / 2, acceptanceVer * pFE / 2]
bl.slitFE = rap.RectangularAperture(
    bl, 'FE slit', kind=['left', 'right', 'bottom', 'top'],
    opening=opening)
bl.m1 = roe.ToroidMirror(bl, 'M1', material=(mAu,), limPhysX=(-5, 5),
                         limPhysY=(-150, 150), positionRoll=np.pi / 2,
                         R=1e22)


class _Grating(roe.BlazedGrating):
    pass


bl.pg = roe.BlazedGrating(bl, 'PG', material=mAu, blaze=blaze, rho=rho,
                          positionRoll=np.pi, limPhysX=(-2, 2),
                          limPhysY=(-40, 40))
bl.pg.order = 1
bl.m2 = roe.OE(bl, 'M2', material=(mAu,), limPhysX=(-5, 5),
               limPhysY=(-225, 225))
bl.m3 = roe.ToroidMirror(bl, 'M3', material=(mAu,),
                         positionRoll=-np.pi / 2, limPhysX=(-10, 10),
                         limPhysY=(-100, 100))
bl.exitSlit = rap.RectangularAperture(
    bl, 'ES', opening=[-ESdX / 2, ESdX / 2, -ESdZ / 2, ESdZ / 2])
bl.m4 = roe.EllipticalMirrorParam(
    bl, 'M4', material=(mAu,), positionRoll=np.pi / 2, pitch=pitch,
    isCylindrical=True, p=43000.0, q=dM45 + pExp,
    limPhysX=(-0.5, 0.5), limPhysY=(-70, 70))
bl.m5 = roe.EllipticalMirrorParam(
    bl, 'M5', material=(mAu,), yaw=-2 * pitch, pitch=pitch,
    isCylindrical=True, p=dM4ES + dM45, q=pExp,
    limPhysX=(-0.5, 0.5), limPhysY=(-40, 40))
bl.fsmExp = rsc.Screen(bl, 'FSM-Exp')

# --- alignment (reference align_beamline) ---
bl.source.center = pM1 * np.sin(2 * pitch), -pM1 * np.cos(2 * pitch), 0
bl.slitFE.center = (pM1 - pFE) * np.sin(2 * pitch), \
    -(pM1 - pFE) * np.cos(2 * pitch), 0
rM1 = 2.0 * pM1 * np.sin(pitch)
bl.m1.center = 0, 0, 0
bl.m1.pitch = pitch
bl.m1.r = rM1
alpha, beta = align_grating(E0, 1, cff)
includedAngle = alpha - beta
t = -fixedExit / np.tan(includedAngle)
bl.m2.pitch = (np.pi - includedAngle) / 2
bl.m2.center = 0, pPG - t, 0
bl.m2.yaw = -2 * bl.m1.pitch
bl.pg.pitch = -(beta + np.pi / 2)
bl.pg.center = 0, pPG, fixedExit
bl.pg.yaw = -2 * bl.m1.pitch
drho = bl.pg.get_grating_area_fraction()
bl.pg.areaFraction = drho
rM3 = 2.0 * np.sin(pitch) * qM3sag
bl.m3.center = [0, pPG + pM3, fixedExit]
bl.m3.pitch = -pitch
bl.m3.r = rM3
bl.m3.R = 1e22
bl.exitSlit.center = -qM3sag * np.sin(2 * pitch), \
    bl.m3.center[1] + qM3sag * np.cos(2 * pitch), fixedExit
bl.m4.center = -(qM3sag + dM4ES) * np.sin(2 * pitch), \
    bl.m3.center[1] + (qM3sag + dM4ES) * np.cos(2 * pitch), fixedExit
bl.m5.center = bl.m4.center[0], bl.m4.center[1] + dM45, fixedExit
bl.fsmExp.center = [
    bl.m4.center[0] + (dM45 + pExp) * np.sin(0.0),
    bl.m4.center[1] + (dM45 + pExp) * np.cos(0.0),
    bl.m4.center[2] + pExp * np.tan(2 * pitch)]

# the reference's prepare_wave calls prevOE.local_z with python scalars,
# which trips ToroidMirror.local_z's boolean-mask assignment — coerce to
# arrays (pure compatibility shim, no physics change)
for _oe in (bl.m1, bl.m2, bl.pg, bl.m3):
    _orig = _oe.local_z

    def _wrap(x, y, _f=_orig):
        return _f(np.atleast_1d(np.asarray(x, float)),
                  np.atleast_1d(np.asarray(y, float)))
    _oe.local_z = _wrap

# focal image pixel grid (reference define_plots: 64 bins over +-50 um)
edges = np.linspace(-50, 50, NSCR + 1)
cent = (edges[:-1] + edges[1:]) * 0.5 / 1e3   # um -> mm
bl.fsmExpX = cent
bl.fsmExpZ = cent

# --- the wave chain (reference run_process_wave) ---
stages = {}


def rec(name, beam, extra=None):
    stages[name + '_Es'] = np.asarray(beam.Es, complex)
    stages[name + '_Ep'] = np.asarray(beam.Ep, complex)
    stages[name + '_J'] = np.asarray(beam.Jss + beam.Jpp, float)
    stages[name + '_x'] = np.asarray(beam.x, float)
    stages[name + '_y'] = np.asarray(beam.y, float)
    stages[name + '_z'] = np.asarray(beam.z, float)
    stages[name + '_a'] = np.asarray(beam.a, float)
    stages[name + '_b'] = np.asarray(beam.b, float)
    stages[name + '_c'] = np.asarray(beam.c, float)
    stages[name + '_state'] = np.asarray(beam.state, int)
    if getattr(beam, 'area', None) is not None:
        stages[name + '_area'] = np.asarray(float(beam.area))
    if extra:
        for k, v in extra.items():
            stages[name + '_' + k] = np.asarray(v)


waveOnSlit = bl.slitFE.prepare_wave(bl.source, NRAYS)
beamSource = bl.source.shine(wave=waveOnSlit, fixedEnergy=E0)
rec('slit', waveOnSlit, extra=dict(
    xDiffr=waveOnSlit.xDiffr, yDiffr=waveOnSlit.yDiffr,
    zDiffr=waveOnSlit.zDiffr, dS=waveOnSlit.dS,
    area=waveOnSlit.area))

waveOnm1 = bl.m1.prepare_wave(bl.slitFE, NRAYS)
beamTom1 = rw.diffract(waveOnSlit, waveOnm1)
rec('wm1', waveOnm1)
_, beamM1local = bl.m1.reflect(beamTom1, noIntersectionSearch=True)
rec('m1', beamM1local)

waveOnm2 = bl.m2.prepare_wave(bl.m1, NRAYS)
beamTom2 = rw.diffract(beamM1local, waveOnm2)
rec('wm2', waveOnm2)
_, beamM2local = bl.m2.reflect(beamTom2, noIntersectionSearch=True)
rec('m2', beamM2local)

waveOnPG = bl.pg.prepare_wave(bl.m2, NRAYS)
beamToPG = rw.diffract(beamM2local, waveOnPG)
rec('wpg', waveOnPG)
_, beamPGlocal = bl.pg.reflect(beamToPG, noIntersectionSearch=True)
beamPGlocal.area = 0
beamPGlocal.areaFraction = bl.pg.areaFraction
rec('pg', beamPGlocal)

waveOnm3 = bl.m3.prepare_wave(bl.pg, NRAYS)
beamTom3 = rw.diffract(beamPGlocal, waveOnm3)
rec('wm3', waveOnm3)
_, beamM3local = bl.m3.reflect(beamTom3, noIntersectionSearch=True)
rec('m3', beamM3local)

waveOnExitSlit = bl.exitSlit.prepare_wave(bl.m3, NRAYS)
rw.diffract(beamM3local, waveOnExitSlit)
rec('es', waveOnExitSlit)

waveOnm4 = bl.m4.prepare_wave(bl.exitSlit, NRAYS)
beamTom4 = rw.diffract(waveOnExitSlit, waveOnm4)
rec('wm4', waveOnm4)
_, beamM4local = bl.m4.reflect(beamTom4, noIntersectionSearch=True)
rec('m4', beamM4local)

waveOnm5 = bl.m5.prepare_wave(bl.m4, NRAYS)
beamTom5 = rw.diffract(beamM4local, waveOnm5)
rec('wm5', waveOnm5)
_, beamM5local = bl.m5.reflect(beamTom5, noIntersectionSearch=True)
rec('m5', beamM5local)

waveOnSample = bl.fsmExp.prepare_wave(bl.m5, bl.fsmExpX, bl.fsmExpZ)
rw.diffract(beamM5local, waveOnSample)
rec('focus', waveOnSample)
img = np.asarray(waveOnSample.Jss + waveOnSample.Jpp,
                 float).reshape(NSCR, NSCR)

out = dict(stages)
out.update(E0=E0, NRAYS=NRAYS, NSCR=NSCR, img=img,
           areaFraction=float(drho),
           flux_focus=float(img.sum()))
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'golden', 'ref_softimax.npz')
np.savez_compressed(path, **out)
print('total flux at focus:', img.sum())
for nm in ('slit', 'm1', 'm2', 'pg', 'm3', 'es', 'm4', 'm5', 'focus'):
    print(f'{nm}: sumJ={stages[nm + "_J"].sum():.5g} '
          f'mean|Es|={np.abs(stages[nm + "_Es"]).mean():.5g}')
print('wrote', path)
