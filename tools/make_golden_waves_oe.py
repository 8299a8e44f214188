"""Golden wave chain THROUGH A CURVED OE from the reference implementation:
slit field -> Kirchhoff onto a toroid mirror surface (mesh samples) ->
reflection on the surface -> Kirchhoff to the focal-plane screen.

Pins down the curved-surface pieces our slit->screen golden cannot see:
surface normals in the obliquity factor, the dS*(n.l) normalization on a
non-flat footprint, the OE-local <-> screen-local geometry rotations, and
the reflected-amplitude bookkeeping (reference reflect.py:266-449,
waves.py:606-831).
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

E0 = 500.0
P, Q = 5000.0, 1000.0
PITCH = 6e-3
NSLIT = 600
NX, NY = 9, 121
NSX, NSZ = 5, 41

np.random.seed(11)

bl = raycing.BeamLine()
R = 2 * P * Q / (P + Q) / math.sin(PITCH)
r = 2 * P * Q / (P + Q) * math.sin(PITCH)
mat = rm.Material('Au', rho=19.3)
toroid = roe.ToroidMirror(bl, 'T', center=(0, P, 0), pitch=PITCH, R=R, r=r,
                          material=mat, limPhysX=(-3, 3),
                          limPhysY=(-40, 40))
slit = rap.RectangularAperture(bl, 'slit', center=(0, 0, 0),
                               opening=(-0.3, 0.3, -0.15, 0.15))
screen = rsc.Screen(bl, 'scr',
                    center=(0, P + Q * math.cos(2 * PITCH),
                            Q * math.sin(2 * PITCH)),
                    z=(0, -math.sin(2 * PITCH), math.cos(2 * PITCH)))

# deterministic coherent source field at the slit (slit frame == global
# here): gaussian amplitude, slight spherical phase
rng = np.random.RandomState(3)
src = rs.Beam(nrays=NSLIT, forceState=1, withAmplitudes=True)
src.x[:] = rng.uniform(-0.3, 0.3, NSLIT)
src.y[:] = 0.0
src.z[:] = rng.uniform(-0.15, 0.15, NSLIT)
src.a[:] = 0.0
src.b[:] = 1.0
src.c[:] = 0.0
src.E[:] = E0
src.Es = np.exp(-(src.x ** 2 + src.z ** 2) / (2 * 0.2 ** 2)) * \
    np.exp(1j * rng.uniform(0, 0.2, NSLIT))
src.Ep = 0.3j * src.Es
src.Jss[:] = np.abs(src.Es) ** 2
src.Jpp[:] = np.abs(src.Ep) ** 2
src.Jsp = src.Es * np.conj(src.Ep)
src.area = 0.6 * 0.3

# hop 1: slit -> toroid surface (deterministic mesh samples)
xx = np.linspace(-2.8, 2.8, NX)
yy = np.linspace(-39.5, 39.5, NY)
waveT = toroid.prepare_wave(slit, (xx, yy), rw=rw)
glo1 = rw.diffract(src, waveT)

# reflection at the sample points (no intersection search)
retGlo, retLoc = toroid.reflect(glo1, noIntersectionSearch=True)
retLoc.area = waveT.area

# hop 2: toroid -> screen
xs = np.asarray([0.0])
lam = 12398.4 / E0 * 1e-7
zs = np.linspace(-0.03, 0.03, NSZ)
waveS = screen.prepare_wave(toroid, xs, zs, rw=rw)
rw.diffract(retLoc, waveS)

dest = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                    'ref_waves_oe.npz')
np.savez_compressed(
    os.path.abspath(dest),
    # configuration
    E0=E0, P=P, Q=Q, pitch=PITCH, R=R, r=r,
    limX=(-3, 3), limY=(-40, 40),
    slit_opening=(-0.3, 0.3, -0.15, 0.15),
    xx=xx, yy=yy, xs=xs, zs=zs,
    # source field (slit-local == global here)
    src_x=src.x, src_z=src.z, src_Es=src.Es, src_Ep=src.Ep,
    src_area=src.area,
    # wave on the toroid: geometry out of prepare_wave
    wT_x=waveT.x, wT_y=waveT.y, wT_z=waveT.z,
    wT_a=waveT.a, wT_b=waveT.b, wT_c=waveT.c,
    wT_xDiffr=waveT.xDiffr, wT_yDiffr=waveT.yDiffr, wT_zDiffr=waveT.zDiffr,
    wT_area=waveT.area, wT_areaNormal=waveT.areaNormal,
    wT_state=waveT.state,
    # fields arriving at the toroid (hop 1 result)
    wT_Es=waveT.Es, wT_Ep=waveT.Ep,
    # global beam returned by hop-1 diffract (input to reflect)
    g1_a=glo1.a, g1_b=glo1.b, g1_c=glo1.c,
    g1_Es=glo1.Es, g1_Ep=glo1.Ep,
    g1_Jss=glo1.Jss, g1_Jpp=glo1.Jpp, g1_x=glo1.x, g1_y=glo1.y,
    g1_z=glo1.z,
    # reflected local beam
    rT_a=retLoc.a, rT_b=retLoc.b, rT_c=retLoc.c,
    rT_Es=retLoc.Es, rT_Ep=retLoc.Ep, rT_state=retLoc.state,
    rT_Jss=retLoc.Jss, rT_Jpp=retLoc.Jpp,
    # wave on the screen: geometry + final field
    wS_xDiffr=waveS.xDiffr, wS_yDiffr=waveS.yDiffr, wS_zDiffr=waveS.zDiffr,
    wS_Es=waveS.Es, wS_Ep=waveS.Ep, wS_Jss=waveS.Jss, wS_Jpp=waveS.Jpp,
    wS_a=waveS.a, wS_b=waveS.b, wS_c=waveS.c)
print('wrote', os.path.abspath(dest))
