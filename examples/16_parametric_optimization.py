"""Gradient-based beamline optimization with jax.grad.

The xrt_tpu analog (and upgrade) of the reference's
16_ParametricOptimization family: where the reference scans parameters
and fits, the TPU-native framework is differentiable end to end — the
flux through a small exit aperture is a pure function of the mirror
pitch and bend radius, so gradient ascent aligns the beamline in a few
steps.  Soft-edge apertures keep the gradient alive.

Run: python examples/16_parametric_optimization.py
     XRT_TPU_PLATFORM=cpu python examples/16_parametric_optimization.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
NSTEPS = 4 if SMOKE else 30

E0 = 9000.0
P, Q = 10000.0, 2000.0
PITCH0 = 4e-3


def main():
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    mat = xm.Material.create('Rh', rho=12.41)
    R0 = 2 * P * Q / (P + Q) / math.sin(PITCH0)
    r0 = 2 * P * Q / (P + Q) * math.sin(PITCH0)
    # exit pinhole on the nominal axis; soft edges make the mask
    # differentiable
    pin = RectangularAperture.create(
        center=(0, P + Q, 2 * PITCH0 * Q),
        opening=(-0.1, 0.1, -0.1, 0.1), softEdge=0.05)
    key = jax.random.PRNGKey(0)
    beam = src.shine(key)   # fixed ray set: the loss is deterministic

    mirror0 = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH0, R=R0, r=r0,
        material=mat, limPhysX=(-20, 20), limPhysY=(-300, 300))

    def neg_flux(params, beam):
        pitch_mrad, logR = params
        # elements are immutable pytrees: traced parameters enter through
        # replace(), so the whole trace is differentiable w.r.t. them
        mirror = mirror0.replace(pitch=pitch_mrad * 1e-3, R=jnp.exp(logR))
        glo, _ = mirror.reflect(beam)
        out = pin.propagate(glo)
        w = jnp.where(out.state == 1, out.Jss + out.Jpp, 0.0)
        return -jnp.sum(w)

    # start misaligned: pitch off by 50 urad, R off by 5%
    import optax
    params = jnp.asarray([(PITCH0 + 5e-5) * 1e3, jnp.log(R0 * 1.05)])
    opt = optax.adam(0.01)
    state = opt.init(params)
    # beam passed as an argument: a closure-captured complex constant
    # would need a host round-trip at lowering time (unimplemented on
    # some TPU transports)
    val_grad = jax.jit(jax.value_and_grad(neg_flux))
    f0 = None
    for i in range(NSTEPS):
        f, g = val_grad(params, beam)
        if f0 is None:
            f0 = f
        upd, state = opt.update(g, state)
        params = params + upd
        if i % 5 == 0 or i == NSTEPS - 1:
            print(f'step {i:3d}: flux={-float(f):10.2f}  '
                  f'pitch={float(params[0]):.5f} mrad  '
                  f'R={float(jnp.exp(params[1])):.0f} mm')
    dpitch = abs(float(params[0]) * 1e-3 - PITCH0)
    print(f'final pitch error {dpitch*1e6:.1f} urad (started at 50.0); '
          f'flux gained {float(val_grad(params, beam)[0]) / float(f0):.2f}x')


# ---------------------------------------------------------------------------
# Part 2: WAVE-chain alignment by gradient descent (the north star)
# ---------------------------------------------------------------------------
#
# Gradient descent through TWO chained Fresnel-Kirchhoff integrals (the
# Pallas kernel's custom VJP) aligns a coherent soft-x-ray branch:
#
#   Gaussian source field on a slit -> M1 (focusing toroid, pitch dp1)
#   -> M2 (plane fold carrying a FIXED 3 nm waviness figure error +
#   a CORRECTIVE deformable term of amplitude theta) -> focal screen.
#
# The optimizer sees only the focal-plane peak flux and recovers
# (dp1, dp2, theta) ~ (0, 0, -3 nm): adaptive optics on the surface
# figure itself — the capability the reference cannot express at all
# (its figure errors, figure_error.py:199-251, live behind a
# non-differentiable OpenCL pipeline).
#
# Traced geometry: the receiving-surface samples move with the traced
# parameters through LINEARIZED retargeting — host-FD Jacobians of the
# exact f64 placement transforms (valid to O(d^2) for alignment-scale
# angles), so the double-float phase coherence of the base geometry is
# preserved (see waves.wave_frame_rotation).

E0W = 280.0                 # SoftiMAX-class soft x-ray energy, eV
P_M1, D_12, Q_F = 24000.0, 2000.0, 4000.0
PITCHW = math.radians(1.0)  # 1-degree grazing SoftiMAX optics
FE_TRUE_NM = 12.0           # the fixed polishing error on M2


def _placement_jacobian(oe, fromOE, x, y, z, param='pitch', h=1e-7,
                        vary='oe'):
    """d(fromOE-frame receiving coords)/d(param) by central FD on the
    exact host float64 placement transforms (linearized retargeting)."""
    import numpy as np
    from xrt_tpu import waves as _w

    def pos(oe_, from_):
        if hasattr(oe_, 'rotationSequence'):     # an OE
            gx, gy, gz = _w._np_local_to_global64(oe_, x, y, z)
        else:                                    # screen/aperture frame
            c = np.asarray(oe_.center, np.float64)
            ex = np.asarray(oe_.ex, np.float64)
            ez = np.asarray(oe_.ez, np.float64)
            ey = np.cross(ez, ex)
            gx = c[0] + x * ex[0] + y * ey[0] + z * ez[0]
            gy = c[1] + x * ex[1] + y * ey[1] + z * ez[1]
            gz = c[2] + x * ex[2] + y * ey[2] + z * ez[2]
        return np.stack(_w._to_fromOE_local64(from_, gx, gy, gz))

    if vary == 'oe':
        p = float(getattr(oe, param))
        hi = pos(oe.replace(**{param: p + h}), fromOE)
        lo = pos(oe.replace(**{param: p - h}), fromOE)
    else:
        p = float(getattr(fromOE, param))
        hi = pos(oe, fromOE.replace(**{param: p + h}))
        lo = pos(oe, fromOE.replace(**{param: p - h}))
    return (hi - lo) / (2 * h)          # (3, N)


def build_wave_problem():
    import time
    import numpy as np
    import optax
    from xrt_tpu.figure_error import waviness
    from xrt_tpu.oes import FlatMirror, ToroidMirror
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GaussianBeam
    from xrt_tpu.waves import (prepare_wave_on_aperture,
                               prepare_wave_on_oe, prepare_wave_on_screen,
                               diffract, reflect_wave,
                               wave_frame_rotation)

    n_slit = 1000 if SMOKE else 20000
    n_m = (24, 32) if SMOKE else (48, 64)
    n_scr = 49 if SMOKE else 129
    nsteps = 4 if SMOKE else 60

    mat = xm.Material.create('Au', rho=19.3, kind='mirror')
    slit = RectangularAperture.create(center=(0, 0, 0),
                                      opening=(-0.3, 0.3, -0.3, 0.3))
    RT = 2 * P_M1 * Q_F / (P_M1 + Q_F) / math.sin(PITCHW)
    rT = 2 * P_M1 * Q_F / (P_M1 + Q_F) * math.sin(PITCHW)
    # limits hug the illuminated footprint (0.66 mm beam -> 34 mm at
    # 1-degree grazing): MC surface samples land IN the beam instead of
    # on dark mirror area (sampling efficiency sets the speckle floor)
    limY1 = (-24.0, 24.0)
    limY2 = (-14.0, 14.0)
    # period 4 mm: the sinusoid's +-1st diffraction orders land at
    # ~6 w_foc, outside the peak window, so the peak metric SEES the
    # figure error (longer periods hide the satellites inside the peak)
    fe_mode = waviness(amplitude=1.0, period=4.0, limPhysX=(-1, 1),
                       limPhysY=limY2, gridStep=0.25)
    m1 = ToroidMirror.create(center=(0, P_M1, 0), pitch=PITCHW,
                             R=RT, r=rT, material=mat,
                             limPhysX=(-0.8, 0.8), limPhysY=limY1)
    zM2 = D_12 * math.sin(2 * PITCHW)
    m2 = FlatMirror.create(
        center=(0, P_M1 + D_12 * math.cos(2 * PITCHW), zM2),
        pitch=-PITCHW,                # with positionRoll=pi the pitch
        positionRoll=math.pi,         # sign flips: surface tilted +PITCHW,
                                      # grazing PITCHW, deflecting DOWN
        material=mat, limPhysX=(-0.5, 0.5), limPhysY=limY2,
        figure_error=fe_mode)
    yscr = P_M1 + D_12 * math.cos(2 * PITCHW) + Q_F - D_12
    scr = Screen.create(center=(0, yscr, zM2))

    # w0=0.05: Rayleigh range 1.8 m << p, so the wavefront at M1 is
    # spherical from the slit and the toroid images p -> q as designed
    gb = GaussianBeam.create(w0=0.05, distE='lines', energies=(E0W,),
                             polarization='horizontal')
    key = jax.random.PRNGKey(0)
    wSlit = prepare_wave_on_aperture(slit, gb, n_slit, key=key)
    # under jit: eager complex arithmetic would enqueue host
    # transfers that some TPU transports do not implement
    srcBeam = jax.jit(lambda k_, w_: gb.shine(k_, w_, toGlobal=False))(
        jax.random.PRNGKey(1), wSlit)
    # RANDOM surface sampling (not a grid): regular grids act as
    # diffraction gratings whose replica orders land on the next element
    # at the short M1->M2 hop and speckle the focus; MC sampling trades
    # that for ~1/sqrt(N) incoherent noise (the reference's choice too,
    # prepare_wave waves.py:505-584)
    n_mm = n_m[0] * n_m[1]
    wM1 = prepare_wave_on_oe(m1, slit, n_mm, key=jax.random.PRNGKey(2))
    wM2 = prepare_wave_on_oe(m2, m1, n_mm, key=jax.random.PRNGKey(3))
    lam = 12398.4 / E0W * 1e-7
    # diffraction-limited focal size: lambda * q / (beam size at M1,
    # ~2*w0*p/z_R = 0.66 mm for the w0=0.05 waist)
    w_foc = lam * Q_F / 0.66
    # window wide enough to capture the 40-urad-misaligned spot
    # (2 * 40e-6 * 6000 mm = 0.48 mm ~ 16 w_foc), sampled below w_foc
    zs = np.linspace(-18 * w_foc, 18 * w_foc, n_scr)
    wScr = prepare_wave_on_screen(scr, m2, np.asarray([0.0]), zs)

    # linearized retargeting constants (host f64, exact transforms)
    x1, y1, z1 = (np.asarray(wM1.x), np.asarray(wM1.y),
                  np.asarray(wM1.z))
    x2, y2, z2 = (np.asarray(wM2.x), np.asarray(wM2.y),
                  np.asarray(wM2.z))
    xs_, ys_, zs_ = (np.asarray(wScr.x), np.asarray(wScr.y),
                     np.asarray(wScr.z))
    J1 = jnp.asarray(_placement_jacobian(m1, slit, x1, y1, z1))
    J21 = jnp.asarray(_placement_jacobian(m2, m1, x2, y2, z2,
                                          vary='from'))
    J22 = jnp.asarray(_placement_jacobian(m2, m1, x2, y2, z2))
    J32 = jnp.asarray(_placement_jacobian(scr, m2, xs_, ys_, zs_,
                                          vary='from'))
    R2 = jnp.asarray(wave_frame_rotation(m2, m1))    # dz -> M1 frame
    fe_unit_z = fe_mode.local_z_distorted(wM2.x, wM2.y)  # mm per nm
    # two metric windows: WIDE captures the misaligned spot (15 urad ~
    # 4 w_foc off-center), TIGHT resolves the figure error (whose
    # satellite orders sit at ~6 w_foc)
    wgt_wide = jnp.asarray(np.exp(-(zs / (8.0 * w_foc)) ** 2))
    wgt_tight = jnp.asarray(np.exp(-(zs / (2.5 * w_foc)) ** 2))

    def shift(w, dxyz):
        return w.replace(xDiffr=w.xDiffr + dxyz[0],
                         yDiffr=w.yDiffr + dxyz[1],
                         zDiffr=w.zDiffr + dxyz[2])

    def chain_I(params, waves):
        dp1, dp2, th = params
        srcB, wM1_, wM2_, wScr_ = waves
        m1_ = m1.replace(pitch=m1.pitch + dp1)
        fe = fe_mode.replace(
            zmap=(FE_TRUE_NM + th) * fe_mode.zmap,
            dzdx=(FE_TRUE_NM + th) * fe_mode.dzdx,
            dzdy=(FE_TRUE_NM + th) * fe_mode.dzdy)
        m2_ = m2.replace(pitch=m2.pitch + dp2, figure_error=fe)
        # the prepared base geometry already carries the unit-amplitude
        # mode (m2 was built with fe_mode at 1 nm): offset from THAT
        dz2 = (FE_TRUE_NM + th - 1.0) * fe_unit_z
        wM1_ = shift(wM1_, J1 * dp1)
        wM2_ = shift(wM2_, J21 * dp1 + J22 * dp2 +
                     R2[:, 2:3] * dz2[None, :])
        wM2_ = wM2_.replace(z=wM2_.z + dz2)
        wScr_ = shift(wScr_, J32 * dp2)
        b1 = diffract(srcB, wM1_)
        _, l1 = reflect_wave(m1_, b1)
        b2 = diffract(l1, wM2_)
        _, l2 = reflect_wave(m2_, b2)
        out = diffract(l2, wScr_)
        return out.Jss + out.Jpp

    def neg_peak(params, waves, wgt=wgt_tight):
        return -jnp.sum(chain_I(params, waves) * wgt) / 1e6

    neg_peak.chain_I = chain_I
    neg_peak.zs = zs
    return neg_peak, (srcBeam, wM1, wM2, wScr), (wgt_wide, wgt_tight)


def main_wave():
    import time
    import optax
    nsteps_a = 6 if SMOKE else 25
    nsteps_b = 6 if SMOKE else 40
    nsteps_c = 0 if SMOKE else 35
    neg_peak, waves0, (wgt_wide, wgt_tight) = build_wave_problem()
    # alignment-scale start: ~15 urad pitch errors + uncorrected
    # figure (far-off starts land in a tilt-compensation local basin
    # dp2 ~ -dp1 — real alignment starts near nominal anyway)
    params = jnp.asarray([15e-6, -12e-6, 0.0])
    # per-parameter scaling: angles in 10-urad units, amplitude in nm
    scale = jnp.asarray([1e-5, 1e-5, 1.0])
    val_grad = jax.jit(jax.value_and_grad(
        lambda q, w, wgt: neg_peak(q * scale, w, wgt)))
    q = params / scale
    t0 = time.time()
    f_first = None
    nstep_total = 0
    # stage A: WIDE window, capture + align the pitches; stage B:
    # TIGHT window, polish + recover the figure-error correction
    stages = [(wgt_wide, nsteps_a, 0.6), (wgt_tight, nsteps_b, 0.2)]
    if nsteps_c:
        stages.append((wgt_tight, nsteps_c, 0.05))
    for stage, (wgt, nsteps, lr) in enumerate(stages):
        opt = optax.adam(lr)
        state = opt.init(q)
        for i in range(nsteps):
            f, g = val_grad(q, waves0, wgt)
            if f_first is None:
                f_first = float(f)
                print(f'first grad step compiled+ran in '
                      f'{time.time() - t0:.1f} s')
                t0 = time.time()
            upd, state = opt.update(g, state)
            q = q + upd
            nstep_total += 1
            if i % 10 == 0 or i == nsteps - 1:
                p = q * scale
                print(f'stage {"ABC"[stage]} step {i:3d}: '
                      f'peak={-float(f):10.6f}  '
                      f'dp1={float(p[0])*1e6:7.2f} urad  '
                      f'dp2={float(p[1])*1e6:7.2f} urad  '
                      f'corr={float(p[2]):6.2f} nm')
    f = val_grad(q, waves0, wgt_tight)[0]
    f_first = float(val_grad(params / scale, waves0, wgt_tight)[0])
    per_step = (time.time() - t0) / max(nstep_total - 1, 1)
    p = q * scale
    # before/after focal profiles for the README
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        import numpy as np
        prof = jax.jit(lambda q_, ws: neg_peak.chain_I(q_ * scale, ws))
        I0 = np.asarray(prof(params / scale, waves0))
        I1 = np.asarray(prof(q, waves0))
        zs_mm = neg_peak.zs
        fig, ax = plt.subplots(figsize=(6, 3.2))
        ax.plot(zs_mm * 1e3, I0 / I1.max(), label='before (misaligned, '
                'uncorrected figure)', color='#c44')
        ax.plot(zs_mm * 1e3, I1 / I1.max(), label='after gradient '
                'alignment', color='#283')
        ax.set_xlabel('focal plane z [um]')
        ax.set_ylabel('intensity (norm.)')
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '16_wave_alignment.png'),
            dpi=110)
        print('wrote 16_wave_alignment.png')
    except Exception as e:
        print('profile plot skipped:', e)
    print(f'converged: dp1={float(p[0])*1e6:.2f} urad, '
          f'dp2={float(p[1])*1e6:.2f} urad, '
          f'figure correction={float(p[2]):.2f} nm '
          f'(true error {FE_TRUE_NM} nm); '
          f'peak gained {float(f) / f_first:.1f}x; '
          f'{per_step:.2f} s/grad-step')
    return float(p[2]), float(f) / f_first


if __name__ == '__main__':
    main()
    main_wave()
