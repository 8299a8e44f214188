"""Fresnel-Kirchhoff wave propagation between optical elements.

TPU-native re-implementation of xrt/backends/raycing/waves.py
(prepare_wave:505, diffract:606, the O(N_src x N_dst) integral
_diffraction_integral_conv:834-851 / the 'integrate_kirchhoff' OpenCL kernel
diffract.cl:80-152, flux normalization :642-673 and :739-749, direction
extraction by the conjugate-phase trick :719-731, receiving-surface
re-rotation :771-824) plus the prepare_wave samplers of screens
(screens.py:304), apertures (apertures.py:467) and OEs (reflect.py:266).

The double sum over (dst, src) pairs with five complex accumulators
(Es, Ep and three direction integrals) is evaluated as a ``lax.scan`` over
source chunks — O(Ndst x chunk) memory, fully fused elementwise work — and
has a Pallas TPU kernel fast path (xrt_tpu.ops.kirchhoff) with
compensated-f32 phase arithmetic.  Here, as in the reference, the phase is
k*r per pair; in float32 this needs the kernel's double-float path, so the
XLA path requires float64 (tests/CPU) and the TPU path uses the kernel.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import config
from .beam import Beam, rotate_coherency_matrix
from .physconsts import CHBAR, CH, PI
from .transforms import (rotate_xyz, rotate_y, rotate_z,
                         virgin_local_to_global)

SRC_CHUNK = 256   # source samples per scan step in the XLA path


def pad1d_edge(v, npad):
    """Pad a 1-D array by repeating its last element.  Used for POSITION
    arrays entering recentred kernels: zero padding would drag the
    recentring reference points (cloud means) toward the origin."""
    return jnp.concatenate([v, jnp.broadcast_to(v[-1:], (npad,))]) \
        if npad else v


def pad1d_zero(v, npad):
    """Zero-pad a 1-D array (fields/weights: padding contributes
    nothing to the integral)."""
    return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) \
        if npad else v


@struct.dataclass
class Wave(Beam):
    """A Beam that also carries the receiving-sample geometry and the
    accumulators of repeated diffraction passes (cf. the attributes attached
    by the reference prepare_wave, waves.py:505-584)."""
    xDiffr: Optional[jnp.ndarray] = None   # receiving pts, fromOE-local
    yDiffr: Optional[jnp.ndarray] = None
    zDiffr: Optional[jnp.ndarray] = None
    rDiffr: Optional[jnp.ndarray] = None
    # float64 low parts of the geometry for float32 (TPU) runs: the
    # Kirchhoff phase k*r needs positions to ~1e-10 mm, far beyond f32;
    # prepare_wave computes the geometry in host float64 and carries the
    # residuals here for the double-float kernel (ops/dd.py)
    xDiffr_lo: Optional[jnp.ndarray] = None
    yDiffr_lo: Optional[jnp.ndarray] = None
    zDiffr_lo: Optional[jnp.ndarray] = None
    x_lo: Optional[jnp.ndarray] = None     # src-side local sample coords
    y_lo: Optional[jnp.ndarray] = None
    z_lo: Optional[jnp.ndarray] = None
    EsAcc: Optional[jnp.ndarray] = None
    EpAcc: Optional[jnp.ndarray] = None
    aEacc: Optional[jnp.ndarray] = None
    bEacc: Optional[jnp.ndarray] = None
    cEacc: Optional[jnp.ndarray] = None
    areaNormal: Optional[jnp.ndarray] = None
    # when the receiver (toOE) is an OE, diffract stores two frames, like
    # the reference's wave/glo pair (waves.py:772-824): the wave itself
    # carries toOE-local directions and the polarization frame rolled to
    # the receiving surface, while the *Glo fields keep the global-frame
    # directions/fields (consumed by wave_to_global -> reflect)
    aGlo: Optional[jnp.ndarray] = None
    bGlo: Optional[jnp.ndarray] = None
    cGlo: Optional[jnp.ndarray] = None
    EsGlo: Optional[jnp.ndarray] = None
    EpGlo: Optional[jnp.ndarray] = None
    JssGlo: Optional[jnp.ndarray] = None
    JppGlo: Optional[jnp.ndarray] = None
    JspGlo: Optional[jnp.ndarray] = None
    beamReflRays: Optional[jnp.ndarray] = None
    beamReflSumJ: Optional[jnp.ndarray] = None
    beamReflSumJnl: Optional[jnp.ndarray] = None
    diffract_repeats: Optional[jnp.ndarray] = None
    fromOE: Any = struct.field(pytree_node=False, default=None)
    toOE: Any = struct.field(pytree_node=False, default=None)


def _to_fromOE_local(fromOE, xglo, yglo, zglo):
    """Global receiving points -> fromOE-local coordinates
    (cf. waves.py:537-569)."""
    x = xglo - fromOE.center[0]
    y = yglo - fromOE.center[1]
    z = zglo - fromOE.center[2]
    if hasattr(fromOE, 'rotationSequence'):  # an OE
        if hasattr(fromOE, 'braggAngle'):    # DCM: 2nd crystal frame
            x, y, z = rotate_xyz(x, y, z,
                                 rotationSequence=fromOE.rotationSequence,
                                 yaw=-math.pi, skip_zero=False)
            pitch = -(-fromOE.pitch - fromOE.braggAngle +
                      fromOE.cryst2pitch + fromOE.cryst2finePitch)
            roll = -(fromOE.roll + fromOE.positionRoll + fromOE.cryst2roll)
            yaw = fromOE.yaw
            x, y, z = rotate_xyz(x, y, z,
                                 rotationSequence=fromOE.rotationSequence,
                                 pitch=pitch, roll=roll, yaw=yaw,
                                 skip_zero=False)
            z = z + fromOE.cryst2perpTransl
            y = y - fromOE.cryst2longTransl
        else:
            pitch, roll, yaw = fromOE._placement()[0:3]
            x, y, z = rotate_xyz(x, y, z,
                                 rotationSequence=fromOE.rotationSequence,
                                 pitch=-pitch, roll=-roll, yaw=-yaw,
                                 skip_zero=False)
            if fromOE.extraPitch is not None:
                x, y, z = rotate_xyz(
                    x, y, z, rotationSequence=fromOE.extraRotationSequence,
                    pitch=-fromOE.extraPitch, roll=-fromOE.extraRoll,
                    yaw=-fromOE.extraYaw, skip_zero=False)
    elif hasattr(fromOE, 'ex'):  # aperture/screen frame
        ex, ey, ez = fromOE.ex, fromOE.ey, fromOE.ez
        lx = x * ex[0] + y * ex[1] + z * ex[2]
        ly = x * ey[0] + y * ey[1] + z * ey[2]
        lz = x * ez[0] + y * ez[1] + z * ez[2]
        x, y, z = lx, ly, lz
    # sources: virgin local = centered global
    return x, y, z


def _np_rotate_xyz(x, y, z, rotationSequence='RzRyRx', pitch=0.0, roll=0.0,
                   yaw=0.0):
    """Pure-numpy float64 replica of transforms.rotate_xyz (needed on TPU
    hosts where jnp is float32)."""
    seq = rotationSequence
    if seq[0] == '-':
        letters = (seq[6], seq[4], seq[2])
    else:
        letters = (seq[1], seq[3], seq[5])
    angles = {'z': float(yaw), 'y': float(roll), 'x': float(pitch)}
    for s in letters:
        cA, sA = math.cos(angles[s]), math.sin(angles[s])
        if s == 'x':
            y, z = cA * y - sA * z, sA * y + cA * z
        elif s == 'y':
            x, z = cA * x + sA * z, -sA * x + cA * z
        else:
            x, y = cA * x - sA * y, sA * x + cA * y
    return x, y, z


def _to_fromOE_local64(fromOE, x64, y64, z64):
    """Float64 numpy version of :func:`_to_fromOE_local`."""
    c = np.asarray(fromOE.center, np.float64)
    x = np.asarray(x64, np.float64) - c[0]
    y = np.asarray(y64, np.float64) - c[1]
    z = np.asarray(z64, np.float64) - c[2]
    if hasattr(fromOE, 'rotationSequence'):
        if hasattr(fromOE, 'braggAngle'):
            x, y, z = _np_rotate_xyz(x, y, z, fromOE.rotationSequence,
                                     yaw=-math.pi)
            pitch = -float(-fromOE.pitch - fromOE.braggAngle +
                           fromOE.cryst2pitch + fromOE.cryst2finePitch)
            roll = -float(fromOE.roll + fromOE.positionRoll +
                          fromOE.cryst2roll)
            yaw = float(fromOE.yaw)
            x, y, z = _np_rotate_xyz(x, y, z, fromOE.rotationSequence,
                                     pitch=pitch, roll=roll, yaw=yaw)
            z = z + float(fromOE.cryst2perpTransl)
            y = y - float(fromOE.cryst2longTransl)
        else:
            pitch, roll, yaw = fromOE._placement()[0:3]
            x, y, z = _np_rotate_xyz(x, y, z, fromOE.rotationSequence,
                                     pitch=-float(pitch),
                                     roll=-float(roll), yaw=-float(yaw))
            if fromOE.extraPitch is not None:
                x, y, z = _np_rotate_xyz(
                    x, y, z, fromOE.extraRotationSequence,
                    pitch=-float(fromOE.extraPitch),
                    roll=-float(fromOE.extraRoll),
                    yaw=-float(fromOE.extraYaw))
    elif hasattr(fromOE, 'ex'):
        ex = np.asarray(fromOE.ex, np.float64)
        ez = np.asarray(fromOE.ez, np.float64)
        ey = np.cross(ez, ex)
        lx = x * ex[0] + y * ex[1] + z * ex[2]
        ly = x * ey[0] + y * ey[1] + z * ey[2]
        lz = x * ez[0] + y * ez[1] + z * ez[2]
        x, y, z = lx, ly, lz
    return x, y, z


def _np_local_to_global64(oe, x64, y64, z64):
    """Float64 numpy forward transform (positions only) matching
    OE.local_to_global — the exact inverse of :func:`_to_fromOE_local64`.

    Wave-receiving geometry MUST be computed in float64: global
    coordinates are O(1e4) mm, so float32 rounding is ~1e-3 mm — hundreds
    of wavelengths of *per-sample* phase noise, which turns a coherent
    focus into speckle.  (The local surface coordinates themselves are
    exact float32 values, so evaluating the transform on them in f64 is
    consistent with the f32 arrays used device-side.)"""
    x64 = np.asarray(x64, np.float64)
    y64 = np.asarray(y64, np.float64)
    z64 = np.asarray(z64, np.float64)
    if hasattr(oe, 'braggAngle'):      # DCM: first crystal
        pitch = float(oe.pitch + oe.braggAngle)
        roll = float(oe.roll + oe.positionRoll + oe.cryst1roll)
        yaw = float(oe.yaw)
        x64 = x64 + float(oe.dxCryst)
    else:
        p_, r_, y_ = oe._placement()[0:3]
        pitch, roll, yaw = float(p_), float(r_), float(y_)
    if oe.extraPitch is not None:
        x64, y64, z64 = _np_rotate_xyz(
            x64, y64, z64, '-' + oe.extraRotationSequence,
            pitch=float(oe.extraPitch), roll=float(oe.extraRoll),
            yaw=float(oe.extraYaw))
    x64, y64, z64 = _np_rotate_xyz(x64, y64, z64,
                                   '-' + oe.rotationSequence,
                                   pitch=pitch, roll=roll, yaw=yaw)
    c = np.asarray(oe.center, np.float64)
    return x64 + c[0], y64 + c[1], z64 + c[2]


def wave_frame_rotation(oe, fromOE) -> np.ndarray:
    """(3, 3) float64 rotation mapping a *displacement* of a receiving
    sample expressed in *oe*'s local frame into the *fromOE*-local frame
    that :func:`prepare_wave` stores the receiving coordinates in — the
    differential of the receiving-geometry transform.

    Use it to retarget a prepared wave differentiably when oe's surface
    moves under a traced parameter (a figure-error amplitude, a pitch
    offset): the receiving coordinates shift by ``R @ (dx, dy, dz)`` (a
    small f32 delta added to the f64-derived base), so the double-float
    residuals of the base geometry stay valid and jax.grad flows through
    the Kirchhoff kernel's custom VJP.  See
    tests/test_gradients.py::test_grad_figure_error_amplitude_fd and
    examples/16_parametric_optimization.py."""
    pts = np.concatenate([np.zeros((1, 3)), np.eye(3)], axis=0)
    gx, gy, gz = _np_local_to_global64(oe, pts[:, 0], pts[:, 1],
                                       pts[:, 2])
    lx, ly, lz = _to_fromOE_local64(fromOE, gx, gy, gz)
    P = np.stack([lx, ly, lz])          # (3, 4): images of 0, ex, ey, ez
    return P[:, 1:] - P[:, :1]


def prepare_wave(fromOE, wave: Wave, xglo, yglo, zglo) -> Wave:
    """Attach the receiving geometry to *wave* (cf. waves.py:505-584).

    When the global receiving points are host values, the fromOE-local
    transform runs in numpy float64 and, for float32 runs, the f64
    residuals are stored in ``*Diffr_lo`` for the double-float Kirchhoff
    kernel."""
    dt = config.dtype()
    host = not any(isinstance(v, jax.core.Tracer)
                   for v in (xglo, yglo, zglo))
    los = {}
    if host:
        # two-step pull: asking the device for a dtype-converting transfer
        # (f32 array -> f64 host) is unimplemented on some TPU transports
        x64, y64, z64 = _to_fromOE_local64(
            fromOE, np.asarray(np.asarray(xglo), np.float64),
            np.asarray(np.asarray(yglo), np.float64),
            np.asarray(np.asarray(zglo), np.float64))
        r64 = np.sqrt(x64 ** 2 + y64 ** 2 + z64 ** 2)
        x = jnp.asarray(x64, dt)
        y = jnp.asarray(y64, dt)
        z = jnp.asarray(z64, dt)
        r = jnp.asarray(r64, dt)
        if dt == jnp.float32:
            from .ops import dd as _dd
            los = dict(
                xDiffr_lo=jnp.asarray(_dd.from_f64(x64)[1]),
                yDiffr_lo=jnp.asarray(_dd.from_f64(y64)[1]),
                zDiffr_lo=jnp.asarray(_dd.from_f64(z64)[1]))
        a64, b64, c64 = x64 / r64, y64 / r64, z64 / r64
        abc = (jnp.asarray(a64, dt), jnp.asarray(b64, dt),
               jnp.asarray(c64, dt))
    else:
        x, y, z = _to_fromOE_local(fromOE, jnp.asarray(xglo),
                                   jnp.asarray(yglo), jnp.asarray(zglo))
        r = jnp.sqrt(x ** 2 + y ** 2 + z ** 2)
        abc = (x / r, y / r, z / r)
    cdt = jnp.result_type(wave.Jsp)
    if isinstance(x, jax.core.Tracer):
        zero_c = jnp.zeros_like(x, dtype=cdt)
    else:
        # eager: build device-side (complex H2D transfer may be missing)
        zero_c = config.czeros(x.shape, cdt)
    zero = jnp.zeros_like(x)
    return wave.replace(
        xDiffr=x, yDiffr=y, zDiffr=z, rDiffr=r,
        a=abc[0], b=abc[1], c=abc[2], path=jnp.zeros_like(x),
        Es=zero_c, Ep=zero_c,
        EsAcc=zero_c, EpAcc=zero_c, aEacc=zero_c, bEacc=zero_c,
        cEacc=zero_c,
        Jss=zero, Jpp=zero, Jsp=zero_c,
        beamReflRays=jnp.zeros((), x.dtype),
        beamReflSumJ=jnp.zeros((), x.dtype),
        beamReflSumJnl=jnp.zeros((), x.dtype),
        diffract_repeats=jnp.zeros((), x.dtype),
        fromOE=fromOE, **los)


# ---------------------------------------------------------------------------
# receiving-surface samplers
# ---------------------------------------------------------------------------

def prepare_wave_on_screen(screen, prevOE, dim1, dim2, dy=0.0,
                           condition=None) -> Wave:
    """Pixel-grid wave samples on a flat or hemispheric screen
    (cf. screens.py:304-367)."""
    from .screens import HemisphericScreen
    dt = config.dtype()
    cdt = config.cdtype()
    dim1 = np.asarray(dim1, float)
    dim2 = np.asarray(dim2, float)
    d1s, d2s = np.meshgrid(dim1, dim2)
    d1s = d1s.flatten()
    d2s = d2s.flatten()
    dS = (dim1[1] - dim1[0]) * (dim2[1] - dim2[0]) \
        if dim1.size > 1 and dim2.size > 1 else 1.0
    if condition is not None:
        d1s, d2s = condition(d1s, d2s)
    nrays = len(d1s)

    # geometry in float64 numpy so that prepare_wave can carry the f64
    # residuals for the double-float phase on float32 hardware
    c64 = np.asarray(screen.center, np.float64)
    ex64 = np.asarray(screen.ex, np.float64)
    ez64 = np.asarray(screen.ez, np.float64)
    ey64 = np.cross(ez64, ex64)
    if isinstance(screen, HemisphericScreen):
        R64 = float(screen.R)
        phi, theta = d1s / R64, d2s / R64
        xloc = R64 * np.sin(phi) * np.cos(theta)
        yloc = R64 * np.cos(phi) * np.cos(theta)
        zloc = R64 * np.sin(theta)
        dS64 = dS * np.abs(np.cos(theta)) * R64 ** 2
    else:
        xloc, yloc, zloc = d1s, np.zeros_like(d1s) + dy, d2s
        dS64 = np.full((nrays,), dS)
    xglo = c64[0] + xloc * ex64[0] + yloc * ey64[0] + zloc * ez64[0]
    yglo = c64[1] + xloc * ex64[1] + yloc * ey64[1] + zloc * ez64[1]
    zglo = c64[2] + xloc * ex64[2] + yloc * ey64[2] + zloc * ez64[2]
    x_l = jnp.asarray(xloc, dt)
    y_l = jnp.asarray(yloc + (dy if isinstance(screen, HemisphericScreen)
                              else 0.0), dt)
    z_l = jnp.asarray(zloc, dt)
    dS_arr = jnp.asarray(dS64, dt)

    wave = Wave(
        x=x_l, y=y_l, z=z_l,
        a=jnp.zeros((nrays,), dt), b=jnp.ones((nrays,), dt),
        c=jnp.zeros((nrays,), dt),
        E=jnp.full((nrays,), config.DEFAULT_ENERGY, dt),
        state=jnp.ones((nrays,), jnp.int32),
        path=jnp.zeros((nrays,), dt),
        Jss=jnp.zeros((nrays,), dt), Jpp=jnp.zeros((nrays,), dt),
        Jsp=config.czeros((nrays,), cdt),
        dS=dS_arr, area=jnp.sum(dS_arr), toOE=screen)
    return prepare_wave(prevOE, wave, xglo, yglo, zglo)


def prepare_wave_on_aperture(aperture, prevOE, nrays, key=None,
                             samples=None) -> Wave:
    """Uniform random wave samples in an aperture opening
    (cf. apertures.py:467-500).

    *samples*: optional (x, z) paired local sample coordinates replacing
    the random draw (deterministic parity tests feed the reference's own
    receiver samples through the chain)."""
    dt = config.dtype()
    cdt = config.cdtype()
    if key is None:
        key = jax.random.PRNGKey(0)
    nrays = int(nrays) if samples is None else len(np.asarray(samples[0]))
    from .apertures import RectangularAperture, RoundAperture
    if samples is not None:
        x = jnp.asarray(samples[0], dt)
        z = jnp.asarray(samples[1], dt)
        if isinstance(aperture, RoundAperture):
            area = math.pi * float(aperture.r) ** 2
        else:
            area = (aperture.right - aperture.left) * \
                (aperture.top - aperture.bottom)
    elif isinstance(aperture, RoundAperture):
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, (nrays,), dt)) * aperture.r
        phi = jax.random.uniform(k2, (nrays,), dt, 0.0, 2 * math.pi)
        x = r * jnp.cos(phi)
        z = r * jnp.sin(phi)
        area = math.pi * float(aperture.r) ** 2
    else:
        k1, k2 = jax.random.split(key)
        dX = aperture.right - aperture.left
        dZ = aperture.top - aperture.bottom
        x = jax.random.uniform(k1, (nrays,), dt) * dX + aperture.left
        z = jax.random.uniform(k2, (nrays,), dt) * dZ + aperture.bottom
        area = dX * dZ
    y = jnp.zeros((nrays,), dt)
    # global sample coordinates in float64 (the f32 local samples are
    # exact; see _np_local_to_global64 on why f32 globals are not enough)
    x64 = np.asarray(x, np.float64)
    z64 = np.asarray(z, np.float64)
    c64 = np.asarray(aperture.center, np.float64)
    ex64 = np.asarray(aperture.ex, np.float64)
    ez64 = np.asarray(aperture.ez, np.float64)
    xglo = c64[0] + x64 * ex64[0] + z64 * ez64[0]
    yglo = c64[1] + x64 * ex64[1] + z64 * ez64[1]
    zglo = c64[2] + x64 * ex64[2] + z64 * ez64[2]
    area = jnp.asarray(area, dt)
    wave = Wave(
        x=x, y=y, z=z,
        a=jnp.zeros((nrays,), dt), b=jnp.ones((nrays,), dt),
        c=jnp.zeros((nrays,), dt),
        E=jnp.full((nrays,), config.DEFAULT_ENERGY, dt),
        state=jnp.ones((nrays,), jnp.int32),
        path=jnp.zeros((nrays,), dt),
        Jss=jnp.zeros((nrays,), dt), Jpp=jnp.zeros((nrays,), dt),
        Jsp=config.czeros((nrays,), cdt),
        dS=jnp.full((nrays,), 1.0, dt) * area / nrays,
        area=area, toOE=aperture)
    return prepare_wave(prevOE, wave, xglo, yglo, zglo)


def prepare_wave_on_oe(oe, prevOE, nrays, key=None, shape='auto',
                       sort=None, samples=None) -> Wave:
    """Wave samples on an OE surface: random (int nrays) or mesh
    ((nx, ny) tuple) samples traced onto the surface with incoming
    directions from the previous element's center (cf. reflect.py:266-405).

    *sort='y'* orders the random samples along the surface's y axis so
    that contiguous index slices are spatial tiles — required by the
    blockwise-tiled :func:`diffract` (:func:`choose_tile_modes`); the
    sample SET (and hence every MC estimate) is unchanged."""
    dt = config.dtype()
    if key is None:
        key = jax.random.PRNGKey(0)
    z_given = None
    if samples is not None:
        # explicit PAIRED surface coordinates (deterministic parity tests
        # feed the reference's own receiver samples through the chain);
        # an optional third member pins the surface z too — float32 runs
        # would otherwise re-derive z with catastrophic cancellation
        # (e.g. a toroid's r - sqrt(r^2 - x^2) loses ~1e-4 mm in f32)
        x = jnp.asarray(samples[0], dt)
        y = jnp.asarray(samples[1], dt)
        if len(samples) > 2:
            z_given = jnp.asarray(samples[2], dt)
        nsamples = x.shape[0]
    elif isinstance(nrays, (tuple, list)):
        if isinstance(nrays[0], np.ndarray):
            # explicit sample coordinates (reference reflect.py:322-327)
            xx, yy = np.asarray(nrays[0]), np.asarray(nrays[1])
        else:
            xx = np.linspace(float(oe.limPhysX[0]), float(oe.limPhysX[1]),
                             int(nrays[0]))
            yy = np.linspace(float(oe.limPhysY[0]), float(oe.limPhysY[1]),
                             int(nrays[1]))
        X, Y = np.meshgrid(xx, yy)
        x = jnp.asarray(X.ravel(), dt)
        y = jnp.asarray(Y.ravel(), dt)
        nsamples = x.shape[0]
    else:
        nsamples = int(nrays)
        k1, k2 = jax.random.split(key)
        dX = oe.limPhysX[1] - oe.limPhysX[0]
        dY = oe.limPhysY[1] - oe.limPhysY[0]
        x = jax.random.uniform(k1, (nsamples,), dt) * dX + oe.limPhysX[0]
        y = jax.random.uniform(k2, (nsamples,), dt) * dY + oe.limPhysY[0]
        if sort == 'y':
            order = jnp.argsort(y)
            x = x[order]
            y = y[order]
    area0 = (oe.limPhysX[1] - oe.limPhysX[0]) * \
        (oe.limPhysY[1] - oe.limPhysY[0])

    # the whole device part runs under one jit: eagerly, the reflect chain
    # would materialize complex constants host-side, which some TPU
    # transports cannot transfer (see config.czeros)
    def _build(x, y, key):
        if z_given is not None:
            z = z_given
            s = phi = None
            if oe.isParametric:
                s, phi, _ = oe.xyz_to_param(x, y, z)
        elif oe.isParametric:
            s, phi, r0 = oe.xyz_to_param(x, y, jnp.zeros_like(x))
            r = oe.local_r(s, phi)
            z = oe.param_to_xyz(s, phi, r)[2]
            # fixed-point refinement: the z=0 projection lands ~1e-4 mm
            # off on tilted parametric surfaces — enough to scramble
            # grazing-incidence phases (k * 1e-4 mm ~ 100 rad); two more
            # re-projections from the surface z converge to ~nm
            for _ in range(2):
                s, phi, r0 = oe.xyz_to_param(x, y, z)
                r = oe.local_r(s, phi)
                z = oe.param_to_xyz(s, phi, r)[2]
        else:
            z = oe.local_z(x, y)
        lb = Beam(x=x, y=y, z=z,
                  a=jnp.zeros((nsamples,), dt),
                  b=jnp.ones((nsamples,), dt),
                  c=jnp.zeros((nsamples,), dt),
                  E=jnp.full((nsamples,), config.DEFAULT_ENERGY, dt),
                  state=jnp.ones((nsamples,), jnp.int32),
                  path=jnp.zeros((nsamples,), dt),
                  Jss=jnp.ones((nsamples,), dt),
                  Jpp=jnp.zeros((nsamples,), dt),
                  Jsp=config.czeros((nsamples,), config.cdtype()))
        lb = lb.with_amplitudes()
        glo_pts = oe.local_to_global(lb)
        if hasattr(prevOE, 'rotationSequence'):
            # the reference puts prevCenter at the middle of the previous
            # OE's surface limits, traced to the surface
            # (reflect.py:348-365)
            cx = 0.5 * (prevOE.limPhysX[0] + prevOE.limPhysX[1])
            cy = 0.5 * (prevOE.limPhysY[0] + prevOE.limPhysY[1])
            cxa = jnp.asarray([cx], dt)
            cya = jnp.asarray([cy], dt)
            if prevOE.isParametric:
                s0, phi0, _ = prevOE.xyz_to_param(cxa, cya,
                                                  jnp.zeros(1, dt))
                r0c = prevOE.local_r(s0, phi0)
                cza = prevOE.param_to_xyz(s0, phi0, r0c)[2]
            else:
                cza = prevOE.local_z(cxa, cya)
            from .beam import new_beam
            lbc = new_beam(1, dtype=dt).replace(x=cxa, y=cya, z=cza)
            lbc = prevOE.local_to_global(lbc)
            prevCenter = (lbc.x[0], lbc.y[0], lbc.z[0])
        else:
            prevCenter = prevOE.center
        a = glo_pts.x - prevCenter[0]
        b = glo_pts.y - prevCenter[1]
        c = glo_pts.z - prevCenter[2]
        norm = jnp.sqrt(a ** 2 + b ** 2 + c ** 2)
        lb_in = glo_pts.replace(
            a=a / norm, b=b / norm, c=c / norm,
            x=jnp.full((nsamples,), prevCenter[0], dt),
            y=jnp.full((nsamples,), prevCenter[1], dt),
            z=jnp.full((nsamples,), prevCenter[2], dt))
        # surface-normal projection factor (reference reflect.py:381-393):
        # |cos| between the incoming central direction and the global
        # surface normal at the OE origin; areaNormal = area * that factor
        # is the aperture area seen by the wave (used by shine(wave=...))
        one = jnp.ones(1, dt)
        zero1 = jnp.zeros(1, dt)
        from .beam import new_beam as _nb
        lbn = _nb(1, dtype=dt).replace(b=zero1, c=one)
        lbn = oe.local_to_global(lbn)
        an = lbn.x - prevCenter[0]
        bn = lbn.y - prevCenter[1]
        cn = lbn.z - prevCenter[2]
        nrm = jnp.sqrt(an ** 2 + bn ** 2 + cn ** 2)
        areaNormalFact = jnp.abs(
            (an * lbn.a[0] + bn * lbn.b[0] + cn * lbn.c[0]) / nrm)[0]
        if samples is not None:
            # explicit samples: the receiver points ARE the requested
            # surface coordinates — no ray-trace landing (the intersection
            # solver would move each point by its convergence tolerance,
            # ~1e-5 mm in float32 = tens of radians of phase at grazing
            # incidence, breaking deterministic cross-dtype parity)
            st = oe.rays_good(x, y, jnp.ones((nsamples,), jnp.int32))
            waveLocal = lb.replace(state=st)
            if oe.isParametric:
                waveLocal = waveLocal.replace(s=s, phi=phi)
            return waveLocal, waveLocal, areaNormalFact
        waveGlobal, waveLocal = oe.reflect(lb_in, key)
        return waveGlobal, waveLocal, areaNormalFact

    waveGlobal, waveLocal, areaNormalFact = jax.jit(_build)(x, y, key)
    good = (waveLocal.state == 1) | (waveLocal.state == 2)
    area = area0 * jnp.mean(good.astype(dt))
    ngood = jnp.maximum(jnp.sum(good), 1)
    wave = Wave(**{f: getattr(waveLocal, f)
                   for f in Beam.__dataclass_fields__})
    wave = wave.replace(area=area,
                        areaNormal=area * areaNormalFact,
                        dS=jnp.ones((nsamples,), dt) * area / ngood,
                        state=jnp.where(good, 1, 0).astype(jnp.int32),
                        toOE=oe)
    # global receiving coordinates in float64 (see _np_local_to_global64:
    # f32 globals at O(1e4) mm would add ~1e-3 mm per-sample phase noise
    # and destroy multi-hop coherence); the f32 local surface coordinates
    # are exact inputs to the transform
    gx, gy, gz = _np_local_to_global64(
        oe, np.asarray(waveLocal.x), np.asarray(waveLocal.y),
        np.asarray(waveLocal.z))
    return prepare_wave(prevOE, wave, gx, gy, gz)


# ---------------------------------------------------------------------------
# the Kirchhoff integral
# ---------------------------------------------------------------------------

def kirchhoff_integral_xla(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                           weights):
    """The five Kirchhoff accumulators by a chunked lax.scan over source
    samples (cf. _diffraction_integral_conv, waves.py:834-851).

    dst arrays shape (Nd,), src arrays shape (Ns,); *weights* masks dead
    source samples (0/1).  Requires float64 for the k*r phase."""
    cdt = jnp.result_type(Es)
    Ns = xs.shape[0]
    npad = (-Ns) % SRC_CHUNK
    if npad:
        pad = lambda v: jnp.concatenate([v, jnp.zeros((npad,), v.dtype)])
        xs, ys, zs, k, nl, weights = map(pad, (xs, ys, zs, k, nl, weights))
        Es = jnp.concatenate([Es, jnp.zeros((npad,), cdt)])
        Ep = jnp.concatenate([Ep, jnp.zeros((npad,), cdt)])
        n = [jnp.concatenate([jnp.broadcast_to(ni, (Ns,)),
                              jnp.zeros((npad,), xs.dtype)]) for ni in n]
    else:
        n = [jnp.broadcast_to(ni, (Ns,)) for ni in n]
    nchunks = xs.shape[0] // SRC_CHUNK

    def reshape(v):
        return v.reshape(nchunks, SRC_CHUNK)
    xs_c, ys_c, zs_c, k_c, nl_c, w_c = map(reshape,
                                           (xs, ys, zs, k, nl, weights))
    Es_c = Es.reshape(nchunks, SRC_CHUNK)
    Ep_c = Ep.reshape(nchunks, SRC_CHUNK)
    n_c = [reshape(ni) for ni in n]

    def body(carry, inp):
        EsA, EpA, aA, bA, cA = carry
        xsc, ysc, zsc, kc, nlc, wc, Esc, Epc, n0, n1, n2 = inp
        a = xd[:, None] - xsc[None, :]
        b = yd[:, None] - ysc[None, :]
        c = zd[:, None] - zsc[None, :]
        pathAfter = jnp.sqrt(a ** 2 + b ** 2 + c ** 2)
        ns = (a * n0[None, :] + b * n1[None, :] + c * n2[None, :]) / \
            pathAfter
        kk = kc[None, :]
        U = kk * 1j / (4 * PI) * (nlc[None, :] + ns) * \
            jnp.exp(1j * kk * pathAfter) / pathAfter * wc[None, :]
        EsA = EsA + jnp.sum(Esc[None, :] * U, axis=1)
        EpA = EpA + jnp.sum(Epc[None, :] * U, axis=1)
        abcU = kk ** 2 / (4 * PI) * (Esc + Epc)[None, :] * U / pathAfter
        aA = aA + jnp.sum(abcU * a, axis=1)
        bA = bA + jnp.sum(abcU * b, axis=1)
        cA = cA + jnp.sum(abcU * c, axis=1)
        return (EsA, EpA, aA, bA, cA), None

    # derive the init from xd so it inherits the varying-axes type when
    # this runs inside shard_map (scan carry types must match)
    init = tuple((xd * 0).astype(cdt) for _ in range(5))
    (EsA, EpA, aA, bA, cA), _ = jax.lax.scan(
        body, init, (xs_c, ys_c, zs_c, k_c, nl_c, w_c, Es_c, Ep_c,
                     n_c[0], n_c[1], n_c[2]))
    return EsA, EpA, aA, bA, cA


def estimate_footprint_area(x, y, good):
    """Convex-hull area of the beam footprint — host-side helper
    (cf. waves.py:649-670).  Call outside jit and pass the result via
    ``beam.replace(area=...)``."""
    from scipy.spatial import ConvexHull
    pts = np.vstack([np.asarray(x)[np.asarray(good)],
                     np.asarray(y)[np.asarray(good)]]).T
    hull = ConvexHull(pts)
    outer = pts[hull.vertices, :]
    x1, y1 = outer[:, 0], outer[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    return 0.5 * abs(np.sum(x1 * y2 - x2 * y1))


def diffract(oeLocal: Beam, wave: Wave, use_pallas='auto',
             phase_mode='recentred', monochromatic=False,
             accumulate='mxu', tile_modes=None, mesh=None,
             ring=False) -> Wave:
    """Diffract the surface field *oeLocal* onto the receiving *wave*
    samples (cf. reference diffract, waves.py:606-831).  Pure: returns the
    updated wave (accumulates over repeated calls through the Acc fields).

    *oeLocal.area* must be set (host-side
    :func:`estimate_footprint_area` or analytically); a jnp bounding-box
    estimate is used as fallback.

    *phase_mode* selects the float32 phase scheme (see
    ops/kirchhoff.py): 'recentred' (default, fastest and most accurate
    for beamline geometries), 'fast' or 'exact' (per-pair double-float
    distances, robust for arbitrary geometry).  *monochromatic=True*
    asserts all source samples share one k and saves a few flops.
    *accumulate* (Pallas TPU path): 'mxu' (default) contracts the
    accumulators on the systolic array with f32-class field fidelity;
    'mxu-fast' single-pass bf16 (~2e-3 incoherent-part error, ~33%
    faster — 52.6 vs 39.6 G pairs/s on one v5e); 'vpu' all-f32
    vector-unit accumulation.  NB the 'mxu*' modes compute the
    *direction* integrals with a separable 1/A series valid for
    longitudinal extents |L.u - L.v| <= ~0.1 R0 (fields are exact);
    eager calls auto-fall-back to 'vpu' outside that envelope, jitted
    calls cannot — see kirchhoff_integral_pallas and
    ops.kirchhoff.recentred_series_e_max.

    *tile_modes* (from :func:`choose_tile_modes`, requires spatially
    sorted samples): blockwise-recentred evaluation — the integral is
    computed per (dst tile, src tile) pair with a per-pair kernel mode,
    so short-distance stages whose global geometry breaks the recentred
    envelopes (e.g. a grating ~250 mm from a 450 mm-long mirror) still
    run mostly on the MXU path, with the exact per-pair 'fast' phase
    only near the contact region.  Overrides *phase_mode*/*accumulate*
    for the integral itself.

    *mesh* (a ``jax.sharding.Mesh``): run the integral with the
    destination samples sharded over the mesh — the multi-chip analog of
    the reference's dst-dimension GPU splitting (myopencl.py:455-542).
    With ``ring=False`` (default) the source cloud is replicated on
    every device and the integral needs ZERO collectives; ``ring=True``
    shards the sources too and rotates the shards around the mesh with
    ``ppermute`` (use when the source cloud is too large to replicate).
    Sharding composes with jit; per-shard recentring means the f32
    result differs from single-device at the kernel's own accuracy
    floor (~1e-6 relative field), the f64 XLA path is bit-exact.
    Not combinable with *tile_modes*."""
    oe = wave.fromOE
    if mesh is not None and tile_modes is not None:
        raise ValueError('tile_modes cannot be combined with mesh= — '
                         'sharded stages run their global kernel mode')
    good = oeLocal.state == 1
    w = good.astype(wave.xDiffr.dtype)

    # area under the beam (bbox fallback; the reference uses a convex hull)
    if oeLocal.area is not None:
        area = oeLocal.area
    else:
        if hasattr(oe, 'rotationSequence'):
            secondDim = oeLocal.y
        else:
            secondDim = oeLocal.z
        big = 1e30
        xg = jnp.where(good, oeLocal.x, -big)
        area = (jnp.max(jnp.where(good, oeLocal.x, -big)) -
                jnp.min(jnp.where(good, oeLocal.x, big))) * \
               (jnp.max(jnp.where(good, secondDim, -big)) -
                jnp.min(jnp.where(good, secondDim, big)))

    # surface normal and its beam projection (waves.py:675-690)
    if hasattr(oe, 'rotationSequence'):   # an OE
        if hasattr(oe, 'braggAngle'):     # DCM -> 2nd crystal surface
            local_n = oe.local_n2
        else:
            local_n = oe.local_n
        if oe.isParametric and oeLocal.s is not None:
            n = local_n(oeLocal.s, oeLocal.phi)[-3:]
        else:
            n = local_n(oeLocal.x, oeLocal.y)[-3:]
    else:
        n = [jnp.zeros_like(oeLocal.x), jnp.ones_like(oeLocal.x),
             jnp.zeros_like(oeLocal.x)]
    nl = oeLocal.a * n[0] + oeLocal.b * n[1] + oeLocal.c * n[2]

    sumJ = jnp.sum((oeLocal.Jss + oeLocal.Jpp) * w)
    sumJnl = jnp.abs(jnp.sum((oeLocal.Jss + oeLocal.Jpp) * nl * w))
    k = oeLocal.E / CHBAR * 1e7  # 1/mm

    if wave.xDiffr.dtype == jnp.float32:
        # float32 path: double-float phase arithmetic (ops/kirchhoff.py);
        # the naive f32 k*r phase would be meaningless (~1e11 rad)
        from .ops import dd as _dd
        from .ops.kirchhoff import (kirchhoff_integral_dd,
                                    kirchhoff_integral_pallas,
                                    kirchhoff_integral_recentred)
        zero = jnp.zeros_like(wave.xDiffr)
        # k as a double-float from E (1e7/CHBAR as a two-part constant)
        _KC = 1e7 / CHBAR
        _KC_HI = np.float32(_KC)
        _KC_LO = np.float32(_KC - np.float64(_KC_HI))
        kh, kl = _dd.two_prod(oeLocal.E, jnp.asarray(_KC_HI))
        kl = kl + oeLocal.E * _KC_LO
        use_kernel = use_pallas if use_pallas != 'auto' \
            else jax.default_backend() == 'tpu'

        def _tile_of(pm, am):
            # dst_tile=256 is ~2% faster on v5e for the recentred MXU
            # accumulation (PERF.md sweep) and fits scoped vmem there;
            # the per-pair dd kernels ('fast'/'exact') and the vpu
            # contraction exceed the 16 MB budget at 256 — keep 128
            return 256 if (pm == 'recentred' and am.startswith('mxu')) \
                else 128

        # off-TPU, an explicit use_pallas=True runs the kernel in Pallas
        # interpret mode (CPU validation of the TPU code path, incl. its
        # custom VJP)
        interp = jax.default_backend() != 'tpu'
        if use_kernel:
            kfn = functools.partial(kirchhoff_integral_pallas,
                                    phase_mode=phase_mode,
                                    monochromatic=monochromatic,
                                    accumulate=accumulate,
                                    dst_tile=_tile_of(phase_mode,
                                                      accumulate),
                                    interpret=interp)
        elif phase_mode == 'recentred':
            kfn = functools.partial(kirchhoff_integral_recentred,
                                    monochromatic=monochromatic)
        else:
            kfn = kirchhoff_integral_dd

        def lo_of(v, lo):
            return zero if lo is None else lo
        src_zero = jnp.zeros_like(oeLocal.x)
        sxl = getattr(oeLocal, 'x_lo', None)
        syl = getattr(oeLocal, 'y_lo', None)
        szl = getattr(oeLocal, 'z_lo', None)
        dst_t = [(wave.xDiffr, lo_of(wave.xDiffr, wave.xDiffr_lo)),
                 (wave.yDiffr, lo_of(wave.yDiffr, wave.yDiffr_lo)),
                 (wave.zDiffr, lo_of(wave.zDiffr, wave.zDiffr_lo))]
        src_t = [(oeLocal.x, src_zero if sxl is None else sxl),
                 (oeLocal.y, src_zero if syl is None else syl),
                 (oeLocal.z, src_zero if szl is None else szl)]
        if tile_modes is not None:
            # blockwise-recentred evaluation (see docstring): static tile
            # boundaries; each tile PAIR runs its own kernel mode.  Pairs
            # are grouped by mode and evaluated by a lax.scan over the
            # group with dynamic_slice tile extraction, so each distinct
            # mode traces (and compiles) exactly ONE kernel — a naive
            # per-pair Python loop compiled ntd*nts kernel variants and
            # took ~4x the untiled chain's compile time.
            ntd = len(tile_modes)
            nts = len(tile_modes[0])
            Nd_ = wave.xDiffr.shape[0]
            Ns_ = oeLocal.x.shape[0]
            Td, _ = _tile_bounds(Nd_, ntd)
            Ts, _ = _tile_bounds(Ns_, nts)
            pad_d = ntd * Td - Nd_
            pad_s = nts * Ts - Ns_

            def mk_kfn(pm, am):
                if use_kernel:
                    return functools.partial(
                        kirchhoff_integral_pallas, phase_mode=pm,
                        monochromatic=monochromatic, accumulate=am,
                        dst_tile=_tile_of(pm, am), interpret=interp)
                if pm == 'recentred':
                    return functools.partial(
                        kirchhoff_integral_recentred,
                        monochromatic=monochromatic)
                return kirchhoff_integral_dd

            # edge-pad positions (zero-padding would drag the recentring
            # reference points D0/S0 toward the origin); zero-pad weights
            # and fields so padded samples contribute nothing
            pad_edge, pad_zero = pad1d_edge, pad1d_zero
            n_arr = [jnp.broadcast_to(ni, oeLocal.x.shape) for ni in n]
            dstp = [(pad_edge(h, pad_d), pad_edge(l, pad_d))
                    for h, l in dst_t]
            srcp = [(pad_edge(h, pad_s), pad_edge(l, pad_s))
                    for h, l in src_t]
            Esp = pad_zero(oeLocal.Es, pad_s)
            Epp = pad_zero(oeLocal.Ep, pad_s)
            khp, klp = pad_edge(kh, pad_s), pad_edge(kl, pad_s)
            narr_p = [pad_edge(ni, pad_s) for ni in n_arr]
            nlp = pad_edge(nl, pad_s)
            wp = pad_zero(w, pad_s)

            groups = {}
            for di in range(ntd):
                for si in range(nts):
                    groups.setdefault(tuple(tile_modes[di][si]),
                                      []).append((di, si))
            cdt_ = jnp.result_type(oeLocal.Es)
            acc5 = tuple(jnp.zeros((ntd * Td,), cdt_) for _ in range(5))

            def one_pair(acc, ds_, ss_, kfn):
                def dsl(v):
                    return jax.lax.dynamic_slice(v, (ds_,), (Td,))

                def ssl(v):
                    return jax.lax.dynamic_slice(v, (ss_,), (Ts,))
                out5 = kfn(
                    *[(dsl(h), dsl(l)) for h, l in dstp],
                    *[(ssl(h), ssl(l)) for h, l in srcp],
                    ssl(Esp), ssl(Epp), (ssl(khp), ssl(klp)),
                    [ssl(ni) for ni in narr_p], ssl(nlp), ssl(wp))
                return tuple(
                    jax.lax.dynamic_update_slice(
                        a, jax.lax.dynamic_slice(a, (ds_,), (Td,)) + o,
                        (ds_,))
                    for a, o in zip(acc, out5))

            unroll_pairs = jax.default_backend() == 'cpu'
            for (pm, am), pairs in sorted(groups.items()):
                kfn = mk_kfn(pm, am)
                if unroll_pairs:
                    # XLA:CPU's while-loop emitter breaks the exact
                    # two-prod/two-sum extraction inside scan bodies (see
                    # kirchhoff_integral_dd) — unroll at trace time; the
                    # kernel-compile dedup only matters on TPU anyway
                    for di, si in pairs:
                        acc5 = one_pair(acc5, di * Td, si * Ts, kfn)
                else:
                    dstarts = jnp.asarray([di * Td for di, _ in pairs],
                                          jnp.int32)
                    sstarts = jnp.asarray([si * Ts for _, si in pairs],
                                          jnp.int32)

                    def body(acc, st, kfn=kfn):
                        return one_pair(acc, st[0], st[1], kfn), None

                    acc5, _ = jax.lax.scan(body, acc5,
                                           (dstarts, sstarts))
            Es, Ep, aE, bE, cE = (a[:Nd_] for a in acc5)
        elif mesh is not None:
            # dst-sharded (or ring) multi-device integral: flatten the
            # (hi, lo) tuples for the generic sharded caller
            from .parallel import dst_sharded_call
            n_b = [jnp.broadcast_to(jnp.asarray(ni), oeLocal.x.shape)
                   for ni in n]

            def _flat_kfn(xh, xl, yh, yl, zh, zl, sxh, sxl, syh, syl,
                          szh, szl, Es_, Ep_, kh_, kl_, n0_, n1_, n2_,
                          nl_, w_):
                return kfn((xh, xl), (yh, yl), (zh, zl),
                           (sxh, sxl), (syh, syl), (szh, szl),
                           Es_, Ep_, (kh_, kl_), [n0_, n1_, n2_],
                           nl_, w_)

            src_flat = ([a for hl in src_t for a in hl] +
                        [oeLocal.Es, oeLocal.Ep, kh, kl] + n_b + [nl, w])
            src_pad = (['edge'] * 6 + ['zero', 'zero', 'edge', 'edge'] +
                       ['edge'] * 3 + ['edge', 'zero'])
            Es, Ep, aE, bE, cE = dst_sharded_call(
                mesh, _flat_kfn, [a for hl in dst_t for a in hl],
                src_flat, ring=ring, src_pad=src_pad)
        else:
            Es, Ep, aE, bE, cE = kfn(
                *dst_t, *src_t,
                oeLocal.Es, oeLocal.Ep, (kh, kl), n, nl, w)
    elif mesh is not None:
        from .parallel import dst_sharded_call
        n_b = [jnp.broadcast_to(jnp.asarray(ni), oeLocal.x.shape)
               for ni in n]

        def _flat_xla(xd_, yd_, zd_, xs_, ys_, zs_, Es_, Ep_, k_, n0_,
                      n1_, n2_, nl_, w_):
            return kirchhoff_integral_xla(xd_, yd_, zd_, xs_, ys_, zs_,
                                          Es_, Ep_, k_, [n0_, n1_, n2_],
                                          nl_, w_)

        src_pad = (['edge'] * 3 + ['zero', 'zero', 'edge'] +
                   ['edge'] * 3 + ['edge', 'zero'])
        Es, Ep, aE, bE, cE = dst_sharded_call(
            mesh, _flat_xla,
            [wave.xDiffr, wave.yDiffr, wave.zDiffr],
            [oeLocal.x, oeLocal.y, oeLocal.z, oeLocal.Es, oeLocal.Ep,
             k] + n_b + [nl, w],
            ring=ring, src_pad=src_pad)
    else:
        Es, Ep, aE, bE, cE = kirchhoff_integral_xla(
            wave.xDiffr, wave.yDiffr, wave.zDiffr,
            oeLocal.x, oeLocal.y, oeLocal.z, oeLocal.Es, oeLocal.Ep, k,
            n, nl, w)

    EsAcc = wave.EsAcc + Es
    EpAcc = wave.EpAcc + Ep
    aEacc = wave.aEacc + aE
    bEacc = wave.bEacc + bE
    cEacc = wave.cEacc + cE
    beamReflRays = wave.beamReflRays + jnp.sum(w)
    beamReflSumJ = wave.beamReflSumJ + sumJ
    beamReflSumJnl = wave.beamReflSumJnl + sumJnl
    repeats = wave.diffract_repeats + 1.0

    Jss = (EsAcc * jnp.conj(EsAcc)).real
    Jpp = (EpAcc * jnp.conj(EpAcc)).real
    Jsp = EsAcc * jnp.conj(EpAcc)

    # directions from the conjugate-phase trick (waves.py:719-731)
    if hasattr(oe, 'rotationSequence'):
        useC = jnp.abs(cEacc[0]) > jnp.abs(bEacc[0])
        toRealComp = jnp.where(useC, cEacc, bEacc)
    else:
        toRealComp = bEacc
    ang = jnp.angle(toRealComp)
    # exp(-i*ang) via lax.complex: avoids a complex host constant, which
    # some TPU transports cannot transfer in eager mode
    toReal = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))
    a = (aEacc * toReal).real
    b = (bEacc * toReal).real
    c = (cEacc * toReal).real
    # rescale to O(1) before normalizing: the gradient accumulators carry
    # the field amplitude scale, and for flux-normalized sources
    # (|Es| ~ 1e8) their squares overflow float32, which would zero the
    # extracted directions (and with them the receiver projection)
    mag = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
    maginv = jnp.where(mag > 0, 1.0 / mag, 0.0)
    a, b, c = a * maginv, b * maginv, c * maginv
    norm = jnp.sqrt(a ** 2 + b ** 2 + c ** 2)
    norm = jnp.where(norm == 0, 1.0, norm)
    a, b, c = a / norm, b / norm, c / norm

    # flux normalization (waves.py:739-749)
    de = beamReflRays * beamReflSumJnl * repeats
    fnorm = jnp.where(de > 0, wave.dS * area * beamReflSumJ / de, 0.0)
    Jss = Jss * fnorm
    Jpp = Jpp * fnorm
    Jsp = Jsp * fnorm
    sq = jnp.sqrt(fnorm)
    out = wave.replace(
        E=jnp.full_like(wave.E, oeLocal.E[0]),
        Es=EsAcc * sq, Ep=EpAcc * sq,
        Jss=Jss, Jpp=Jpp, Jsp=Jsp, a=a, b=b, c=c,
        EsAcc=EsAcc, EpAcc=EpAcc, aEacc=aEacc, bEacc=bEacc, cEacc=cEacc,
        beamReflRays=beamReflRays, beamReflSumJ=beamReflSumJ,
        beamReflSumJnl=beamReflSumJnl, diffract_repeats=repeats,
        accepted=oeLocal.accepted, acceptedE=oeLocal.acceptedE,
        seeded=oeLocal.seeded,
        seededI=None if oeLocal.seededI is None else oeLocal.seededI)

    toOE = wave.toOE
    if (toOE is None or not hasattr(toOE, 'rotationSequence')) and \
            hasattr(oe, 'rotationSequence'):
        # aperture/screen receiver fed by an OE: the raw accumulators are
        # in the fromOE's ROLLED s/p basis; the reference rotates them to
        # the virgin/global basis by the fromOE's roll (waves.py:771-779,
        # verified against the reference run: for a positionRoll=-pi/2
        # mirror the output Es is -EpAcc*sqrt(norm)).  Without this, a
        # sideways-deflecting mirror followed by a slit hop mislabels
        # s and p and every later reflectivity is applied to the wrong
        # component.  Pure basis rotation: Jss+Jpp (flux) is unchanged.
        rollAngle = jnp.asarray(oe.roll) + \
            jnp.asarray(getattr(oe, 'positionRoll', 0.0))
        apply = True
        if not isinstance(rollAngle, jax.core.Tracer):
            apply = float(rollAngle) != 0.0
        if apply:
            cosY = jnp.cos(rollAngle)
            sinY = jnp.sin(rollAngle)
            EsR, EpR = rotate_y(out.Es, out.Ep, cosY, sinY)
            JssR, JppR, JspR = rotate_coherency_matrix(
                out.Jss, out.Jpp, out.Jsp, rollAngle)
            out = out.replace(Es=EsR, Ep=EpR,
                              Jss=JssR, Jpp=JppR, Jsp=JspR)
    if toOE is not None and hasattr(toOE, 'rotationSequence'):
        # the receiver is an OE: rotate into its frame and project the flux
        # onto the (generally grazing) surface (reference waves.py:772-824).
        # glo: the global-frame beam (what reflect() consumes next)
        glo = wave_to_global(out)
        ones = jnp.ones_like(out.xDiffr)
        if hasattr(toOE, 'local_n1'):     # DCM: first crystal
            local_n = toOE.local_n1
        else:
            local_n = toOE.local_n
        if getattr(toOE, 'isParametric', False):
            s_, phi_, _ = toOE.xyz_to_param(wave.x, wave.y, wave.z)
            nrm = toOE.local_n(s_, phi_)
        else:
            nrm = local_n(wave.x, wave.y)
        n1 = nrm[-3] * ones
        n2 = nrm[-2] * ones
        n3 = nrm[-1] * ones
        pitchT, rollT, yawT = toOE._placement()[0:3]
        rollAngle = rollT + jnp.arctan2(n1, n3)
        JssR, JppR, JspR = rotate_coherency_matrix(
            glo.Jss, glo.Jpp, glo.Jsp, -rollAngle)
        cosY, sinY = jnp.cos(rollAngle), jnp.sin(rollAngle)
        EsR, EpR = rotate_y(glo.Es, glo.Ep, cosY, -sinY)
        al, bl_, cl_ = rotate_xyz(
            glo.a, glo.b, glo.c, rotationSequence=toOE.rotationSequence,
            pitch=-pitchT, roll=-rollT, yaw=-yawT, skip_zero=False)
        if toOE.extraPitch is not None:
            al, bl_, cl_ = rotate_xyz(
                al, bl_, cl_,
                rotationSequence=toOE.extraRotationSequence,
                pitch=-toOE.extraPitch, roll=-toOE.extraRoll,
                yaw=-toOE.extraYaw, skip_zero=False)
        proj = jnp.abs(al * n1 + bl_ * n2 + cl_ * n3)
        sqp = jnp.sqrt(proj).astype(glo.Es.dtype)
        out = out.replace(
            a=al, b=bl_, c=cl_,
            Es=EsR * sqp, Ep=EpR * sqp,
            Jss=JssR * proj, Jpp=JppR * proj, Jsp=JspR * proj,
            aGlo=glo.a, bGlo=glo.b, cGlo=glo.c,
            EsGlo=glo.Es * sqp, EpGlo=glo.Ep * sqp,
            JssGlo=glo.Jss * proj, JppGlo=glo.Jpp * proj,
            JspGlo=glo.Jsp * proj)
    return out


def wave_to_global(wave: Wave) -> Beam:
    """The diffracted beam with global positions of the receiving points
    (cf. the `glo` construction, waves.py:755-770).  After a diffract onto
    an OE receiver, the wave's own fields are in the receiver's frame; the
    stored *Glo fields give the global beam directly (reference
    waves.py:779-783)."""
    oe = wave.fromOE
    glo = Beam(**{f: getattr(wave, f) for f in Beam.__dataclass_fields__})
    if wave.aGlo is not None:
        glo = glo.replace(a=wave.aGlo, b=wave.bGlo, c=wave.cGlo,
                          Es=wave.EsGlo, Ep=wave.EpGlo,
                          Jss=wave.JssGlo, Jpp=wave.JppGlo,
                          Jsp=wave.JspGlo)
        # positions only: the fields/directions are already global
        from .beam import new_beam
        tmp = new_beam(wave.xDiffr.shape[0],
                       dtype=wave.xDiffr.dtype).replace(
            x=wave.xDiffr, y=wave.yDiffr, z=wave.zDiffr)
        if hasattr(oe, 'rotationSequence'):
            tmp = oe.local_to_global(tmp,
                                     is2ndXtal=hasattr(oe, 'braggAngle'))
        elif hasattr(oe, 'ex'):
            ex, ey, ez = oe.ex, oe.ey, oe.ez
            tmp = tmp.replace(
                x=oe.center[0] + wave.xDiffr * ex[0] +
                wave.yDiffr * ey[0] + wave.zDiffr * ez[0],
                y=oe.center[1] + wave.xDiffr * ex[1] +
                wave.yDiffr * ey[1] + wave.zDiffr * ez[1],
                z=oe.center[2] + wave.xDiffr * ex[2] +
                wave.yDiffr * ey[2] + wave.zDiffr * ez[2])
        else:
            tmp = tmp.replace(x=wave.xDiffr + oe.center[0],
                              y=wave.yDiffr + oe.center[1],
                              z=wave.zDiffr + oe.center[2])
        return glo.replace(x=tmp.x, y=tmp.y, z=tmp.z)
    glo = glo.replace(x=wave.xDiffr, y=wave.yDiffr, z=wave.zDiffr)
    if hasattr(oe, 'rotationSequence'):  # an OE
        return oe.local_to_global(glo,
                                  is2ndXtal=hasattr(oe, 'braggAngle'))
    if hasattr(oe, 'ex'):
        ex, ey, ez = oe.ex, oe.ey, oe.ez
        gx = oe.center[0] + glo.x * ex[0] + glo.y * ey[0] + glo.z * ez[0]
        gy = oe.center[1] + glo.x * ex[1] + glo.y * ey[1] + glo.z * ez[1]
        gz = oe.center[2] + glo.x * ex[2] + glo.y * ey[2] + glo.z * ez[2]
        return glo.replace(x=gx, y=gy, z=gz)
    return glo.replace(x=glo.x + oe.center[0], y=glo.y + oe.center[1],
                       z=glo.z + oe.center[2])


MXU_FAST_FIELD_ERR = 2e-3   # incoherent relative field error of the
                            # single-pass bf16 accumulation (PERF.md)


def choose_kirchhoff_mode(dst_xyz, src_xyz, k=None, error_budget=None):
    """(phase_mode, accumulate) for a Kirchhoff stage with the given
    CONCRETE geometry (host-side, numpy).

    *dst_xyz*, *src_xyz*: (x, y, z) triples in the SAME (source-local)
    frame — i.e. (wave.xDiffr, ...) and the source beam's (x, y, z).
    Checks both envelopes of the recentred scheme: the 1/A direction
    series (e <= SERIES_E_MAX for 'mxu') and the transverse delta-series
    phase error; geometries outside both fall back to the per-pair
    double-float 'fast' phase (exact at any separation).

    *error_budget*: per-stage relative FIELD error the caller can
    tolerate (e.g. the chain's own Monte-Carlo noise floor ~1/sqrt(N)).
    When it covers the single-pass bf16 accumulation's
    :data:`MXU_FAST_FIELD_ERR` (~2e-3 incoherent), 'mxu-fast' replaces
    the two-pass 'mxu'/'mxu2' — 33% faster at identical PHASE and
    direction-integral treatment (the sensitivity-critical quantities:
    the round-4 blaze-facet study showed downstream transfers amplify
    DIRECTION noise, which single- vs two-pass field accumulation does
    not change)."""
    from .ops.kirchhoff import (recentred_series_e_max, SERIES_E_MAX,
                                SERIES_E2_MAX)
    d = np.stack([np.asarray(v, np.float64) for v in dst_xyz])
    s = np.stack([np.asarray(v, np.float64) for v in src_xyz])
    e = recentred_series_e_max((d[0],), (d[1],), (d[2],),
                               (s[0],), (s[1],), (s[2],))
    C = d.mean(axis=1) - s.mean(axis=1)
    R0 = float(np.sqrt(np.sum(C * C)))
    if R0 == 0.0:
        return 'fast', 'vpu'
    L = C / R0
    du = d - d.mean(axis=1)[:, None]
    sv = s - s.mean(axis=1)[:, None]
    tdu = du - L[:, None] * (L @ du)
    tsv = sv - L[:, None] * (L @ sv)
    tmax = float(np.max(np.linalg.norm(tdu, axis=0)) +
                 np.max(np.linalg.norm(tsv, axis=0)))
    Amin = R0 * max(1e-3, 1.0 - e)
    xmax = (tmax / Amin) ** 2
    kv = 1.42e6 if k is None else float(k)
    phase_err = kv * Amin * 0.027 * xmax ** 4
    if e > 0.25 or phase_err > 0.03:
        return 'fast', 'vpu'
    if e > SERIES_E_MAX:
        return 'recentred', 'vpu'
    fast_ok = error_budget is not None and \
        error_budget >= MXU_FAST_FIELD_ERR
    if e > SERIES_E2_MAX:
        return 'recentred', 'mxu-fast' if fast_ok else 'mxu'
    # small longitudinal extent: the two-term 1/A series is both faster
    # (56 vs 72 MXU column-passes) and at least as accurate (~e^2 weight
    # error <= 1e-3 at this envelope)
    return 'recentred', 'mxu-fast' if fast_ok else 'mxu2'


def _tile_bounds(N, ntiles):
    """(tile_size, starts): uniform ceil-division tiling of range(N).
    The last tile may extend past N; callers edge-pad the arrays to
    ntiles*tile_size (diffract) or clip the slice (choose_tile_modes)."""
    T = -(-N // ntiles)
    return T, [i * T for i in range(ntiles)]


def choose_tile_modes(dst_xyz, src_xyz, n_dst_tiles, n_src_tiles, k=None,
                      error_budget=None):
    """Per-tile-pair kernel modes for :func:`diffract` blockwise tiling.

    Requires the samples to be SPATIALLY SORTED along the beam axis
    (``sort='y'`` in the prepare_wave samplers), so that contiguous
    slices are spatial tiles.  Returns a (n_dst_tiles, n_src_tiles)
    nested list of (phase_mode, accumulate) chosen per tile pair — the
    blockwise analog of recentring per attention tile: a short-distance
    stage whose GLOBAL geometry breaks the recentred envelopes usually
    satisfies them on most tile pairs, leaving the exact per-pair 'fast'
    phase only near the contact region."""
    Nd = len(np.asarray(dst_xyz[0]))
    Ns = len(np.asarray(src_xyz[0]))
    # the same uniform tiling diffract() uses (its scan needs equal-size
    # tiles); the last tile is clipped here and edge-padded there
    Td, dstarts = _tile_bounds(Nd, n_dst_tiles)
    Ts, sstarts = _tile_bounds(Ns, n_src_tiles)
    modes = []
    for di in range(n_dst_tiles):
        row = []
        dsl = slice(dstarts[di], min(dstarts[di] + Td, Nd))
        dxyz = tuple(np.asarray(v)[dsl] for v in dst_xyz)
        for si in range(n_src_tiles):
            ssl = slice(sstarts[si], min(sstarts[si] + Ts, Ns))
            sxyz = tuple(np.asarray(v)[ssl] for v in src_xyz)
            if dxyz[0].size == 0 or sxyz[0].size == 0:
                # empty clipped tile: contributes nothing; any mode works
                row.append(('recentred', 'mxu'))
            else:
                row.append(choose_kirchhoff_mode(
                    dxyz, sxyz, k, error_budget=error_budget))
        modes.append(row)
    return modes


def rescale_field(beam: Beam, target_rms=1.0):
    """(beam', log_scale): scale the field (Es, Ep and the coherency
    matrix) so the RMS good-sample amplitude becomes *target_rms*.

    The Kirchhoff chain is linear in the field but the reference's flux
    bookkeeping makes |Es| grow by several orders of magnitude per OE hop
    (the reference SoftiMAX chain reaches J ~ 1e39, beyond float32
    range).  float32 chains therefore renormalize between stages and
    undo the accumulated scale on the final result:

        beam, ls = rescale_field(loc);  logs += ls
        ...
        J_true = J_final * exp(-2 * logs)   # in float64, on host

    diffract()'s flux normalization is scale-invariant (SumJ/SumJnl
    cancels), so rescaling the source beam of a diffract scales its
    output field linearly — the chain stays exact."""
    good = (beam.state == 1).astype(beam.Jss.dtype)
    ng = jnp.maximum(jnp.sum(good), 1.0)
    p2 = jnp.abs(beam.Es) ** 2 + jnp.abs(beam.Ep) ** 2
    rms = jnp.sqrt(jnp.sum(jnp.where(good > 0, p2, 0.0)) / ng)
    s = jnp.where(rms > 0, target_rms / rms, 1.0).astype(beam.Jss.dtype)
    sc = s.astype(jnp.result_type(beam.Es))
    out = beam.replace(
        Es=beam.Es * sc, Ep=beam.Ep * sc,
        Jss=beam.Jss * s * s, Jpp=beam.Jpp * s * s,
        Jsp=beam.Jsp * (sc * sc))
    return out, jnp.log(s)


def qualify_sampling(wave: Wave, E, goodlen):
    """Fresnel number and samples-per-zone diagnostics
    (cf. waves.py:587-604)."""
    a = wave.xDiffr / wave.rDiffr
    c = wave.zDiffr / wave.rDiffr
    NAx = (jnp.max(a) - jnp.min(a)) * 0.5
    NAz = (jnp.max(c) - jnp.min(c)) * 0.5
    invLambda = E / CH * 1e7
    fn = (NAx ** 2 + NAz ** 2) * jnp.mean(wave.rDiffr) * invLambda
    return fn, jnp.abs(goodlen / fn)


# ---------------------------------------------------------------------------
# one-call propagation forms (reference reflect.py:405-449,
# screens.py:367-421, apertures.py:501-542)
# ---------------------------------------------------------------------------

def _shine_or_diffract(wave, waveOnSelf, key, fixedEnergy=None, **dkw):
    """Fill *waveOnSelf* from *wave*: a source shines its analytic/filament
    field directly; anything else Kirchhoff-diffracts the surface field."""
    prevOE = waveOnSelf.fromOE
    if hasattr(prevOE, 'shine_wave'):          # synchrotron source
        if key is None:
            key = jax.random.PRNGKey(0)
        E = fixedEnergy if fixedEnergy is not None else \
            float(wave.E[0]) if wave is not None else None
        return prevOE.shine_wave(key, waveOnSelf, fixedEnergy=E)
    if hasattr(prevOE, 'shine') and not hasattr(prevOE, 'reflect'):
        if key is None:
            key = jax.random.PRNGKey(0)
        return prevOE.shine(key, waveOnSelf)   # analytic Gaussian beams
    return diffract(wave, waveOnSelf, **dkw)


def reflect_wave(oe, b, key=None, **kwargs):
    """Reflect a diffracted wave at its receiving OE surface, preserving
    the receiver's EXACT local sample coordinates.

    ``oe.reflect(wave_to_global(b))`` round-trips the positions through
    global coordinates; in float32 that quantizes them at
    ulp(|center|) ~ 1e-3 mm for a 20-m beamline — hundreds of radians
    of per-sample phase noise for the NEXT Kirchhoff hop (the receiving
    geometry itself is exact: prepare_wave carries f64-derived
    residuals, but the beam's local x/y/z would not survive the round
    trip).  The wave's own x/y/z ARE the exact surface samples, so they
    (and s/phi for parametric surfaces) are restored on the local
    output.  In float64 this is a no-op to ~1e-12.

    Returns (beamGlobal, beamLocal) like reflect."""
    if key is None:
        key = jax.random.PRNGKey(0)
    glo, loc = oe.reflect(wave_to_global(b), key,
                          noIntersectionSearch=True, **kwargs)
    loc = loc.replace(x=b.x, y=b.y, z=b.z)
    if b.s is not None:
        loc = loc.replace(s=b.s, phi=b.phi)
    return glo, loc


def propagate_wave_to_oe(oe, wave, nrays='auto', key=None,
                         fixedEnergy=None, prevOE=None, **dkw):
    """One-call wave hop onto an OE and reflection at its surface
    (reference OE.propagate_wave, reflect.py:405-449): samples the
    receiving surface, diffracts (or shines, for a source parent) the
    incoming *wave* onto it, then reflects without intersection search.
    *wave.toOE* must be the element the incoming samples live on (as set
    by every prepare_wave_* sampler).

    Returns (beamGlobal, beamLocal) like reflect."""
    if prevOE is None:
        prevOE = getattr(wave, 'toOE', None) if wave is not None else None
    if prevOE is None:
        raise ValueError('the incoming beam has no toOE (e.g. it came out '
                         'of reflect); pass prevOE= explicitly')
    n = wave.xDiffr.shape[0] if nrays == 'auto' else int(nrays)
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    waveOnSelf = prepare_wave_on_oe(oe, prevOE, n, key=k1)
    waveOnSelf = _shine_or_diffract(wave, waveOnSelf, k2,
                                    fixedEnergy=fixedEnergy, **dkw)
    retGlo, retLoc = reflect_wave(oe, waveOnSelf)
    if retLoc.area is None:
        retLoc = retLoc.replace(area=waveOnSelf.area)
    return retGlo, retLoc


def expose_wave_on_screen(screen, wave, dim1, dim2, key=None,
                          fixedEnergy=None, prevOE=None, **dkw):
    """One-call wave hop onto a screen pixel grid (reference
    Screen.expose_wave, screens.py:367-421).  Returns the filled Wave."""
    if prevOE is None:
        prevOE = getattr(wave, 'toOE', None) if wave is not None else None
    if prevOE is None:
        raise ValueError('the incoming beam has no toOE (e.g. it came out '
                         'of reflect); pass prevOE= explicitly')
    waveOnSelf = prepare_wave_on_screen(screen, prevOE, dim1, dim2)
    return _shine_or_diffract(wave, waveOnSelf, key,
                              fixedEnergy=fixedEnergy, **dkw)


def propagate_wave_to_aperture(aperture, wave, nrays='auto', key=None,
                               fixedEnergy=None, prevOE=None, **dkw):
    """One-call wave hop onto aperture samples (reference
    apertures propagate_wave, apertures.py:501-542).  Returns the filled
    Wave (samples are drawn inside the opening, so no extra masking)."""
    if prevOE is None:
        prevOE = getattr(wave, 'toOE', None) if wave is not None else None
    if prevOE is None:
        raise ValueError('the incoming beam has no toOE (e.g. it came out '
                         'of reflect); pass prevOE= explicitly')
    n = wave.xDiffr.shape[0] if nrays == 'auto' else int(nrays)
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    waveOnSelf = prepare_wave_on_aperture(aperture, prevOE, n, key=k1)
    return _shine_or_diffract(wave, waveOnSelf, k2,
                              fixedEnergy=fixedEnergy, **dkw)
