"""Optical element base: placement, ray-surface intersection, reflection.

TPU-native re-implementation of the capabilities of the reference
xrt/backends/raycing/oes/base.py (OE:65, find_intersection:848,
_use_my_method:933, _use_Brent_method:961, rays_good:1094, _bracketing:1247)
and oes/reflect.py (reflect:18, _reflect_local:551, _grating_deflection:451,
multiple_reflect:165).

Design differences from the reference (deliberate, for XLA):

* Rays are never boolean-filtered; the ``state`` mask selects which rays are
  transformed, everything else flows through ``jnp.where``.
* The intersection solver is a vectorized Illinois (modified regula falsi)
  iteration under ``lax.while_loop`` with a convergence mask — one solver
  with guaranteed bracket convergence instead of the reference's
  secant-vs-Brent runtime choice; all rays iterate in lockstep on the VPU.
* Material dispatch (mirror/crystal/plate/grating/...) happens at trace
  time from the static ``kind`` string — each branch compiles only if used.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .. import config
from ..beam import Beam, rotate_coherency_matrix
from ..physconsts import CH, CHBAR
from ..transforms import (rotate_beam, rotate_x, rotate_y, rotate_z,
                          global_to_virgin_local, virgin_local_to_global)

MAX_HALF_SIZE_OF_OE = 1000.0   # mm (reference raycing:254)
MAX_DEPTH_OF_OE = 100.0        # mm (reference raycing:255)
DT_MARGIN = 1e-5               # mm margin around OE (reference raycing:250)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


# ---------------------------------------------------------------------------
# intersection solver
# ---------------------------------------------------------------------------

def _z_eps(dtype):
    """Convergence tolerance of the intersection search: the reference uses
    zEps=1e-12 mm in float64 (raycing:247); in float32 that is unreachable,
    so scale with the dtype epsilon."""
    if dtype == jnp.float64:
        return 1e-12
    return 3e-6


def _rel_eps(dtype):
    """Relative bracket-width tolerance (a small multiple of the dtype
    epsilon: the bracket cannot shrink below the ULP of t anyway)."""
    return 32.0 * float(jnp.finfo(dtype).eps)


def find_intersection(surface_fn, tMin, tMax, x, y, z, a, b, c,
                      invertNormal=1, active=None, max_iterations=None):
    """Bracketed root-find against an explicit surface z(x, y); see
    :func:`find_intersection_dz` for the general form."""
    def dz_fn(xx, yy, zz):
        surf = surface_fn(xx, yy)
        surf = jnp.where(jnp.isnan(surf), 0.0, surf)
        return (zz - surf) * invertNormal
    return find_intersection_dz(dz_fn, tMin, tMax, x, y, z, a, b, c,
                                active, max_iterations)


def find_intersection_dz(dz_fn, tMin, tMax, x, y, z, a, b, c,
                         active=None, max_iterations=None):
    """Vectorized bracketed root-finding of dz(t) along each ray
    (cf. reference find_intersection base.py:848-886 + the solvers at
    :933-1048).  *dz_fn(x, y, z) -> signed distance* must be positive at
    tMin and negative at tMax for rays that intersect.  Returns
    (t, x2, y2, z2, lost_mask) where lost_mask marks rays already below the
    surface at tMin (reference's ind1)."""
    dt = x.dtype
    eps = _z_eps(dt)
    if max_iterations is None:
        max_iterations = config.MAX_INTERSECTION_ITERATIONS
    if active is None:
        active = jnp.ones_like(x, dtype=bool)

    def f(t):
        xx = x + a * t
        yy = y + b * t
        zz = z + c * t
        return dz_fn(xx, yy, zz), xx, yy, zz

    dz1, x1, y1, z1 = f(tMin)
    dz2, x2, y2, z2 = f(tMax)
    lost = active & (dz1 <= 0)       # started below the surface
    over = active & (dz2 >= 0)       # never crosses within bracket
    good = active & ~(lost | over)

    # Illinois iteration on bracket [ta, tb] with f(ta) > 0 > f(tb)
    ta = tMin
    tb = tMax
    fa = dz1
    fb = dz2

    def cond(state):
        it, ta, tb, fa, fb, ts, fs, act = state
        return jnp.logical_and(it < max_iterations, jnp.any(act))

    def body(state):
        it, ta, tb, fa, fb, ts_prev, fs_prev, act = state
        denom = fb - fa
        denom = jnp.where(denom == 0, 1.0, denom)
        ts = ta - fa * (tb - ta) / denom
        # safeguard: fall back to bisection when the step leaves the bracket
        mid = 0.5 * (ta + tb)
        bad = (ts <= jnp.minimum(ta, tb)) | (ts >= jnp.maximum(ta, tb)) | \
            jnp.isnan(ts)
        ts = jnp.where(bad, mid, ts)
        fs, _, _, _ = f(ts)
        keep_a = fs <= 0          # root in [ta, ts]
        # Illinois halving of the stale endpoint to guarantee superlinear
        # convergence
        ta_n = jnp.where(keep_a, ta, ts)
        fa_n = jnp.where(keep_a, fa * 0.5, fs)
        tb_n = jnp.where(keep_a, ts, tb)
        fb_n = jnp.where(keep_a, fs, fb * 0.5)
        ta = jnp.where(act, ta_n, ta)
        tb = jnp.where(act, tb_n, tb)
        fa = jnp.where(act, fa_n, fa)
        fb = jnp.where(act, fb_n, fb)
        ts_keep = jnp.where(act, ts, ts_prev)
        fs_keep = jnp.where(act, fs, fs_prev)
        # relative bracket tolerance: the absolute eps is unreachable in
        # float32 at beamline scales (t ~ 1e4 mm has ~6e-4 mm ULPs), which
        # would silently run every ray to max_iterations — each iteration
        # is an HBM round-trip of the whole ray state.  The Newton polish
        # below restores full precision from a ~1e-5-relative bracket.
        tol = eps + _rel_eps(dt) * (jnp.abs(ta) + jnp.abs(tb))
        act = act & (jnp.abs(fs) > eps) & (jnp.abs(tb - ta) > tol)
        return it + 1, ta, tb, fa, fb, ts_keep, fs_keep, act

    ts0 = jnp.where(good, 0.5 * (ta + tb), tMax)
    fs0 = jnp.zeros_like(ts0)
    _, ta, tb, fa, fb, ts, fs, _ = jax.lax.while_loop(
        cond, body, (0, ta, tb, fa, fb, ts0, fs0, good))

    t = jax.lax.stop_gradient(
        jnp.where(good, ts, jnp.where(lost, tMin, tMax)))

    # Differentiable Newton polish through stop_gradient: the while_loop is
    # not reverse-differentiable, but one Newton step from the converged
    # root provides the exact implicit-function-theorem gradients
    # d(t*)/d(params) = -dF/dparams / dF/dt — and polishes the root (a help
    # in float32).
    t0 = t

    def F(tt):
        return f(tt)[0]

    t_newton = t0
    for _ in range(2):       # two steps: quadratic -> ~machine precision
        Ft, dFt = jax.jvp(F, (t_newton,), (jnp.ones_like(t_newton),))
        dFt = jnp.where(jnp.abs(dFt) < 1e-12, 1e-12, dFt)
        t_newton = t_newton - Ft / dFt
    # keep the Newton result only where it stays within the bracket
    ok = good & (t_newton >= tMin) & (t_newton <= tMax) & \
        jnp.isfinite(t_newton)
    t = jnp.where(ok, t_newton, t)
    xx = x + a * t
    yy = y + b * t
    zz = z + c * t
    return t, xx, yy, zz, lost


# ---------------------------------------------------------------------------
# the OE class
# ---------------------------------------------------------------------------

class _OEMethods:
    """Surface definition and trace methods shared by all OEs."""

    isParametric = False

    # ---- surface-as-code interface (override in subclasses) -------------
    def local_z(self, x, y):
        """Surface height z(x, y) in the local frame; default flat
        (cf. base.py:675)."""
        return jnp.zeros_like(x)

    def local_n(self, x, y):
        """Surface normal [nx, ny, nz] (or 6-list [bragg-normal, surface
        normal] for asymmetric crystals); default (0,0,1), with the crystal
        asymmetry angle *alpha* rotating the Bragg-plane normal about x
        (cf. base.py:720-744)."""
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        if getattr(self, 'alpha', None) is not None:
            from ..transforms import rotate_x as _rx
            bA, cA = _rx(zero, one, jnp.cos(self.alpha),
                         -jnp.sin(self.alpha))
            return [zero, bA, cA, zero, zero, one]
        return [zero, zero, one]

    def local_g(self, x, y):
        """Local groove/zone vector for gratings/FZPs, 1/mm.

        Any OE with *gratingDensity* = [axis, rho0, P0, P1, ...] becomes
        a (possibly VLS) grating on its own surface, like the reference
        (base.py:213-229): rho(t) = rho0*(P0 + 2 P1 t + 3 P2 t^2 + ...)
        along the given axis."""
        gd = getattr(self, 'gratingDensity', None)
        if gd is None:
            raise NotImplementedError
        t = x if self.grooveAxis == 'x' else y
        rho = gd[1] * jnp.ones_like(t)
        if gd.shape[0] > 2:
            poly = gd[2] * jnp.ones_like(t)
            for i in range(3, gd.shape[0]):
                poly = poly + (i - 1) * gd[i] * t ** (i - 2)
            rho = rho * poly
        zero = jnp.zeros_like(t)
        if self.grooveAxis == 'x':
            return [-rho, zero, zero]
        return [zero, -rho, zero]

    def _export_params(self):
        """JSON-layout hook: re-encode gratingDensity in the reference's
        [axis, rho0, P0, ...] input form."""
        gd = getattr(self, 'gratingDensity', None)
        if gd is None:
            return (), {}
        vals = [float(v) for v in np.asarray(gd)[1:]]
        return (('gratingDensity',),
                {'gratingDensity': [self.grooveAxis] + vals})

    # ---- parametric interface (isParametric = True subclasses) ----------
    def local_r(self, s, phi):
        """Radial surface coordinate of a parametric OE (base.py:761)."""
        raise NotImplementedError

    def local_r_distorted(self, s, phi):
        if getattr(self, 'figure_error', None) is not None:
            return self.figure_error.local_r_distorted(s, phi)
        return None

    def xyz_to_param(self, x, y, z):
        raise NotImplementedError

    def param_to_xyz(self, s, phi, r):
        raise NotImplementedError

    def local_z_distorted(self, x, y):
        """Additive figure-error height; None if absent (base.py:801)."""
        if getattr(self, 'figure_error', None) is not None:
            return self.figure_error.local_z_distorted(x, y)
        return None

    def local_n_distorted(self, x, y):
        """Figure-error normal perturbation: None, (dpitch, droll) angles or
        a 3-vector to add to the normal (reflect.py:765)."""
        if getattr(self, 'figure_error', None) is not None:
            return self.figure_error.local_n_distorted(x, y)
        return None

    def local_n_depth(self, x, y, z):
        """Bragg-plane + surface normals at depth *z* inside the crystal,
        for volumetric-diffraction OEs (BentLaue2D, laue.py:366-417).
        None means no depth dependence."""
        return None

    # ---- effective placement angles (overridden by DCM crystals) ---------
    def _placement(self, is2ndXtal=False):
        pitch = self.pitch
        if getattr(self, 'bragg_', None) is not None:
            pitch = pitch + self.bragg_
        roll = self.roll + self.positionRoll
        return pitch, roll, self.yaw, None, None, None

    def _surface_with_distortion(self, x, y):
        surf = self.local_z(x, y)
        dist = self.local_z_distorted(x, y)
        if dist is not None:
            surf = surf + dist
        return surf

    # ---- classification --------------------------------------------------
    def rays_good(self, x, y, state, lostNum=config.STATE_DEAD,
                  limits=None):
        """Good/out/over/dead classification against physical and optical
        limits (cf. base.py:1094-1164).  Returns the new state array."""
        if limits is not None:
            limPhysX, limPhysY, limOptX, limOptY = limits
        else:
            limPhysX = self.limPhysX
            limPhysY = self.limPhysY
            limOptX = self.limOptX
            limOptY = self.limOptY
        locState = jnp.ones_like(state)
        if self.shape == 'rect':
            if limOptX is not None:
                out = ((limPhysX[0] <= x) & (x < limOptX[0])) | \
                      ((limOptX[1] <= x) & (x < limPhysX[1]))
                locState = jnp.where(out, 2, locState)
            if limOptY is not None:
                out = ((limPhysY[0] <= y) & (y < limOptY[0])) | \
                      ((limOptY[1] <= y) & (y < limPhysY[1]))
                locState = jnp.where(out, 2, locState)
            outside = (x < limPhysX[0]) | (x > limPhysX[1]) | \
                      (y < limPhysY[0]) | (y > limPhysY[1])
            overEdge = getattr(self, 'overEdge', 'ymax')
            over = jnp.zeros_like(outside)
            if 'xmin' in overEdge:
                over = over | (x < limPhysX[0])
            if 'xmax' in overEdge:
                over = over | (x > limPhysX[1])
            if 'ymin' in overEdge:
                over = over | (y < limPhysY[0])
            if 'ymax' in overEdge:
                over = over | (y > limPhysY[1])
            locState = jnp.where(outside, lostNum, locState)
            locState = jnp.where(over, 3, locState)
        elif self.shape == 'round':
            centerX = (limPhysX[0] + limPhysX[1]) * 0.5
            radiusX = (limPhysX[1] - limPhysX[0]) * 0.5
            centerY = (limPhysY[0] + limPhysY[1]) * 0.5
            radiusY = (limPhysY[1] - limPhysY[0]) * 0.5
            rr = ((x - centerX) / radiusX) ** 2 + \
                 ((y - centerY) / radiusY) ** 2
            locState = jnp.where(rr > 1, lostNum, locState)
        else:
            raise ValueError(f'unknown OE shape {self.shape!r}')
        # keep pre-existing dead/alive status
        return jnp.where(state == 1, locState, state)

    # ---- bracketing (cf. base.py:1218-1297) ------------------------------
    def _bracket(self, x, y, z, a, b, c, good, limPhysX=None,
                 limPhysY=None):
        if limPhysX is None:
            limPhysX = self.limPhysX
        if limPhysY is None:
            limPhysY = self.limPhysY
        def set_t(xyz, abc, lim, defSize):
            if lim is None:
                limMin = -defSize
                limMax = defSize
            else:
                limMin = jnp.maximum(lim[0], -defSize)
                limMax = jnp.minimum(lim[1], defSize)
            abc_safe = jnp.where(abc == 0, 1e-30, abc)
            tLo = (limMin - xyz) / abc_safe
            tHi = (limMax - xyz) / abc_safe
            pos = abc > 0
            tA = jnp.where(pos, tLo, tHi) - DT_MARGIN
            tB = jnp.where(pos, tHi, tLo) + DT_MARGIN
            return tA, tB

        # reference picks the globally dominant direction; we pick per ray
        tx1, tx2 = set_t(x, a, limPhysX, MAX_HALF_SIZE_OF_OE)
        ty1, ty2 = set_t(y, b, limPhysY, MAX_HALF_SIZE_OF_OE)
        tz1, tz2 = set_t(z, c, None, MAX_DEPTH_OF_OE)
        absa, absb, absc = jnp.abs(a), jnp.abs(b), jnp.abs(c)
        useX = (absa >= absb) & (absa >= absc)
        useY = (absb > absa) & (absb >= absc)
        tMin = jnp.where(useX, tx1, jnp.where(useY, ty1, tz1))
        tMax = jnp.where(useX, tx2, jnp.where(useY, ty2, tz2))
        # clip the start for near-coincident previous reflection points
        # (base.py:1283)
        tMin = jnp.maximum(tMin, -1e6 * _z_eps(x.dtype))
        tMax = jnp.maximum(tMax, tMin)
        return tMin, tMax

    # ---- grating deflection (reflect.py:451-470) --------------------------
    def _grating_deflection(self, key, a, b, c, E, g, oeNormal,
                            beamInDotNormal, order=1, sig=None):
        gx, gy, gz = g[0], g[1], g[2]
        beamInDotG = a * gx + b * gy + c * gz
        G2 = gx ** 2 + gy ** 2 + gz ** 2
        if isinstance(order, (int, float)):
            locOrder = jnp.full_like(a, order)
        elif isinstance(order, (tuple, list)):
            idx = jax.random.randint(key, a.shape, 0, len(order))
            locOrder = jnp.asarray(order, a.dtype)[idx]
        else:
            locOrder = order
        orderLambda = locOrder * CH / E * 1e-7
        u = beamInDotNormal ** 2 - 2 * beamInDotG * orderLambda - \
            G2 * orderLambda ** 2
        gs = jnp.sign(beamInDotNormal) if sig is None else sig
        dn = beamInDotNormal + gs * jnp.sqrt(jnp.abs(u))
        nsx, nsy, nsz = oeNormal[-3], oeNormal[-2], oeNormal[-1]
        a_out = a - nsx * dn + gx * orderLambda
        b_out = b - nsy * dn + gy * orderLambda
        c_out = c - nsz * dn + gz * orderLambda
        norm = jnp.sqrt(a_out ** 2 + b_out ** 2 + c_out ** 2)
        return a_out / norm, b_out / norm, c_out / norm, locOrder

    def propagate_wave(self, wave=None, nrays='auto', key=None,
                       fixedEnergy=None, prevOE=None, **dkw):
        """One-call Kirchhoff hop onto this OE + reflection at its surface
        (reference OE.propagate_wave, reflect.py:405-449).  Returns
        (beamGlobal, beamLocal)."""
        from ..waves import propagate_wave_to_oe
        return propagate_wave_to_oe(self, wave, nrays=nrays, key=key,
                                    fixedEnergy=fixedEnergy, prevOE=prevOE,
                                    **dkw)

    def multiple_reflect(self, beam: Beam, key=None, maxReflections=20):
        """Reflect with up to *maxReflections* bounces on the same (closed
        or strongly curved) surface — whispering-gallery and capillary
        optics (cf. reference multiple_reflect, reflect.py:165-264).

        Returns (beamGlobal, beamLocalLast): the global beam carries
        ``nRefl`` per ray; rays that leave the surface keep the state/
        position of their last bounce.  The loop length is static
        (jit-friendly); converged rays pass through masked."""
        if key is None:
            key = jax.random.PRNGKey(0)
        good_in = beam.state > 0
        lb = global_to_virgin_local(beam, self.center)
        pitch, roll, yaw, dx, dy, dz = self._placement()
        nRefl = jnp.zeros_like(beam.state)
        good = good_in

        def one_bounce(lb, good, nRefl, out_local, keyi, isMulti):
            prev = lb
            vlb, loc = self._reflect_local(
                lb, good, keyi, pitch, roll, yaw, dx, dy, dz,
                isMulti=isMulti)
            over = vlb.state == 3
            # rays that flew over keep their pre-step coordinates
            # (reflect.py:226-229)
            vlb = vlb.replace(
                x=jnp.where(good & over, prev.x, vlb.x),
                y=jnp.where(good & over, prev.y, vlb.y),
                z=jnp.where(good & over, prev.z, vlb.z))
            newGood = good & ((vlb.state == 1) | (vlb.state == 2))
            nRefl = nRefl + newGood.astype(nRefl.dtype)
            lb = _merge_by_mask(lb, vlb, good)
            if out_local is None:
                out_local = loc
            else:
                out_local = _merge_by_mask(out_local, loc, newGood)
            return lb, newGood, nRefl, out_local

        # first bounce traced separately (isMulti=False picks the forward
        # intersection bracket), then ONE scanned body for the rest — the
        # jaxpr holds a single copy of the reflect body instead of
        # maxReflections unrolled ones (compile time/code size for
        # capillaries)
        lb, good, nRefl, out_local = one_bounce(
            lb, good, nRefl, None, jax.random.fold_in(key, 0), False)

        def body(carry, i):
            lb, good, nRefl, out_local = carry
            return one_bounce(lb, good, nRefl, out_local,
                              jax.random.fold_in(key, i), True), None

        if maxReflections > 1:
            (lb, good, nRefl, out_local), _ = jax.lax.scan(
                body, (lb, good, nRefl, out_local),
                jnp.arange(1, maxReflections))
        reflected = nRefl > 0
        glo = virgin_local_to_global(lb, self.center)
        merged = _merge_by_mask(beam, glo, good_in & reflected)
        merged = merged.replace(
            state=jnp.where(good_in & reflected, 1, beam.state),
            nRefl=nRefl)
        return merged, out_local

    def local_to_global(self, lb: Beam, is2ndXtal=False) -> Beam:
        """Transform a true-local beam into the global frame, rotating the
        polarization back by the local roll (cf. reference base.py:1166-1243
        local_to_global).  Pure: returns a new Beam."""
        from ..beam import rotate_coherency_matrix as _rcm
        if is2ndXtal and hasattr(self, 'braggAngle'):  # DCM second crystal
            pitch = -self.pitch - self.braggAngle + self.cryst2pitch + \
                self.cryst2finePitch
            roll = self.roll + self.cryst2roll + self.positionRoll
            yaw = -self.yaw
            dx, dy, dz = -self.dxCryst, self.cryst2longTransl, \
                -self.cryst2perpTransl
        elif hasattr(self, 'braggAngle'):
            pitch = self.pitch + self.braggAngle
            roll = self.roll + self.positionRoll + self.cryst1roll
            yaw = self.yaw
            dx, dy, dz = self.dxCryst, None, None
        else:
            pitch, roll, yaw = self._placement()[0:3]
            dx = dy = dz = None
        if dx is not None:
            lb = lb.replace(x=lb.x + dx)
        if dy is not None:
            lb = lb.replace(y=lb.y + dy)
        if dz is not None:
            lb = lb.replace(z=lb.z + dz)
        if self.extraPitch is not None:
            sign = -1.0 if is2ndXtal else 1.0
            lb = rotate_beam(
                lb, rotationSequence='-' + self.extraRotationSequence,
                pitch=sign * self.extraPitch, roll=self.extraRoll,
                yaw=sign * self.extraYaw, skip_zero=False)
        lb = rotate_beam(lb, rotationSequence='-' + self.rotationSequence,
                         pitch=pitch, roll=roll, yaw=yaw, skip_zero=False)
        if is2ndXtal and hasattr(self, 'braggAngle'):
            lb = rotate_beam(lb, roll=math.pi, skip_zero=False)
        # rotate the polarization frame back by the local roll
        if self.isParametric:
            sP, phiP, _ = self.xyz_to_param(lb.x, lb.y, lb.z)
            normal = self.local_n(sP, phiP)
        else:
            normal = self.local_n(lb.x, lb.y)
        ones = jnp.ones_like(lb.x)
        rollAngle = self.roll + self.positionRoll + \
            jnp.arctan2(normal[-3] * ones, normal[-1] * ones)
        Jss, Jpp, Jsp = _rcm(lb.Jss, lb.Jpp, lb.Jsp, rollAngle)
        updates = dict(Jss=Jss, Jpp=Jpp, Jsp=Jsp)
        if lb.Es is not None:
            cosY, sinY = jnp.cos(rollAngle), jnp.sin(rollAngle)
            Es, Ep = rotate_y(lb.Es, lb.Ep, cosY, sinY)
            updates.update(Es=Es, Ep=Ep)
        lb = lb.replace(**updates)
        return virgin_local_to_global(lb, self.center)

    # ---- the main trace method -------------------------------------------
    def reflect(self, beam: Beam, key=None, needLocal=True,
                noIntersectionSearch=False, is2ndXtal=False,
                fromVacuum=True):
        """Reflect/refract/diffract *beam* (global frame) off this OE
        (cf. reflect.py:18-163).  Returns (beamGlobal, beamLocal); pure and
        jittable.  *key* is needed only for stochastic materials (powder,
        mosaic, multi-order gratings)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        good_in = beam.state > 0

        lb = global_to_virgin_local(beam, self.center)
        pitch, roll, yaw, dx, dy, dz = self._placement(is2ndXtal)
        lb, out = self._reflect_local(
            lb, good_in, key, pitch, roll, yaw, dx, dy, dz,
            fromVacuum=fromVacuum, is2ndXtal=is2ndXtal,
            noIntersectionSearch=noIntersectionSearch)
        # merge with the incoming beam: untouched rays stay as they came
        glo = lb
        # virgin-local -> global
        glo = virgin_local_to_global(glo, self.center)
        merged_glo = _merge_by_mask(beam, glo, good_in)
        if needLocal:
            return merged_glo, out
        return merged_glo

    def _reflect_local(self, lb, good, key, pitch, roll, yaw,
                       dx=None, dy=None, dz=None, fromVacuum=True,
                       is2ndXtal=False, noIntersectionSearch=False,
                       local_z=None, local_n=None, material=None,
                       limits=None, isMulti=False):
        """The virgin-local-frame part of reflect (cf. reflect.py:551-1139).
        Returns (virgin-local beam, true-local beam)."""
        isParam = getattr(self, 'isParametric', False)
        if material is None:
            material = self.material
        if local_z is None:
            local_z = self.local_r if isParam else self.local_z
        if local_n is None:
            local_n = self.local_n
        lb_in = lb
        if is2ndXtal:
            lb = rotate_beam(lb, roll=math.pi, skip_zero=False)
        lb = rotate_beam(lb, rotationSequence=self.rotationSequence,
                         pitch=-pitch, roll=-roll, yaw=-yaw, skip_zero=False)
        if self.extraPitch is not None:
            extraSign = -1.0 if is2ndXtal else 1.0
            lb = rotate_beam(
                lb, rotationSequence=self.extraRotationSequence,
                pitch=-extraSign * self.extraPitch, roll=-self.extraRoll,
                yaw=-extraSign * self.extraYaw, skip_zero=False)
        if dx is not None:
            lb = lb.replace(x=lb.x - dx)
        if dy is not None:
            lb = lb.replace(y=lb.y - dy)
        if dz is not None:
            lb = lb.replace(z=lb.z - dz)

        invertNormal = getattr(self, 'invertNormal', None)
        if invertNormal is None:
            invertNormal = 1 if fromVacuum else -1

        limPhysX, limPhysY, limOptX, limOptY = limits if limits is not \
            None else (self.limPhysX, self.limPhysY, self.limOptX,
                       self.limOptY)

        if isParam:
            # the signed distance in the radial parametric coordinate
            # (cf. reference find_dz with diffSign=-1, base.py:801-846)
            def dz_fn(xx, yy, zz):
                s_, phi_, r_ = self.xyz_to_param(xx, yy, zz)
                surf = local_z(s_, phi_)
                dist = self.local_r_distorted(s_, phi_)
                if dist is not None:
                    surf = surf + dist
                surf = jnp.where(jnp.isnan(surf), 0.0, surf)
                return (surf - r_) * invertNormal
        else:
            def dz_fn(xx, yy, zz):
                surf = local_z(xx, yy)
                dist = self.local_z_distorted(xx, yy)
                if dist is not None:
                    surf = surf + dist
                surf = jnp.where(jnp.isnan(surf), 0.0, surf)
                return (zz - surf) * invertNormal

        tMin, tMax = self._bracket(lb.x, lb.y, lb.z, lb.a, lb.b, lb.c, good,
                                   limPhysX, limPhysY)
        if isMulti:
            # start the search past the tangent point: the root of the
            # derivative of dz along the ray (cf. reference _bracketing with
            # isMulti, base.py:1283-1295, derivOrder=1)
            def ddz_fn(xx, yy, zz):
                def g(t):
                    return dz_fn(xx + lb.a * t, yy + lb.b * t,
                                 zz + lb.c * t)
                val, dval = jax.jvp(g, (jnp.zeros_like(xx),),
                                    (jnp.ones_like(xx),))
                return dval
            t_tan, _, _, _, _ = find_intersection_dz(
                ddz_fn, jnp.zeros_like(tMin), tMax,
                lb.x, lb.y, lb.z, lb.a, lb.b, lb.c, active=good)
            tMin = t_tan + 1e-6
        if noIntersectionSearch:
            t = jnp.zeros_like(lb.x)
            xx, yy, zz = lb.x, lb.y, lb.z
            lost_mask = jnp.zeros_like(good)
        elif hasattr(self, 'analytic_intersect'):
            t, xx, yy, zz, lost_mask = self.analytic_intersect(
                tMin, tMax, lb.x, lb.y, lb.z, lb.a, lb.b, lb.c)
        else:
            t, xx, yy, zz, lost_mask = find_intersection_dz(
                dz_fn, tMin, tMax,
                lb.x, lb.y, lb.z, lb.a, lb.b, lb.c,
                active=good)
        x_new = jnp.where(good, xx, lb.x)
        y_new = jnp.where(good, yy, lb.y)
        z_new = jnp.where(good, zz, lb.z)
        if isParam:
            # switch to parametric coordinates for state/normal evaluation
            # (the reference stores s, phi, r in lb.x/y/z at this stage)
            sP, phiP, rP = self.xyz_to_param(x_new, y_new, z_new)
            tX, tY, tZ = self.param_to_xyz(sP, phiP, rP)
            lb = lb.replace(x=jnp.where(good, sP, lb.x),
                            y=jnp.where(good, phiP, lb.y),
                            z=jnp.where(good, rP, lb.z))
            state = self.rays_good(tX, tY, lb.state,
                                   limits=(limPhysX, limPhysY, limOptX,
                                           limOptY))
        else:
            lb = lb.replace(x=x_new, y=y_new, z=z_new)
            state = self.rays_good(lb.x, lb.y, lb.state,
                                   limits=(limPhysX, limPhysY, limOptX,
                                           limOptY))
        state = jnp.where(good & lost_mask, config.STATE_DEAD, state)
        state = jnp.where(good, state, lb.state)
        lb = lb.replace(state=state)
        goodN = state == 1
        lb = lb.replace(path=jnp.where(goodN, lb.path + t, lb.path))

        lb, rollAngle = self._interact(lb, goodN, key, roll, fromVacuum, t,
                                       material, local_n,
                                       is2ndXtal=is2ndXtal)
        if isParam:
            # back to cartesian; keep the parametric impact coordinates
            # (cf. reflect.py:1112-1117)
            xC, yC, zC = self.param_to_xyz(lb.x, lb.y, lb.z)
            lb = lb.replace(s=lb.x, phi=lb.y, r=lb.z,
                            x=jnp.where(good, xC, lb.x),
                            y=jnp.where(good, yC, lb.y),
                            z=jnp.where(good, zC, lb.z))

        # back to virgin local; rotate the polarization frame back by the
        # local roll — in the virgin-local beam only, the true-local beam
        # keeps the surface s/p frame (reflect.py:1105-1110)
        vlb = lb
        if rollAngle is not None:
            JssB, JppB, JspB = rotate_coherency_matrix(
                lb.Jss, lb.Jpp, lb.Jsp, rollAngle)
            upd = dict(Jss=jnp.where(goodN, JssB, lb.Jss),
                       Jpp=jnp.where(goodN, JppB, lb.Jpp),
                       Jsp=jnp.where(goodN, JspB, lb.Jsp))
            if lb.Es is not None:
                cosYb, sinYb = jnp.cos(rollAngle), jnp.sin(rollAngle)
                EsB, EpB = rotate_y(lb.Es, lb.Ep, cosYb, sinYb)
                upd['Es'] = jnp.where(goodN, EsB, lb.Es)
                upd['Ep'] = jnp.where(goodN, EpB, lb.Ep)
            vlb = lb.replace(**upd)
        if dx is not None:
            vlb = vlb.replace(x=vlb.x + dx)
        if dy is not None:
            vlb = vlb.replace(y=vlb.y + dy)
        if dz is not None:
            vlb = vlb.replace(z=vlb.z + dz)
        if self.extraPitch is not None:
            extraSign = -1.0 if is2ndXtal else 1.0
            vlb = rotate_beam(
                vlb, rotationSequence='-' + self.extraRotationSequence,
                pitch=extraSign * self.extraPitch, roll=self.extraRoll,
                yaw=extraSign * self.extraYaw, skip_zero=False)
        vlb = rotate_beam(vlb, rotationSequence='-' + self.rotationSequence,
                          pitch=pitch, roll=roll, yaw=yaw, skip_zero=False)
        if is2ndXtal:
            vlb = rotate_beam(vlb, roll=math.pi, skip_zero=False)
        return vlb, lb

    # ---- the physics at the surface --------------------------------------
    def _interact(self, lb, goodN, key, roll, fromVacuum, tMax, material,
                  local_n=None, is2ndXtal=False):
        """Direction update + reflectivity/transmittivity + polarization
        bookkeeping for rays with state==1 (cf. reflect.py:713-1110)."""
        if local_n is None:
            local_n = self.local_n
        matSur = material[self.curSurface] \
            if isinstance(material, (list, tuple)) else material
        kind = 'mirror' if matSur is None else \
            matSur.resolved_kind(self.auto_material_kind)

        normal = list(local_n(lb.x, lb.y))
        n_dist = self.local_n_distorted(lb.x, lb.y)
        if n_dist is not None:
            if len(n_dist) == 2:
                cosX, sinX = jnp.cos(n_dist[0]), jnp.sin(n_dist[0])
                normal[-2], normal[-1] = rotate_x(normal[-2], normal[-1],
                                                  cosX, sinX)
                cosY, sinY = jnp.cos(n_dist[1]), jnp.sin(n_dist[1])
                normal[-3], normal[-1] = rotate_y(normal[-3], normal[-1],
                                                  cosY, sinY)
            else:
                nx = normal[-3] + n_dist[0]
                ny = normal[-2] + n_dist[1]
                nz = normal[-1] + n_dist[2]
                nn = jnp.sqrt(nx ** 2 + ny ** 2 + nz ** 2)
                normal[-3], normal[-2], normal[-1] = nx / nn, ny / nn, \
                    nz / nn
        isAsymmetric = len(normal) == 6
        nbx, nby, nbz = normal[0], normal[1], normal[2]
        nsx, nsy, nsz = normal[-3], normal[-2], normal[-1]
        ones = jnp.ones_like(lb.x)
        nbx = nbx * ones
        nby = nby * ones
        nbz = nbz * ones
        nsx = nsx * ones
        nsy = nsy * ones
        nsz = nsz * ones

        if kind == 'powder':
            # both the Bragg-plane and the "surface" normal become the
            # random crystallite normal, and the interaction point moves to
            # a random depth in the powder layer (reflect.py:754-765)
            kp1, kp2, key = jax.random.split(key, 3)
            nbx, nby, nbz = matSur.random_orientation(
                kp1, lb.x.shape[0], lb.x.dtype)
            nsx, nsy, nsz = nbx, nby, nbz
            isAsymmetric = False
            if matSur.t is not None:
                depth = jax.random.uniform(
                    kp2, lb.x.shape, lb.x.dtype) * matSur.t
                lb = lb.replace(
                    x=jnp.where(goodN, lb.x + lb.a * depth, lb.x),
                    y=jnp.where(goodN, lb.y + lb.b * depth, lb.y),
                    z=jnp.where(goodN, lb.z + lb.c * depth, lb.z))

        beamInDotNormal = jnp.clip(
            _dot3(lb.a, lb.b, lb.c, nbx, nby, nbz), -1.0, 1.0)
        theta_new = jnp.arccos(beamInDotNormal) - math.pi / 2
        theta = jnp.where(goodN, theta_new,
                          lb.theta if lb.theta is not None else 0.0)
        lb = lb.replace(theta=theta)
        if isAsymmetric:
            beamInDotSurfaceNormal = _dot3(lb.a, lb.b, lb.c, nsx, nsy, nsz)
        else:
            beamInDotSurfaceNormal = beamInDotNormal

        crystalVD = (kind == 'crystal' and isAsymmetric and
                     getattr(matSur, 'volumetricDiffraction', False) and
                     matSur.t is not None)
        if crystalVD:
            # move the diffraction point to a random depth through the
            # crystal and re-evaluate the lattice orientation there
            # (reflect.py:800-830)
            kvd, key = jax.random.split(key)
            thMax = -matSur.t / jnp.where(beamInDotSurfaceNormal == 0,
                                          -1.0, beamInDotSurfaceNormal)
            dpth = jax.random.uniform(kvd, lb.x.shape, lb.x.dtype) * thMax
            lb = lb.replace(
                x=jnp.where(goodN, lb.x + lb.a * dpth, lb.x),
                y=jnp.where(goodN, lb.y + lb.b * dpth, lb.y),
                z=jnp.where(goodN, lb.z + lb.c * dpth, lb.z))
            deep = self.local_n_depth(lb.x, lb.y, lb.z)
            if deep is not None:
                nbx, nby, nbz = (deep[0] * ones, deep[1] * ones,
                                 deep[2] * ones)
                beamInDotNormal = jnp.clip(
                    _dot3(lb.a, lb.b, lb.c, nbx, nby, nbz), -1.0, 1.0)
                theta_new = jnp.arccos(beamInDotNormal) - math.pi / 2
                lb = lb.replace(theta=jnp.where(goodN, theta_new,
                                                lb.theta))

        kg, kmat = jax.random.split(key)
        a_out, b_out, c_out = lb.a, lb.b, lb.c
        order_arr = None
        ras_poly = rap_poly = None
        mosaic = (kind == 'crystal' and getattr(matSur, 'mosaicity', None)
                  is not None)

        if kind in ('powder', 'monocrystal', 'crystal harmonics'):
            a_out, b_out, c_out, ras_poly, rap_poly = \
                matSur.reflect_multi_hkl(
                    kmat, lb.E, (lb.a, lb.b, lb.c),
                    (nbx, nby, nbz), (nsx, nsy, nsz))
        elif kind in ('grating', 'FZP'):
            g = self.local_g(lb.x, lb.y)
            giveSign = 1 if kind == 'FZP' else -1
            a_out, b_out, c_out, order_arr = self._grating_deflection(
                kg, lb.a, lb.b, lb.c, lb.E, g, normal,
                beamInDotSurfaceNormal, self.order, giveSign)
        elif kind in ('mirror', 'thin mirror'):
            a_out = lb.a - nbx * 2 * beamInDotNormal
            b_out = lb.b - nby * 2 * beamInDotNormal
            c_out = lb.c - nbz * 2 * beamInDotNormal
        elif kind in ('crystal', 'multilayer'):
            transmitted = getattr(matSur, 'geom', 'reflected').endswith(
                'transmitted')
            if transmitted:
                pass  # straight through
            elif crystalVD:
                # volumetric diffraction: specular reflection about the
                # depth-local Bragg-plane normal (reflect.py:873-878 with
                # useAsymmetricNormal disabled)
                a_out = lb.a - nbx * 2 * beamInDotNormal
                b_out = lb.b - nby * 2 * beamInDotNormal
                c_out = lb.c - nbz * 2 * beamInDotNormal
            elif mosaic:
                mx, my, mz = _mosaic_normal(kmat, matSur, (nbx, nby, nbz),
                                            lb.E)
                mdot = _dot3(lb.a, lb.b, lb.c, mx, my, mz)
                a_out = lb.a - mx * 2 * mdot
                b_out = lb.b - my * 2 * mdot
                c_out = lb.c - mz * 2 * mdot
            else:
                # asymmetric reflection via the crystal "grating" vector
                # (reflect.py:568-612)
                nDotNs = nbx * nsx + nby * nsy + nbz * nsz
                sgbdn = jnp.where(jnp.mean(beamInDotNormal) < 0, 1.0, -1.0)
                crystd = matSur.d
                wHd = 1.0 / (crystd * 1e-7)
                gx = (nbx - nDotNs * nsx) * wHd * sgbdn
                gy = (nby - nDotNs * nsy) * wHd * sgbdn
                gz = (nbz - nDotNs * nsz) * wHd * sgbdn
                sg = 1 if getattr(matSur, 'geom', 'Bragg').startswith(
                    'Laue') else -1
                a_out, b_out, c_out, _ = self._grating_deflection(
                    kg, lb.a, lb.b, lb.c, lb.E, (gx, gy, gz), normal,
                    beamInDotSurfaceNormal, 1, sg)
        elif kind in ('plate', 'lens'):
            if getattr(matSur, 'needsSpatialAmplitude', False):
                # voxel-volume materials (TXM): local refractive index at
                # the intersection point (reflect.py:894-910)
                refractive_index = matSur.get_refractive_index(
                    lb.E, lb.x, lb.y, lb.z).real
            else:
                refractive_index = matSur.get_refractive_index(lb.E).real
            n1overn2 = 1.0 / refractive_index if fromVacuum \
                else refractive_index
            signN = jnp.sign(-beamInDotNormal)
            n1overn2cosTheta1 = -n1overn2 * beamInDotNormal
            cosTheta2 = signN * jnp.sqrt(
                jnp.clip(1 - n1overn2 ** 2 + n1overn2cosTheta1 ** 2, 0.0,
                         None))
            dn = n1overn2cosTheta1 - cosTheta2
            a_out = lb.a * n1overn2 + nbx * dn
            b_out = lb.b * n1overn2 + nby * dn
            c_out = lb.c * n1overn2 + nbz * dn
        # else: transmit straight

        # ---- reflectivity amplitudes ----
        rollAngle = roll + jnp.arctan2(nsx, nsz)
        Jss_l, Jpp_l, Jsp_l = rotate_coherency_matrix(
            lb.Jss, lb.Jpp, lb.Jsp, -rollAngle)
        Es_l = Ep_l = None
        if lb.Es is not None:
            cosY, sinY = jnp.cos(rollAngle), jnp.sin(rollAngle)
            Es_l, Ep_l = rotate_y(lb.Es, lb.Ep, cosY, -sinY)

        if matSur is None:
            ras = rap = jnp.ones_like(lb.x)
            mu = nreal = None
        elif ras_poly is not None:
            ras, rap = ras_poly, rap_poly
            mu = nreal = None
        elif kind == 'crystal':
            beamOutDotSurfaceNormal = _dot3(a_out, b_out, c_out,
                                            nsx, nsy, nsz)
            if mosaic:
                ras, rap = matSur.get_amplitude_mosaic(
                    lb.E, beamInDotSurfaceNormal, beamOutDotSurfaceNormal,
                    beamInDotNormal)
            elif getattr(matSur, 'useTT', False):
                # bent-crystal Takagi-Taupin amplitudes; bending radii come
                # from the OE (reflect.py:885-905)
                Ry = getattr(self, 'R', None)
                if Ry is None:
                    Ry = getattr(self, 'Rm', None)
                lcname = type(self).__name__.lower()
                if Ry is not None and ('johansson' in lcname or
                                       'ground' in lcname):
                    Ry = Ry * 2
                Rx = getattr(self, 'Rs', None)
                ras, rap = matSur.get_amplitude_pytte(
                    lb.E, beamInDotSurfaceNormal, beamOutDotSurfaceNormal,
                    beamInDotNormal, alphaAsym=self.alpha,
                    Ry=None if Ry is None else float(Ry),
                    Rx=None if Rx is None else float(Rx))
            else:
                ras, rap = matSur.get_amplitude(
                    lb.E, beamInDotSurfaceNormal, beamOutDotSurfaceNormal,
                    beamInDotNormal)
            mu = nreal = None
        elif kind == 'multilayer':
            ras, rap = matSur.get_amplitude(
                lb.E, beamInDotSurfaceNormal, lb.x, lb.y)[0:2]
            mu = nreal = None
        elif kind == 'grating' and getattr(matSur, 'efficiency_orders',
                                           ()) and order_arr is not None:
            # tabulated grating efficiency by order/energy
            # (reflect.py:1011, material.py:391-413)
            ras, rap = matSur.get_grating_efficiency(lb.E, order_arr)
            mu = nreal = None
        elif getattr(matSur, 'needsSpatialAmplitude', False):
            # TXM voxel volume: on exit integrate mu and phase along the
            # chord from the entry point (volume.py:410-431); local
            # positions here are at the current (exit) surface
            # material-frame convention: entry surface at z=0, beam along
            # +z, sample z in [0, t].  The exit (2nd-surface) frame of a
            # Plate/DCM relates by (x, y, z) -> (-x, y, z + t)
            # (rotate_beam roll=pi at _reflect_local:502 plus the
            # perpendicular translation)
            tm = getattr(self, 't', None)   # the plate's thickness
            if tm is None:
                tm = getattr(matSur, 't', None)
            tshift = 0.0 if (tm is None or not is2ndXtal) else tm
            sx = -1.0 if is2ndXtal else 1.0
            if fromVacuum:
                res = matSur.get_amplitude(
                    lb.E, beamInDotNormal, fromVacuum,
                    sx * lb.x, lb.y, lb.z + tshift)
            else:
                res = matSur.get_amplitude(
                    lb.E, beamInDotNormal, fromVacuum,
                    sx * (lb.x - lb.a * tMax), lb.y - lb.b * tMax,
                    (lb.z - lb.c * tMax) + tshift,
                    sx * lb.a, lb.b, lb.c, tMax)
            ras, rap, mu, nreal = res
        else:
            res = matSur.get_amplitude(lb.E, beamInDotNormal, fromVacuum)
            ras, rap = res[0], res[1]
            mu = res[2] if len(res) > 2 else None
            nreal = res[3] if len(res) > 3 else None

        ras = jnp.where(jnp.isnan(jnp.abs(ras)), 0.0, ras)
        rap = jnp.where(jnp.isnan(jnp.abs(rap)), 0.0, rap)

        Jss_new = (Jss_l * ras * jnp.conj(ras)).real
        Jpp_new = (Jpp_l * rap * jnp.conj(rap)).real
        Jsp_new = Jsp_l * ras * jnp.conj(rap)
        if Es_l is not None:
            Es_new = Es_l * ras
            Ep_new = Ep_l * rap

        if (not fromVacuum) and matSur is not None and \
                kind not in ('crystal', 'multilayer', 'powder',
                             'monocrystal', 'crystal harmonics'):
            att = jnp.exp(-mu * tMax * 0.1)  # tMax mm, mu 1/cm
            Jss_new = Jss_new * att
            Jpp_new = Jpp_new * att
            Jsp_new = Jsp_new * att
            if Es_l is not None:
                # e^{i arg} via lax.complex(cos, sin): no eager complex
                # scalar constants (doomed on some TPU transports)
                arg = 0.1 * nreal * tMax
                mPh = jnp.sqrt(att) * jax.lax.complex(jnp.cos(arg),
                                                      jnp.sin(arg))
                Es_new = Es_new * mPh
                Ep_new = Ep_new * mPh
        elif Es_l is not None:
            arg = 1e7 * lb.E / CHBAR * tMax
            mPh = jax.lax.complex(jnp.cos(arg), jnp.sin(arg))
            Es_new = Es_new * mPh
            Ep_new = Ep_new * mPh

        # the true-local beam keeps its amplitudes in the per-point SURFACE
        # s/p frame — the reference rotates back only in the virgin-local
        # copy (reflect.py:1105-1110, vlb not lb); wave hops (diffract from
        # this OE) consume the surface-frame amplitudes
        updates = dict(
            a=jnp.where(goodN, a_out, lb.a),
            b=jnp.where(goodN, b_out, lb.b),
            c=jnp.where(goodN, c_out, lb.c),
            Jss=jnp.where(goodN, Jss_new, lb.Jss),
            Jpp=jnp.where(goodN, Jpp_new, lb.Jpp),
            Jsp=jnp.where(goodN, Jsp_new, lb.Jsp),
        )
        if Es_l is not None:
            updates['Es'] = jnp.where(goodN, Es_new, lb.Es)
            updates['Ep'] = jnp.where(goodN, Ep_new, lb.Ep)
        if order_arr is not None:
            prev = lb.order if lb.order is not None \
                else jnp.zeros_like(lb.x)
            updates['order'] = jnp.where(goodN, order_arr, prev)
        return lb.replace(**updates), rollAngle


def _merge_by_mask(old: Beam, new: Beam, mask) -> Beam:
    """new where mask else old, over all present array fields."""
    updates = {}
    for name in Beam.__dataclass_fields__:
        ov = getattr(old, name)
        nv = getattr(new, name)
        if nv is None:
            continue
        if ov is None:
            updates[name] = nv
            continue
        if getattr(nv, 'ndim', 0) == 0 or nv.shape != mask.shape:
            updates[name] = nv
        else:
            updates[name] = jnp.where(mask, nv, ov)
    return old.replace(**updates)


def _mosaic_normal(key, mat, oeNormal, E):
    """Sample crystallite normals of a mosaic crystal: Gaussian tilt of the
    nominal Bragg-plane normal by the mosaicity around a random azimuth
    (cf. base.py:1304-1385)."""
    k1, k2 = jax.random.split(key)
    dtheta = mat.mosaicity * jax.random.normal(k1, E.shape, E.dtype)
    # rotate the nominal normal by dtheta about a random azimuth in the
    # plane perpendicular to it
    nx, ny, nz = oeNormal
    phi = jax.random.uniform(k2, E.shape, E.dtype, 0.0, 2 * math.pi)
    # build an orthonormal basis (u, v) perpendicular to n
    ux = jnp.where(jnp.abs(nz) < 0.9, -ny, jnp.zeros_like(nx))
    uy = jnp.where(jnp.abs(nz) < 0.9, nx, nz)
    uz = jnp.where(jnp.abs(nz) < 0.9, jnp.zeros_like(nx), -ny)
    un = jnp.sqrt(ux ** 2 + uy ** 2 + uz ** 2)
    un = jnp.where(un == 0, 1.0, un)
    ux, uy, uz = ux / un, uy / un, uz / un
    vx = ny * uz - nz * uy
    vy = nz * ux - nx * uz
    vz = nx * uy - ny * ux
    st, ct = jnp.sin(dtheta), jnp.cos(dtheta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    mx = nx * ct + (ux * cp + vx * sp) * st
    my = ny * ct + (uy * cp + vy * sp) * st
    mz = nz * ct + (uz * cp + vz * sp) * st
    return mx, my, mz


@struct.dataclass
class OE(_OEMethods):
    """A general optical element (cf. reference OE, base.py:65).

    Subclasses define the surface via ``local_z``/``local_n`` (and
    ``local_g`` for gratings).  Numeric placement parameters are pytree
    leaves — differentiable; strings/shapes are static."""
    center: jnp.ndarray = None
    pitch: jnp.ndarray = None
    roll: jnp.ndarray = None
    yaw: jnp.ndarray = None
    positionRoll: jnp.ndarray = None
    bragg_: Optional[jnp.ndarray] = None        # extra pitch from material
    extraPitch: Optional[jnp.ndarray] = None
    extraRoll: Optional[jnp.ndarray] = None
    extraYaw: Optional[jnp.ndarray] = None
    limPhysX: Optional[jnp.ndarray] = None
    limPhysY: Optional[jnp.ndarray] = None
    limOptX: Optional[jnp.ndarray] = None
    limOptY: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None
    # [axis-flag unused slot, rho0, P0, P1, ...] -- see local_g; the axis
    # char lives in grooveAxis (non-pytree)
    gratingDensity: Optional[jnp.ndarray] = None
    material: Any = None
    figure_error: Any = None
    name: str = struct.field(pytree_node=False, default='')
    shape: str = struct.field(pytree_node=False, default='rect')
    rotationSequence: str = struct.field(pytree_node=False, default='RzRyRx')
    extraRotationSequence: str = struct.field(pytree_node=False,
                                              default='RzRyRx')
    order: Any = struct.field(pytree_node=False, default=1)
    curSurface: int = struct.field(pytree_node=False, default=0)
    auto_material_kind: str = struct.field(pytree_node=False,
                                           default='mirror')
    grooveAxis: str = struct.field(pytree_node=False, default='y')
    overEdge: str = struct.field(pytree_node=False, default='ymax')
    # user-facing creation args for classes whose fields are derived from
    # them (parametric conics): a tuple of (name, value) pairs consumed by
    # beamline._element_params for JSON round-trips
    createArgs: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, name='', center=(0, 0, 0), pitch=0.0, roll=0.0, yaw=0.0,
               positionRoll=0.0, bragg=None, extraPitch=0.0, extraRoll=0.0,
               extraYaw=0.0, limPhysX=(-math.inf, math.inf),
               limPhysY=(-math.inf, math.inf), limOptX=None, limOptY=None,
               alpha=None, material=None, figure_error=None, shape='rect',
               rotationSequence='RzRyRx', extraRotationSequence='RzRyRx',
               order=1, curSurface=0, overEdge='ymax',
               gratingDensity=None, **kwargs):
        dt = config.dtype()
        # accept unit strings like '0.2deg' / '4 mrad'
        # (reference auto_units_angle, _flow_utils.py:74)
        pitch = config.auto_units_angle(pitch)
        roll = config.auto_units_angle(roll)
        yaw = config.auto_units_angle(yaw)
        positionRoll = config.auto_units_angle(positionRoll)
        alpha = config.auto_units_angle(alpha)
        if isinstance(bragg, str):
            # bragg may carry an alignment ENERGY ('8000 eV'): resolve to
            # the Bragg angle of this element's material (reference
            # auto_units_angle_with_energy, _flow_utils.py:118-123)
            E_al = config.parse_energy(bragg)
            if E_al is not None:
                if material is None:
                    raise ValueError(
                        f'bragg={bragg!r} needs a material to resolve '
                        'the Bragg angle')
                bragg = float(material.get_Bragg_angle(E_al) -
                              material.get_dtheta(E_al))
            elif 'auto' in bragg.lower():
                bragg = None
        bragg = config.auto_units_angle(bragg)

        def arr(v):
            return None if v is None else jnp.asarray(v, dt)
        if order is not None and not isinstance(order, (int, float, str)):
            # several diffraction orders (e.g. np.linspace(-2, 2, 5)):
            # rays are distributed randomly among them like the reference
            order = tuple(float(o) for o in np.ravel(order))
            if len(order) == 1:
                order = order[0]
        if gratingDensity is not None:
            # reference format [axis, rho0, P0, P1, ...] (base.py:213)
            kwargs['grooveAxis'] = str(gratingDensity[0])
            kwargs['gratingDensity'] = jnp.asarray(
                [0.0] + [float(v) for v in gratingDensity[1:]], dt)
            kwargs.setdefault('auto_material_kind', 'grating')
        hasExtra = any(isinstance(v, jnp.ndarray) or v
                       for v in (extraPitch, extraRoll, extraYaw))
        return cls(center=arr(center), pitch=arr(pitch), roll=arr(roll),
                   yaw=arr(yaw), positionRoll=arr(positionRoll),
                   bragg_=arr(bragg),
                   extraPitch=arr(extraPitch) if hasExtra else None,
                   extraRoll=arr(extraRoll) if hasExtra else None,
                   extraYaw=arr(extraYaw) if hasExtra else None,
                   limPhysX=arr(limPhysX), limPhysY=arr(limPhysY),
                   limOptX=arr(limOptX), limOptY=arr(limOptY),
                   alpha=arr(alpha), material=material, figure_error=figure_error, name=name,
                   shape=shape, rotationSequence=rotationSequence,
                   extraRotationSequence=extraRotationSequence, order=order,
                   curSurface=curSurface, overEdge=overEdge, **kwargs)
