"""The Kirchhoff double-sum kernel for float32 TPU execution.

TPU-native equivalent of the reference 'integrate_kirchhoff' OpenCL kernel
(xrt/backends/raycing/cl/diffract.cl:80-152, host dispatch waves.py:854-896)
which the reference runs in float64 on GPUs.  TPUs have no hardware float64;
here the phase k*r (~1e11 rad, needed to ~1e-3 rad) is computed in
double-float (f32-pair) arithmetic — see xrt_tpu.ops.dd — while the
amplitude factors stay in plain f32.  Positions enter as (hi, lo) f32 pairs
produced from host float64 by dd.from_f64.

Two implementations:
* kirchhoff_integral_dd — XLA elementwise + lax.scan over source chunks
  (compiles anywhere, including CPU for validation);
* kirchhoff_integral_pallas — the same math as a Pallas TPU grid kernel
  over destination tiles with VMEM accumulators.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physconsts import PI, CHBAR
from . import dd

SRC_CHUNK = 512


def _phase_dd(xd, yd, zd, xs, ys, zs, k):
    """Reduced phase (k*r mod 2pi) and plain-f32 r for dd coordinate pairs.

    xd..zs are ((hi, lo)) tuples; k is an (hi, lo) tuple broadcast over the
    pair grid.  Shapes broadcast (dst[:, None] vs src[None, :])."""
    dx_h, dx_l = dd.sub(xd[0], xd[1], xs[0], xs[1])
    dy_h, dy_l = dd.sub(yd[0], yd[1], ys[0], ys[1])
    dz_h, dz_l = dd.sub(zd[0], zd[1], zs[0], zs[1])
    x2_h, x2_l = dd.sqr(dx_h, dx_l)
    y2_h, y2_l = dd.sqr(dy_h, dy_l)
    z2_h, z2_l = dd.sqr(dz_h, dz_l)
    r2_h, r2_l = dd.add(x2_h, x2_l, y2_h, y2_l)
    r2_h, r2_l = dd.add(r2_h, r2_l, z2_h, z2_l)
    r_h, r_l = dd.sqrt(r2_h, r2_l)
    # kappa = k/(2*pi) per source sample (cheap: src-shaped, amortized over
    # the dst dimension), then phase = 2*pi*frac(kappa*r) — the fast
    # reduction, see dd.frac_two_pi
    ka_h, ka_l = dd.mul(k[0], k[1],
                        jnp.full_like(k[0], dd.INV_TWO_PI_HI),
                        jnp.full_like(k[0], dd.INV_TWO_PI_LO))
    m_h, m_l = dd.mul(ka_h, ka_l, r_h, r_l)
    phase = dd.frac_two_pi(m_h, m_l)
    return phase, r_h, dx_h, dy_h, dz_h


def kirchhoff_integral_dd(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                          weights, remat=False):
    """Five Kirchhoff accumulators with double-float phases.

    All positional args xd..zs and k are (hi, lo) tuples of f32 arrays;
    Es/Ep complex64; n a 3-list of f32 arrays over src; nl, weights f32 over
    src.  Returns complex64 (Es, Ep, aE, bE, cE) over dst.
    *remat=True*: checkpoint the chunk body for memory-bounded
    reverse-mode differentiation (see kirchhoff_integral_recentred)."""
    f32 = xd[0].dtype
    cdt = jnp.complex64 if f32 == jnp.float32 else jnp.complex128
    Ns = xs[0].shape[0]
    npad = (-Ns) % SRC_CHUNK

    def pad(v):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v
    xs = (pad(xs[0]), pad(xs[1]))
    ys = (pad(ys[0]), pad(ys[1]))
    zs = (pad(zs[0]), pad(zs[1]))
    k = (pad(k[0]), pad(k[1]))
    nl = pad(nl)
    weights = pad(weights)
    Es = pad(Es)
    Ep = pad(Ep)
    n = [pad(jnp.broadcast_to(ni, (Ns,)).astype(f32)) for ni in n]
    nchunks = xs[0].shape[0] // SRC_CHUNK

    def rsh(v):
        return v.reshape(nchunks, SRC_CHUNK)
    inputs = (rsh(xs[0]), rsh(xs[1]), rsh(ys[0]), rsh(ys[1]), rsh(zs[0]),
              rsh(zs[1]), rsh(k[0]), rsh(k[1]), rsh(nl), rsh(weights),
              rsh(Es), rsh(Ep), rsh(n[0]), rsh(n[1]), rsh(n[2]))

    xd_b = (xd[0][:, None], xd[1][:, None])
    yd_b = (yd[0][:, None], yd[1][:, None])
    zd_b = (zd[0][:, None], zd[1][:, None])

    def body(carry, inp):
        EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i = \
            carry
        (xsh, xsl, ysh, ysl, zsh, zsl, kh, kl, nlc, wc, Esc, Epc,
         n0, n1, n2) = inp
        phase, r, a, b, c = _phase_dd(
            xd_b, yd_b, zd_b,
            (xsh[None, :], xsl[None, :]), (ysh[None, :], ysl[None, :]),
            (zsh[None, :], zsl[None, :]), (kh[None, :], kl[None, :]))
        ns = (a * n0[None, :] + b * n1[None, :] + c * n2[None, :]) / r
        # U = i*k/(4pi) * (nl + ns) * e^{i phase} / r, masked by weights
        pre = kh[None, :] / (4 * PI) * (nlc[None, :] + ns) / r * wc[None, :]
        cph = jnp.cos(phase)
        sph = jnp.sin(phase)
        U_r = -pre * sph   # i * e^{i phase} = -sin + i cos
        U_i = pre * cph
        Es_r = Esc.real[None, :]
        Es_i = Esc.imag[None, :]
        Ep_r = Epc.real[None, :]
        Ep_i = Epc.imag[None, :]
        EsA_r = EsA_r + jnp.sum(Es_r * U_r - Es_i * U_i, axis=1)
        EsA_i = EsA_i + jnp.sum(Es_r * U_i + Es_i * U_r, axis=1)
        EpA_r = EpA_r + jnp.sum(Ep_r * U_r - Ep_i * U_i, axis=1)
        EpA_i = EpA_i + jnp.sum(Ep_r * U_i + Ep_i * U_r, axis=1)
        # abcU = k^2/(4pi) (Es+Ep) U / r
        f = kh[None, :] ** 2 / (4 * PI) / r
        sE_r = Es_r + Ep_r
        sE_i = Es_i + Ep_i
        g_r = f * (sE_r * U_r - sE_i * U_i)
        g_i = f * (sE_r * U_i + sE_i * U_r)
        aA_r = aA_r + jnp.sum(g_r * a, axis=1)
        aA_i = aA_i + jnp.sum(g_i * a, axis=1)
        bA_r = bA_r + jnp.sum(g_r * b, axis=1)
        bA_i = bA_i + jnp.sum(g_i * b, axis=1)
        cA_r = cA_r + jnp.sum(g_r * c, axis=1)
        cA_i = cA_i + jnp.sum(g_i * c, axis=1)
        return (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i,
                cA_r, cA_i), None

    Nd = xd[0].shape[0]
    init = tuple(jnp.zeros((Nd,), f32) for _ in range(10))
    if remat:
        out, _ = jax.lax.scan(jax.checkpoint(body), init, inputs)
    elif jax.default_backend() == 'cpu':
        # XLA:CPU's while-loop emitter miscompiles the exact
        # two_sum/two_prod error extraction inside the loop body (verified
        # empirically: phases come out as if the lo parts were dropped, and
        # neither scan unroll nor optimization_barrier prevents it; TPU
        # preserves exactness).  Unroll at trace time instead: each chunk
        # compiles as a plain fused elementwise+reduce kernel, which is
        # exact.
        carry = init
        for i in range(nchunks):
            carry, _ = body(carry, tuple(v[i] for v in inputs))
        out = carry
    else:
        out, _ = jax.lax.scan(body, init, inputs)
    (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i) = out
    cx = jax.lax.complex
    return (cx(EsA_r, EsA_i), cx(EpA_r, EpA_i),
            cx(aA_r, aA_i), cx(bA_r, bA_i), cx(cA_r, cA_i))


# ---------------------------------------------------------------------------
# Recentred transverse-offset phase (the fast path)
# ---------------------------------------------------------------------------
#
# With D0/S0 reference points near the dst/src clouds, C = D0 - S0,
# R0 = |C|, L = C/R0, u = d - D0, v = s - S0 and w = u - v, the pair
# distance obeys the EXACT identity
#
#   r^2 = (R0 + L.w)^2 + |w_perp|^2,   w_perp = w - (L.w) L,
#
# i.e. r = A*sqrt(1 + wp2/A^2) with A = R0 + L.u - L.v and
# wp2 = |t_d - t_s|^2 where t = (u - (L.u) L) are the *transverse*
# offsets — small (~mm) even when footprints extend ~100 mm along the
# beam.  All large/precision-critical quantities (L.u, L.v, R0, the
# phase kappa*(R0 - L.v)) are per-POINT double-float precomputations;
# the per-PAIR work is plain f32 on small numbers plus a truncated
# sqrt series for delta = r - A (kappa*delta is O(1..1e4) cycles).
#
# Accuracy: phase error ~ 2*pi*(1.2e-7 * kappa*delta + 4e-7) rad where
# kappa*delta = wp2/(2*A*lambda) — i.e. ~1e-4 rad for typical wave
# propagation (transverse extents <~2 mm, distances >~0.5 m) and
# <~1e-2 rad up to kappa*delta ~ 1e4.  The per-src/per-dst dd terms
# carry the usual 2^-48 relative bound.  For pathological geometries
# (NA > ~0.1 or transverse extents of many cm at short distance) use
# phase_mode='exact'/'fast'.


def _presplit(a):
    """Dekker split halves of f32 *a* (each with <=12 mantissa bits), for
    exact products against another pre-split factor."""
    c = dd._SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def recentre_kirchhoff_inputs(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                              weights, monochromatic=False,
                              narrowband=False):
    """Per-point precomputations for the recentred Kirchhoff phase.

    All inputs as in :func:`kirchhoff_integral_dd` ((hi, lo) f32 tuples for
    positions and k).  Returns (dst, src, params) dicts of f32 arrays /
    scalars consumed by :func:`_recentred_pair` — O(Nd)+O(Ns) double-float
    work, all plain XLA.

    *narrowband* (polychromatic only): factor kappa_s = kappa_0 + dk_s
    about the first sample's kappa_0; the per-dst phase kappa_0*(L.u)
    folds into a mono-style fractional phase and the remaining cross
    term dk_s*(L.u)_d is a SINGLE f32 product per pair (the exact-poly
    path needs a 9-flop pre-split two-product) — error
    ~ |dk|_max * |L.u|_max * 2^-24 cycles, i.e. <1e-3 cycles for any
    %-bandwidth workload with cm-scale footprints
    (:func:`narrowband_err_cycles`).  This makes per-sample-energy
    integrals (e-spread sampling, coherent-mode pipelines, reference
    waves.py:606-896) run at the monochromatic rate."""
    f32 = xd[0].dtype
    Ns = xs[0].shape[0]

    def mean_h(t):
        return jnp.mean(t[0])
    D0 = (mean_h(xd), mean_h(yd), mean_h(zd))
    S0 = (mean_h(xs), mean_h(ys), mean_h(zs))
    # C = D0 - S0 exactly (dd scalars)
    C = [dd.two_sum(D0[i], -S0[i]) for i in range(3)]
    # |C|^2, R0 = |C|, rho = |C|^2 - R0^2 (fold the dd-sqrt residual)
    c2 = dd.sqr(*C[0])
    c2 = dd.add(*c2, *dd.sqr(*C[1]))
    c2 = dd.add(*c2, *dd.sqr(*C[2]))
    R0 = dd.sqrt(*c2)
    rho_h, rho_l = dd.sub(*c2, *dd.sqr(*R0))
    rho = rho_h + rho_l
    L = [dd.div(*C[i], *R0) for i in range(3)]

    u = [dd.add_f(xd[0], xd[1], -D0[0]), dd.add_f(yd[0], yd[1], -D0[1]),
         dd.add_f(zd[0], zd[1], -D0[2])]
    v = [dd.add_f(xs[0], xs[1], -S0[0]), dd.add_f(ys[0], ys[1], -S0[1]),
         dd.add_f(zs[0], zs[1], -S0[2])]

    def ldot(w):
        m = dd.mul(L[0][0], L[0][1], w[0][0], w[0][1])
        m = dd.add(*m, *dd.mul(L[1][0], L[1][1], w[1][0], w[1][1]))
        m = dd.add(*m, *dd.mul(L[2][0], L[2][1], w[2][0], w[2][1]))
        return m
    pdh, pdl = ldot(u)         # L.u per dst (dd)
    lvh, lvl = ldot(v)         # L.v per src (dd)

    def transverse(w, ph, pl):
        out = []
        for i in range(3):
            proj = dd.mul(ph, pl, L[i][0], L[i][1])
            th, tl = dd.sub(w[i][0], w[i][1], proj[0], proj[1])
            out.append(th + tl)
        return out
    td = transverse(u, pdh, pdl)
    ts = transverse(v, lvh, lvl)

    # kappa = k/(2 pi) in dd (per src)
    kah, kal = dd.mul(k[0], k[1], jnp.full_like(k[0], dd.INV_TWO_PI_HI),
                      jnp.full_like(k[0], dd.INV_TWO_PI_LO))
    # phi_s = frac(kappa * (R0 - L.v)) per src (dd, then a small f32)
    qh, ql = dd.add_f(-lvh, -lvl, R0[0])
    qh, ql = dd.add_f(qh, ql, R0[1])
    mh, ml = dd.mul(kah, kal, qh, ql)
    phis = dd.frac_cycles(mh, ml)

    halfR0 = 0.5 * (R0[0] + R0[1])
    dst = dict(tdx=td[0], tdy=td[1], tdz=td[2],
               ad=halfR0 + (pdh + pdl), pdh=pdh, pdl=pdl)
    src = dict(tsx=ts[0], tsy=ts[1], tsz=ts[2],
               as_=halfR0 - (lvh + lvl), lvh=lvh, phis=phis)

    n = [jnp.broadcast_to(ni, (Ns,)).astype(f32) for ni in n]
    kw = k[0] * weights * (1.0 / (4 * PI))
    Ch = [C[i][0] + C[i][1] for i in range(3)]
    Lh = [L[i][0] + L[i][1] for i in range(3)]
    src.update(
        kw=kw, kwnl=kw * nl, k2=k[0] ** 2 * (1.0 / (4 * PI)),
        Lns=Lh[0] * n[0] + Lh[1] * n[1] + Lh[2] * n[2],
        Cns=Ch[0] * n[0] + Ch[1] * n[1] + Ch[2] * n[2],
        n0=n[0], n1=n[1], n2=n[2],
        esr=Es.real.astype(f32), esi=Es.imag.astype(f32),
        epr=Ep.real.astype(f32), epi=Ep.imag.astype(f32))
    src['ser'] = src['esr'] + src['epr']
    src['sei'] = src['esi'] + src['epi']
    params = dict(Cx=Ch[0], Cy=Ch[1], Cz=Ch[2],
                  Lx=Lh[0], Ly=Lh[1], Lz=Lh[2], rho=rho,
                  invR0=1.0 / (R0[0] + R0[1]))
    # longitudinal-extent parameter of the separable 1/A series used by
    # the MXU direction-integral accumulation (see _kirchhoff_pallas_
    # recentred): |e| = |L.u - L.v|/R0 <= (max|L.u| + max|L.v|)/R0.
    # The truncated series 1/A = c0(1 - e + e^2) is accurate to ~|e|^3;
    # SERIES_E_MAX is the recommended envelope (~0.1 -> <=0.1% weight
    # error on the *direction* integrals only; fields are exact).
    params['e_max'] = params['invR0'] * (
        jnp.max(jnp.abs(pdh)) + jnp.max(jnp.abs(lvh)))
    if monochromatic:
        # fold kappa*L.u into a per-dst fractional phase; kappa scalar
        ka0 = (kah[0], kal[0])
        mdh, mdl = dd.mul_f(*ka0, pdh)
        mdl = mdl + ka0[0] * pdl
        dst['phid'] = dd.frac_cycles(mdh, mdl)
        params['kappa_h'] = ka0[0]
        params['kappa_l'] = ka0[1]
    elif narrowband:
        # kappa_s = kappa_0 + dk_s: mono-style per-dst phid at kappa_0,
        # single-f32 per-pair cross term dk_s*pdh (see docstring)
        ka0 = (kah[0], kal[0])
        mdh, mdl = dd.mul_f(*ka0, pdh)
        mdl = mdl + ka0[0] * pdl
        dst['phid'] = dd.frac_cycles(mdh, mdl)
        # kah - kah[0] is exact for any %-scale bandwidth (Sterbenz)
        src.update(kah=kah, kal=kal,
                   dks=(kah - ka0[0]) + (kal - ka0[1]))
    else:
        ka1, ka2 = _presplit(kah)
        pd1, pd2 = _presplit(pdh)
        src.update(kah=kah, kal=kal, ka1=ka1, ka2=ka2)
        dst.update(pd1=pd1, pd2=pd2)
    return dst, src, params


def narrowband_err_cycles(k, xd, yd, zd, xs, ys, zs):
    """Worst-case phase error (cycles) of the narrowband polychromatic
    factorization for the given geometry and wavenumbers: the single-f32
    cross product dk*(L.u) rounds at 2^-24 relative.  Eager helper
    (numpy, hi parts)."""
    kh = np.asarray(k[0] if isinstance(k, tuple) else k, np.float64)
    if kh.size == 0:
        return 0.0
    dk_max = float(np.max(np.abs(kh - kh.flat[0]))) / (2 * np.pi)

    def hi(v):
        return np.asarray(v[0] if isinstance(v, tuple) else v,
                          np.float64)
    d = np.stack([hi(xd), hi(yd), hi(zd)])
    s = np.stack([hi(xs), hi(ys), hi(zs)])
    D0 = d.mean(axis=1)
    S0 = s.mean(axis=1)
    C = D0 - S0
    R0 = float(np.sqrt(np.sum(C * C)))
    if R0 == 0.0:
        return float('inf')
    L = C / R0
    pd_max = float(np.max(np.abs(L @ (d - D0[:, None]))))
    return dk_max * pd_max * 2.0 ** -24


# delta = r - A = A*(sqrt(1+x) - 1) = wp2*rinv*(1/2 - x/8 + x^2/16 - ...)
_DELTA_C1 = 0.125
_DELTA_C2 = 0.0625
_DELTA_C3 = 0.0390625

# validity envelope of the separable 1/A direction-weight series used by
# accumulate='mxu*' (weight error ~ e^3; 0.1 -> <=0.1%).  Above this the
# eager path falls back to the exact per-pair 'vpu' contraction.
SERIES_E_MAX = 0.1
# envelope of the TWO-term series ('mxu2': 1/A = c0(1 - e), weight error
# ~ e^2; 0.03 -> <=0.1%, same bound as 'mxu' at its own envelope edge).
# 'mxu2' drops the lvh^2 weight-column replicas: 56 instead of 72 MXU
# column-passes per chunk -> ~25% faster at equal field fidelity.
SERIES_E2_MAX = 0.03


def recentred_series_e_max(xd, yd, zd, xs, ys, zs):
    """Upper bound on the 1/A-series parameter |e| = |L.u - L.v|/R0 for the
    given destination/source clouds (hi parts only; O(N) numpy, for eager
    validity checks).  The MXU direction-integral accumulation is accurate
    to ~e_max^3; see :data:`SERIES_E_MAX`."""
    import numpy as np

    def hi(v):
        return np.asarray(v[0] if isinstance(v, tuple) else v,
                          dtype=np.float64)
    d = np.stack([hi(xd), hi(yd), hi(zd)])
    s = np.stack([hi(xs), hi(ys), hi(zs)])
    D0 = d.mean(axis=1)
    S0 = s.mean(axis=1)
    C = D0 - S0
    R0 = float(np.sqrt(np.sum(C * C)))
    if R0 == 0.0:
        return float('inf')
    L = C / R0
    pd = L @ (d - D0[:, None])
    lv = L @ (s - S0[:, None])
    return float((np.max(np.abs(pd)) + np.max(np.abs(lv))) / R0)


def _recentred_core(d, s, params, monochromatic, narrowband=False):
    """Per-pair propagator for broadcast-compatible dst/src dicts.

    Returns (U_r, U_i, rinv, tx, ty, tz, lw): the complex Kirchhoff
    propagator U (split), the reciprocal pair distance and the recentred
    geometry offsets consumed by the two accumulation schemes."""
    tx = d['tdx'] - s['tsx']
    ty = d['tdy'] - s['tsy']
    tz = d['tdz'] - s['tsz']
    wp2 = tx * tx + ty * ty + tz * tz + params['rho']
    A = d['ad'] + s['as_']
    rinv = 1.0 / A
    x = wp2 * rinv * rinv
    poly = 0.5 - x * (_DELTA_C1 - x * (_DELTA_C2 - _DELTA_C3 * x))
    delta = wp2 * rinv * poly
    if monochromatic:
        phic = params['kappa_h'] * delta
        lo2 = d['phid'] + s['phis'] + params['kappa_l'] * delta
        m = lo2 - jnp.round(lo2) + (phic - jnp.round(phic))
    elif narrowband:
        # per-pair cross term dk_s*(L.u)_d as ONE f32 product, reduced
        # to cycles immediately (error bound: narrowband_err_cycles)
        phic = s['kah'] * delta
        u = s['dks'] * d['pdh']
        lo2 = d['phid'] + s['phis'] + (u - jnp.round(u)) + \
            s['kal'] * delta
        m = lo2 - jnp.round(lo2) + (phic - jnp.round(phic))
    else:
        # exact kappa_s * (L.u)_d via pre-split two-product
        p = s['kah'] * d['pdh']
        e = ((s['ka1'] * d['pd1'] - p) + s['ka1'] * d['pd2'] +
             s['ka2'] * d['pd1']) + s['ka2'] * d['pd2']
        phic = s['kah'] * delta
        lo2 = e + s['kal'] * d['pdh'] + s['kah'] * d['pdl'] + s['phis'] + \
            s['kal'] * delta
        c0 = dd.frac_cycles(p, lo2)
        m = c0 + (phic - jnp.round(phic))
    c = m - jnp.round(m)
    sph, cph = dd.sincos_cycles(c)

    lw = d['pdh'] - s['lvh']
    num = s['Cns'] + tx * s['n0'] + ty * s['n1'] + tz * s['n2'] + \
        lw * s['Lns']
    pre = (s['kwnl'] + num * rinv * s['kw']) * rinv
    U_r = -pre * sph
    U_i = pre * cph
    return U_r, U_i, rinv, tx, ty, tz, lw


def _recentred_pair(d, s, params, monochromatic, narrowband=False):
    """Per-pair Kirchhoff factors for broadcast-compatible dst/src dicts.

    Returns (U_r, U_i, g_r, g_i, ax, ay, az): the complex Kirchhoff
    propagator U (split), the gradient-integral weight g = k^2/(4 pi) /r *
    (Es+Ep)*U (split) and the un-normalized direction numerators."""
    U_r, U_i, rinv, tx, ty, tz, lw = _recentred_core(
        d, s, params, monochromatic, narrowband)
    ax = params['Cx'] + tx + lw * params['Lx']
    ay = params['Cy'] + ty + lw * params['Ly']
    az = params['Cz'] + tz + lw * params['Lz']
    f = s['k2'] * rinv
    g_r = f * (s['ser'] * U_r - s['sei'] * U_i)
    g_i = f * (s['ser'] * U_i + s['sei'] * U_r)
    return U_r, U_i, g_r, g_i, ax, ay, az


_DST_KEYS_MONO = ('tdx', 'tdy', 'tdz', 'ad', 'pdh', 'phid')
_DST_KEYS_POLY = ('tdx', 'tdy', 'tdz', 'ad', 'pdh', 'pdl', 'pd1', 'pd2')
_SRC_KEYS_COMMON = ('tsx', 'tsy', 'tsz', 'as_', 'lvh', 'phis', 'kw',
                    'kwnl', 'k2', 'Lns', 'Cns', 'n0', 'n1', 'n2',
                    'esr', 'esi', 'epr', 'epi', 'ser', 'sei')
_SRC_KEYS_POLY = _SRC_KEYS_COMMON + ('kah', 'kal', 'ka1', 'ka2')
_SRC_KEYS_NARROW = _SRC_KEYS_COMMON + ('kah', 'kal', 'dks')


def _mode_keys(monochromatic, narrowband):
    if monochromatic:
        return _DST_KEYS_MONO, _SRC_KEYS_COMMON
    if narrowband:
        return _DST_KEYS_MONO, _SRC_KEYS_NARROW
    return _DST_KEYS_POLY, _SRC_KEYS_POLY


def _accumulate(acc, U_r, U_i, g_r, g_i, ax, ay, az, s, axis):
    esr, esi = s['esr'], s['esi']
    epr, epi = s['epr'], s['epi']
    return (acc[0] + jnp.sum(esr * U_r - esi * U_i, axis=axis),
            acc[1] + jnp.sum(esr * U_i + esi * U_r, axis=axis),
            acc[2] + jnp.sum(epr * U_r - epi * U_i, axis=axis),
            acc[3] + jnp.sum(epr * U_i + epi * U_r, axis=axis),
            acc[4] + jnp.sum(g_r * ax, axis=axis),
            acc[5] + jnp.sum(g_i * ax, axis=axis),
            acc[6] + jnp.sum(g_r * ay, axis=axis),
            acc[7] + jnp.sum(g_i * ay, axis=axis),
            acc[8] + jnp.sum(g_r * az, axis=axis),
            acc[9] + jnp.sum(g_i * az, axis=axis))


def kirchhoff_integral_recentred(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                                 weights, monochromatic=False,
                                 src_chunk=None, remat=False,
                                 narrowband=False):
    """XLA (non-Pallas) evaluation of the recentred scheme — compiles on
    any backend; used for validation and as the CPU f32 fast path.

    *remat=True* wraps the source-chunk body in :func:`jax.checkpoint`
    and always uses the scan branch, so reverse-mode differentiation
    stores only O(Nd) per chunk (the carry) instead of the O(Nd x chunk)
    pair intermediates — the memory form used by the custom-VJP backward
    of the Pallas kernel (:func:`_kirchhoff_bwd`)."""
    dst, src, params = recentre_kirchhoff_inputs(
        xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, weights, monochromatic,
        narrowband)
    f32 = xd[0].dtype
    Ns = xs[0].shape[0]
    Nd = xd[0].shape[0]
    chunk = src_chunk or SRC_CHUNK
    npad = (-Ns) % chunk
    dkeys, skeys = _mode_keys(monochromatic, narrowband)

    def pad(v):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v
    nchunks = (Ns + npad) // chunk
    src_steps = {kk: pad(src[kk]).reshape(nchunks, chunk) for kk in skeys}
    dcol = {kk: dst[kk][:, None] for kk in dkeys}

    def body(carry, s_chunk):
        srow = {kk: s_chunk[kk][None, :] for kk in skeys}
        vals = _recentred_pair(dcol, srow, params, monochromatic,
                               narrowband)
        return _accumulate(carry, *vals, srow, 1), None

    init = tuple(jnp.zeros((Nd,), f32) for _ in range(10))
    if remat:
        out, _ = jax.lax.scan(jax.checkpoint(body), init, src_steps)
    elif jax.default_backend() == 'cpu':
        # XLA:CPU's while-loop emitter breaks the exact two-prod error
        # extraction inside scan bodies (see kirchhoff_integral_dd);
        # unroll at trace time so each chunk is a plain fused kernel
        out = init
        for i in range(nchunks):
            out, _ = body(out, {kk: v[i] for kk, v in src_steps.items()})
    else:
        out, _ = jax.lax.scan(body, init, src_steps)
    (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i) = out
    cx = jax.lax.complex
    return (cx(EsA_r, EsA_i), cx(EpA_r, EpA_i),
            cx(aA_r, aA_i), cx(bA_r, bA_i), cx(cA_r, cA_i))


def _phase_dd_fast(xd_t, yd_t, zd_t, xs_t, ys_t, zs_t, ka_t):
    """Lean dd phase for the Pallas kernel: exact two-prod squares with a
    single unnormalized low-order channel, rsqrt-based square root, and the
    frac(kappa*r) reduction.  ~40% fewer flops than the normalized chain
    for a worst-case phase error of ~0.03 rad at k*r ~ 1e12 (the normalized
    path gives ~0.01; both are limited by the 48-bit dd product).

    Returns (phase, r, 1/r, dx, dy, dz)."""
    dxh, dxl = dd.sub(xd_t[0], xd_t[1], xs_t[0], xs_t[1])
    dyh, dyl = dd.sub(yd_t[0], yd_t[1], ys_t[0], ys_t[1])
    dzh, dzl = dd.sub(zd_t[0], zd_t[1], zs_t[0], zs_t[1])
    p1, e1 = dd.two_prod(dxh, dxh)
    p2, e2 = dd.two_prod(dyh, dyh)
    p3, e3 = dd.two_prod(dzh, dzh)
    s1, t1 = dd.two_sum(p1, p2)
    s2, t2 = dd.two_sum(s1, p3)
    lo = t1 + t2 + e1 + e2 + e3 + 2.0 * (dxh * dxl + dyh * dyl +
                                         dzh * dzl)
    s0 = jnp.sqrt(s2)
    rinv = 1.0 / s0                     # single reciprocal, reused
    q, eq = dd.two_prod(s0, s0)
    corr = ((s2 - q) + (lo - eq)) * (0.5 * rinv)
    mh, me = dd.two_prod(ka_t[0], s0)
    ml = me + ka_t[0] * corr + ka_t[1] * s0
    cyc = dd.frac_cycles(mh, ml)
    return cyc, s0, rinv, dxh, dyh, dzh


def _kirchhoff_pallas_recentred(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                                weights, dst_tile, src_chunk, sublanes,
                                monochromatic, accumulate='mxu',
                                interpret=False, narrowband=False):
    """The recentred-phase Pallas kernel (see module notes above): per-pair
    work is plain f32 on small transverse offsets; all dd precision lives
    in O(N) per-point precomputations.  ~2x the throughput of the dd-phase
    kernel at better typical accuracy.

    *accumulate*:
      'mxu' (default) — the ten reduction sums ride TWO MXU left
        operands (U_r, U_i) against one 28-column weight matrix (4 field
        columns two-pass bf16, 8 direction columns + their lvh/lvh^2
        replicas single-pass): 6 matmul passes per chunk.  All ten
        accumulators are linear in the per-src weights once the
        recentred geometry ax = Dx(dst) - sigma_x(src) is split and the
        direction integrand's 1/A weight is series-expanded (see the
        stage docstring), so the per-pair VPU work shrinks to the
        propagator itself and the systolic array absorbs the
        contraction.  bf16 rounding of the per-pair propagator is an
        unbiased ~2^-8 relative perturbation per term that random-walks
        down as 1/sqrt(Nsrc) in the accumulated field.
      'mxu-fast' — same, single-pass bf16 fields: 2 matmul passes.
      'vpu' — plain f32 multiply-accumulate on the vector unit (the
        reference scheme; keeps every product in f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = xd[0].dtype
    dst, src, params = recentre_kirchhoff_inputs(
        xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, weights, monochromatic,
        narrowband)
    dkeys, skeys = _mode_keys(monochromatic, narrowband)
    pkeys = ('Cx', 'Cy', 'Cz', 'Lx', 'Ly', 'Lz', 'rho', 'invR0') + \
        (('kappa_h', 'kappa_l') if monochromatic else ())

    Nd = xd[0].shape[0]
    Ns = xs[0].shape[0]
    block_d = dst_tile * sublanes
    npad_d = (-Nd) % block_d
    npad_s = (-Ns) % src_chunk

    def padto(v, npad):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v
    NdP = Nd + npad_d
    nrows = NdP // dst_tile
    nsrc_chunks = (Ns + npad_s) // src_chunk
    dsts = [padto(dst[kk], npad_d).reshape(nrows, dst_tile) for kk in dkeys]
    srcs = [padto(src[kk], npad_s).reshape(nsrc_chunks, src_chunk)
            for kk in skeys]
    pvec = jnp.stack([jnp.asarray(params[kk], f32) for kk in pkeys])[None]

    def kernel_vpu(pref, *refs):
        drefs = refs[:len(dkeys)]
        srefs = refs[len(dkeys):len(dkeys) + len(skeys)]
        outs = refs[len(dkeys) + len(skeys):]
        pdict = {kk: pref[0, i] for i, kk in enumerate(pkeys)}
        for srow in range(sublanes):
            dcol = {kk: r[srow, :].reshape(-1, 1)
                    for kk, r in zip(dkeys, drefs)}

            def body(j, acc):
                srow_d = {kk: r[j, :].reshape(1, -1)
                          for kk, r in zip(skeys, srefs)}
                vals = _recentred_pair(dcol, srow_d, pdict, monochromatic,
                                       narrowband)
                return _accumulate(acc, *vals, srow_d, 1)

            init = tuple(jnp.zeros((dst_tile,), f32) for _ in range(10))
            acc = jax.lax.fori_loop(0, nsrc_chunks, body, init)
            for ref, val in zip(outs, acc):
                ref[srow, :] = val

    def kernel_mxu(pref, *refs):
        drefs = refs[:len(dkeys)]
        srefs = refs[len(dkeys):len(dkeys) + len(skeys)]
        outs = refs[len(dkeys) + len(skeys):]
        pdict = {kk: pref[0, i] for i, kk in enumerate(pkeys)}
        bf16 = jnp.bfloat16
        dn = (((1,), (1,)), ((), ()))   # contract the src dimension
        # 'mxu2': two-term 1/A series — drop the lvh^2 column replicas
        nterms = 2 if accumulate == 'mxu2' else 3
        ncols = 4 + 8 * nterms

        def rows(vs):
            return jnp.concatenate([v.reshape(1, -1) for v in vs], axis=0)

        def split(v):
            hi = v.astype(bf16)
            return hi, (v - hi.astype(f32)).astype(bf16)

        def mm(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=f32)

        for srow in range(sublanes):
            dcol = {kk: r[srow, :].reshape(-1, 1)
                    for kk, r in zip(dkeys, drefs)}

            def stage(j):
                """Chunk j's per-pair propagator + contraction operands.

                All ten accumulators ride TWO left operands (U_r, U_i)
                against one 28-column weight matrix: 4 field columns
                (Es/Ep re/im), 8 direction columns (k^2-weighted field
                sums x sigma = ts + (L.v) L shifted copies) and their
                lvh- and lvh^2-scaled replicas.  The direction
                integrand's per-pair 1/A weight is restored in the
                post-combine from the separable series
                1/A = c0 (1 - e + e^2) + O(e^3), e = c0 (L.u - L.v),
                c0 = 1/R0 — exact to ~(extent/R0)^3 (<~4e-4 worst-case
                grazing footprints, <1e-9 typical), and the extracted
                directions are normalized ratios, so a smooth O(e^3)
                reweighting is far below their noise floor.  MXU pass
                count per chunk: 2 ('mxu-fast'/'mxu32') or 6 ('mxu':
                two-pass bf16 field splits hi*hi + hi*lo + lo*hi ~= f32
                products, 2^-16 per term; direction columns ride the hi
                pass — single-pass bf16's ~2^-9/sqrt(N) noise is
                microradians after normalization)."""
                s1 = {kk: r[j, :] for kk, r in zip(skeys, srefs)}
                srow_d = {kk: v.reshape(1, -1) for kk, v in s1.items()}
                U_r, U_i, rinv, _, _, _, _ = _recentred_core(
                    dcol, srow_d, pdict, monochromatic, narrowband)
                a1 = s1['k2'] * s1['ser']
                a2 = s1['k2'] * s1['sei']
                sx = s1['tsx'] + s1['lvh'] * pdict['Lx']
                sy = s1['tsy'] + s1['lvh'] * pdict['Ly']
                sz = s1['tsz'] + s1['lvh'] * pdict['Lz']
                w8 = [a1, a2, a1 * sx, a1 * sy, a1 * sz,
                      a2 * sx, a2 * sy, a2 * sz]
                lv = s1['lvh']
                wcols = [s1['esr'], s1['esi'], s1['epr'], s1['epi']] + \
                    w8 + [lv * w for w in w8]
                if nterms == 3:
                    lv2 = lv * lv
                    wcols += [lv2 * w for w in w8]
                W = rows(wcols)
                if accumulate == 'mxu32':       # native f32 dots
                    return (U_r, U_i, W)
                if accumulate == 'mxu-fast':    # single-pass bf16
                    return (U_r.astype(bf16), U_i.astype(bf16),
                            W.astype(bf16))
                Ph, Pl = split(U_r)             # 'mxu': two-pass fields
                Qh, Ql = split(U_i)
                Wb = W.astype(bf16)
                Wl4 = (W[:4] - Wb[:4].astype(f32)).astype(bf16)
                return (Ph, Pl, Qh, Ql, Wb, Wl4)

            def accum(acc, m):
                accP, accQ, accPlo, accQlo = acc
                if accumulate in ('mxu', 'mxu2'):
                    Ph, Pl, Qh, Ql, Wb, Wl4 = m
                    accP = accP + mm(Ph, Wb)
                    accQ = accQ + mm(Qh, Wb)
                    accPlo = accPlo + mm(Ph, Wl4) + mm(Pl, Wb[:4])
                    accQlo = accQlo + mm(Qh, Wl4) + mm(Ql, Wb[:4])
                else:
                    P, Q, W = m
                    accP = accP + mm(P, W)
                    accQ = accQ + mm(Q, W)
                return accP, accQ, accPlo, accQlo

            def body(j, acc):
                # NB: a software pipeline (delaying chunk j-1's matmuls
                # into iteration j to overlap MXU and VPU) was measured
                # 2x SLOWER here — the (128 x src_chunk) operand carry
                # forces megabyte VMEM copies every iteration
                return accum(acc, stage(j))

            init_acc = (jnp.zeros((dst_tile, ncols), f32),
                        jnp.zeros((dst_tile, ncols), f32),
                        jnp.zeros((dst_tile, 4), f32),
                        jnp.zeros((dst_tile, 4), f32))
            accPw, accQw, accPlo, accQlo = jax.lax.fori_loop(
                0, nsrc_chunks, body, init_acc)
            # post-combine: ax = Dx(dst) - sigma_x(src) with
            # Dx = Cx + td + (L.u) Lx, so
            # sum g*ax = Dx*sum(g) - sum(g*sigma_x) column-wise
            tdx = dcol['tdx'][:, 0]
            tdy = dcol['tdy'][:, 0]
            tdz = dcol['tdz'][:, 0]
            pdh = dcol['pdh'][:, 0]
            accP = accPw[:, 0:4] + accPlo
            accQ = accQw[:, 0:4] + accQlo
            # direction integrals: restore 1/A = c0(1 - e + e^2), with
            # e = c0*(pdh - lvh); the lvh powers live in the column
            # replicas, the pdh powers in the per-dst coefficients:
            # 1/A ~= (c0 - c0^2 pdh + c0^3 pdh^2)
            #        + (c0^2 - 2 c0^3 pdh) lvh + c0^3 lvh^2
            c0 = pdict['invR0']
            ed = c0 * pdh
            if nterms == 3:
                cA = (c0 * (1.0 - ed + ed * ed))[:, None]
                cB = (c0 * c0 * (1.0 - 2.0 * ed))[:, None]
                cC = c0 * c0 * c0
                accR = cA * accPw[:, 4:12] + cB * accPw[:, 12:20] + \
                    cC * accPw[:, 20:28]
                accS = cA * accQw[:, 4:12] + cB * accQw[:, 12:20] + \
                    cC * accQw[:, 20:28]
            else:
                # 1/A ~= c0(1 - e), e = c0 (pdh - lvh):
                # (c0 - c0^2 pdh) + c0^2 * lvh
                cA = (c0 * (1.0 - ed))[:, None]
                cB = c0 * c0
                accR = cA * accPw[:, 4:12] + cB * accPw[:, 12:20]
                accS = cA * accQw[:, 4:12] + cB * accQw[:, 12:20]
            Dx = pdict['Cx'] + tdx + pdh * pdict['Lx']
            Dy = pdict['Cy'] + tdy + pdh * pdict['Ly']
            Dz = pdict['Cz'] + tdz + pdh * pdict['Lz']
            vals = (accP[:, 0] - accQ[:, 1],
                    accQ[:, 0] + accP[:, 1],
                    accP[:, 2] - accQ[:, 3],
                    accQ[:, 2] + accP[:, 3],
                    Dx * accR[:, 0] - accR[:, 2]
                    - Dx * accS[:, 1] + accS[:, 5],
                    Dx * accS[:, 0] - accS[:, 2]
                    + Dx * accR[:, 1] - accR[:, 5],
                    Dy * accR[:, 0] - accR[:, 3]
                    - Dy * accS[:, 1] + accS[:, 6],
                    Dy * accS[:, 0] - accS[:, 3]
                    + Dy * accR[:, 1] - accR[:, 6],
                    Dz * accR[:, 0] - accR[:, 4]
                    - Dz * accS[:, 1] + accS[:, 7],
                    Dz * accS[:, 0] - accS[:, 4]
                    + Dz * accR[:, 1] - accR[:, 7])
            for ref, val in zip(outs, vals):
                ref[srow, :] = val

    kernel = kernel_mxu if accumulate.startswith('mxu') else kernel_vpu

    grid = (nrows // sublanes,)
    dst_spec = pl.BlockSpec((sublanes, dst_tile), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    src_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, len(pkeys)), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_spec] + [dst_spec] * len(dkeys) +
                 [src_spec] * len(skeys),
        out_specs=tuple([dst_spec] * 10),
        out_shape=tuple(jax.ShapeDtypeStruct((nrows, dst_tile), f32)
                        for _ in range(10)),
        interpret=interpret,
    )(pvec, *dsts, *srcs)
    sl = slice(0, Nd)

    def fl(v):
        return v.reshape(-1)[sl]
    (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i) = out
    cx = jax.lax.complex
    return (cx(fl(EsA_r), fl(EsA_i)), cx(fl(EpA_r), fl(EpA_i)),
            cx(fl(aA_r), fl(aA_i)), cx(fl(bA_r), fl(bA_i)),
            cx(fl(cA_r), fl(cA_i)))


def kirchhoff_integral_pallas(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                              weights, dst_tile=128, src_chunk=2048,
                              sublanes=8, phase_mode='recentred',
                              monochromatic=False, accumulate='mxu',
                              interpret=False, narrowband='auto'):
    """Pallas TPU kernel: grid over destination tiles (sublanes x dst_tile
    points per program), fori_loop over source chunks, with
    (dst_tile x src_chunk) 2D vector work per step.

    Accepts plain f32 arrays (lo parts zero) or (hi, lo) tuples.
    *phase_mode*:
      'recentred' (default) — transverse-offset scheme, fastest, phase
        error ~1e-4 rad typical (see module notes for the envelope);
      'fast' — per-pair dd distances via :func:`_phase_dd_fast`
        (~0.03 rad worst);
      'exact' — fully renormalized dd chain (~0.01 rad worst).
    *accumulate* ('recentred' only): 'mxu' (default) contracts the ten
    accumulators on the systolic array (bf16 terms, f32 sums); 'vpu'
    keeps the all-f32 vector-unit multiply-accumulate.

    Validity envelope of 'mxu'/'mxu32'/'mxu-fast': the *direction*
    integrals (not the fields) replace the per-pair 1/A weight with the
    separable series c0(1 - e + e^2), e = (L.u - L.v)/R0, accurate to
    ~e^3 — fine for |e| <= ~0.1 (:data:`SERIES_E_MAX`; e.g. a 300 mm
    footprint at >= 1.5 m).  When called EAGERLY (concrete arrays) the
    envelope is checked via :func:`recentred_series_e_max` and the call
    falls back to the exact 'vpu' contraction with a warning; under jit
    the check cannot branch — call :func:`recentred_series_e_max` on
    your geometry once if in doubt, or pass accumulate='vpu'."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def astuple(v):
        if isinstance(v, tuple):
            return v
        return (v, jnp.zeros_like(v))
    xd, yd, zd = astuple(xd), astuple(yd), astuple(zd)
    xs, ys, zs = astuple(xs), astuple(ys), astuple(zs)
    k = astuple(k)
    f32 = xd[0].dtype
    if phase_mode == 'recentred':
        traced = any(isinstance(jnp.asarray(v[0]), jax.core.Tracer)
                     for v in (xd, yd, zd, xs, ys, zs))
        if narrowband == 'auto':
            # the narrowband poly factorization runs at the mono rate;
            # eager calls enable it when its error bound is negligible
            # (<1e-3 cycles ~ 6 mrad of phase), traced calls keep the
            # exact path unless the caller opts in explicitly
            if monochromatic or traced or isinstance(
                    jnp.asarray(k[0] if isinstance(k, tuple) else k),
                    jax.core.Tracer):
                narrowband = False
            else:
                narrowband = narrowband_err_cycles(
                    k, xd, yd, zd, xs, ys, zs) < 1e-3
        if accumulate.startswith('mxu') and not traced:
            e_max = recentred_series_e_max(xd, yd, zd, xs, ys, zs)
            if accumulate == 'mxu2' and e_max > SERIES_E2_MAX:
                # two-term series out of envelope: degrade to the
                # three-term 'mxu' (checked against its own bound below)
                accumulate = 'mxu'
            if e_max > SERIES_E_MAX:
                import warnings
                warnings.warn(
                    f"recentred 'mxu' accumulation: geometry exceeds the "
                    f"1/A-series envelope (e_max={e_max:.3f} > "
                    f"{SERIES_E_MAX}); falling back to the exact 'vpu' "
                    f"contraction for the direction integrals.",
                    stacklevel=2)
                accumulate = 'vpu'
    Ns = xs[0].shape[0]
    n3 = tuple(jnp.broadcast_to(jnp.asarray(ni), (Ns,)).astype(f32)
               for ni in n)
    static = (dst_tile, src_chunk, sublanes, phase_mode,
              bool(monochromatic), accumulate, bool(interpret),
              narrowband is True)
    return _kirchhoff_pallas_diff(static, xd, yd, zd, xs, ys, zs, Es, Ep,
                                  k, n3, nl, weights)


def _kirchhoff_pallas_ddphase(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                              weights, dst_tile, src_chunk, sublanes,
                              phase_mode, interpret=False):
    """The per-pair double-float-phase Pallas kernel ('fast'/'exact' phase
    modes) — the pre-recentring scheme, kept for arbitrary/contact
    geometries (see kirchhoff_integral_pallas)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = xd[0].dtype
    Nd = xd[0].shape[0]
    Ns = xs[0].shape[0]
    block_d = dst_tile * sublanes
    npad_d = (-Nd) % block_d
    npad_s = (-Ns) % src_chunk

    def padto(v, npad):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v

    NdP = Nd + npad_d
    NsP = Ns + npad_s
    nrows = NdP // dst_tile          # multiple of sublanes
    nsrc_chunks = NsP // src_chunk

    def prep_d(v):
        return padto(v, npad_d).reshape(nrows, dst_tile)

    def prep_s(v):
        return padto(v, npad_s).reshape(nsrc_chunks, src_chunk)

    # kappa = k/(2*pi) in dd, precomputed per source sample for the fast
    # frac-based phase reduction; amplitude prefactors folded per-source
    # (hoisted out of the O(Ndst x Nsrc) pair loop):
    #   kw   = k*w/(4*pi);  kwnl = kw*nl;  k2 = k^2/(4*pi)
    kah, kal = dd.mul(k[0], k[1], jnp.full_like(k[0], dd.INV_TWO_PI_HI),
                      jnp.full_like(k[0], dd.INV_TWO_PI_LO))
    kw = k[0] * weights * (1.0 / (4 * PI))
    kwnl = kw * nl
    k2 = k[0] ** 2 * (1.0 / (4 * PI))
    esr0 = Es.real.astype(f32)
    esi0 = Es.imag.astype(f32)
    epr0 = Ep.real.astype(f32)
    epi0 = Ep.imag.astype(f32)
    if phase_mode == 'fast':
        kphase = (kah, kal)
    else:
        kphase = (k[0], k[1])
    srcs = [prep_s(v) for v in (
        xs[0], xs[1], ys[0], ys[1], zs[0], zs[1], kphase[0], kphase[1],
        kwnl, kw, k2,
        esr0, esi0, epr0, epi0, esr0 + epr0, esi0 + epi0,
        jnp.broadcast_to(n[0], (Ns,)).astype(f32),
        jnp.broadcast_to(n[1], (Ns,)).astype(f32),
        jnp.broadcast_to(n[2], (Ns,)).astype(f32))]
    dsts = [prep_d(v) for v in (xd[0], xd[1], yd[0], yd[1], zd[0], zd[1])]

    def kernel(xdh, xdl, ydh, ydl, zdh, zdl,
               xsh, xsl, ysh, ysl, zsh, zsl, kp0, kp1,
               kwnl_ref, kw_ref, k2_ref,
               esr, esi, epr, epi, ser, sei, n0, n1, n2,
               o0, o1, o2, o3, o4, o5, o6, o7, o8, o9):
        # one fori_loop per sublane row keeps only one row's working set
        # live at a time — a single swapped loop over src chunks with all
        # sublane rows in flight exceeds the 16MB scoped-VMEM budget
        outs = (o0, o1, o2, o3, o4, o5, o6, o7, o8, o9)
        for srow in range(sublanes):
            def col(ref):
                return ref[srow, :].reshape(-1, 1)
            xd_t = (col(xdh), col(xdl))
            yd_t = (col(ydh), col(ydl))
            zd_t = (col(zdh), col(zdl))

            def body(j, acc):
                def row(ref):
                    return ref[j, :].reshape(1, -1)
                xs_t = (row(xsh), row(xsl))
                ys_t = (row(ysh), row(ysl))
                zs_t = (row(zsh), row(zsl))
                k_t = (row(kp0), row(kp1))
                if phase_mode == 'fast':
                    cyc, r, rinv, a, b, c = _phase_dd_fast(
                        xd_t, yd_t, zd_t, xs_t, ys_t, zs_t, k_t)
                    sph, cph = dd.sincos_cycles(cyc)
                else:
                    phase, r, a, b, c = _phase_dd(xd_t, yd_t, zd_t, xs_t,
                                                  ys_t, zs_t, k_t)
                    rinv = 1.0 / r
                    cph = jnp.cos(phase)
                    sph = jnp.sin(phase)
                nsk = (a * row(n0) + b * row(n1) + c * row(n2)) * \
                    (rinv * row(kw_ref))
                pre = (row(kwnl_ref) + nsk) * rinv
                U_r = -pre * sph
                U_i = pre * cph
                esr_c = row(esr)
                esi_c = row(esi)
                epr_c = row(epr)
                epi_c = row(epi)
                f = row(k2_ref) * rinv
                sE_r = row(ser)
                sE_i = row(sei)
                g_r = f * (sE_r * U_r - sE_i * U_i)
                g_i = f * (sE_r * U_i + sE_i * U_r)
                return (acc[0] + jnp.sum(esr_c * U_r - esi_c * U_i, axis=1),
                        acc[1] + jnp.sum(esr_c * U_i + esi_c * U_r, axis=1),
                        acc[2] + jnp.sum(epr_c * U_r - epi_c * U_i, axis=1),
                        acc[3] + jnp.sum(epr_c * U_i + epi_c * U_r, axis=1),
                        acc[4] + jnp.sum(g_r * a, axis=1),
                        acc[5] + jnp.sum(g_i * a, axis=1),
                        acc[6] + jnp.sum(g_r * b, axis=1),
                        acc[7] + jnp.sum(g_i * b, axis=1),
                        acc[8] + jnp.sum(g_r * c, axis=1),
                        acc[9] + jnp.sum(g_i * c, axis=1))

            init = tuple(jnp.zeros((dst_tile,), f32) for _ in range(10))
            acc = jax.lax.fori_loop(0, nsrc_chunks, body, init)
            for ref, val in zip(outs, acc):
                ref[srow, :] = val

    grid = (nrows // sublanes,)
    dst_spec = pl.BlockSpec((sublanes, dst_tile), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    src_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[dst_spec] * 6 + [src_spec] * 20,
        out_specs=tuple([dst_spec] * 10),
        out_shape=tuple(jax.ShapeDtypeStruct((nrows, dst_tile), f32)
                        for _ in range(10)),
        interpret=interpret,
    )(*dsts, *srcs)
    sl = slice(0, Nd)

    def fl(v):
        return v.reshape(-1)[sl]
    (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i) = out
    cx = jax.lax.complex
    return (cx(fl(EsA_r), fl(EsA_i)), cx(fl(EpA_r), fl(EpA_i)),
            cx(fl(aA_r), fl(aA_i)), cx(fl(bA_r), fl(bA_i)),
            cx(fl(cA_r), fl(cA_i)))


# ---------------------------------------------------------------------------
# Differentiability: custom VJP for the Pallas kernels
# ---------------------------------------------------------------------------
#
# The Pallas kernels are forward-only (jax.grad cannot traverse a
# pallas_call), but the Kirchhoff integral's adjoint is itself a
# Kirchhoff-type contraction: every output is a sum over source samples
# of per-pair factors, so the cotangent of each input is the SAME double
# sum re-reduced over the other index with differentiated per-pair
# factors.  Rather than hand-deriving the ~30 adjoint accumulators (and
# their chain rules through the recentred dd phase), the backward pass
# re-evaluates the mathematically identical XLA formulation
# (kirchhoff_integral_recentred / _dd with checkpointed chunk bodies)
# under jax.vjp, BLOCKED over destination samples so peak memory stays
# O(dst_block x src_chunk) — the flash-attention-style recompute scheme.
# Forward stays at full kernel speed; backward runs at XLA fused-VPU
# speed (benched as kirchhoff_grad_pairs_per_s in bench.py).
#
# This is the capability the reference does not have at all: the
# reference's OpenCL integrate_kirchhoff (diffract.cl:80-152) is not
# differentiable in any mode.

#  (v5e sweep: 2048/2048 -> 2.13, 8192/2048 -> 2.15, 8192/4096 -> 2.26,
#  16384/4096 -> 2.26 G pairs/s — the backward is bound by its XLA
#  elementwise work, not block overhead)
GRAD_DST_BLOCK = 8192
GRAD_SRC_CHUNK = 4096


def _kirchhoff_bwd_blocked(phase_mode, monochromatic, args, cts):
    """Cotangents of all 12 differentiable Kirchhoff inputs, computed as
    a scan over destination blocks; each block runs jax.vjp of the
    checkpointed XLA formulation (recompute-in-backward)."""
    (xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, weights) = args
    Nd = xd[0].shape[0]
    B = min(GRAD_DST_BLOCK, Nd)
    npad = (-Nd) % B
    nblk = (Nd + npad) // B

    def pad_edge(v):
        if not npad:
            return v
        return jnp.concatenate([v, jnp.broadcast_to(v[-1:], (npad,))])

    def pad_zero(v):
        if not npad:
            return v
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)])

    # edge-pad positions (a zero-padded point could coincide with a
    # source sample -> r=0 -> NaN poisoning the whole cotangent);
    # zero-pad the output cotangents so padded rows contribute nothing
    dst_blocks = tuple((pad_edge(h).reshape(nblk, B),
                        pad_edge(l).reshape(nblk, B))
                       for h, l in (xd, yd, zd))
    ct_blocks = tuple(pad_zero(c).reshape(nblk, B) for c in cts)
    src_args = (xs, ys, zs, Es, Ep, k, n, nl, weights)

    if phase_mode == 'recentred':
        def f(d, s):
            (xs_, ys_, zs_, Es_, Ep_, k_, n_, nl_, w_) = s
            return kirchhoff_integral_recentred(
                d[0], d[1], d[2], xs_, ys_, zs_, Es_, Ep_, k_, list(n_),
                nl_, w_, monochromatic=monochromatic,
                src_chunk=GRAD_SRC_CHUNK, remat=True)
    else:
        def f(d, s):
            (xs_, ys_, zs_, Es_, Ep_, k_, n_, nl_, w_) = s
            return kirchhoff_integral_dd(
                d[0], d[1], d[2], xs_, ys_, zs_, Es_, Ep_, k_, list(n_),
                nl_, w_, remat=True)

    def body(src_acc, inp):
        d, ct = inp
        _, vjp = jax.vjp(f, d, src_args)
        dbar, sbar = vjp(ct)
        sbar = (sbar[0], sbar[1], sbar[2], sbar[3], sbar[4], sbar[5],
                tuple(sbar[6]), sbar[7], sbar[8])
        return jax.tree_util.tree_map(jnp.add, src_acc, sbar), dbar

    src_zero = jax.tree_util.tree_map(
        jnp.zeros_like, (xs, ys, zs, Es, Ep, k, tuple(n), nl, weights))
    src_bar, dst_bars = jax.lax.scan(body, src_zero,
                                     (dst_blocks, ct_blocks))

    def unblk(v):
        return v.reshape(-1)[:Nd]
    xd_b, yd_b, zd_b = (jax.tree_util.tree_map(unblk, t)
                        for t in dst_bars)
    (xs_b, ys_b, zs_b, Es_b, Ep_b, k_b, n_b, nl_b, w_b) = src_bar
    return (xd_b, yd_b, zd_b, xs_b, ys_b, zs_b, Es_b, Ep_b, k_b,
            n_b, nl_b, w_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kirchhoff_pallas_diff(static, xd, yd, zd, xs, ys, zs, Es, Ep, k, n,
                           nl, weights):
    (dst_tile, src_chunk, sublanes, phase_mode, monochromatic,
     accumulate, interpret, narrowband) = static
    if phase_mode == 'recentred':
        return _kirchhoff_pallas_recentred(
            xd, yd, zd, xs, ys, zs, Es, Ep, k, list(n), nl, weights,
            dst_tile, src_chunk, sublanes, monochromatic, accumulate,
            interpret=interpret, narrowband=narrowband)
    return _kirchhoff_pallas_ddphase(
        xd, yd, zd, xs, ys, zs, Es, Ep, k, list(n), nl, weights,
        dst_tile, src_chunk, sublanes, phase_mode, interpret=interpret)


def _kirchhoff_pallas_diff_fwd(static, xd, yd, zd, xs, ys, zs, Es, Ep, k,
                               n, nl, weights):
    out = _kirchhoff_pallas_diff(static, xd, yd, zd, xs, ys, zs, Es, Ep,
                                 k, n, nl, weights)
    return out, (xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, weights)


def _kirchhoff_pallas_diff_bwd(static, res, cts):
    phase_mode, monochromatic = static[3], static[4]
    return _kirchhoff_bwd_blocked(phase_mode, monochromatic, res, cts)


_kirchhoff_pallas_diff.defvjp(_kirchhoff_pallas_diff_fwd,
                              _kirchhoff_pallas_diff_bwd)
