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
                          weights):
    """Five Kirchhoff accumulators with double-float phases.

    All positional args xd..zs and k are (hi, lo) tuples of f32 arrays;
    Es/Ep complex64; n a 3-list of f32 arrays over src; nl, weights f32 over
    src.  Returns complex64 (Es, Ep, aE, bE, cE) over dst."""
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
    if jax.default_backend() == 'cpu':
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
    return (EsA_r + 1j * EsA_i, EpA_r + 1j * EpA_i,
            aA_r + 1j * aA_i, bA_r + 1j * bA_i, cA_r + 1j * cA_i)


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


def kirchhoff_integral_pallas(xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                              weights, dst_tile=128, src_chunk=1024,
                              sublanes=8, phase_mode='fast'):
    """Pallas TPU kernel: grid over destination tiles (sublanes x dst_tile
    points per program), fori_loop over source chunks, the dd-phase math of
    :func:`kirchhoff_integral_dd` on the VPU with (dst_tile x src_chunk)
    2D vector work per step.

    Accepts plain f32 arrays (lo parts zero) or (hi, lo) tuples.
    *phase_mode*: 'fast' uses :func:`_phase_dd_fast` (~18% faster end to
    end, worst-case ~0.03 rad phase), 'exact' the fully renormalized dd
    chain (~0.01 rad)."""
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
    )(*dsts, *srcs)
    sl = slice(0, Nd)

    def fl(v):
        return v.reshape(-1)[sl]
    (EsA_r, EsA_i, EpA_r, EpA_i, aA_r, aA_i, bA_r, bA_i, cA_r, cA_i) = out
    return (fl(EsA_r) + 1j * fl(EsA_i), fl(EpA_r) + 1j * fl(EpA_i),
            fl(aA_r) + 1j * fl(aA_i), fl(bA_r) + 1j * fl(bA_i),
            fl(cA_r) + 1j * fl(cA_i))
