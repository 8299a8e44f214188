"""Double-float ("double-double" style) arithmetic on float32 pairs.

A value is represented as (hi, lo) with value = hi + lo and |lo| <= ulp(hi)/2,
giving ~48 bits of mantissa from float32 hardware.  Used by the TPU Kirchhoff
kernel to carry the k*r phase (~1e11 rad) to ~1e-4 rad accuracy on hardware
without native float64 — the reference achieves this by forcing float64 on
GPU (xrt myopencl.py precisionOpenCL; waves are documented to need double
precision).

Algorithms: Knuth two-sum, Dekker split/two-product (FMA-free, safe under
XLA's FMA formation which only improves the error terms).  All functions are
elementwise jnp code usable inside jit, shard_map and Pallas kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 for float32 Dekker splitting


def two_sum(a, b):
    """Exact a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact a + b = s + e, requires |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Exact a * b = p + e (Dekker)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def add(ahi, alo, bhi, blo):
    """dd + dd."""
    s, e = two_sum(ahi, bhi)
    e = e + (alo + blo)
    return quick_two_sum(s, e)


def sub(ahi, alo, bhi, blo):
    return add(ahi, alo, -bhi, -blo)


def add_f(ahi, alo, b):
    s, e = two_sum(ahi, b)
    e = e + alo
    return quick_two_sum(s, e)


def mul(ahi, alo, bhi, blo):
    """dd * dd."""
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def mul_f(ahi, alo, b):
    """dd * float."""
    p, e = two_prod(ahi, b)
    e = e + alo * b
    return quick_two_sum(p, e)


def sqr(ahi, alo):
    p, e = two_prod(ahi, ahi)
    e = e + 2.0 * ahi * alo
    return quick_two_sum(p, e)


def div(ahi, alo, bhi, blo):
    """dd / dd by one Newton refinement of the f32 quotient."""
    q1 = ahi / bhi
    # r = a - q1*b in dd
    p_hi, p_lo = mul_f(bhi, blo, q1)
    r_hi, r_lo = sub(ahi, alo, p_hi, p_lo)
    q2 = (r_hi + r_lo) / bhi
    return quick_two_sum(q1, q2)


def sqrt(ahi, alo):
    """dd sqrt by one Newton step: s = s0 + (a - s0^2)/(2 s0)."""
    s0 = jnp.sqrt(ahi)
    s0 = jnp.where(ahi <= 0, 0.0, s0)
    s2_hi, s2_lo = two_prod(s0, s0)
    r_hi, r_lo = sub(ahi, alo, s2_hi, s2_lo)
    denom = jnp.where(s0 == 0, 1.0, 2.0 * s0)
    corr = (r_hi + r_lo) / denom
    return quick_two_sum(s0, corr)


def from_f64(x64):
    """Split a host float64 array into an f32 (hi, lo) pair."""
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# 2*pi to double-float precision (and the residual beyond)
_TWO_PI_64 = 2 * np.pi
_TWO_PI_HI = np.float32(_TWO_PI_64)
_TWO_PI_LO = np.float32(_TWO_PI_64 - np.float64(_TWO_PI_HI))
_TWO_PI_LO2 = np.float32(_TWO_PI_64 - np.float64(_TWO_PI_HI) -
                         np.float64(_TWO_PI_LO))


def mod_two_pi(phi_hi, phi_lo):
    """phi mod 2*pi for dd phi with |phi| up to ~2^45 (k*r ~ 1e13 rad).

    The integer quotient n can exceed the 24-bit exact-integer range of
    float32, so it is split as n = n1*2^24 + n2*2^12 + n3 (each part
    exactly representable) and each part is removed with exact two-products
    against the three-part 2*pi constant."""
    n = jnp.round(phi_hi / _TWO_PI_HI)
    n1 = jnp.round(n / 16777216.0)
    rem = n - n1 * 16777216.0        # exact: |rem| <= 2^23
    n2 = jnp.round(rem / 4096.0)
    n3 = rem - n2 * 4096.0           # exact
    m1 = n1 * 16777216.0             # exact scale by 2^24
    m2 = n2 * 4096.0

    h, l = phi_hi, phi_lo
    for part in (m1, m2, n3):
        p_hi, p_lo = two_prod(part, _TWO_PI_HI)
        h, l = add(h, l, -p_hi, -p_lo)
        p_hi, p_lo = two_prod(part, _TWO_PI_LO)
        h, l = add(h, l, -p_hi, -p_lo)
        h, l = add_f(h, l, -part * _TWO_PI_LO2)
    # final touch-up into [-pi, pi)
    n3 = jnp.round(h / _TWO_PI_HI)
    p_hi, p_lo = two_prod(n3, _TWO_PI_HI)
    h, l = add(h, l, -p_hi, -p_lo)
    h, l = add_f(h, l, -n3 * _TWO_PI_LO)
    return h + l


# 1/(2*pi) as a double-float constant
_INV_TWO_PI_64 = 1.0 / (2 * np.pi)
INV_TWO_PI_HI = np.float32(_INV_TWO_PI_64)
INV_TWO_PI_LO = np.float32(_INV_TWO_PI_64 - np.float64(INV_TWO_PI_HI))


def frac_cycles(m_hi, m_lo):
    """frac(m) in [-0.5, 0.5] cycles for dd m = phase/(2*pi) — the
    radian-free variant of :func:`frac_two_pi`, feeding
    :func:`sincos_cycles` so no further range reduction is ever needed."""
    n = jnp.round(m_hi)
    f1 = m_hi - n          # exact
    n2 = jnp.round(m_lo)
    f2 = m_lo - n2         # exact
    c = f1 + f2            # in [-1, 1]
    return c - jnp.round(c)


# minimax-fitted polynomials for sin/cos of 2*pi*c on c in [-0.5, 0.5]
# (max errors 3e-7 / 2.4e-6 — far below the ~1e-2 rad phase budget)
_SIN_C = (6.283183465409586, -41.34148025958734, 81.59765524711817,
          -76.59489967393306, 41.26979637356224, -12.37227202917199)
_COS_C = (0.999999443415578, -19.73903432200607, 64.93061147431378,
          -85.29594600637849, 58.91242234401467, -21.28277632550657)


def sincos_cycles(c):
    """(sin, cos) of 2*pi*c for c in [-0.5, 0.5] by degree-11/10
    polynomials — cheaper than builtin trig, which would redo the range
    reduction :func:`frac_cycles` already performed."""
    c2 = c * c
    s = _SIN_C[5]
    for k in (4, 3, 2, 1, 0):
        s = s * c2 + _SIN_C[k]
    s = s * c
    co = _COS_C[5]
    for k in (4, 3, 2, 1, 0):
        co = co * c2 + _COS_C[k]
    return s, co


def frac_two_pi(m_hi, m_lo):
    """2*pi * frac(m) in [-2pi, 2pi] for dd m = phase/(2*pi).

    The cheap phase reduction: with m = kappa*r (kappa = k/2pi in dd), the
    integer part of m_hi is removed by an *exact* f32 subtraction (round()
    of an f32 differs from it by <= 0.5, so the difference is exactly
    representable), and likewise for the overflow of m_lo.  Costs ~8 flops
    against ~200 for the generic :func:`mod_two_pi` ladder; accuracy is the
    same class — both are bounded by the ~2^-48 relative error of the dd
    product, i.e. phase*2^-48 radians."""
    n = jnp.round(m_hi)
    f1 = m_hi - n          # exact
    n2 = jnp.round(m_lo)
    f2 = m_lo - n2         # exact
    return _TWO_PI_HI * (f1 + f2) + _TWO_PI_LO * (f1 + f2)
