"""Device-side weighted histogramming with hue+brightness colorization.

TPU-native equivalent of the reference per-worker histogramming
(xrt/multipro.py:53-177 do_hist1d/do_hist2d and the HSV colorize at
:316-325): 1D/2D histograms are scatter-adds on device, RGB colorization is
computed with vectorized HSV->RGB; everything is jittable and accumulates
across repeats by simple addition (histograms are linear).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hist1d(x, weights, bins: int, limits) -> jnp.ndarray:
    """Weighted 1D histogram on fixed limits (scatter-add, or the MXU
    one-hot contraction on TPU at large ray counts — see hist2d)."""
    if _use_mxu_hist(x, bins, 1):
        z = jnp.zeros_like(x)
        return hist2d_mxu(x, z, weights[:, None], bins, 1, limits,
                          (-1.0, 1.0))[0, :, 0]
    lo, hi = limits
    idx = jnp.floor((x - lo) / (hi - lo) * bins).astype(jnp.int32)
    inside = (idx >= 0) & (idx < bins) & jnp.isfinite(x)
    idx = jnp.clip(idx, 0, bins - 1)
    w = jnp.where(inside, weights, 0.0)
    return jnp.zeros((bins,), weights.dtype).at[idx].add(w)


def hist1d_rgb(x, rgb, bins: int, limits) -> jnp.ndarray:
    """RGB-weighted 1D histogram; rgb shape (N, 3) -> (bins, 3)."""
    if _use_mxu_hist(x, bins, 1):
        z = jnp.zeros_like(x)
        return hist2d_mxu(x, z, rgb, bins, 1, limits, (-1.0, 1.0))[0]
    lo, hi = limits
    idx = jnp.floor((x - lo) / (hi - lo) * bins).astype(jnp.int32)
    inside = (idx >= 0) & (idx < bins) & jnp.isfinite(x)
    idx = jnp.clip(idx, 0, bins - 1)
    w = jnp.where(inside[:, None], rgb, 0.0)
    return jnp.zeros((bins, 3), rgb.dtype).at[idx].add(w)


def _flat_idx(x, y, xbins, ybins, xlimits, ylimits):
    xlo, xhi = xlimits
    ylo, yhi = ylimits
    ix = jnp.floor((x - xlo) / (xhi - xlo) * xbins).astype(jnp.int32)
    iy = jnp.floor((y - ylo) / (yhi - ylo) * ybins).astype(jnp.int32)
    inside = (ix >= 0) & (ix < xbins) & (iy >= 0) & (iy < ybins) & \
        jnp.isfinite(x) & jnp.isfinite(y)
    ix = jnp.clip(ix, 0, xbins - 1)
    iy = jnp.clip(iy, 0, ybins - 1)
    return iy * xbins + ix, inside


def _use_mxu_hist(x, xbins, ybins):
    return (jax.default_backend() == 'tpu' and x.dtype == jnp.float32 and
            x.ndim == 1 and x.shape[0] >= 1 << 16 and
            xbins <= 1024 and ybins <= 1024)


def hist2d(x, y, weights, xbins, ybins, xlimits, ylimits) -> jnp.ndarray:
    """Weighted 2D histogram, returned with shape (ybins, xbins) like the
    reference (y is the row index, multipro.py:140-144).

    On TPU with large ray batches the scatter-add (slow per-element
    dynamic updates) is replaced by a Pallas one-hot contraction on the
    MXU: h = [row one-hot] @ (w * [col one-hot]), with the weights in a
    two-pass bf16 split so the sums keep f32-class accuracy."""
    if _use_mxu_hist(x, xbins, ybins):
        return hist2d_mxu(x, y, weights[:, None], xbins, ybins,
                          xlimits, ylimits)[..., 0]
    flat, inside = _flat_idx(x, y, xbins, ybins, xlimits, ylimits)
    w = jnp.where(inside, weights, 0.0)
    h = jnp.zeros((xbins * ybins,), weights.dtype).at[flat].add(w)
    return h.reshape(ybins, xbins)


def hist2d_rgb(x, y, rgb, xbins, ybins, xlimits, ylimits) -> jnp.ndarray:
    if _use_mxu_hist(x, xbins, ybins):
        return hist2d_mxu(x, y, rgb, xbins, ybins, xlimits, ylimits)
    flat, inside = _flat_idx(x, y, xbins, ybins, xlimits, ylimits)
    w = jnp.where(inside[:, None], rgb, 0.0)
    h = jnp.zeros((xbins * ybins, 3), rgb.dtype).at[flat].add(w)
    return h.reshape(ybins, xbins, 3)


def hist2d_mxu(x, y, W, xbins, ybins, xlimits, ylimits,
               chunk=2048) -> jnp.ndarray:
    """(ybins, xbins, k) histogram of k weight columns as a Pallas MXU
    kernel: per ray chunk, build the row one-hot A (ybins, chunk) and the
    weighted column one-hots B_j (chunk, xbins) in bf16 (two-pass split
    for the weights) and accumulate A @ B_j on the systolic array —
    TPU scatter-add costs per-element; this streams."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    N = x.shape[0]
    k = W.shape[1]
    xlo, xhi = xlimits
    ylo, yhi = ylimits
    # quantized bin indices as f32 (exact for bins < 2^24); weights of
    # outside/non-finite rays zeroed, indices clamped into range
    ix = jnp.floor((x - xlo) * (xbins / (xhi - xlo)))
    iy = jnp.floor((y - ylo) * (ybins / (yhi - ylo)))
    inside = (ix >= 0) & (ix < xbins) & (iy >= 0) & (iy < ybins) & \
        jnp.isfinite(x) & jnp.isfinite(y)
    ix = jnp.clip(ix, 0, xbins - 1).astype(f32)
    iy = jnp.clip(iy, 0, ybins - 1).astype(f32)
    Wm = jnp.where(inside[:, None], W.astype(f32), 0.0)

    npad = (-N) % chunk
    if npad:
        pad = lambda v: jnp.concatenate(
            [v, jnp.zeros((npad,) + v.shape[1:], v.dtype)])
        ix, iy, Wm = pad(ix), pad(iy), pad(Wm)
    nch = (N + npad) // chunk
    c8 = chunk // 8                  # (8, c8) tiles satisfy Mosaic tiling
    ix = ix.reshape(nch, 8, c8)
    iy = iy.reshape(nch, 8, c8)
    ws = [Wm[:, j].reshape(nch, 8, c8) for j in range(k)]

    def kernel(ix_ref, iy_ref, *refs):
        # rays live on the LANE axis throughout (no relayouts): per
        # 8-sublane row of the chunk, the row one-hot A (ybins, c8) and
        # the transposed weighted column one-hot Bt (xbins, c8) contract
        # over their lane axes on the MXU
        w_refs = refs[:k]
        out_ref = refs[k]
        step = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (ybins, c8), 0).astype(f32)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (xbins, c8), 0).astype(f32)
        dn_ll = (((1,), (1,)), ((), ()))   # contract lanes x lanes
        accs = [jnp.zeros((ybins, xbins), f32) for _ in range(k)]
        for r in range(8):
            iyr = iy_ref[0, r:r + 1, :]    # (1, c8)
            ixr = ix_ref[0, r:r + 1, :]
            A = (iyr == rows).astype(bf16)
            onec = (ixr == cols).astype(f32)
            for j in range(k):
                wj = w_refs[j][0, r:r + 1, :] * onec
                wh = wj.astype(bf16)
                wl = (wj - wh.astype(f32)).astype(bf16)
                accs[j] = accs[j] + jax.lax.dot_general(
                    A, wh, dn_ll, preferred_element_type=f32) + \
                    jax.lax.dot_general(
                        A, wl, dn_ll, preferred_element_type=f32)
        for j in range(k):
            prev = jnp.where(step == 0, jnp.zeros_like(accs[j]),
                             out_ref[j])
            out_ref[j] = prev + accs[j]

    spec = pl.BlockSpec((1, 8, c8), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nch,),
        in_specs=[spec, spec] + [spec] * k,
        out_specs=pl.BlockSpec((k, ybins, xbins), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, ybins, xbins), f32),
    )(ix, iy, *ws)
    return jnp.moveaxis(out, 0, -1)


def hsv_to_rgb(h, s, v):
    """Vectorized HSV->RGB (equivalent of matplotlib.colors.hsv_to_rgb)."""
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode='clip')
    g = jnp.choose(i, [t, v, v, q, p, p], mode='clip')
    b = jnp.choose(i, [p, p, t, v, v, q], mode='clip')
    return jnp.stack([r, g, b], axis=-1)


def colorize(cData, flux, climits, colorFactor=0.85, colorSaturation=1.0):
    """Hue from cData mapped over *climits*, brightness from flux
    (cf. multipro.py:316-325).  Returns (N, 3) RGB weights."""
    lo, hi = climits
    c01 = (cData - lo) * colorFactor / (hi - lo)
    c01 = jnp.clip(c01, 0.0, 1.0)
    return hsv_to_rgb(c01, jnp.full_like(c01, colorSaturation), flux)
