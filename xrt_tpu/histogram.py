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
    """Weighted 1D histogram on fixed limits via scatter-add."""
    lo, hi = limits
    idx = jnp.floor((x - lo) / (hi - lo) * bins).astype(jnp.int32)
    inside = (idx >= 0) & (idx < bins) & jnp.isfinite(x)
    idx = jnp.clip(idx, 0, bins - 1)
    w = jnp.where(inside, weights, 0.0)
    return jnp.zeros((bins,), weights.dtype).at[idx].add(w)


def hist1d_rgb(x, rgb, bins: int, limits) -> jnp.ndarray:
    """RGB-weighted 1D histogram; rgb shape (N, 3) -> (bins, 3)."""
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


def hist2d(x, y, weights, xbins, ybins, xlimits, ylimits) -> jnp.ndarray:
    """Weighted 2D histogram, returned with shape (ybins, xbins) like the
    reference (y is the row index, multipro.py:140-144)."""
    flat, inside = _flat_idx(x, y, xbins, ybins, xlimits, ylimits)
    w = jnp.where(inside, weights, 0.0)
    h = jnp.zeros((xbins * ybins,), weights.dtype).at[flat].add(w)
    return h.reshape(ybins, xbins)


def hist2d_rgb(x, y, rgb, xbins, ybins, xlimits, ylimits) -> jnp.ndarray:
    flat, inside = _flat_idx(x, y, xbins, ybins, xlimits, ylimits)
    w = jnp.where(inside[:, None], rgb, 0.0)
    h = jnp.zeros((xbins * ybins, 3), rgb.dtype).at[flat].add(w)
    return h.reshape(ybins, xbins, 3)


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
