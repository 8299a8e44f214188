"""One-object coherent wave-chain builder.

The reference builds multi-hop wave beamlines by hand inside
``run_process`` (prepare_wave -> diffract -> reflect per element, e.g.
examples/withRaycing/14_SoftiMAX/Softi_CXIw2D.py run_process_wave);
:class:`WaveChain` packages the same chain TPU-first:

- receiving geometry prepared once per element (host float64, f64
  residuals carried for the double-float kernels),
- per-stage kernel-mode selection against the recentred-scheme
  envelopes (:func:`xrt_tpu.waves.choose_kirchhoff_mode`), with
  optional blockwise tiling for short-distance stages
  (:func:`~xrt_tpu.waves.choose_tile_modes`),
- between-stage float32 log-rescaling
  (:func:`~xrt_tpu.waves.rescale_field`) so chains survive the
  reference's J ~ 1e39 flux bookkeeping on an f32 chip,
- the whole propagation compiled as ONE jit.

    chain = (WaveChain(source, nrays=200000, fixedEnergy=E0)
             .through_aperture(slitFE)
             .through_oe(m1)
             .through_oe(grating)          # areaFraction applied if the
             .through_aperture(exitSlit)   # element defines one
             .to_screen(screen, xs, zs))
    run = chain.build(key, tiled=True)
    wave, logs = run(key2)
    I = WaveChain.absolute_intensity(wave, logs)   # float64, ph/s units
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import waves as _w


class WaveChain:
    """Sequential coherent wave chain source -> ... -> last element."""

    def __init__(self, source, nrays=100000, fixedEnergy=None):
        self.source = source
        self.nrays = int(nrays)
        self.fixedEnergy = fixedEnergy
        self._hops: List[Tuple[str, Any, Any]] = []

    # -- builder ---------------------------------------------------------
    def through_aperture(self, aperture):
        self._hops.append(('aperture', aperture, None))
        return self

    def through_oe(self, oe, areaFraction='auto'):
        if areaFraction == 'auto':
            areaFraction = float(oe.get_grating_area_fraction()) \
                if hasattr(oe, 'get_grating_area_fraction') else None
        self._hops.append(('oe', oe, areaFraction))
        return self

    def to_screen(self, screen, dim1, dim2):
        self._hops.append(('screen', screen, (np.asarray(dim1, float),
                                              np.asarray(dim2, float))))
        return self

    # -- compile ---------------------------------------------------------
    def build(self, key=None, tiled=False, tile_shape=(5, 10),
              verbose=False, mesh=None, ring=False,
              error_budget='auto'):
        """Prepare the fixed receiving geometry, choose per-stage kernel
        modes, and return ``run(key=None) -> (final_wave, log_scale)``.

        The first ``run`` call compiles; later calls re-execute.  The
        final wave's J/Es carry the accumulated rescaling — use
        :meth:`absolute_intensity` (or ``exp(-2*logs)``) to restore the
        reference's absolute units in float64.

        *error_budget*: per-stage relative field error passed to
        :func:`~xrt_tpu.waves.choose_kirchhoff_mode` — 'auto' (default)
        uses the chain's own Monte-Carlo noise floor ~3/sqrt(nrays)
        (for the standard 2e5-sample chain that is ~6.7e-3, which
        admits the 33%-faster single-pass bf16 'mxu-fast' field
        accumulation whose ~2e-3 incoherent error is invisible under
        the MC noise); None disables the budget (always two-pass).

        *mesh* (a ``jax.sharding.Mesh``): every Kirchhoff integral in
        the chain runs with its destination samples sharded over the
        mesh and the source cloud replicated (zero collectives — the
        multi-chip splitting of the reference chain,
        myopencl.py:455-542); ``ring=True`` shards the sources too and
        rotates them with ppermute (for clouds too large to replicate).
        The elementwise element physics (shine/reflect) stays
        data-parallel under the same jit.  Not combinable with
        *tiled*."""
        if mesh is not None and tiled:
            raise ValueError('tiled chains cannot run sharded '
                             '(tile_modes + mesh is unsupported); use '
                             'mesh= with tiled=False')
        if key is None:
            key = jax.random.PRNGKey(0)
        if not self._hops:
            raise ValueError('empty chain')
        if error_budget == 'auto':
            error_budget = 3.0 / math.sqrt(self.nrays)
        ks = jax.random.split(key, len(self._hops))
        waves = []
        modes: List[Optional[Tuple[str, str]]] = []
        tilemaps: List[Optional[list]] = []
        prev_el = self.source
        prev_geom = None          # source-sample geometry of the sender
        # wavenumber for the phase-error envelope checks: the recentred
        # delta-series error scales with k, so the mode selection must
        # see the actual photon energy, not the helper's default
        from .physconsts import CHBAR
        if self.fixedEnergy is not None:
            kv = float(self.fixedEnergy) / CHBAR * 1e7
        else:
            kv = float(getattr(self.source, 'eMax', 280.0)) / CHBAR * 1e7
        for i, (kind, el, extra) in enumerate(self._hops):
            if kind == 'aperture':
                wv = _w.prepare_wave_on_aperture(el, prev_el, self.nrays,
                                                 key=ks[i])
            elif kind == 'oe':
                wv = _w.prepare_wave_on_oe(
                    el, prev_el, self.nrays, key=ks[i],
                    sort='y' if tiled else None)
            else:
                wv = _w.prepare_wave_on_screen(el, prev_el, *extra)
            if i == 0:
                modes.append(None)        # filled by shine, not diffract
                tilemaps.append(None)
            else:
                dst = (np.asarray(wv.xDiffr), np.asarray(wv.yDiffr),
                       np.asarray(wv.zDiffr))
                mode = _w.choose_kirchhoff_mode(
                    dst, prev_geom, k=kv, error_budget=error_budget)
                tm = None
                if tiled and not (mode[0] == 'recentred' and
                                  mode[1].startswith('mxu')):
                    tm = _w.choose_tile_modes(dst, prev_geom, *tile_shape,
                                              k=kv,
                                              error_budget=error_budget)
                if verbose:
                    nm = getattr(el, 'name', '') or type(el).__name__
                    print(f'# hop {i} -> {nm}: {mode}'
                          + (f' tiled {tile_shape}' if tm else ''))
                modes.append(mode)
                tilemaps.append(tm)
            prev_geom = (np.asarray(wv.x), np.asarray(wv.y),
                         np.asarray(wv.z))
            waves.append(wv)
            prev_el = el

        hops = list(self._hops)
        source = self.source
        fixedE = self.fixedEnergy
        mono = fixedE is not None

        def _chain(k, wvs):
            f32 = wvs[0].xDiffr.dtype == jnp.float32
            logs = jnp.zeros((), wvs[0].x.dtype)

            def scaled(b):
                nonlocal logs
                if not f32:
                    return b
                b, ls = _w.rescale_field(b)
                logs = logs + ls
                return b

            cur = _w._shine_or_diffract(None, wvs[0], k, fixedEnergy=fixedE)
            if hops[0][0] == 'oe':
                _, cur = _w.reflect_wave(hops[0][1], cur, k)
            cur = scaled(cur)
            for i in range(1, len(hops)):
                kind, el, extra = hops[i]
                pm, acc = modes[i]
                b = _w.diffract(cur, wvs[i], phase_mode=pm,
                                monochromatic=mono, accumulate=acc,
                                tile_modes=tilemaps[i], mesh=mesh,
                                ring=ring)
                if kind == 'oe':
                    # reflect_wave keeps the EXACT local sample coords
                    # (the f32 global round trip would add ~1e-3 mm
                    # position noise = 100s of rad for the next hop)
                    _, cur = _w.reflect_wave(el, b, k)
                    if extra is not None:   # grating areaFraction
                        cur = cur.replace(area=cur.area * extra)
                else:
                    cur = b
                if i < len(hops) - 1:
                    cur = scaled(cur)
            return cur, logs

        chain = jax.jit(_chain)
        waves0 = tuple(waves)

        def run(k=None):
            return chain(key if k is None else k, waves0)

        run.waves = waves0
        run.modes = modes
        run.tilemaps = tilemaps
        return run

    # -- output helpers --------------------------------------------------
    @staticmethod
    def absolute_intensity(wave, log_scale) -> np.ndarray:
        """(Jss + Jpp) restored to absolute units, float64 on host."""
        J = np.asarray(wave.Jss, np.float64) + \
            np.asarray(wave.Jpp, np.float64)
        return J * math.exp(-2.0 * float(log_scale))
