"""The job runner: repeated traced passes accumulated into plots.

TPU-native equivalent of the reference run machinery
(xrt/runner.py:501 run_ray_tracing + the worker farm xrt/multipro.py): the
reference spawns a process farm where each worker traces ``nrays`` rays and
returns per-plot histograms over queues; here one jit-compiled step traces a
full batch and returns the per-plot histograms as device arrays, the host
loop accumulates them (histograms are linear), and multi-chip scaling is a
``shard_map`` over rays with ``psum``-ed histograms (xrt_tpu.parallel)
instead of queues.

The user contract mirrors the reference run_process
(xrt/backends/raycing/run.py:2, doc at backends/raycing/__init__.py:104-127):
``run_process(beamLine, key) -> {beamName: Beam}``, except that the RNG key
is explicit for reproducibility across shards.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .beam import Beam
from .histogram import (hist1d, hist1d_rgb, hist2d, hist2d_rgb, colorize)
from .plotspec import XYCPlot, HUE_GOOD, HUE_OUT, HUE_OVER, HUE_DEAD

# ---------------------------------------------------------------------------
# beam getters (cf. reference _beam_props.py)
# ---------------------------------------------------------------------------


def _safe_b(beam):
    return jnp.where(beam.b == 0, 1e-300, beam.b)


BEAM_GETTERS = {
    'x': lambda b: b.x,
    'y': lambda b: b.y,
    'z': lambda b: b.z,
    'xprime': lambda b: b.a / _safe_b(b),
    'zprime': lambda b: b.c / _safe_b(b),
    'path': lambda b: b.path,
    'energy': lambda b: b.E,
    'r': lambda b: jnp.sqrt(b.x ** 2 + b.z ** 2),
    'phi': lambda b: jnp.arctan2(b.x, b.z),
    'theta': lambda b: jnp.arctan2(
        jnp.sqrt(b.a ** 2 + b.c ** 2), b.b),
    'degree_of_polarization': lambda b: b.degree_of_polarization,
    'circular_polarization_rate': lambda b: 2 * b.Jsp.imag /
        jnp.maximum(b.Jss + b.Jpp, 1e-300),
    'polarization_psi': lambda b: 0.5 * jnp.arctan2(
        2. * b.Jsp.real, b.Jss - b.Jpp),
    's': lambda b: getattr(b, 's', b.x),
    'incidence_angle': lambda b: getattr(b, 'theta', jnp.zeros_like(b.x)),
    # (remaining reference getters, _beam_props.py:40-162)
    'a': lambda b: b.a,
    'b': lambda b: b.b,
    'xzprime': lambda b: jnp.sqrt(b.a ** 2 + b.c ** 2) / _safe_b(b),
    'order': lambda b: b.order if b.order is not None
        else jnp.zeros_like(b.x),
    'reflection_number': lambda b: b.nRefl if b.nRefl is not None
        else jnp.zeros_like(b.x),
    'Es_amp': lambda b: jnp.abs(b.Es),
    'Ep_amp': lambda b: jnp.abs(b.Ep),
    'Es_phase': lambda b: jnp.angle(b.Es),
    'Ep_phase': lambda b: jnp.angle(b.Ep),
    'ratio_ellipse_axes': lambda b: jnp.tan(0.5 * jnp.arcsin(jnp.clip(
        2 * b.Jsp.imag / jnp.maximum(b.Jss + b.Jpp, 1e-300), -1., 1.))),
    'phase_shift': lambda b: jnp.angle(b.Jsp) / jnp.pi,  # units of pi
}


def get_beam_data(beam: Beam, data):
    if callable(data):
        return data(beam)
    return BEAM_GETTERS[data](beam)


def _intensity_flux(beam: Beam, fluxKind: str):
    """(intensity, flux) per fluxKind (cf. get_output,
    backends/raycing/__init__.py:423-451)."""
    fk = fluxKind
    if fk.startswith('power'):
        acc = beam.accepted if beam.accepted is not None else 1.0
        seed = beam.seeded if beam.seeded is not None else 1.0
        from .physconsts import SIE0
        intensity = (beam.Jss + beam.Jpp) * beam.E * acc / seed * SIE0
        return intensity, intensity
    if fk.startswith('s'):
        i = beam.Jss
    elif fk.startswith('p') and not fk.startswith('power'):
        i = beam.Jpp
    elif fk.startswith('+-45'):
        i = 2 * beam.Jsp.real
    elif fk.startswith('left-right'):
        i = 2 * beam.Jsp.imag
    elif fk.startswith('E'):
        if fk.startswith('Es'):
            return beam.Es, beam.Jss
        if fk.startswith('Ep'):
            return beam.Ep, beam.Jpp
        return beam.Es + beam.Ep, beam.Jss + beam.Jpp
    else:
        i = beam.Jss + beam.Jpp
    return i, i


def _plot_arrays(plot: XYCPlot, beams: Dict[str, Beam]):
    """Device-side equivalent of raycing.get_output (see reference
    backends/raycing/__init__.py:331-451): returns
    (x, y, cData, intensity, flux, mask, counters)."""
    beam = beams[plot.beam]
    state = beam.state if plot.beamState is None \
        else beams[plot.beamState].state
    mask = jnp.zeros_like(state, dtype=bool)
    for rayFlag in plot.rayFlag:
        if rayFlag < 0:
            mask = mask | (state < 0)
        else:
            mask = mask | (state == rayFlag)
    x = (get_beam_data(beam, plot.xaxis.data) - plot.xaxis.offset) * \
        plot.xaxis.factor
    y = (get_beam_data(beam, plot.yaxis.data) - plot.yaxis.offset) * \
        plot.yaxis.factor
    if plot.caxis.useCategory:
        cData = jnp.where(state == 1, HUE_GOOD,
                          jnp.where(state == 2, HUE_OUT,
                                    jnp.where(state == 3, HUE_OVER,
                                              HUE_DEAD))).astype(x.dtype)
        intensity = jnp.ones_like(x)
        flux = intensity
    else:
        beamC = beam if plot.beamC is None else beams[plot.beamC]
        cData = get_beam_data(beamC, plot.caxis.data) * plot.caxis.factor
        intensity, flux = _intensity_flux(beam, plot.fluxKind)
    counters = dict(
        nRaysAll=state.shape[0],
        nRaysAlive=jnp.sum(state > 0),
        nRaysGood=jnp.sum(state == 1),
        nRaysOut=jnp.sum(state == 2),
        nRaysOver=jnp.sum(state == 3),
        nRaysDead=jnp.sum(state < 0),
        nRaysAccepted=beam.accepted if beam.accepted is not None else 0.0,
        nRaysAcceptedE=beam.acceptedE if beam.acceptedE is not None else 0.0,
        nRaysSeeded=beam.seeded if beam.seeded is not None else 0.0,
        nRaysSeededI=beam.seededI if beam.seededI is not None else 0.0,
    )
    return x, y, cData, intensity, flux, mask, counters


def histogram_plot(plot: XYCPlot, beams: Dict[str, Beam]):
    """All histograms of one plot for one traced pass — pure and jittable.
    Limits must already be fixed in the plot axes."""
    x, y, cData, intensity, flux, mask, counters = _plot_arrays(plot, beams)
    fmask = mask.astype(flux.dtype)
    if jnp.iscomplexobj(flux):
        flux = flux * fmask
    else:
        flux = flux * fmask
    intensity = intensity * fmask
    xlim = tuple(plot.xaxis.limits)
    ylim = tuple(plot.yaxis.limits)
    clim = tuple(plot.caxis.limits)
    rgb = colorize(cData, jnp.abs(flux), clim, plot.colorFactor,
                   plot.colorSaturation)
    out = dict(
        xh=hist1d(x, jnp.abs(flux), plot.xaxis.bins, xlim),
        xhRGB=hist1d_rgb(x, rgb, plot.xaxis.bins, xlim),
        yh=hist1d(y, jnp.abs(flux), plot.yaxis.bins, ylim),
        yhRGB=hist1d_rgb(y, rgb, plot.yaxis.bins, ylim),
        eh=hist1d(cData, jnp.abs(flux), plot.caxis.bins, clim),
        ehRGB=hist1d_rgb(cData, rgb, plot.caxis.bins, clim),
        xyh=hist2d(x, y, intensity, plot.xaxis.bins, plot.yaxis.bins,
                   xlim, ylim),
        xyhRGB=hist2d_rgb(x, y, rgb, plot.xaxis.bins, plot.yaxis.bins,
                          xlim, ylim),
        intensity=jnp.sum(jnp.abs(flux)),
        counters=counters,
    )
    # mutual-intensity accumulators for coherence analysis
    # (multipro.py do_histXXZZ:91, do_hist2d 4D/PCA branches:107-178)
    fk = plot.fluxKind
    if fk.startswith('E'):
        fklow = fk.lower()
        field = intensity  # complex per-ray field for 'E*' kinds
        if fklow.endswith('xx') or fklow.endswith('zz') or \
                fklow.endswith('yy'):
            axv, bins, lim = (x, plot.xaxis.bins, xlim) \
                if fklow.endswith('xx') else (y, plot.yaxis.bins, ylim)
            fs = hist1d(axv, field.real * fmask, bins, lim) + \
                1j * hist1d(axv, field.imag * fmask, bins, lim)
            out['J2D'] = jnp.outer(fs, jnp.conj(fs))
        elif fklow.endswith('4d'):
            f2 = hist2d(x, y, field.real * fmask, plot.xaxis.bins,
                        plot.yaxis.bins, xlim, ylim) + \
                1j * hist2d(x, y, field.imag * fmask, plot.xaxis.bins,
                            plot.yaxis.bins, xlim, ylim)
            fvec = f2.ravel()
            out['J4D'] = jnp.outer(fvec, jnp.conj(fvec))
        elif fklow.endswith('pca'):
            f2 = hist2d(x, y, field.real * fmask, plot.xaxis.bins,
                        plot.yaxis.bins, xlim, ylim) + \
                1j * hist2d(x, y, field.imag * fmask, plot.xaxis.bins,
                            plot.yaxis.bins, xlim, ylim)
            out['fieldPCA'] = f2.ravel()
    return out


# ---------------------------------------------------------------------------
# limits calibration (iteration 0 semantics, multipro.py:179-233,297-314)
# ---------------------------------------------------------------------------

def _update_limits(axis, arr):
    if (axis._limitsInit is None) or isinstance(axis._limitsInit, str):
        arr = np.asarray(arr)
        if arr.size > 1 and np.isfinite(arr).any():
            xmin = float(np.nanmin(arr))
            xmax = float(np.nanmax(arr))
            dx = axis.extraMargin * (xmax - xmin) / axis.bins
            xmin -= dx
            xmax += dx
            if xmin == xmax:
                xmin -= 1.0
                xmax += 1.0
        else:
            xmin, xmax = 1.0, 10.0
        if isinstance(axis._limitsInit, str):  # 'symmetric'
            xmm = max(abs(xmin), abs(xmax))
            xmin, xmax = -xmm, xmm
        axis.limits = [xmin, xmax]
    else:
        axis.limits = list(axis._limitsInit)


def calibrate_limits(plots: Sequence[XYCPlot], beams: Dict[str, Beam]):
    """Fix auto axis limits from a calibration pass (host side)."""
    for plot in plots:
        x, y, cData, intensity, flux, mask, _ = _plot_arrays(plot, beams)
        m = np.asarray(mask)
        _update_limits(plot.xaxis, np.asarray(x)[m])
        _update_limits(plot.yaxis, np.asarray(y)[m])
        _update_limits(plot.caxis, np.asarray(cData)[m])
        # aspect='equal' equalization (multipro.py:202-233)
        if plot.aspect == 'equal' or isinstance(plot.aspect, (int, float)):
            aspect = 1.0 if plot.aspect == 'equal' else float(plot.aspect)
            xlim, ylim = plot.xaxis.limits, plot.yaxis.limits
            dx = xlim[1] - xlim[0]
            dy = ylim[1] - ylim[0]
            xDefined = plot.xaxis._limitsInit is not None and \
                not isinstance(plot.xaxis._limitsInit, str)
            yDefined = plot.yaxis._limitsInit is not None and \
                not isinstance(plot.yaxis._limitsInit, str)
            if xDefined and not yDefined:
                leading = 'x'
            elif yDefined and not xDefined:
                leading = 'y'
            else:
                leading = 'x' if dx > dy * aspect else 'y'
            if leading == 'x':
                yMid = (ylim[1] + ylim[0]) / 2
                dy2 = dx / aspect / 2
                plot.yaxis.limits = [yMid - dy2, yMid + dy2]
            else:
                xMid = (xlim[1] + xlim[0]) / 2
                dx2 = dy * aspect / 2
                plot.xaxis.limits = [xMid - dx2, xMid + dx2]


def _accumulate(plot: XYCPlot, h):
    plot.total1D_x += np.asarray(h['xh'])
    plot.total1D_x_RGB += np.asarray(h['xhRGB'])
    plot.total1D_y += np.asarray(h['yh'])
    plot.total1D_y_RGB += np.asarray(h['yhRGB'])
    plot.total1D_c += np.asarray(h['eh'])
    plot.total1D_c_RGB += np.asarray(h['ehRGB'])
    plot.total2D += np.asarray(h['xyh']).real
    plot.total2D_RGB += np.asarray(h['xyhRGB'])
    plot.intensity += float(h['intensity'])
    c = h['counters']
    plot.nRaysAll += int(c['nRaysAll'])
    plot.nRaysAlive += int(c['nRaysAlive'])
    plot.nRaysGood += int(c['nRaysGood'])
    plot.nRaysOut += int(c['nRaysOut'])
    plot.nRaysOver += int(c['nRaysOver'])
    plot.nRaysDead += int(c['nRaysDead'])
    plot.nRaysAccepted += float(c['nRaysAccepted'])
    plot.nRaysAcceptedE += float(c['nRaysAcceptedE'])
    plot.nRaysSeeded += float(c['nRaysSeeded'])
    plot.nRaysSeededI += float(c['nRaysSeededI'])
    if 'J2D' in h:
        if not hasattr(plot, 'totalJ2D') or plot.totalJ2D is None:
            plot.totalJ2D = np.zeros_like(np.asarray(h['J2D']))
        plot.totalJ2D = plot.totalJ2D + np.asarray(h['J2D'])
    if 'J4D' in h:
        if not hasattr(plot, 'totalJ4D') or plot.totalJ4D is None:
            plot.totalJ4D = np.zeros_like(np.asarray(h['J4D']))
        plot.totalJ4D = plot.totalJ4D + np.asarray(h['J4D'])
    if 'fieldPCA' in h:
        if not hasattr(plot, 'fieldsPCA') or plot.fieldsPCA is None:
            plot.fieldsPCA = []
        plot.fieldsPCA.append(np.asarray(h['fieldPCA']))
    plot.repeats += 1


RUN_HISTORY_FILE = 'lastRuns.pickle'


def store_run_history(t_start, t_stop, tag='', fileName=None, keep=10):
    """Append (start, stop, duration, tag) to the run-history pickle
    (reference runner.py:87-111, lastRuns.pickle)."""
    import pickle
    import os
    fileName = fileName or RUN_HISTORY_FILE
    runs = load_run_history(fileName)
    runs.append((time.localtime(t_start), time.localtime(t_stop),
                 t_stop - t_start, tag))
    with open(fileName, 'wb') as f:
        pickle.dump(runs[-keep:], f)
    return runs[-keep:]


def load_run_history(fileName=None):
    import pickle
    import os
    fileName = fileName or RUN_HISTORY_FILE
    if not os.path.exists(fileName):
        return []
    try:
        with open(fileName, 'rb') as f:
            return list(pickle.load(f))
    except Exception:
        return []


def normalize_sibling_plots(plots, saveSuffix='_norm'):
    """Put a family of plots on a common brightness scale and re-save them
    (reference runner.py:460-498): the global maxima of the 1D profiles and
    the 2D RGB histogram are shared across all *plots* via their
    ``globalMax*`` attributes before re-rendering."""
    import numpy as _np
    max2D = max(float(_np.max(p.total2D)) for p in plots) or 1.0
    max2D_RGB = max(float(_np.max(p.total2D_RGB)) for p in plots) or 1.0
    max1Dx = max(float(_np.max(p.total1D_x)) for p in plots) or 1.0
    max1Dy = max(float(_np.max(p.total1D_y)) for p in plots) or 1.0
    for plot in plots:
        plot.globalMax2D = max2D
        plot.globalMax2D_RGB = max2D_RGB
        plot.globalMax1D_x = max1Dx
        plot.globalMax1D_y = max1Dy
        if plot.saveName:
            from .plotting import save_plot
            root, ext = plot.saveName.rsplit('.', 1)
            save_plot(plot, f'{root}{saveSuffix}.{ext}')
    return max2D, max2D_RGB


def run_ray_tracing(plots, repeats=1, beamLine=None, run_process=None,
                    key=None, updateEvery=None, pickleEvery=None,
                    generator=None, generatorArgs=(), afterScript=None,
                    afterScriptArgs=(), mesh=None, verbose=False,
                    historyFile=None, historyTag=''):
    """Trace ``repeats`` batches and accumulate histograms into *plots*
    (cf. reference runner.run_ray_tracing, xrt/runner.py:501).

    *run_process(beamLine, key) -> {name: Beam}* is the user trace function
    (explicit-key equivalent of the reference raycing.run.run_process
    contract).  When *mesh* is given, each pass is sharded over its devices
    by xrt_tpu.parallel.sharded_run.  *generator* supports parametric scans:
    a python generator which mutates the beamline/plots between scan points
    (reference runner.py:142-187)."""
    if isinstance(plots, XYCPlot):
        plots = [plots]
    if key is None:
        key = jax.random.PRNGKey(0)
    elif isinstance(key, int):
        key = jax.random.PRNGKey(key)

    if generator is not None:
        gen = generator(*generatorArgs)
    else:
        gen = None

    # Compiled-step cache across scan points (cf. the reference's repeated
    # worker dispatch, runner.py:252): the beamline elements enter the
    # jitted step as ARGUMENTS (installed into the beamLine only during
    # tracing), so a generator that tweaks element parameters between scan
    # points hits the jit cache instead of re-tracing/re-compiling; the
    # cache is keyed on the plots' limits, which are baked into the
    # histogram code as constants.
    step_cache = {}

    def _limits_key():
        def lim(v):
            if v is None or isinstance(v, str):
                return v
            return (float(v[0]), float(v[1]))
        return tuple((lim(p.xaxis.limits), lim(p.yaxis.limits),
                      lim(p.caxis.limits), p.xaxis.bins, p.yaxis.bins,
                      p.caxis.bins) for p in plots)

    def _make_step():
        @jax.jit
        def step(elements, key):
            saved = None
            if beamLine is not None and elements is not None:
                saved = dict(beamLine._elements)
                for n, el in elements.items():
                    beamLine.update(n, el)
            try:
                beams = run_process(beamLine, key)
                return [histogram_plot(plot, beams) for plot in plots]
            finally:
                if saved is not None:
                    for n, el in saved.items():
                        beamLine.update(n, el)
        return step

    def _get_step():
        # without a beamLine the scan state lives in user closures, which
        # are baked into the trace as constants — caching across scan
        # points would silently reuse the first point's values, so each
        # point gets a fresh jit (the pre-cache behavior)
        if beamLine is None or not getattr(beamLine, '_elements', None):
            return _make_step()
        lk = _limits_key()
        if lk not in step_cache:
            step_cache[lk] = _make_step()
        return step_cache[lk]

    def one_scan_point(key):
        # restore persistent accumulations if requested
        for plot in plots:
            if plot.persistentName:
                import os
                if os.path.exists(plot.persistentName):
                    plot.restore_plots()
        # calibration pass for auto limits
        key, sub = jax.random.split(key)
        need_cal = any(p.xaxis.limits is None or p.yaxis.limits is None or
                       p.caxis.limits is None or
                       isinstance(p.xaxis.limits, str) for p in plots)
        if need_cal:
            # under jit: an eager trace would materialize complex constants
            # host-side, which some TPU transports cannot transfer; only
            # the real coordinate arrays are pulled by calibrate_limits
            beams0 = jax.jit(lambda k: run_process(beamLine, k))(sub)
            calibrate_limits(plots, beams0)

        step = _get_step()
        elements = dict(beamLine._elements) \
            if beamLine is not None and getattr(beamLine, '_elements', None) \
            else None

        from .profiler import stage as _pstage
        t0 = time.time()
        for it in range(repeats):
            key, sub = jax.random.split(key)
            if mesh is not None:
                from .parallel import sharded_step
                with _pstage('runner.step'):
                    hists = sharded_step(run_process, beamLine, plots,
                                         mesh, sub)
                    jax.block_until_ready(hists)
            else:
                with _pstage('runner.step'):
                    hists = step(elements, sub)
                    jax.block_until_ready(hists)
            with _pstage('runner.accumulate'):
                for plot, h in zip(plots, hists):
                    _accumulate(plot, h)
            if updateEvery and (it + 1) % updateEvery == 0 and \
                    (it + 1) < repeats:
                # live plot refresh (reference runner.py:241-247: every
                # updateEvery iterations the figures redraw)
                from .plotting import save_plot
                for plot in plots:
                    if plot.saveName:
                        save_plot(plot, plot.saveName)
            if pickleEvery and (it + 1) % pickleEvery == 0:
                for plot in plots:
                    if plot.persistentName:
                        plot.store_plots()
            if verbose:
                print(f'iteration {it + 1}/{repeats} done in '
                      f'{time.time() - t0:.3f}s')
        for plot in plots:
            if plot.persistentName:
                plot.store_plots()
            if plot.saveName:
                from .plotting import save_plot
                save_plot(plot, plot.saveName)
        return key

    t_run0 = time.time()
    if gen is None:
        one_scan_point(key)
    else:
        for _ in gen:
            key = one_scan_point(key)
    if historyFile:
        store_run_history(t_run0, time.time(), tag=historyTag,
                          fileName=historyFile)
    if verbose:
        from .profiler import report
        print(report())
    if afterScript:
        afterScript(*afterScriptArgs)
    return plots
