"""Rendering of accumulated XYCPlot histograms.

Equivalent in capability to the display layer of the reference
xrt/plotter.py (plot_plots:1873, plot_hist1d:1525, plot_hist2d:1739,
save:1996): the hue+brightness 2D image with side 1D profiles, FWHM/center
annotations and flux readout, saved to PNG/PDF/SVG via matplotlib (headless
Agg backend).
"""
from __future__ import annotations

import numpy as np


def rgb_image(plot, saturation='auto'):
    """The (ybins, xbins, 3) displayable RGB image of a plot: accumulated
    RGB weights normalized by their maximum brightness channel (or by the
    shared ``globalMax2D_RGB`` set by
    :func:`~xrt_tpu.runner.normalize_sibling_plots`)."""
    img = np.asarray(plot.total2D_RGB, float)
    mx = getattr(plot, 'globalMax2D_RGB', None) or img.max()
    if mx > 0:
        img = img / mx
    return np.clip(img, 0.0, 1.0)


def save_plot(plot, fileName, dpi=100, title=None, backend='Agg'):
    """Render the accumulated histograms of *plot* to an image file
    (cf. reference XYCPlot.save, plotter.py:1996)."""
    import matplotlib
    matplotlib.use(backend, force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7.2, 7.2))
    # layout similar to the reference: central 2D map + top/right 1D
    axC = fig.add_axes([0.12, 0.1, 0.6, 0.6])
    axX = fig.add_axes([0.12, 0.72, 0.6, 0.16], sharex=axC)
    axY = fig.add_axes([0.74, 0.1, 0.16, 0.6], sharey=axC)

    xlim = plot.xaxis.limits
    ylim = plot.yaxis.limits
    img = rgb_image(plot)
    axC.imshow(img, origin='lower', aspect='auto',
               extent=[xlim[0], xlim[1], ylim[0], ylim[1]])
    axC.set_xlabel(f'{plot.xaxis.label} ({plot.xaxis.unit})')
    axC.set_ylabel(f'{plot.yaxis.label} ({plot.yaxis.unit})')

    xc = plot.xaxis.binCenters
    hx = np.asarray(plot.total1D_x, float)
    rgbx = np.asarray(plot.total1D_x_RGB, float)
    if rgbx.max() > 0:
        rgbx = rgbx / rgbx.max()
    axX.bar(xc, hx / max(hx.max(), 1e-300), width=xc[1] - xc[0],
            color=np.clip(rgbx, 0, 1))
    axX.set_xlim(*xlim)
    axX.tick_params(labelbottom=False)

    yc = plot.yaxis.binCenters
    hy = np.asarray(plot.total1D_y, float)
    rgby = np.asarray(plot.total1D_y_RGB, float)
    if rgby.max() > 0:
        rgby = rgby / rgby.max()
    axY.barh(yc, hy / max(hy.max(), 1e-300), height=yc[1] - yc[0],
             color=np.clip(rgby, 0, 1))
    axY.set_ylim(*ylim)
    axY.tick_params(labelleft=False)

    txt = (f'dx = {plot.dx:.4g}   dz = {plot.dy:.4g}\n'
           f'cx = {plot.cx:.4g}   cz = {plot.cy:.4g}\n'
           f'dE = {plot.dE:.4g}   cE = {plot.cE:.4g}\n'
           f'flux = {plot.flux:.4g}   rays: {plot.nRaysGood}/'
           f'{plot.nRaysAll}')
    fig.text(0.74, 0.78, txt, fontsize=8, va='top', family='monospace')
    fig.suptitle(title or plot.title)
    fig.savefig(fileName, dpi=dpi)
    plt.close(fig)
    return fileName
