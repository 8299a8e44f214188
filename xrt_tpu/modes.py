"""Coherent mode decomposition and propagation.

TPU-native re-implementation of xrt/backends/raycing/modes.py
(_solve_modes:165, make_and_save_modes:336, use_saved:415): a stack of
filament (macro-electron) fields is computed at the first aperture with the
source's wave-mode shine, eigendecomposed into coherent modes and saved;
saved modes/fields re-emerge as waves ready for Kirchhoff propagation or as
hybrid ray beams.
"""
from __future__ import annotations

import pickle
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def solve_modes(fields, nModes, phaseEsEp=0.0):
    """Eigenmodes from a list of (Es, Ep) sample-field pairs
    (cf. modes.py:165-222).  Returns (modes [(mEs, mEp)], all eigenvalues,
    total flux in the fields)."""
    nElectrons = len(fields)
    nModes = min(nModes, nElectrons)
    Es = jnp.stack([f[0] for f in fields]).T   # (nsamples, nElectrons)
    Ep = jnp.stack([f[1] for f in fields]).T
    fluxFields = jnp.sum((Es * jnp.conj(Es)).real) + \
        jnp.sum((Ep * jnp.conj(Ep)).real)
    DE = Es + Ep * jnp.exp(1j * phaseEsEp)
    DTD = DE.T.conj() @ DE
    DTD = DTD / jnp.trace(DTD).real
    wAll, vE = jnp.linalg.eigh(DTD)
    modes = []
    for iMode in range(nModes):
        vv = vE[:, -1 - iMode]
        modes.append((Es @ vv, Ep @ vv))
    return modes, wAll, fluxFields


def make_and_save_modes(bl, nsamples, nElectrons, nElectronsSave, nModes,
                        fixedEnergy, key=None, phaseEsEp=0.0,
                        output='all', basename='local'):
    """Compute *nElectrons* filament fields of the first source at the first
    aperture of *bl*, decompose into *nModes* coherent modes, and pickle
    fields/modes (cf. modes.py:336-413).

    Returns (modes, wAll, fluxFields, wave)."""
    from .waves import prepare_wave_on_aperture
    if key is None:
        key = jax.random.PRNGKey(0)
    source = bl.sources[0]
    slit = bl.slits[0]
    kw, key = jax.random.split(key)
    wave = prepare_wave_on_aperture(slit, source, nsamples, key=kw)
    dS = wave.area / nsamples
    norm = nElectrons ** 0.5

    shine_wave = jax.jit(lambda k: source.shine_wave(k, wave, fixedEnergy))
    fields = []
    for iElectron in range(nElectrons):
        key, sub = jax.random.split(key)
        w = shine_wave(sub)
        fields.append((w.Es * jnp.sqrt(dS) / norm,
                       w.Ep * jnp.sqrt(dS) / norm))
    modes, wAll, fluxFields = solve_modes(fields, nModes, phaseEsEp)

    if 'wave' in output or 'all' in output:
        state = {
            'fields': [(np.asarray(f[0]), np.asarray(f[1]))
                       for f in fields[:nElectronsSave]],
            'modes': [(np.asarray(m[0]), np.asarray(m[1]))
                      for m in modes],
            'wAll': np.asarray(wAll),
            'fluxFields': float(fluxFields),
            'wave_geometry': {k: np.asarray(getattr(wave, k)) for k in
                              ('x', 'y', 'z', 'a', 'b', 'c', 'xDiffr',
                               'yDiffr', 'zDiffr', 'rDiffr', 'dS')},
            'area': float(wave.area),
            'E0': fixedEnergy,
        }
        with open(f'wave-{basename}.pickle', 'wb') as f:
            pickle.dump(state, f)
    return modes, wAll, fluxFields, wave


def use_saved(what, basename, slit=None, source=None):
    """Load saved modes or fields as Wave objects ready for diffraction
    (cf. modes.py:415-470).  *what* is e.g. 'wave-modes' or 'wave-fields'.
    *slit*/*source* rebuild the wave geometry (fromOE/toOE references are
    not pickled)."""
    from . import config
    from .waves import Wave
    with open(f'wave-{basename}.pickle', 'rb') as f:
        state = pickle.load(f)
    saved = state['modes'] if what.endswith('modes') else state['fields']
    geo = state['wave_geometry']
    dt = config.dtype()
    res = []
    for Es, Ep in saved:
        n = len(Es)
        w = Wave(
            x=jnp.asarray(geo['x'], dt), y=jnp.asarray(geo['y'], dt),
            z=jnp.asarray(geo['z'], dt), a=jnp.asarray(geo['a'], dt),
            b=jnp.asarray(geo['b'], dt), c=jnp.asarray(geo['c'], dt),
            E=jnp.full((n,), state['E0'], dt),
            state=jnp.ones((n,), jnp.int32),
            path=jnp.zeros((n,), dt),
            Jss=jnp.asarray((Es * np.conj(Es)).real, dt),
            Jpp=jnp.asarray((Ep * np.conj(Ep)).real, dt),
            Jsp=jnp.asarray(Es * np.conj(Ep)),
            Es=jnp.asarray(Es), Ep=jnp.asarray(Ep),
            xDiffr=jnp.asarray(geo['xDiffr'], dt),
            yDiffr=jnp.asarray(geo['yDiffr'], dt),
            zDiffr=jnp.asarray(geo['zDiffr'], dt),
            rDiffr=jnp.asarray(geo['rDiffr'], dt),
            dS=jnp.asarray(geo['dS'], dt),
            area=jnp.asarray(state['area'], dt),
            fromOE=source, toOE=slit)
        res.append(w)
    return res, state['wAll'], state['fluxFields']
