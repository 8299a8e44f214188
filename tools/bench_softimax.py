"""End-to-end port of the reference speed test 3: the SoftiMAX wave chain.

Workload definition (reference tests/speed/3_Softi_CXIw2D_speed.py:10-17 and
examples/withRaycing/14_SoftiMAX/Softi_CXIw2D.py): a coherent undulator
filament field is propagated by consecutive Fresnel-Kirchhoff integrals
source -> FE slit -> M1 (toroid) -> M2 (plane) -> PG (blazed grating, the
cff=1.6 collimated-mono pair with fixed exit) -> M3 (toroid) -> exit slit ->
M4 -> M5 (elliptical cylinders, the KB pair) -> three 64x64 focal images
at -50/0/+50 mm around the sample focus.  Every wave carries 2e5 samples,
so each of the 7 wave->wave integrals is 4e10 src x dst pair interactions
(plus 3 smaller focal-image integrals); published reference times: 17.5 s
on one A100 (f64 OpenCL), 71 s on a W9100, 162 s on a Xeon Gold 6130.

The optical parameters (energies, distances, angles, slit sizes, grating)
are the reference's own; the layout is laid down with pilot-ray placement
(each next element is centered on the traced central ray) instead of the
reference's beamline-azimuth bookkeeping.

Per-stage kernel selection: stages whose geometry fits the recentred
1/A-series envelope (e <= 0.1, kirchhoff.SERIES_E_MAX) run the default
MXU accumulation; mid-range stages run recentred phase with the exact
'vpu' direction contraction; the short mono stages (M2->PG is ~250 mm
with 450 mm footprints — sample pairs nearly touch) run the per-pair
double-float 'fast' phase, exact at any separation.

Run directly for a one-off timing + focal-image PNG:
    python tools/bench_softimax.py [--smoke]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

E0 = 280.0
DE = 0.5
ACCEPT_H = 2.2e-4       # FE acceptance, full angle, rad
ACCEPT_V = 4.2e-4
P_FE = 19250.0
P_M1 = 24000.0
P_PG = 2000.0           # M1 -> PG
P_M3 = 2800.0           # PG -> M3
Q_M3_SAG = 12000.0
D_M4_ES = 2200.0
D_M45 = 3200.0
P_EXP = 1800.0
PITCH = math.radians(1.0)
CFF = 1.6
FIXED_EXIT = 20.0       # mm
RHO_G = 300.0           # lines/mm
BLAZE = math.radians(0.6)
ES_DX = 2.0             # exit slit, mm
ES_DZ = 0.1
D_FOCUS = (-50.0, 0.0, 50.0)
IMAGE_HALF = 0.05       # +-50 um focal image extent


def align_grating(E, m, cff, rho):
    """cff-constrained grating alignment (reference speed-test 3
    align_grating, 3_Softi_CXIw2D_speed.py:250-264)."""
    from xrt_tpu.physconsts import CH
    order = abs(m) if cff > 1 else -abs(m)
    f1 = cff ** 2 + 1
    f2 = cff ** 2 - 1
    ml_d = order * rho * CH / E * 1e-7
    cosAlpha = math.sqrt(-ml_d ** 2 * f1 + 2 * abs(ml_d) *
                         math.sqrt(f2 ** 2 + cff ** 2 * ml_d ** 2)) / abs(f2)
    cosBeta = cff * cosAlpha
    alpha = math.acos(cosAlpha)
    beta = -math.acos(cosBeta)
    return alpha, beta


def _pilot_dir(oe, origin, d, key):
    """Outgoing direction of the central ray reflected by *oe* (host)."""
    import jax
    import jax.numpy as jnp
    from xrt_tpu import config
    from xrt_tpu.beam import new_beam
    dt = config.dtype()
    nray = 4
    b = new_beam(nray, energy=E0, withAmplitudes=True, dtype=dt)
    b = b.replace(
        x=jnp.full((nray,), origin[0], dt),
        y=jnp.full((nray,), origin[1], dt),
        z=jnp.full((nray,), origin[2], dt),
        a=jnp.full((nray,), d[0], dt),
        b=jnp.full((nray,), d[1], dt),
        c=jnp.full((nray,), d[2], dt))
    glo, loc = jax.jit(oe.reflect)(b, key)
    st = np.asarray(loc.state)
    good = st == 1
    if not good.any():
        raise RuntimeError(f'pilot ray missed {type(oe).__name__}')
    v = np.array([np.asarray(glo.a)[good].mean(),
                  np.asarray(glo.b)[good].mean(),
                  np.asarray(glo.c)[good].mean()], float)
    return v / np.linalg.norm(v)


def _aim_yaw(d):
    """Yaw that turns an element's +y axis onto the horizontal projection
    of direction *d* (local +y maps to (-sin yaw, cos yaw, 0))."""
    return math.atan2(-d[0], d[1])


def choose_stage_mode(wave, src_x, src_y, src_z, k=None,
                      error_budget=None):
    """(phase_mode, accumulate) for one diffract stage given its fixed
    geometry — thin wrapper over the library's
    :func:`xrt_tpu.waves.choose_kirchhoff_mode` (the envelope logic
    lives there; k defaults to the 280 eV chain energy)."""
    from xrt_tpu.waves import choose_kirchhoff_mode
    return choose_kirchhoff_mode(
        (np.asarray(wave.xDiffr), np.asarray(wave.yDiffr),
         np.asarray(wave.zDiffr)),
        (np.asarray(src_x), np.asarray(src_y), np.asarray(src_z)), k=k,
        error_budget=error_budget)


def build_chain(nrays=200000, n_scr=64, verbose=False, tiled=False,
                error_budget='auto'):
    """Build the beamline + fixed wave geometry; return run_chain().

    run_chain(key) executes one full source->focus propagation (the
    reference run_process_wave) and blocks until the three focal images
    are materialized; it returns them as a numpy array (3, n_scr, n_scr).
    All stages are compiled on the first call.

    *tiled*: blockwise-recentred tiling for the stages outside the
    global MXU envelopes (waves.choose_tile_modes): measured 7.77 s vs
    8.37 s untiled on one v5e.  Since round 4 the tile pairs are grouped
    by kernel mode and scanned within groups (waves.diffract), so the
    one-time compile is the same ~68 s as untiled (was 280 s with one
    kernel variant per tile pair) — tiled is now the default.

    *error_budget*: per-stage relative field error for the mode chooser
    ('auto' = the chain's own MC noise floor 3/sqrt(nrays) ~ 6.7e-3 at
    2e5 samples, which admits 'mxu-fast' single-pass bf16 field
    accumulation — 33% faster, ~2e-3 incoherent error, invisible under
    the MC noise; see waves.choose_kirchhoff_mode).  None keeps the
    two-pass accumulation everywhere."""
    if error_budget == 'auto':
        error_budget = 3.0 / math.sqrt(nrays)
    import jax
    import jax.numpy as jnp
    import xrt_tpu.materials as xm
    from xrt_tpu import config
    from xrt_tpu.apertures import RectangularAperture
    from xrt_tpu.oes import (ToroidMirror, FlatMirror, BlazedGrating,
                             EllipticalMirrorParam)
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import Undulator
    from xrt_tpu.waves import (prepare_wave_on_aperture, prepare_wave_on_oe,
                               prepare_wave_on_screen, diffract,
                               reflect_wave, rescale_field)

    key = jax.random.PRNGKey(7)
    mAu = xm.Material.create('Au', rho=19.32, kind='mirror')

    src = Undulator.create(
        nrays=nrays, eE=3.0, eI=0.5, eEspread=0.0,
        eEpsilonX=0.0, eEpsilonZ=0.0, betaX=9.0, betaZ=2.0,
        period=48.0, n=77, targetE=(E0, 1),
        eMin=E0 - DE, eMax=E0 + DE,
        xPrimeMax=ACCEPT_H / 2 * 1e3, zPrimeMax=ACCEPT_V / 2 * 1e3,
        xPrimeMaxAutoReduce=False, zPrimeMaxAutoReduce=False,
        gNodes=402, gIntervals=2)

    slitFE = RectangularAperture.create(
        center=(0, P_FE, 0),
        opening=[-ACCEPT_H * P_FE / 2, ACCEPT_H * P_FE / 2,
                 -ACCEPT_V * P_FE / 2, ACCEPT_V * P_FE / 2])

    rM1 = 2.0 * P_M1 * math.sin(PITCH)
    m1 = ToroidMirror.create(
        center=(0, P_M1, 0), pitch=PITCH, positionRoll=math.pi / 2,
        R=1e22, r=rM1, material=mAu, limPhysX=(-5, 5),
        limPhysY=(-150, 150))
    d1 = _pilot_dir(m1, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), key)
    yaw1 = _aim_yaw(d1)
    c1 = np.array(m1.center, float) if not hasattr(m1.center, 'shape') \
        else np.asarray(m1.center, float)

    # collimated-PGM pair (fixed exit +FIXED_EXIT in z)
    alpha, beta = align_grating(E0, 1, CFF, RHO_G)
    incAng = alpha - beta
    t = -FIXED_EXIT / math.tan(incAng)
    m2 = FlatMirror.create(
        center=tuple(c1 + d1 * (P_PG - t)),
        pitch=(math.pi - incAng) / 2, yaw=yaw1, material=mAu,
        limPhysX=(-5, 5), limPhysY=(-225, 225))
    pg = BlazedGrating.create(
        center=tuple(c1 + d1 * P_PG + np.array([0, 0, FIXED_EXIT])),
        pitch=-(beta + math.pi / 2), yaw=yaw1, positionRoll=math.pi,
        blaze=BLAZE, rho=RHO_G, material=mAu,
        limPhysX=(-2, 2), limPhysY=(-40, 40))
    areaFraction = float(pg.get_grating_area_fraction())

    rM3 = 2.0 * math.sin(PITCH) * Q_M3_SAG
    # NB the reference writes m3.pitch=-pitch with positionRoll=-pi/2; in
    # our Rz(yaw)Ry(roll)Rx(pitch) composition the same optical surface
    # (normal facing -x, leaning upstream) needs pitch=+PITCH
    m3 = ToroidMirror.create(
        center=tuple(c1 + d1 * (P_PG + P_M3) + np.array([0, 0,
                                                         FIXED_EXIT])),
        pitch=PITCH, yaw=yaw1, positionRoll=-math.pi / 2,
        R=1e22, r=rM3, material=mAu, limPhysX=(-10, 10),
        limPhysY=(-100, 100))
    c3 = np.asarray(m3.center, float)
    d3 = _pilot_dir(m3, tuple(c3 - d1 * 100.0), d1, key)
    yaw3 = _aim_yaw(d3)

    exitSlit = RectangularAperture.create(
        center=tuple(c3 + d3 * Q_M3_SAG),
        opening=[-ES_DX / 2, ES_DX / 2, -ES_DZ / 2, ES_DZ / 2],
        x=(math.cos(yaw3), math.sin(yaw3), 0.0))

    m4 = EllipticalMirrorParam.create(
        center=tuple(c3 + d3 * (Q_M3_SAG + D_M4_ES)),
        p=43000.0, q=D_M45 + P_EXP, pitch=PITCH, yaw=yaw3,
        positionRoll=math.pi / 2, isCylindrical=True, material=mAu,
        limPhysX=(-0.5, 0.5), limPhysY=(-70, 70))
    c4 = np.asarray(m4.center, float)
    d4 = _pilot_dir(m4, tuple(c4 - d3 * 100.0), d3, key)
    yaw4 = _aim_yaw(d4)

    m5 = EllipticalMirrorParam.create(
        center=tuple(c4 + d4 * D_M45),
        p=D_M4_ES + D_M45, q=P_EXP, pitch=PITCH, yaw=yaw4,
        isCylindrical=True, material=mAu,
        limPhysX=(-0.5, 0.5), limPhysY=(-40, 40))
    c5 = np.asarray(m5.center, float)
    d5 = _pilot_dir(m5, tuple(c5 - d4 * 100.0), d4, key)

    screens = [Screen.create(center=tuple(c5 + d5 * (P_EXP + dq)))
               for dq in D_FOCUS]
    px = np.linspace(-IMAGE_HALF, IMAGE_HALF, n_scr)

    elements = dict(src=src, slitFE=slitFE, m1=m1, m2=m2, pg=pg, m3=m3,
                    exitSlit=exitSlit, m4=m4, m5=m5, screens=screens)

    # -- fixed wave geometry + per-stage kernel mode (host, once) --------
    modes = {}
    tilemaps = {}

    # the Pallas kernel keeps the full SOURCE cloud in VMEM; above this
    # many samples the stage is tiled along src purely for size, so the
    # chain scales to production sampling (1e6/wave = 1e12 pairs per
    # integral — the convergence level the reference's own speed-test
    # docstring recommends but never ran)
    SRC_TILE_MAX = 200000

    def _prep(name, fn, src_wave):
        from xrt_tpu.waves import choose_tile_modes
        w = fn()
        modes[name] = choose_stage_mode(w, src_wave.x, src_wave.y,
                                        src_wave.z,
                                        error_budget=error_budget)
        Ns_ = int(np.asarray(src_wave.x).shape[0])
        need_size_tiles = Ns_ > SRC_TILE_MAX
        if (tiled and not (modes[name][0] == 'recentred' and
                           modes[name][1].startswith('mxu'))) or \
                need_size_tiles:
            # blockwise-recentred tiling: most tile pairs of a
            # short-distance stage satisfy the MXU envelopes even when
            # the global geometry does not (samples are y-sorted); for
            # oversized source clouds the same machinery tiles purely
            # for VMEM footprint
            ntd = 5 if (tiled and not modes[name][1].startswith('mxu')) \
                else 1
            nts = max(10 if ntd == 5 else 1,
                      -(-Ns_ // SRC_TILE_MAX))
            tm = choose_tile_modes(
                (np.asarray(w.xDiffr), np.asarray(w.yDiffr),
                 np.asarray(w.zDiffr)),
                (np.asarray(src_wave.x), np.asarray(src_wave.y),
                 np.asarray(src_wave.z)),
                n_dst_tiles=ntd, n_src_tiles=nts,
                error_budget=error_budget)
            tilemaps[name] = tm
            if verbose:
                flat = [m for row in tm for m in row]
                print(f'# stage {name}: tiled {ntd}x{nts} -> '
                      f"{sum(1 for m in flat if m[1].startswith('mxu'))}"
                      f'/{len(flat)} tiles on mxu '
                      f"({sum(1 for m in flat if m[0] == 'fast')} fast)")
        elif verbose:
            print(f'# stage {name}: phase={modes[name][0]} '
                  f'acc={modes[name][1]}')
        return w

    def prepare(k):
        ks = jax.random.split(k, 8)
        wSlit = prepare_wave_on_aperture(slitFE, src, nrays, key=ks[0])
        wM1 = _prep('m1', lambda: prepare_wave_on_oe(
            m1, slitFE, nrays, key=ks[1], sort='y'), wSlit)
        wM2 = _prep('m2', lambda: prepare_wave_on_oe(
            m2, m1, nrays, key=ks[2], sort='y'), wM1)
        wPG = _prep('pg', lambda: prepare_wave_on_oe(
            pg, m2, nrays, key=ks[3], sort='y'), wM2)
        wM3 = _prep('m3', lambda: prepare_wave_on_oe(
            m3, pg, nrays, key=ks[4], sort='y'), wPG)
        wES = _prep('es', lambda: prepare_wave_on_aperture(
            exitSlit, m3, nrays, key=ks[5]), wM3)
        wM4 = _prep('m4', lambda: prepare_wave_on_oe(
            m4, exitSlit, nrays, key=ks[6], sort='y'), wES)
        wM5 = _prep('m5', lambda: prepare_wave_on_oe(
            m5, m4, nrays, key=ks[7], sort='y'), wM4)
        wScr = []
        for i, scr in enumerate(screens):
            w = _prep(f'scr{i}', lambda: prepare_wave_on_screen(
                scr, m5, px, px), wM5)
            wScr.append(w)
        return wSlit, wM1, wM2, wPG, wM3, wES, wM4, wM5, wScr

    waves0 = prepare(key)

    def _chain(k, wSlit, wM1, wM2, wPG, wM3, wES, wM4, wM5, wScr):
        """The reference run_process_wave: pure-jax field propagation.

        The running field is renormalized to unit RMS between stages
        (reference semantics reach J ~ 1e39, beyond float32; the chain
        is linear so the accumulated log-scale is undone on the final
        images, see waves.rescale_field).  Returns (images, logs)."""
        def dif(name, loc, w):
            pm, acc = modes[name]
            return diffract(loc, w, phase_mode=pm, monochromatic=True,
                            accumulate=acc,
                            tile_modes=tilemaps.get(name))

        logs = jnp.zeros((), wSlit.x.dtype)

        def refl(oe, b):
            nonlocal logs
            # reflect_wave keeps the receiver's exact local coords: the
            # f32 global round trip would quantize them at ~1e-3 mm and
            # scramble the next hop's phases
            _, loc = reflect_wave(oe, b, k)
            loc, ls = rescale_field(loc)
            logs = logs + ls
            return loc

        ws = src.shine_wave(k, wSlit, E0)
        ws, ls = rescale_field(ws)
        logs = logs + ls
        l1 = refl(m1, dif('m1', ws, wM1))
        l2 = refl(m2, dif('m2', l1, wM2))
        lg = refl(pg, dif('pg', l2, wPG))
        # illuminated-fraction of the sawtooth period scales the
        # effective radiating area (reference beamPGlocal.areaFraction)
        lg = lg.replace(area=lg.area * areaFraction)
        l3 = refl(m3, dif('m3', lg, wM3))
        bes = dif('es', l3, wES)
        bes, ls = rescale_field(bes)
        logs = logs + ls
        l4 = refl(m4, dif('m4', bes, wM4))
        l5 = refl(m5, dif('m5', l4, wM5))
        outs = [dif(f'scr{i}', l5, w) for i, w in enumerate(wScr)]
        return jnp.stack([(o.Jss + o.Jpp).reshape(n_scr, n_scr)
                          for o in outs]), logs

    chain = jax.jit(_chain)

    # production sampling (>3e5/wave): the monolithic 10-stage jit's
    # peak buffer set exceeds HBM (observed worker crash at 1e6 while
    # every stage runs fine in isolation) — execute stage-wise, each
    # hop its own jit, freeing the previous stage's buffers in between;
    # the ~10 extra dispatches cost nothing against the 1e12-pair
    # integrals
    staged = nrays > 300000

    def _shine_stage(k, wSlit):
        ws = src.shine_wave(k, wSlit, E0)
        return rescale_field(ws)

    def _hop_stage(name, oe, areaFrac, k, loc, w):
        pm, acc = modes[name]
        b = diffract(loc, w, phase_mode=pm, monochromatic=True,
                     accumulate=acc, tile_modes=tilemaps.get(name))
        if oe is None:
            out, ls = rescale_field(b)
        else:
            _, out = reflect_wave(oe, b, k)
            out, ls = rescale_field(out)
        if areaFrac is not None:
            out = out.replace(area=out.area * areaFrac)
        return out, ls

    def _focal_stage(name, loc, w):
        pm, acc = modes[name]
        o = diffract(loc, w, phase_mode=pm, monochromatic=True,
                     accumulate=acc, tile_modes=tilemaps.get(name))
        return (o.Jss + o.Jpp).reshape(n_scr, n_scr)

    if staged:
        _shine_j = jax.jit(_shine_stage)
        _hop_j = jax.jit(_hop_stage, static_argnums=(0, 2))
        _focal_j = jax.jit(_focal_stage, static_argnums=(0,))

        def _chain_staged(k, wSlit, wM1, wM2, wPG, wM3, wES, wM4, wM5,
                          wScr):
            cur, logs = _shine_j(k, wSlit)
            hops = [('m1', m1, None, wM1), ('m2', m2, None, wM2),
                    ('pg', pg, areaFraction, wPG), ('m3', m3, None, wM3),
                    ('es', None, None, wES), ('m4', m4, None, wM4),
                    ('m5', m5, None, wM5)]
            for name, oe, af, w in hops:
                cur, ls = _hop_j(name, oe, af, k, cur, w)
                cur.x.block_until_ready()
                logs = logs + ls
            imgs = [np.asarray(_focal_j(f'scr{i}', cur, w))
                    for i, w in enumerate(wScr)]
            return np.stack(imgs), logs

    state = {'key': key}

    def run_chain(reprepare=False):
        """One full propagation; returns (3, n_scr, n_scr) focal images
        in the reference's absolute flux units (float64 host rescale).
        With reprepare=True the wave geometry is regenerated too (the
        reference recomputes it every repeat; compiles are cached).
        NB the kernel modes are baked into the compiled chain: if the
        re-drawn geometry changes any stage's mode the cached executable
        would silently run the wrong kernel, so that case errors out."""
        state['key'], sub = jax.random.split(state['key'])
        if reprepare:
            modes_before = dict(modes)
            waves = prepare(sub)
            if modes != modes_before:
                changed = [nm for nm in modes
                           if modes[nm] != modes_before.get(nm)]
                raise RuntimeError(
                    'reprepare moved stages across a kernel-mode '
                    f'envelope ({changed}); rebuild the chain '
                    '(build_chain) so the jit retraces with the new '
                    'modes')
        else:
            waves = waves0
        if staged:
            imgs, logs = _chain_staged(sub, *waves[:-1], waves[-1])
        else:
            imgs, logs = chain(sub, *waves[:-1], waves[-1])
        return np.asarray(imgs, np.float64) * math.exp(
            -2.0 * float(logs))

    run_chain.elements = elements
    run_chain.modes = modes
    run_chain.nrays = nrays
    return run_chain


def main():
    smoke = '--smoke' in sys.argv
    # tiled is the production default (7.8 vs 8.4 s on one v5e; same
    # compile cost since the per-mode kernel dedup); --untiled opts out
    tiled = '--untiled' not in sys.argv
    from xrt_tpu.config import select_platform
    select_platform()
    nrays = 4000 if smoke else 200000
    for a in sys.argv:
        if a.startswith('--nrays='):
            nrays = int(float(a.split('=')[1]))
    n_scr = 32 if smoke else 64
    for a in sys.argv:
        if a.startswith('--nscr='):
            n_scr = int(a.split('=')[1])
    t0 = time.time()
    run_chain = build_chain(nrays=nrays, n_scr=n_scr, verbose=True,
                            tiled=tiled)
    t1 = time.time()
    imgs = run_chain()            # compile + first run
    t2 = time.time()
    times = []
    nrep = 1 if nrays > 300000 else (2 if smoke else 3)
    for _ in range(nrep):
        ta = time.time()
        imgs = run_chain()
        times.append(time.time() - ta)
    best = min(times)
    npairs = 7 * run_chain.nrays ** 2 + 3 * run_chain.nrays * n_scr ** 2
    print(f'build {t1 - t0:.1f} s, first run (compile) {t2 - t1:.1f} s, '
          f'chain best-of-{len(times)} {best:.2f} s '
          f'({npairs / best / 1e9:.1f} G pairs/s); '
          f'reference 1xA100: 17.5 s')
    for i, dq in enumerate(D_FOCUS):
        tot = float(imgs[i].sum())
        print(f'  focus {dq:+.0f} mm: total {tot:.3e}, peak '
              f'{float(imgs[i].max()):.3e}')
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for i, (ax, dq) in enumerate(zip(axes, D_FOCUS)):
            ax.imshow(imgs[i], origin='lower',
                      extent=[-50, 50, -50, 50], cmap='inferno')
            ax.set_title(f'focus {dq:+.0f} mm')
            ax.set_xlabel('x (um)')
        axes[0].set_ylabel('z (um)')
        fig.tight_layout()
        fig.savefig('softimax_focus.png', dpi=110)
        print('saved softimax_focus.png')
    except Exception as e:
        print(f'(no plot: {e!r})')


if __name__ == '__main__':
    main()
