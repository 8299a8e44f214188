"""Exact port of reference speed test 1 (the analyzer workload):
tests/speed/1_SourceZCrystalThetaAlpha_speed.py — a diced Johansson
2D-bent Si(444) crystal analyzer traced from three geometric source
types (flat-E band, single line, 7 lines), 96 iterations x 1e5 rays
each, with the three reference detector/footprint histograms.

Reference numbers (same workload, i7-7700K): 436.1 s on 1 thread,
157.1 s best with 4 processes (no GPU implementation exists).

Run:  python tools/bench_analyzer.py [--nrays 100000 --repeats 96]
"""
import argparse
import math
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp

# reference configuration (1_SourceZCrystalThetaAlpha_speed.py:112-190):
# crystal = CrystalDiamond((4,4,4), d111/4), diced Johansson toroid,
# R=500, theta=60 deg, alpha=0
D111 = 3.1354161
THETA_DEG = 60.0
R = 500.0
DX_CRYSTAL = DY_CRYSTAL = 100.0
BEAM_H = 0.2 / 2.35
BEAM_V = 0.07 / 2.35
E_AXIS_FLAT = 8.0e-4     # eAxesFlat[theta=60][crystal=Si444] (diced Joh.)


def build(nrays):
    import xrt_tpu.materials as xm
    from xrt_tpu.oes import DicedJohanssonToroid
    from xrt_tpu.screens import Screen
    from xrt_tpu.sources import GeometricSource
    from xrt_tpu.physconsts import CH

    crystal = xm.CrystalDiamond.create(hkl=(4, 4, 4), d=D111 / 4,
                                       elements='Si', rho=2.33, name='Si')
    theta = math.radians(THETA_DEG)
    sinTheta = math.sin(theta)
    E0raw = CH / (2 * float(crystal.d) * sinTheta)
    dTheta = float(crystal.get_dtheta_symmetric_Bragg(E0raw))
    E0 = CH / (2 * float(crystal.d) * math.sin(theta + dTheta))
    p = q = 2.0 * R * sinTheta
    Rs = 2.0 * R * sinTheta ** 2
    sin2T, cos2T = math.sin(2 * theta), math.cos(2 * theta)
    pdp = 2.0 * R * math.sin(theta - DY_CRYSTAL / 6 / R)

    analyzer = DicedJohanssonToroid.create(
        dxFacet=2.1, dyFacet=1.4, dxGap=0.05, dyGap=0.05,
        Rm=R, Rs=Rs, material=crystal,
        center=(0, p, 0), pitch=theta,
        limPhysX=(-DX_CRYSTAL / 2, DX_CRYSTAL / 2),
        limPhysY=(-DY_CRYSTAL / 2, DY_CRYSTAL / 2))
    detector = Screen.create(center=(0, p + q * cos2T, q * sin2T),
                             x=(1, 0, 0), z=(0, -sin2T, cos2T))

    def source(distE, energies):
        return GeometricSource.create(
            nrays=nrays, dx=BEAM_H, dz=BEAM_V,
            distxprime='flat', dxprime=DX_CRYSTAL / pdp,
            distzprime='flat', dzprime=DY_CRYSTAL * sinTheta / pdp,
            distE=distE, energies=energies, polarization=None)

    eMin, eMax = E0 * (1 - E_AXIS_FLAT), E0 * (1 + E_AXIS_FLAT)
    dE7 = E0 * E_AXIS_FLAT / 4
    sources = [
        source('flat', (eMin, eMax)),                       # isource 0
        source('lines', (E0,)),                             # isource 1
        source('lines', tuple(E0 + (i - 3) * dE7            # isource 2
                              for i in range(7))),
    ]
    return sources, analyzer, detector, (eMin, eMax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nrays', type=int, default=100000)
    ap.add_argument('--repeats', type=int, default=96)
    args = ap.parse_args()

    from xrt_tpu.histogram import hist2d

    sources, analyzer, detector, (eMin, eMax) = build(args.nrays)

    def make_step(src):
        def one(key):
            beam = src.shine(key)
            glo, loc = analyzer.reflect(beam, key)
            det = detector.expose(glo)
            wLoc = jnp.where(loc.state == 1, loc.Jss + loc.Jpp, 0.0)
            wDet = jnp.where(det.state == 1, det.Jss + det.Jpp, 0.0)
            # the three reference histograms: xtal_E (400x400),
            # xtal_E_zoom (128x128), det_E (128x128)
            h1 = hist2d(loc.x, loc.y, wLoc, 400, 400, (-52, 52), (-52, 52))
            h2 = hist2d(loc.x, loc.y, wLoc, 128, 128, (-1.6, 1.6),
                        (-1.6, 1.6))
            h3 = hist2d(det.x, det.z, wDet, 128, 128, (-2.5, 2.5),
                        (-1.5, 1.5))
            return h1, h2, h3

        @jax.jit
        def run(key):
            def body(carry, k):
                h1, h2, h3 = one(k)
                return (carry[0] + h1, carry[1] + h2, carry[2] + h3), None
            init = (jnp.zeros((400, 400)), jnp.zeros((128, 128)),
                    jnp.zeros((128, 128)))
            keys = jax.random.split(key, args.repeats)
            (h1, h2, h3), _ = jax.lax.scan(body, init, keys)
            return jnp.sum(h1) + jnp.sum(h2) + jnp.sum(h3)
        return run

    steps = [make_step(s) for s in sources]
    # warm-up compiles
    for i, st in enumerate(steps):
        float(np.asarray(st(jax.random.PRNGKey(100 + i))))
    t0 = time.time()
    acc = 0.0
    for i, st in enumerate(steps):
        acc = acc + st(jax.random.PRNGKey(i))
    total_flux = float(np.asarray(acc))
    dt = time.time() - t0
    nrays_total = 3 * args.repeats * args.nrays
    print(f'analyzer workload: {nrays_total:.3g} rays '
          f'(3 sources x {args.repeats} x {args.nrays}), '
          f'{dt:.2f} s = {nrays_total / dt / 1e6:.2f} M rays/s; '
          f'accumulated flux {total_flux:.5g}')
    print(f'reference (identical workload): 436.1 s (1 thread), '
          f'157.1 s (4 processes, i7-7700K) -> '
          f'{436.1 / dt:.1f}x / {157.1 / dt:.1f}x')
    import json
    print('BENCH_EXTRA' + json.dumps({
        'analyzer_total_s': round(dt, 3),
        'analyzer_vs_i7_1thread': round(436.1 / dt, 1),
        'analyzer_vs_i7_4proc': round(157.1 / dt, 1)}))


if __name__ == '__main__':
    main()
