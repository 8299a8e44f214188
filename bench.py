"""Benchmark: ray-tracing throughput of the flagship beamline trace.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload mirrors the reference xrt speed-test geometry class
(tests/speed/1_SourceZCrystalThetaAlpha_speed.py): Monte-Carlo source ->
curved mirror with material reflectivity -> screen -> 2D detector
histogram.  vs_baseline compares rays/s against the reference xrt tracing
the identical beamline on this host's CPU (single worker numpy,
tools/bench_reference.py -> 460913 rays/s measured 2026-08-17; the
reference's published multi-process scaling is ~2.7x on 4 cores,
BASELINE.md table 1).
"""
import json
import math
import time

REFERENCE_RAYS_PER_S = 460913.0   # reference xrt, 1-core numpy, this host


def main():
    import jax
    import jax.numpy as jnp
    from xrt_tpu.histogram import hist2d
    from xrt_tpu.sources import GeometricSource
    from xrt_tpu.screens import Screen
    from xrt_tpu.oes import ToroidMirror
    import xrt_tpu.materials as xm

    NRAYS = 1000000
    E0 = 9000.0
    pitch = 4e-3
    p, q = 10000.0, 2000.0
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    src = GeometricSource.create(
        nrays=NRAYS, center=(0, 0, 0), dx=0.1, dz=0.05,
        dxprime=3e-5, dzprime=3e-5, distE='flat',
        energies=(8900.0, 9100.0), polarization='horizontal')
    R = 2 * p * q / (p + q) / math.sin(pitch)
    r = 2 * p * q / (p + q) * math.sin(pitch)
    mirror = ToroidMirror.create(center=(0, p, 0), pitch=pitch, R=R, r=r,
                                 material=mat, limPhysX=(-20, 20),
                                 limPhysY=(-300, 300))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))

    @jax.jit
    def step(key):
        beam = src.shine(key)
        glo, _ = mirror.reflect(beam, key)
        img = screen.expose(glo)
        w = jnp.where(img.state == 1, img.Jss + img.Jpp, 0.0)
        return hist2d(img.x, img.z, w, 128, 128, (-1.0, 1.0), (-1.0, 1.0))

    key = jax.random.PRNGKey(0)
    # warmup/compile
    step(key).block_until_ready()
    nrep = 10
    t0 = time.time()
    for i in range(nrep):
        key, sub = jax.random.split(key)
        h = step(sub)
    h.block_until_ready()
    dt = time.time() - t0
    rays_per_s = NRAYS * nrep / dt
    print(json.dumps({
        'metric': 'traced rays/s/chip (MC source + toroid Si mirror + '
                  'screen + 2D hist)',
        'value': round(rays_per_s, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_s / REFERENCE_RAYS_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
