"""Multi-device scaling demo: rays data-parallel over a jax Mesh with
psum'd detector histograms, plus the ring-sharded (ppermute) Kirchhoff
integral.  Runs on any device count — try:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/05_multichip_sharded.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()  # set XRT_TPU_PLATFORM=cpu to run off-TPU

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.screens import Screen
from xrt_tpu.histogram import hist2d
from xrt_tpu.parallel import make_mesh, shard_map, kirchhoff_ring

E0 = 9000.0


def main():
    ndev = len(jax.devices())
    print(f'{ndev} devices: {jax.devices()}')
    mesh = make_mesh()
    axis = mesh.axis_names[0]

    p, q, pitch = 10000.0, 2000.0, 4e-3
    src = GeometricSource.create(nrays=20000, dx=0.1, dz=0.05,
                                 dxprime=3e-5, dzprime=3e-5,
                                 energies=(E0,), distE='lines')
    R = 2 * p * q / (p + q) / math.sin(pitch)
    r = 2 * p * q / (p + q) * math.sin(pitch)
    mirror = ToroidMirror.create(center=(0, p, 0), pitch=pitch, R=R, r=r,
                                 material=xm.Material.create('Rh',
                                                             rho=12.41),
                                 limPhysX=(-20, 20), limPhysY=(-300, 300))
    screen = Screen.create(center=(0, p + q, 2 * pitch * q))

    def step(keys):
        beam = src.shine(keys[0])
        glo, _ = mirror.reflect(beam)
        img = screen.expose(glo)
        w = jnp.where(img.state == 1, img.Jss + img.Jpp, 0.0)
        h = hist2d(img.x, img.z, w, 64, 64, (-1, 1), (-1, 1))
        return jax.lax.psum(h, axis)   # detector reduce over ICI

    keys = jax.random.split(jax.random.PRNGKey(0), ndev)
    fn = jax.jit(shard_map(step, mesh, in_specs=P(axis), out_specs=P()))
    h = np.asarray(fn(keys))
    print(f'traced {src.nrays * ndev} rays total; detector flux = '
          f'{h.sum():.4g}')

    # ring Kirchhoff: both src and dst sharded, src shards rotating with
    # ppermute
    rng = np.random.default_rng(0)
    Ns, Nd = 4000, 2000
    out = kirchhoff_ring(
        mesh,
        jnp.asarray(rng.uniform(-0.5, 0.5, Nd)),
        jnp.asarray(rng.uniform(-0.5, 0.5, Nd)) + 100.0,
        jnp.asarray(rng.uniform(-0.5, 0.5, Nd)),
        jnp.asarray(rng.uniform(-1, 1, Ns)),
        jnp.asarray(rng.uniform(-1, 1, Ns)),
        jnp.asarray(rng.uniform(-0.01, 0.01, Ns)),
        jnp.asarray(rng.normal(size=Ns) + 1j * rng.normal(size=Ns)),
        jnp.zeros(Ns) + 0j,
        jnp.full((Ns,), 2 * np.pi / 1.5e-7),
        [jnp.zeros(()), jnp.zeros(()), jnp.ones(())],
        jnp.ones((Ns,)), jnp.ones((Ns,)))
    print(f'ring Kirchhoff over {ndev} devices: '
          f'|Es| mean = {np.abs(np.asarray(out[0])).mean():.4g}')


if __name__ == '__main__':
    main()
