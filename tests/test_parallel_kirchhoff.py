"""Multi-device Kirchhoff: dst-sharded and ring (ppermute) variants must
reproduce the single-device integral exactly on an 8-device CPU mesh."""

CODE = r"""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
assert jax.device_count() == 8, jax.devices()

from xrt_tpu.parallel import make_mesh, kirchhoff_sharded, kirchhoff_ring
from xrt_tpu.waves import kirchhoff_integral_xla

rng = np.random.default_rng(0)
Ns, Nd = 700, 333   # deliberately not multiples of 8
xs = jnp.asarray(rng.uniform(-1, 1, Ns))
ys = jnp.asarray(rng.uniform(-1, 1, Ns))
zs = jnp.asarray(rng.uniform(-0.01, 0.01, Ns))
xd = jnp.asarray(rng.uniform(-0.5, 0.5, Nd))
yd = jnp.asarray(rng.uniform(-0.5, 0.5, Nd)) + 100.0
zd = jnp.asarray(rng.uniform(-0.5, 0.5, Nd))
Es = jnp.asarray(rng.normal(size=Ns) + 1j * rng.normal(size=Ns))
Ep = jnp.asarray(rng.normal(size=Ns) + 1j * rng.normal(size=Ns))
k = jnp.full((Ns,), 2 * np.pi / 1.5e-7)
n = [jnp.zeros(()), jnp.zeros(()), jnp.ones(())]
nl = jnp.asarray(rng.uniform(0.7, 1.0, Ns))
w = jnp.asarray((rng.uniform(size=Ns) > 0.1).astype(float))

ref = kirchhoff_integral_xla(xd, yd, zd, xs, ys, zs, Es, Ep, k,
                             [jnp.broadcast_to(v, (Ns,)) for v in n],
                             nl, w)
mesh = make_mesh()
out_s = kirchhoff_sharded(mesh, xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, w)
out_r = kirchhoff_ring(mesh, xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, w)
for name, out in (('sharded', out_s), ('ring', out_r)):
    for a, b in zip(ref, out):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-300))
        assert err < 1e-12, (name, err)
print('OK sharded+ring match single-device')
"""


def test_kirchhoff_sharded_and_ring(clean_env_runner):
    out, _ = clean_env_runner(CODE)
    assert 'OK sharded+ring match single-device' in out
