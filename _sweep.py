import functools, time, itertools
import numpy as np
import jax, jax.numpy as jnp
from xrt_tpu.ops import dd
from xrt_tpu.ops.kirchhoff import kirchhoff_integral_pallas

Ns = Nd = 200000
rng = np.random.RandomState(0)
t = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
args = (t(rng.uniform(-1, 1, Nd)), t(np.full(Nd, 20000.)),
        t(rng.uniform(-1, 1, Nd)),
        t(rng.uniform(-50, 50, Ns)), t(rng.uniform(-1, 1, Ns)),
        t(rng.uniform(-.5, .5, Ns)),
        jnp.ones(Ns, jnp.float32), jnp.zeros(Ns, jnp.float32),
        t(np.full(Ns, 4.56e7)), jnp.ones(Ns, jnp.float32),
        jnp.ones(Ns, jnp.float32), jnp.ones(Ns, jnp.float32))

def run(dst_tile, src_chunk, sublanes):
    def wrapped(xd, yd, zd, xs, ys, zs, esr, esi, k, n1, nl, w):
        zero = jnp.zeros_like(esr)
        out = kirchhoff_integral_pallas(
            xd, yd, zd, xs, ys, zs, jax.lax.complex(esr, esi),
            jax.lax.complex(zero, zero), k, [zero, n1, zero], nl, w,
            monochromatic=True, accumulate='mxu',
            dst_tile=dst_tile, src_chunk=src_chunk, sublanes=sublanes)
        return sum(jnp.sum(o.real) + jnp.sum(o.imag) for o in out)
    f = jax.jit(wrapped)
    try:
        float(np.asarray(f(*args)))
    except Exception as e:
        print(f'({dst_tile},{src_chunk},{sublanes}): FAIL {type(e).__name__}')
        return
    t0 = time.time(); s = 0.0
    for i in range(2):
        a2 = ((args[0][0] + np.float32(i*1e-6), args[0][1]),) + args[1:]
        s = s + f(*a2)
    float(np.asarray(s))
    dt = (time.time()-t0)/2
    print(f'({dst_tile},{src_chunk},{sublanes}): {Ns*Nd/dt/1e9:.1f} G pairs/s')

cfgs = ((128,1024,8),(256,1024,8),(128,2048,8))
for rep in range(2):
    for cfg in cfgs:
        run(*cfg)
