import time, numpy as np, jax, jax.numpy as jnp
from xrt_tpu.ops import dd
from xrt_tpu.ops.kirchhoff import kirchhoff_integral_pallas
Ns, Nd = 100000, 20000
rng = np.random.RandomState(0)
t = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
base = (t(rng.uniform(-50, 50, Ns)), t(rng.uniform(-1, 1, Ns)), t(rng.uniform(-.5, .5, Ns)),
        jnp.ones(Ns, jnp.float32), jnp.zeros(Ns, jnp.float32),
        t(np.full(Ns, 4.56e7)), jnp.ones(Ns, jnp.float32),
        jnp.ones(Ns, jnp.float32), jnp.ones(Ns, jnp.float32))
xd = t(rng.uniform(-1, 1, Nd)); yd = t(np.full(Nd, 20000.)); zd = t(rng.uniform(-1, 1, Nd))
def bench(name, **kw):
    def wrapped(xd, yd, zd, xs, ys, zs, esr, esi, k, n1, nl, w):
        zero = jnp.zeros_like(esr)
        out = kirchhoff_integral_pallas(xd, yd, zd, xs, ys, zs, esr+1j*esi, zero+0j, k,
                                        [zero, n1, zero], nl, w, **kw)
        return sum(jnp.sum(o.real)+jnp.sum(o.imag) for o in out)
    fn = jax.jit(wrapped)
    try:
        float(np.asarray(fn(xd, yd, zd, *base)))
    except Exception as e:
        print(name, kw, "FAIL", str(e)[:90], flush=True); return
    times=[]
    for i in range(4):
        xdi = (xd[0] + np.float32(i*1e-6), xd[1])
        t0=time.time(); s=float(np.asarray(fn(xdi, yd, zd, *base))); times.append(time.time()-t0)
    print(name, kw, f"{Ns*Nd/np.median(times)/1e9:.2f} Gpairs/s", flush=True)
bench("a", src_chunk=512)
bench("b", src_chunk=1024)
bench("c", src_chunk=768)
bench("d", src_chunk=512, dst_tile=256)
