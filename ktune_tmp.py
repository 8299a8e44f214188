import time, numpy as np, jax, jax.numpy as jnp
from xrt_tpu.ops import dd
from xrt_tpu.ops.kirchhoff import kirchhoff_integral_pallas, kirchhoff_integral_dd
# correctness small
Ns, Nd = 20000, 4000
rng = np.random.RandomState(0)
t = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
args_s = (t(rng.uniform(-1,1,Nd)), t(np.full(Nd,20000.)), t(rng.uniform(-1,1,Nd)),
          t(rng.uniform(-50,50,Ns)), t(rng.uniform(-1,1,Ns)), t(rng.uniform(-.5,.5,Ns)),
          jnp.asarray(rng.normal(size=Ns).astype(np.float32)), jnp.zeros(Ns, jnp.float32),
          t(np.full(Ns, 4.56e7)), jnp.ones(Ns, jnp.float32),
          jnp.ones(Ns, jnp.float32), jnp.ones(Ns, jnp.float32))
def runf(fn_raw, ret_all=False, **kw):
    def wrapped(xd, yd, zd, xs, ys, zs, esr, esi, k, n1, nl, w):
        zero = jnp.zeros_like(esr)
        out = fn_raw(xd, yd, zd, xs, ys, zs, esr+1j*esi, zero+0j, k, [zero,n1,zero], nl, w, **kw)
        if ret_all:
            return tuple(x for o in out for x in (o.real, o.imag))
        return sum(jnp.sum(o.real)+jnp.sum(o.imag) for o in out)
    return jax.jit(wrapped)
ref = [np.asarray(v) for v in runf(kirchhoff_integral_dd, ret_all=True)(*args_s)]
for mode in ('exact', 'fast'):
    out = [np.asarray(v) for v in runf(kirchhoff_integral_pallas, ret_all=True, phase_mode=mode)(*args_s)]
    d = max(np.abs(out[i]-ref[i]).max()/max(np.abs(ref[i]).max(),1e-30) for i in range(10))
    print(mode, "rel diff vs XLA-dd:", d, flush=True)
# perf big
Ns, Nd = 100000, 20000
base = (t(rng.uniform(-50, 50, Ns)), t(rng.uniform(-1, 1, Ns)), t(rng.uniform(-.5, .5, Ns)),
        jnp.ones(Ns, jnp.float32), jnp.zeros(Ns, jnp.float32),
        t(np.full(Ns, 4.56e7)), jnp.ones(Ns, jnp.float32),
        jnp.ones(Ns, jnp.float32), jnp.ones(Ns, jnp.float32))
xd = t(rng.uniform(-1, 1, Nd)); yd = t(np.full(Nd, 20000.)); zd = t(rng.uniform(-1, 1, Nd))
for kw_ in ({'src_chunk':1024}, {'src_chunk':512}):
    fn = runf(kirchhoff_integral_pallas, phase_mode='fast', **kw_)
    float(np.asarray(fn(xd, yd, zd, *base)))
    times=[]
    for i in range(4):
        xdi = (xd[0] + np.float32(i*1e-6), xd[1])
        t0=time.time(); s=float(np.asarray(fn(xdi, yd, zd, *base))); times.append(time.time()-t0)
    print(kw_, f"{Ns*Nd/np.median(times)/1e9:.2f} Gpairs/s", flush=True)
