"""MXU-accumulation Kirchhoff: accuracy vs the f32 VPU kernel + speed."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from xrt_tpu.ops import dd
from xrt_tpu.ops.kirchhoff import kirchhoff_integral_pallas

def make_args(Ns, Nd, seed=0):
    rng = np.random.RandomState(seed)
    t = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
    es = rng.uniform(-1, 1, Ns) + 1j * rng.uniform(-1, 1, Ns)
    return (t(rng.uniform(-1, 1, Nd)), t(np.full(Nd, 20000.)),
            t(rng.uniform(-1, 1, Nd)),
            t(rng.uniform(-50, 50, Ns)), t(rng.uniform(-1, 1, Ns)),
            t(rng.uniform(-.5, .5, Ns)),
            jnp.asarray(es.real, jnp.float32), jnp.asarray(es.imag, jnp.float32),
            t(np.full(Ns, 4.56e7)),
            jnp.asarray(rng.uniform(0.1, 0.9, Ns), jnp.float32),
            jnp.ones(Ns, jnp.float32), jnp.ones(Ns, jnp.float32))

def wrapped(mono, mode, xd, yd, zd, xs, ys, zs, esr, esi, k, n1, nl, w):
    zero = jnp.zeros_like(esr)
    Es = jax.lax.complex(esr, esi)
    Ep = jax.lax.complex(0.3 * esr, -0.2 * esi)
    out = kirchhoff_integral_pallas(
        xd, yd, zd, xs, ys, zs, Es, Ep, k,
        [zero, n1, zero], nl, w, monochromatic=mono, accumulate=mode)
    return [jnp.stack([o.real, o.imag]) for o in out]

# --- accuracy at 20k x 20k
Ns = Nd = 20000
args = make_args(Ns, Nd)
for mono in (True,):
    f_v = jax.jit(functools.partial(wrapped, mono, 'vpu'))
    pass
    ov = [np.asarray(o) for o in f_v(*args)]
    for mode in ('mxu', 'mxu-fast', 'mxu32'):
        f_m = jax.jit(functools.partial(wrapped, mono, mode))
        om = [np.asarray(o) for o in f_m(*args)]
        for name, a, b in zip(('Es', 'Ep', 'aE', 'bE', 'cE'), ov, om):
            scale = np.abs(a).max()
            err = np.abs(a - b).max() / scale
            print(f'{mode} {name}: rel err {err:.2e}')

# --- speed at the bench size (mono)
Ns = Nd = 200000
args = make_args(Ns, Nd, 1)
for mode in ('vpu', 'mxu', 'mxu-fast', 'mxu32'):
    f = jax.jit(functools.partial(wrapped, True, mode))
    digest = lambda outs: sum(jnp.sum(o) for o in outs)
    float(np.asarray(digest(f(*args))))
    nrep = 3
    t0 = time.time(); s = 0.0
    for i in range(nrep):
        a2 = ((args[0][0] + np.float32(i * 1e-6), args[0][1]),) + args[1:]
        s = s + digest(f(*a2))
    float(np.asarray(s))
    dt = (time.time() - t0) / nrep
    print(f'{mode}: {Ns * Nd / dt / 1e9:.1f} G pairs/s ({dt:.2f} s)')
