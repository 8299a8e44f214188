import time, math, numpy as np, jax, jax.numpy as jnp
from xrt_tpu.histogram import hist2d
from xrt_tpu.sources import GeometricSource
from xrt_tpu.screens import Screen
from xrt_tpu.oes import ToroidMirror
import xrt_tpu.materials as xm

for NRAYS in (1000000, 4000000):
    pitch = 4e-3; p, q = 10000.0, 2000.0
    mat = xm.Material.create('Si', rho=2.33, kind='mirror')
    src = GeometricSource.create(nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='flat', energies=(8900.0, 9100.0), polarization='horizontal')
    R = 2*p*q/(p+q)/math.sin(pitch); r = 2*p*q/(p+q)*math.sin(pitch)
    mirror = ToroidMirror.create(center=(0,p,0), pitch=pitch, R=R, r=r, material=mat,
                                 limPhysX=(-20,20), limPhysY=(-300,300))
    screen = Screen.create(center=(0, p+q, 2*pitch*q))
    @jax.jit
    def stage_all(key):
        beam = src.shine(key)
        glo, _ = mirror.reflect(beam, key)
        img = screen.expose(glo)
        w = jnp.where(img.state == 1, img.Jss + img.Jpp, 0.0)
        return jnp.sum(hist2d(img.x, img.z, w, 128, 128, (-1.,1.), (-1.,1.)))
    key = jax.random.PRNGKey(0)
    float(np.asarray(stage_all(key)))
    n = 6; t0=time.time(); s=0.0
    for i in range(n):
        key, sub = jax.random.split(key)
        s = s + stage_all(sub)
    float(np.asarray(s))
    dt=(time.time()-t0)/n
    print(f"NRAYS={NRAYS}: {dt*1e3:.1f} ms -> {NRAYS/dt/1e6:.2f} Mrays/s", flush=True)
