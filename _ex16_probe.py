import sys
sys.path.insert(0, '/root/repo')
import importlib.util
spec = importlib.util.spec_from_file_location('ex16', '/root/repo/examples/16_parametric_optimization.py')
ex16 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ex16)
import jax, jax.numpy as jnp, numpy as np
neg_peak, waves0, (wW, wT) = ex16.build_wave_problem()
f = jax.jit(lambda p, ws, w: neg_peak(p, ws, w))
fg = jax.jit(jax.grad(lambda p, ws, w: neg_peak(p, ws, w)))
for pt in ([0,0,-12], [40e-6,-30e-6,0], [42.5e-6,-42.9e-6,-10.7],
           [20e-6,-15e-6,-6], [10e-6,-7e-6,-10]):
    a = jnp.asarray(pt, jnp.float32)
    print(pt, 'tight', float(np.asarray(f(a, waves0, wT))), 'wide', float(np.asarray(f(a, waves0, wW))))
g = fg(jnp.asarray([40e-6,-30e-6,0.0], jnp.float32), waves0, wW)
print('grad at start (wide):', np.asarray(g))
