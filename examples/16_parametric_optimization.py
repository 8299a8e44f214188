"""Gradient-based beamline optimization with jax.grad.

The xrt_tpu analog (and upgrade) of the reference's
16_ParametricOptimization family: where the reference scans parameters
and fits, the TPU-native framework is differentiable end to end — the
flux through a small exit aperture is a pure function of the mirror
pitch and bend radius, so gradient ascent aligns the beamline in a few
steps.  Soft-edge apertures keep the gradient alive.

Run: python examples/16_parametric_optimization.py
     XRT_TPU_PLATFORM=cpu python examples/16_parametric_optimization.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrt_tpu.config import select_platform
select_platform()

import math

import jax
import jax.numpy as jnp

import xrt_tpu.materials as xm
from xrt_tpu.sources import GeometricSource
from xrt_tpu.oes import ToroidMirror
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen

SMOKE = bool(os.environ.get('XRT_TPU_SMOKE'))
NRAYS = 2000 if SMOKE else 100000
NSTEPS = 4 if SMOKE else 30

E0 = 9000.0
P, Q = 10000.0, 2000.0
PITCH0 = 4e-3


def main():
    src = GeometricSource.create(
        nrays=NRAYS, dx=0.1, dz=0.05, dxprime=3e-5, dzprime=3e-5,
        distE='lines', energies=(E0,), polarization='horizontal')
    mat = xm.Material.create('Rh', rho=12.41)
    R0 = 2 * P * Q / (P + Q) / math.sin(PITCH0)
    r0 = 2 * P * Q / (P + Q) * math.sin(PITCH0)
    # exit pinhole on the nominal axis; soft edges make the mask
    # differentiable
    pin = RectangularAperture.create(
        center=(0, P + Q, 2 * PITCH0 * Q),
        opening=(-0.1, 0.1, -0.1, 0.1), softEdge=0.05)
    key = jax.random.PRNGKey(0)
    beam = src.shine(key)   # fixed ray set: the loss is deterministic

    mirror0 = ToroidMirror.create(
        center=(0, P, 0), pitch=PITCH0, R=R0, r=r0,
        material=mat, limPhysX=(-20, 20), limPhysY=(-300, 300))

    def neg_flux(params):
        pitch_mrad, logR = params
        # elements are immutable pytrees: traced parameters enter through
        # replace(), so the whole trace is differentiable w.r.t. them
        mirror = mirror0.replace(pitch=pitch_mrad * 1e-3, R=jnp.exp(logR))
        glo, _ = mirror.reflect(beam)
        out = pin.propagate(glo)
        w = jnp.where(out.state == 1, out.Jss + out.Jpp, 0.0)
        return -jnp.sum(w)

    # start misaligned: pitch off by 50 urad, R off by 5%
    import optax
    params = jnp.asarray([(PITCH0 + 5e-5) * 1e3, jnp.log(R0 * 1.05)])
    opt = optax.adam(0.01)
    state = opt.init(params)
    val_grad = jax.jit(jax.value_and_grad(neg_flux))
    f0 = None
    for i in range(NSTEPS):
        f, g = val_grad(params)
        if f0 is None:
            f0 = f
        upd, state = opt.update(g, state)
        params = params + upd
        if i % 5 == 0 or i == NSTEPS - 1:
            print(f'step {i:3d}: flux={-float(f):10.2f}  '
                  f'pitch={float(params[0]):.5f} mrad  '
                  f'R={float(jnp.exp(params[1])):.0f} mm')
    dpitch = abs(float(params[0]) * 1e-3 - PITCH0)
    print(f'final pitch error {dpitch*1e6:.1f} urad (started at 50.0); '
          f'flux gained {float(val_grad(params)[0]) / float(f0):.2f}x')


if __name__ == '__main__':
    main()
