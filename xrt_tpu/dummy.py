"""The simplest backend: random Gaussian rays for histogram demos.

Equivalent of xrt/backends/dummy.py (run_process:18): returns
(x, y, intensity, cData, nrays) suitable for feeding a plot directly,
bypassing ray tracing.  Override :data:`run_process` with your own callable
to drive plots from arbitrary data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

nrays = 25000


def run_process(nrays=nrays, seed=0):
    nrays = int(nrays)
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (nrays,))
    y = jax.random.normal(ky, (nrays,))
    intensity = jnp.ones_like(x)
    energy = x + y * 2.0 + 5000
    return x, y, intensity, energy, nrays
