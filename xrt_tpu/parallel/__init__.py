"""Multi-device scaling: rays sharded over a jax Mesh.

TPU-native replacement of the reference's parallel execution layer
(xrt/multipro.py worker farm + xrt/runner.py:252-307 and the multi-GPU
ray-dimension splitting in myopencl.py:455-590): instead of processes and
queues, every device traces an independent batch of rays with its own PRNG
key under ``shard_map``; the fixed-size per-plot histograms are reduced with
``psum`` over the ICI mesh — the exact analog of the reference master
summing per-worker histograms, but without leaving the device fabric.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)


def make_mesh(devices=None, axis_name='rays') -> Mesh:
    """A 1D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_step(run_process, beamLine, plots, mesh: Mesh, key,
                 axis_name=None):
    """One traced pass with rays data-parallel over *mesh*; returns the
    per-plot histogram dicts summed over devices.

    Each device runs the full ``run_process`` on its own key (so the total
    ray count per pass is nrays * n_devices, mirroring the reference's
    per-worker nrays semantics, runner.py:252-307)."""
    from ..runner import histogram_plot

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    keys = jax.random.split(key, ndev)

    def step(keys):
        beams = run_process(beamLine, keys[0])
        hists = [histogram_plot(plot, beams) for plot in plots]

        def reduce_leaf(x):
            x = jnp.asarray(x)
            return jax.lax.psum(x, axis_name)
        return jax.tree_util.tree_map(reduce_leaf, hists)

    fn = shard_map(step, mesh, in_specs=P(axis_name), out_specs=P())
    return jax.jit(fn)(keys)


def sharded_trace(run_process, beamLine, mesh: Mesh, key, reduce_fn,
                  axis_name=None):
    """General sharded trace: every device traces with its own key, then
    *reduce_fn(beams, axis_name)* turns the shard-local beams dict into
    reduced outputs (use jax.lax.psum/pmean inside)."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    keys = jax.random.split(key, ndev)

    def step(keys):
        beams = run_process(beamLine, keys[0])
        return reduce_fn(beams, axis_name)

    fn = shard_map(step, mesh, in_specs=P(axis_name), out_specs=P())
    return jax.jit(fn)(keys)
