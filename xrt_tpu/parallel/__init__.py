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


def kirchhoff_sharded(mesh: Mesh, xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                      weights, axis_name=None):
    """Kirchhoff integral with the destination points sharded over the
    mesh and the source cloud replicated.

    Each device integrates its own destination tile against the full
    source — zero collectives, embarrassingly parallel over ICI, the
    multi-chip analog of the reference's per-GPU ray splitting
    (myopencl.py:455-590).  Destination arrays are padded to a multiple of
    the device count; returns full-length accumulators."""
    from ..waves import kirchhoff_integral_xla

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    Nd = xd.shape[0]
    npad = (-Nd) % ndev

    def padd(v):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v
    xdp, ydp, zdp = padd(xd), padd(yd), padd(zd)
    n = [jnp.broadcast_to(jnp.asarray(ni), xs.shape) for ni in n]

    def local(xdl, ydl, zdl):
        return kirchhoff_integral_xla(xdl, ydl, zdl, xs, ys, zs, Es, Ep,
                                      k, n, nl, weights)

    fn = shard_map(local, mesh,
                   in_specs=(P(axis_name), P(axis_name), P(axis_name)),
                   out_specs=P(axis_name))
    out = jax.jit(fn)(xdp, ydp, zdp)
    return tuple(o[:Nd] for o in out)


def kirchhoff_ring(mesh: Mesh, xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl,
                   weights, axis_name=None):
    """Kirchhoff integral with BOTH ends sharded: destinations stay pinned
    per device while the source shards rotate around the ICI ring with
    ``lax.ppermute``, each device accumulating its tile against every
    source shard in turn.

    Use when the source cloud is too large to replicate (e.g. 1e7+ wave
    samples): per-device memory is O((Nd + Ns)/ndev) and the permute
    overlaps with compute on TPU.  Scaling-book 'all-gather as a ring'
    pattern applied to a physics kernel."""
    from ..waves import kirchhoff_integral_xla

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    Nd, Ns = xd.shape[0], xs.shape[0]
    npad_d = (-Nd) % ndev
    npad_s = (-Ns) % ndev

    def padto(v, npad):
        return jnp.concatenate([v, jnp.zeros((npad,), v.dtype)]) if npad \
            else v
    xdp, ydp, zdp = (padto(v, npad_d) for v in (xd, yd, zd))
    n = [jnp.broadcast_to(jnp.asarray(ni), xs.shape) for ni in n]
    # weights mask the source padding
    srcs = [padto(v, npad_s) for v in
            (xs, ys, zs, k, nl, weights, n[0], n[1], n[2])]
    srcs += [padto(Es, npad_s), padto(Ep, npad_s)]

    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def local(xdl, ydl, zdl, *src_shards):
        def body(carry, _):
            accs, shards = carry
            (xsl, ysl, zsl, kl, nll, wl, n0, n1, n2, Esl, Epl) = shards
            out = kirchhoff_integral_xla(xdl, ydl, zdl, xsl, ysl, zsl,
                                         Esl, Epl, kl, [n0, n1, n2], nll,
                                         wl)
            accs = tuple(a + o for a, o in zip(accs, out))
            shards = tuple(jax.lax.ppermute(s, axis_name, perm)
                           for s in shards)
            return (accs, shards), None

        cdt = jnp.result_type(Es)
        pvary = getattr(jax.lax, 'pvary', lambda x, names: x)
        init_accs = tuple(pvary(jnp.zeros(xdl.shape, cdt), (axis_name,))
                          for _ in range(5))
        (accs, _), _ = jax.lax.scan(body, (init_accs, src_shards),
                                    None, length=ndev)
        return accs

    in_specs = (P(axis_name),) * 3 + (P(axis_name),) * len(srcs)
    fn = shard_map(local, mesh, in_specs=in_specs, out_specs=P(axis_name))
    out = jax.jit(fn)(xdp, ydp, zdp, *srcs)
    return tuple(o[:Nd] for o in out)


def dst_sharded_call(mesh: Mesh, fn, dst_args, src_args, ring=False,
                     src_pad=None, axis_name=None, acc_dtype=None,
                     n_out=5):
    """Run ``fn(*dst_args, *src_args) -> tuple of per-dst accumulators``
    with the destination arrays sharded over *mesh*.

    The generic multi-device form of the Kirchhoff splitting (reference
    myopencl.py:455-542 splits the dst dimension across GPUs): *fn* is any
    integral kernel linear in its source samples whose outputs are 1D over
    the dst axis (e.g. a partial application of the f32 double-float /
    recentred Pallas kernels, or the f64 XLA path).

    - ``ring=False`` (default): src args replicated on every device —
      ZERO collectives; each device integrates its own dst tile.
    - ``ring=True``: src args sharded too; the src shards rotate around
      the mesh with ``lax.ppermute`` while each device accumulates its
      dst tile against every shard in turn — per-device memory
      O((Nd+Ns)/ndev).  *src_pad* gives the pad rule per src arg
      ('edge' for positions/k/normals, 'zero' for fields/weights so the
      padding contributes nothing); default 'zero'.

    dst args are edge-padded to a multiple of the device count (zero
    padding would pollute per-shard recentring reference points);
    outputs are clipped back to the true length.  *n_out* is the number
    of accumulators *fn* returns (ring mode needs it up front for the
    scan carry; a mismatch raises at trace time)."""
    from ..waves import pad1d_edge as pad_edge, pad1d_zero as pad_zero
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    dst_args = [jnp.asarray(v) for v in dst_args]
    src_args = [jnp.asarray(v) for v in src_args]
    Nd = dst_args[0].shape[0]
    npad_d = (-Nd) % ndev
    dsts = [pad_edge(v, npad_d) for v in dst_args]
    nd_args = len(dsts)

    if not ring:
        def local(*args):
            return fn(*args)
        specs = (P(axis_name),) * nd_args + (P(),) * len(src_args)
        wrapped = shard_map(local, mesh, in_specs=specs,
                            out_specs=P(axis_name))
        out = wrapped(*dsts, *src_args)
        return tuple(o[:Nd] for o in out)

    Ns = src_args[0].shape[0]
    npad_s = (-Ns) % ndev
    if src_pad is None:
        src_pad = ['zero'] * len(src_args)
    srcs = [pad_edge(v, npad_s) if rule == 'edge' else pad_zero(v, npad_s)
            for v, rule in zip(src_args, src_pad)]
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    if acc_dtype is None:
        acc_dtype = jnp.complex64 \
            if dst_args[0].dtype == jnp.float32 else jnp.complex128
    pvary = getattr(jax.lax, 'pvary', lambda x, names: x)

    def local(*args):
        dst_l = args[:nd_args]
        src_l = args[nd_args:]

        def body(carry, _):
            accs, shards = carry
            out = fn(*dst_l, *shards)
            if len(out) != n_out:
                raise ValueError(
                    f'ring fn returned {len(out)} accumulators, '
                    f'expected n_out={n_out}')
            accs = tuple(a + o for a, o in zip(accs, out))
            shards = tuple(jax.lax.ppermute(s, axis_name, perm)
                           for s in shards)
            return (accs, shards), None

        init = tuple(pvary(jnp.zeros(dst_l[0].shape, acc_dtype),
                           (axis_name,)) for _ in range(n_out))
        (accs, _), _ = jax.lax.scan(body, (init, tuple(src_l)), None,
                                    length=ndev)
        return accs

    specs = (P(axis_name),) * nd_args + (P(axis_name),) * len(srcs)
    wrapped = shard_map(local, mesh, in_specs=specs,
                        out_specs=P(axis_name))
    out = wrapped(*dsts, *srcs)
    return tuple(o[:Nd] for o in out)


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
