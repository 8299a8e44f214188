"""Structured per-stage tracing/profiling.

The reference has only ad-hoc wall-clock prints (runner.py:214-218,
waves.py:826-828, myopencl status prints) and commented-out @profile
decorators; this module provides the structured equivalent: named stages
accumulate wall time and call counts into a global (or local) registry,
with nesting, a one-line report, and a context/decorator API.

Device-honest timing: jax dispatch is asynchronous, so a stage that ends
without materializing its result measures dispatch only.  Pass
``block=...`` (any pytree of device arrays) when exiting a stage — or use
``stage(..., block_on_exit=True)`` with the stage's return value — to
insert a ``jax.block_until_ready`` before the clock stops.

Usage::

    from xrt_tpu.profiler import stage, report, reset

    with stage('shine'):
        beam = src.shine(key)
    with stage('reflect', block=beam):   # block pending work first
        glo, loc = mirror.reflect(beam)
    print(report())

    @stage('kirchhoff')
    def hop(src, wave):
        return diffract(src, wave)
"""
from __future__ import annotations

import functools
import time
from contextlib import ContextDecorator
from typing import Dict, Optional


class StageStats:
    __slots__ = ('calls', 'total', 'best', 'worst')

    def __init__(self):
        self.calls = 0
        self.total = 0.0
        self.best = float('inf')
        self.worst = 0.0

    def add(self, dt):
        self.calls += 1
        self.total += dt
        self.best = min(self.best, dt)
        self.worst = max(self.worst, dt)


class Profiler:
    """A registry of named stage timings."""

    def __init__(self):
        self.stats: Dict[str, StageStats] = {}
        self._stack = []

    def reset(self):
        self.stats.clear()
        self._stack.clear()

    def add(self, name, dt):
        self.stats.setdefault(name, StageStats()).add(dt)

    def stage(self, name, block=None):
        return _Stage(self, name, block)

    def report(self, sort='total'):
        """Formatted table of all stages (sorted by total time)."""
        if not self.stats:
            return '(no stages recorded)'
        rows = sorted(self.stats.items(),
                      key=lambda kv: -getattr(kv[1], sort, kv[1].total))
        w = max(len(k) for k, _ in rows)
        lines = [f'{"stage":<{w}}  {"calls":>6} {"total":>9} {"mean":>9} '
                 f'{"best":>9} {"worst":>9}']
        for name, s in rows:
            lines.append(
                f'{name:<{w}}  {s.calls:>6} {s.total:>8.3f}s '
                f'{s.total / s.calls:>8.4f}s {s.best:>8.4f}s '
                f'{s.worst:>8.4f}s')
        return '\n'.join(lines)

    def as_dict(self):
        return {k: {'calls': s.calls, 'total': s.total, 'best': s.best,
                    'worst': s.worst} for k, s in self.stats.items()}


class _Stage(ContextDecorator):
    def __init__(self, profiler, name, block=None):
        self.profiler = profiler
        self.name = name
        self.block = block

    def __enter__(self):
        # nested stages get dotted names: 'trace.reflect'
        parent = self.profiler._stack[-1] if self.profiler._stack else None
        self.full = f'{parent}.{self.name}' if parent else self.name
        self.profiler._stack.append(self.full)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block is not None:
            import jax
            jax.block_until_ready(self.block)
        self.profiler.add(self.full, time.perf_counter() - self.t0)
        self.profiler._stack.pop()
        return False

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with _Stage(self.profiler, self.name):
                out = fn(*args, **kwargs)
                import jax
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
                return out
        return wrapper


#: the default global profiler
GLOBAL = Profiler()


def stage(name, block=None):
    """Context manager / decorator recording into the global profiler."""
    return GLOBAL.stage(name, block)


def report(sort='total'):
    return GLOBAL.report(sort)


def reset():
    GLOBAL.reset()


def as_dict():
    return GLOBAL.as_dict()
