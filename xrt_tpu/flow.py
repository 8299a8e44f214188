"""Automatic flow capture and restart-from-element replay.

The reference records every ``shine``/``reflect``/``propagate``/``expose``
call transparently through a decorator installed on the propagation
methods (xrt/backends/raycing/_flow_utils.py:157-211,
``append_to_flow_decorator``) and re-runs the flow from a modified element
on in a message-driven process (xrt/backends/raycing/_flow.py:13,
``propagationProcess``).

The TPU-native equivalent is simpler and stronger because every element is
an immutable pytree and every propagation method is pure: a recorded step
``(element, method, args, kwargs) -> outputs`` can be replayed with any
element swapped and all *upstream* beams taken from the recording cache —
bitwise identical to a full re-trace (the random keys travel inside the
recorded args) at a fraction of the work.

Usage::

    with record_flow(bl) as flow:      # bl optional, provides names
        run_process(bl)                # ANY user code calling the methods

    flow.steps                         # what was captured
    out = flow.replay()                                  # full re-run
    out = flow.replay(replace={'m1': new_mirror})        # from m1 onward

Recording happens at the Python level, so capture with concrete (eager)
inputs; ``replay`` itself is pure in the replaced elements and can be
jitted (cached upstream beams become constants).
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax

#: (module path, class name, method names) — every defining class gets its
#: own wrap so subclass overrides are captured too
_REGISTRY = [
    ('xrt_tpu.sources.geometric', 'GeometricSource', ('shine',)),
    ('xrt_tpu.sources.gaussian', 'GaussianBeam', ('shine',)),
    ('xrt_tpu.sources.gaussian', 'MeshSource', ('shine',)),
    ('xrt_tpu.sources.gaussian', 'CollimatedMeshSource', ('shine',)),
    ('xrt_tpu.sources.synchrotron', '_SynchrotronBase',
     ('shine', 'shine_wave')),
    ('xrt_tpu.sources.undulator', 'Undulator', ('shine', 'shine_wave')),
    ('xrt_tpu.oes.base', '_OEMethods', ('reflect', 'multiple_reflect',
                                        'propagate_wave')),
    ('xrt_tpu.oes.dcm', 'DCM', ('double_reflect',)),
    ('xrt_tpu.oes.refractive', 'Plate', ('double_refract',)),
    ('xrt_tpu.apertures', '_ApertureBase', ('propagate',)),
    ('xrt_tpu.screens', 'Screen', ('expose', 'expose_global')),
]

#: module-level helper functions that derive beams from beams — these must
#: be tracked too or the dataflow chain breaks across them (e.g.
#: propagate_flow converts an aperture-local beam back to global through
#: _local_to_global_aperture between propagate() and expose())
_FUNC_REGISTRY = [
    ('xrt_tpu.beamline', '_local_to_global_aperture'),
    ('xrt_tpu.waves', 'wave_to_global'),
]

_STACK: List['Flow'] = []
_instrumented = False


def _wrap(cls, mname):
    orig = cls.__dict__.get(mname)
    if orig is None or getattr(orig, '_flow_wrapped', False):
        return
    import functools

    @functools.wraps(orig)
    def wrapper(self, *args, **kwargs):
        out = orig(self, *args, **kwargs)
        if _STACK:
            _STACK[-1]._record(self, mname, args, kwargs, out)
        return out

    wrapper._flow_wrapped = True
    setattr(cls, mname, wrapper)


def _wrap_func(mod, fname):
    orig = getattr(mod, fname, None)
    if orig is None or getattr(orig, '_flow_wrapped', False):
        return
    import functools

    @functools.wraps(orig)
    def wrapper(*args, **kwargs):
        out = orig(*args, **kwargs)
        if _STACK:
            _STACK[-1]._record_func(orig, args, kwargs, out)
        return out

    wrapper._flow_wrapped = True
    setattr(mod, fname, wrapper)


def instrument():
    """Install the capture wrappers (idempotent, done lazily on the first
    :func:`record_flow`)."""
    global _instrumented
    if _instrumented:
        return
    import importlib
    for modpath, clsname, methods in _REGISTRY:
        mod = importlib.import_module(modpath)
        cls = getattr(mod, clsname, None)
        if cls is None:
            continue
        for m in methods:
            _wrap(cls, m)
    for modpath, fname in _FUNC_REGISTRY:
        mod = importlib.import_module(modpath)
        _wrap_func(mod, fname)
    _instrumented = True


@dataclass
class FlowStep:
    name: str
    element: Any
    method: str
    args: tuple
    kwargs: dict
    out: Any

    def __repr__(self):
        return f'FlowStep({self.name}.{self.method})'


class Flow:
    """A recorded propagation flow (see module doc)."""

    def __init__(self, bl=None):
        self._names = {}
        if bl is not None:
            for name, el in getattr(bl, '_elements', {}).items():
                self._names[id(el)] = name
        self.steps: List[FlowStep] = []
        self._counter = itertools.count()
        self._recording = False

    # -- recording ------------------------------------------------------
    def __enter__(self):
        instrument()
        _STACK.append(self)
        self._recording = True
        return self

    def __exit__(self, *exc):
        _STACK.remove(self)
        self._recording = False
        return False

    def _name_of(self, element):
        nm = self._names.get(id(element))
        if nm is None:
            nm = f'{type(element).__name__}_{next(self._counter)}'
            self._names[id(element)] = nm
        return nm

    def _record(self, element, method, args, kwargs, out):
        self.steps.append(FlowStep(self._name_of(element), element,
                                   method, args, kwargs, out))

    def _record_func(self, fn, args, kwargs, out):
        # a derived-beam helper: replayed by calling the function itself;
        # method=None marks it (names are '~'-prefixed, never replaceable)
        self.steps.append(FlowStep(f'~{fn.__name__}', fn, None, args,
                                   kwargs, out))

    # -- introspection ---------------------------------------------------
    @property
    def beams(self) -> Dict[str, Any]:
        """Recorded outputs keyed ``name.method`` (last call wins)."""
        return {(s.name if s.method is None else f'{s.name}.{s.method}'):
                s.out for s in self.steps}

    def index_of(self, name) -> int:
        for i, s in enumerate(self.steps):
            if s.name == name:
                return i
        raise KeyError(f'no recorded step for element {name!r}')

    # -- replay -----------------------------------------------------------
    def replay(self, replace: Optional[Dict[str, Any]] = None,
               startFrom='auto') -> Dict[str, Any]:
        """Re-run the flow and return ``{name.method: outputs}``.

        *replace* maps element names to modified elements; *startFrom* is
        an element name, a step index, or 'auto' (= the earliest replaced
        element).  Steps before the start return their cached outputs;
        steps after run live, with any beam argument that was produced by
        an earlier step substituted by that step's replayed value —
        bitwise-identical to a full re-trace when the recorded random keys
        are reused (they travel inside the recorded args/kwargs).
        """
        replace = replace or {}
        unknown = set(replace) - {s.name for s in self.steps}
        if unknown:
            raise KeyError(f'replace names not in flow: {sorted(unknown)}')
        if startFrom == 'auto':
            # nothing forced: dataflow dirtiness decides — only the steps
            # reachable from a replaced element re-run (with no replace
            # this replays everything from the cache)
            start = len(self.steps) if replace else 0
        elif isinstance(startFrom, str):
            start = self.index_of(startFrom)
        else:
            start = int(startFrom)

        # map object ids of recorded outputs -> (step index, position)
        produced: Dict[int, Tuple[int, Optional[int]]] = {}
        for i, s in enumerate(self.steps):
            if isinstance(s.out, tuple):
                for j, o in enumerate(s.out):
                    produced[id(o)] = (i, j)
            else:
                produced[id(s.out)] = (i, None)
        # replaced element objects, for element args inside derived helpers
        el_map: Dict[int, Any] = {}
        for s in self.steps:
            if s.name in replace:
                el_map[id(s.element)] = replace[s.name]

        new_out: List[Any] = []
        results: Dict[str, Any] = {}

        def resolve(v):
            hit = produced.get(id(v))
            if hit is not None:
                i, j = hit
                o = new_out[i]
                return o if j is None else o[j]
            return el_map.get(id(v), v)

        def inputs_dirty(s):
            """True when any beam/element argument of *s* resolves to a
            value different from the recorded one."""
            for a in list(s.args) + list(s.kwargs.values()):
                if resolve(a) is not a:
                    return True
            return False

        for i, s in enumerate(self.steps):
            rerun = i >= start or s.name in replace or inputs_dirty(s)
            if not rerun:
                new_out.append(s.out)
            else:
                args = tuple(resolve(a) for a in s.args)
                kwargs = {k: resolve(v) for k, v in s.kwargs.items()}
                if s.method is None:      # derived-beam helper function
                    new_out.append(s.element(*args, **kwargs))
                else:
                    el = replace.get(s.name, s.element)
                    new_out.append(getattr(el, s.method)(*args, **kwargs))
            key = s.name if s.method is None else f'{s.name}.{s.method}'
            results[key] = new_out[-1]
        return results


def record_flow(bl=None) -> Flow:
    """Context manager capturing every propagation-method call into a
    :class:`Flow` (cf. reference append_to_flow_decorator,
    _flow_utils.py:185)."""
    return Flow(bl)
