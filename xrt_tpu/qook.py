"""Import reference-xrt Qook project files.

xrtQook (the reference's GUI beamline builder) saves projects as XML
with four sections — Materials, the beamline element tree (each element
carrying its constructor properties and its propagation method with
beam wiring), plots, and the run_ray_tracing card
(reference gui/xrtQook/widgets/qookbase.py, e.g.
examples/withRaycing/_QookBeamlines/*.xml).  This module loads such a
file directly into xrt_tpu objects:

    from xrt_tpu.qook import load_qook_project
    prj = load_qook_project('1crystal.xml')
    beams = prj.beamline.propagate_flow(jax.random.PRNGKey(0))
    run_ray_tracing(prj.plots, beamLine=prj.beamline, **prj.run_kwargs,
                    run_process=lambda bl, key: bl.propagate_flow(key))

Class names map one-to-one (same physics classes exist here); parameters
the TPU build does not take (targetOpenCL, shouldCheckCenter, ...) are
collected in ``prj.skipped`` instead of raising.  'auto' placement
(centers with "auto" components, pitch='auto' from a crystal) resolves
through :meth:`xrt_tpu.beamline.BeamLine.place`'s axis bookkeeping, like
Qook's own auto-alignment.
"""
from __future__ import annotations

import ast
import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .beamline import BeamLine, _create_signature_names


@dataclass
class QookProject:
    beamline: BeamLine
    plots: List[Any]
    run_kwargs: Dict[str, Any]
    materials: Dict[str, Any]
    beam_sources: Dict[str, str]         # beam name -> element name
    skipped: Dict[str, Dict[str, Any]] = field(default_factory=dict)
    description: str = ''


_EVAL_NS = {'auto': 'auto', 'None': None, 'True': True, 'False': False,
            'np': np, 'numpy': np, 'pi': math.pi, 'inf': math.inf}


def _parse_value(text):
    """Qook stores values as python expressions ('10000-10', '(0, 0, 0)',
    '[0, 21000, "auto"]', 'auto', 'None', 'Si')."""
    if text is None:
        return None
    t = text.strip()
    if t == '':
        return None
    try:
        return ast.literal_eval(t)
    except (ValueError, SyntaxError):
        pass
    try:
        return eval(t, {'__builtins__': {}}, _EVAL_NS)
    except Exception:
        return t          # a bareword: element/material/beam name, 'Si'...


def _props(node):
    out = {}
    p = node.find('properties')
    if p is None:
        return out
    for ch in p:
        out[ch.tag] = _parse_value(ch.text)
    return out


def _obj_path(node):
    o = node.find('_object')
    return (o.text or '').strip() if o is not None else ''


_DROP_PARAMS = {'bl', 'targetOpenCL', 'precisionOpenCL',
                'shouldCheckCenter', 'uuid', 'surface'}


def _resolve_class(obj_path):
    """'xrt.backends.raycing.oes.OE' -> the same-named xrt_tpu class."""
    from . import apertures, screens
    from . import materials as xm
    from . import oes, sources
    cls_name = obj_path.rsplit('.', 1)[-1]
    for ns in (sources, oes, apertures, screens, xm):
        cls = getattr(ns, cls_name, None)
        if cls is not None:
            return cls
    raise ValueError(f'no xrt_tpu equivalent for {obj_path!r}')


def _filtered_create_kwargs(cls, params, skipped, tag):
    accepted = _create_signature_names(cls)
    kwargs, skip = {}, {}
    for k, v in params.items():
        if v is None or k in _DROP_PARAMS:
            continue
        if isinstance(v, str) and v == 'auto' and \
                k not in ('pitch', 'bragg'):
            # 'auto' values other than placement pitch are defaults here
            # (x/z screen orientation resolves from the axis below)
            if k not in ('x', 'z'):
                skip[k] = v
            continue
        if k in accepted:
            kwargs[k] = v
        else:
            skip[k] = v
    if skip:
        skipped[tag] = skip
    return kwargs


def load_qook_project(fileName_or_text, nrays=None) -> QookProject:
    """Load a Qook project XML into (BeamLine, plots, run kwargs).

    *nrays*: override every source's ray count (quick looks / tests)."""
    text = fileName_or_text
    if not text.lstrip().startswith('<'):
        with open(fileName_or_text) as f:
            text = f.read()
    root = ET.fromstring(text)
    skipped: Dict[str, Dict[str, Any]] = {}

    # --- materials
    materials: Dict[str, Any] = {}
    mats_node = root.find('Materials')
    if mats_node is not None:
        for m in mats_node:
            cls = _resolve_class(_obj_path(m))
            params = _props(m)
            # nested material references (e.g. multilayer layers)
            for k, v in list(params.items()):
                if isinstance(v, str) and v in materials:
                    params[k] = materials[v]
            kwargs = _filtered_create_kwargs(cls, params, skipped, m.tag)
            materials[m.tag] = cls.create(**kwargs) \
                if hasattr(cls, 'create') else cls(**kwargs)

    # --- the beamline node: any direct child whose _object is a BeamLine
    bl_node = None
    for ch in root:
        if _obj_path(ch).endswith('BeamLine'):
            bl_node = ch
            break
    if bl_node is None:
        raise ValueError('no BeamLine section in the Qook project')
    blp = _props(bl_node)
    alignE = blp.get('alignE', 9000.0)
    bl = BeamLine(azimuth=float(blp.get('azimuth', 0.0) or 0.0),
                  height=float(blp.get('height', 0.0) or 0.0),
                  alignE=9000.0 if alignE in (None, 'auto')
                  else float(alignE),
                  name=bl_node.tag)

    # collect elements: child nodes with an _object class + a method node
    elements = []
    for el in bl_node:
        if el.tag in ('properties', '_object'):
            continue
        obj = _obj_path(el)
        if not obj:
            continue
        method_node = None
        for mn in el:
            if mn.tag in ('properties', '_object'):
                continue
            if mn.find('_object') is not None:
                method_node = mn
                break
        elements.append((el, obj, method_node))

    # 'auto' alignE: middle of the first source's energy window
    if alignE in (None, 'auto') and elements:
        p0 = _props(elements[0][0])
        if p0.get('eMin') is not None and p0.get('eMax') is not None:
            bl.alignE = 0.5 * (float(p0['eMin']) + float(p0['eMax']))

    beam_sources: Dict[str, str] = {}
    axes: Dict[str, Any] = {}
    for el, obj, method_node in elements:
        # the input beam of this step (Qook flows are DAGs: several
        # branches can start from one source); restore that branch's
        # optical axis for 'auto' placement
        src_el = None
        if method_node is not None:
            pnode = method_node.find('parameters')
            if pnode is not None:
                in_beam = (pnode.findtext('beam') or '').strip()
                src_el = beam_sources.get(in_beam)
        if src_el is not None and src_el in axes:
            bl._axis_point, bl._axis_dir = (axes[src_el][0].copy(),
                                            axes[src_el][1].copy())
        cls = _resolve_class(obj)
        params = _props(el)
        for k, v in list(params.items()):
            if isinstance(v, str) and v in materials:
                params[k] = materials[v]
        center = params.pop('center', (0.0, 0.0, 0.0))
        if nrays is not None and 'nrays' in params:
            params['nrays'] = int(nrays)
        pitch = params.get('pitch')
        kwargs = _filtered_create_kwargs(cls, params, skipped, el.tag)
        kwargs.pop('center', None)
        kwargs.pop('name', None)    # registered under the node tag

        # screen 'auto' orientation: perpendicular to the current axis
        if hasattr(cls, 'expose') and \
                (params.get('x') == 'auto' or params.get('z') == 'auto'):
            d = bl.axis_dir
            if not np.allclose(d, [0.0, 1.0, 0.0], atol=1e-12):
                x_b = np.cross(d, [0.0, 0.0, 1.0])
                nx = np.linalg.norm(x_b)
                x_b = np.array([1.0, 0.0, 0.0]) if nx < 1e-12 else x_b / nx
                z_b = np.cross(x_b, d)
                if params.get('x') == 'auto':
                    kwargs['x'] = tuple(x_b)
                if params.get('z') == 'auto':
                    kwargs['z'] = tuple(z_b)

        hasAuto = (isinstance(center, (list, tuple)) and
                   any(c == 'auto' for c in center)) or pitch == 'auto'
        if hasAuto:
            # resolve 'auto' center components on the current optical
            # axis, parameterized by the known y component
            c = list(center)
            ap, ad = bl.axis_point, bl.axis_dir
            t = None
            for i in (1, 0, 2):
                if c[i] != 'auto' and abs(ad[i]) > 1e-12:
                    t = (float(c[i]) - ap[i]) / ad[i]
                    break
            if t is None:
                t = 0.0
            for i in range(3):
                if c[i] == 'auto':
                    c[i] = float(ap[i] + t * ad[i])
            if pitch == 'auto':
                kwargs.pop('pitch', None)
                bl.place(el.tag, cls, center=tuple(float(x) for x in c),
                         pitch='auto',
                         bragg_material=kwargs.get('material'), **kwargs)
            else:
                bl.place(el.tag, cls,
                         center=tuple(float(x) for x in c), **kwargs)
        else:
            el_obj = cls.create(center=tuple(center), **kwargs) \
                if 'center' in _create_signature_names(cls) \
                else cls.create(**kwargs)
            bl.add(el.tag, el_obj)
            bl._axis_point = np.asarray(center, float)

        # '_input' names the upstream element for propagate_flow
        if src_el is not None:
            n_, k_, m_, kw_ = bl.flow[-1]
            kw_ = dict(kw_)
            kw_['_input'] = src_el
            bl.flow[-1] = (n_, k_, m_, kw_)
        axes[el.tag] = (bl.axis_point, bl.axis_dir)

        # record which beam names this element's method produces
        if method_node is not None:
            out = method_node.find('output')
            if out is not None:
                for b in out:
                    beam_sources[(b.text or '').strip()] = el.tag

    # --- plots
    plots = []
    plots_node = root.find('plots')
    if plots_node is not None:
        from .plotspec import XYCAxis, XYCPlot
        ax_names = _create_signature_names(XYCAxis) | \
            set(XYCAxis.__dataclass_fields__)
        pl_names = set(XYCPlot.__dataclass_fields__)
        for pn in plots_node:
            kw: Dict[str, Any] = {}
            for ch in pn:
                if ch.tag == '_object':
                    continue
                if ch.find('_object') is not None:     # an axis
                    axkw = {c.tag: _parse_value(c.text) for c in ch
                            if c.tag != '_object'}
                    axkw = {k: v for k, v in axkw.items()
                            if k in ax_names and v is not None}
                    kw[ch.tag] = XYCAxis(**axkw)
                else:
                    v = _parse_value(ch.text)
                    if ch.tag in pl_names and v is not None:
                        kw[ch.tag] = v
            beam = kw.get('beam', '')
            if beam in beam_sources:
                kw['beam'] = beam_sources[beam]
            if isinstance(kw.get('rayFlag'), (list, tuple)):
                kw['rayFlag'] = tuple(kw['rayFlag'])
            elif isinstance(kw.get('rayFlag'), int):
                kw['rayFlag'] = (kw['rayFlag'],)
            plots.append(XYCPlot(**kw))

    # --- run card
    run_kwargs: Dict[str, Any] = {}
    rn = root.find('run_ray_tracing')
    if rn is not None:
        for ch in rn:
            if ch.tag in ('repeats', 'updateEvery', 'pickleEvery'):
                v = _parse_value(ch.text)
                if isinstance(v, (int, float)):
                    run_kwargs[ch.tag] = int(v)

    desc = root.findtext('description') or ''
    return QookProject(beamline=bl, plots=plots, run_kwargs=run_kwargs,
                       materials=materials, beam_sources=beam_sources,
                       skipped=skipped, description=desc.strip())
