"""BeamLine: a host-side container and orchestrator of beamline elements.

Equivalent in capability to the reference xrt BeamLine
(xrt/backends/raycing/beamline.py:229): element registry, azimuth frame,
auto-alignment of centers along the nominal optical axis and of crystal
pitches at the alignment energy (beamline.py:368-508), an ordered default
flow with recording/replay (propagate_flow:510, sort_flow:559), and
JSON (de)serialization (load_from_json:1570, export_to_json:1602).

The elements themselves are jax pytrees (functional, frozen); BeamLine is a
mutable host object that *builds* them, so all auto-alignment happens at
build time in float64 numpy, outside jit — the traced compute stays pure.
"""
from __future__ import annotations

import json
import math
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax


def _rot_matrix(seq, pitch, roll, yaw):
    """3x3 matrix of transforms.rotate_xyz with the given angles (acting on
    column vectors), built by applying it to the basis."""
    from .transforms import rotate_xyz
    import numpy as _np
    cols = []
    for v in _np.eye(3):
        x, y, z = rotate_xyz(float(v[0]), float(v[1]), float(v[2]), seq,
                             pitch, roll, yaw, skip_zero=False)
        cols.append([float(x), float(y), float(z)])
    return _np.array(cols).T


def _rodrigues(v, axis, ang):
    import numpy as _np
    axis = _np.asarray(axis, float)
    axis = axis / _np.linalg.norm(axis)
    c, s = math.cos(ang), math.sin(ang)
    return (v * c + _np.cross(axis, v) * s +
            axis * _np.dot(axis, v) * (1 - c))


def _axis_extra_angles(d, pitch, roll, yaw, seq='RzRyRx'):
    """Extra (pitch, roll, yaw) that rotate an element's frame into the
    beam frame when the optical axis *d* is not +y.

    The element's global->local transform is
    ``Rext(-e) @ Rmain(-m)`` (oes/base.py:503-510); an element aligned to
    the tilted axis needs ``Rmain(-m) @ T^{-1}`` where T maps y-hat onto
    *d*.  Hence ``Rext(-e) = Rmain(-m) @ T^{-1} @ Rmain(-m)^{-1}`` and the
    angles follow from the Euler extraction for the Rx@Ry@Rz composition
    used by 'RzRyRx'."""
    import numpy as _np
    d = _np.asarray(d, float)
    d = d / _np.linalg.norm(d)
    yhat = _np.array([0.0, 1.0, 0.0])
    axis = _np.cross(yhat, d)
    na = _np.linalg.norm(axis)
    if na < 1e-15:
        return 0.0, 0.0, 0.0
    ang = math.atan2(na, float(_np.dot(yhat, d)))
    # T maps yhat -> d; build via Rodrigues columns
    T = _np.stack([_rodrigues(v, axis, ang) for v in _np.eye(3)]).T
    Mi = _rot_matrix(seq, -pitch, -roll, -yaw)
    G = Mi @ T.T @ _np.linalg.inv(Mi)
    # G must equal Rot(seq=RzRyRx applied z,y,x) with angles
    # (-ep, -er, -ey): G = Rx(a) @ Ry(b) @ Rz(c)
    b = math.asin(max(-1.0, min(1.0, G[0, 2])))
    c = math.atan2(-G[0, 1], G[0, 0])
    a = math.atan2(-G[1, 2], G[2, 2])
    return -a, -b, -c


class BeamLine:
    """Container of sources, optical elements, apertures and screens.

    *azimuth* rotates the beamline's horizontal axis; *alignE* is the energy
    used for 'auto' Bragg angles."""

    def __init__(self, azimuth=0.0, height=0.0, alignE=9000.0, name=''):
        self.name = name
        self.azimuth = azimuth
        self.height = height
        self.alignE = alignE
        self.sources: List[Any] = []
        self.oes: List[Any] = []
        self.slits: List[Any] = []
        self.screens: List[Any] = []
        self.flow: List[tuple] = []      # (name, element, method, kwargs)
        self.alarms: List[str] = []
        self._elements: Dict[str, Any] = {}
        # nominal optical axis state for auto-alignment
        self._axis_point = np.zeros(3)
        self._axis_dir = np.array([0.0, 1.0, 0.0])

    @property
    def sinAzimuth(self):
        return math.sin(self.azimuth)

    @property
    def cosAzimuth(self):
        return math.cos(self.azimuth)

    # ------------------------------------------------------------------
    def add(self, name: str, element: Any, kind: str = 'auto',
            method: Optional[str] = None, **methodKwargs):
        """Register *element* under *name* and append it to the default
        flow.  *kind* in {'source', 'oe', 'slit', 'screen', 'auto'}."""
        cls = type(element).__name__
        if kind == 'auto':
            if hasattr(element, 'shine'):
                kind = 'source'
            elif hasattr(element, 'propagate') and not hasattr(element,
                                                              'reflect'):
                kind = 'slit'
            elif hasattr(element, 'expose'):
                kind = 'screen'
            else:
                kind = 'oe'
        {'source': self.sources, 'oe': self.oes, 'slit': self.slits,
         'screen': self.screens}[kind].append(element)
        # snapshot the placement-axis state so remove() of the last
        # element (or an api_add rollback) can rewind it
        if not hasattr(self, '_axis_before'):
            self._axis_before = {}
        self._axis_before.setdefault(
            name, (self._axis_point.copy(), self._axis_dir.copy()))
        # advance the placement axis along the polyline of element
        # centers: after add (incl. load_from_json rebuilds) a
        # place(distance=...) measures from the LAST element along the
        # last inter-element direction — without this, loading a layout
        # left the cursor at the origin and distance placement broke
        c = getattr(element, 'center', None)
        if c is not None:
            c = np.asarray(c, float)
            if c.shape == (3,) and np.all(np.isfinite(c)):
                d = c - self._axis_point
                nrm = float(np.linalg.norm(d))
                if nrm > 1e-9:
                    self._axis_dir = d / nrm
                self._axis_point = c
        # post-placement axis state per element: branch placement
        # (place(..., after=name)) resumes the axis from here
        if not hasattr(self, '_axis_after'):
            self._axis_after = {}
        self._axis_after[name] = (self._axis_point.copy(),
                                  self._axis_dir.copy())
        self._elements[name] = element
        if method is None:
            method = {'source': 'shine', 'oe': 'reflect',
                      'slit': 'propagate', 'screen': 'expose'}[kind]
            if hasattr(element, 'double_refract'):
                method = 'double_refract'
            elif hasattr(element, 'double_reflect'):
                method = 'double_reflect'
        self.flow.append((name, kind, method, methodKwargs))
        return element

    def __getitem__(self, name):
        return self._elements[name]

    def remove(self, name: str):
        """Unregister *name* and drop its flow step (browser-assembly
        analog of deleting a tree node in the reference xrtQook,
        qookbase.py).

        If *name* was the most recently added element, the auto-placement
        axis cursor rewinds to its pre-placement state, so remove +
        re-add-at-distance behaves as an undo."""
        was_last = bool(self.flow) and self.flow[-1][0] == name
        el = self._elements.pop(name)
        for lst in (self.sources, self.oes, self.slits, self.screens):
            # identity match: list.__contains__ would fall through to the
            # flax-dataclass __eq__, which compares jnp array fields and
            # raises on any same-class sibling in the list
            for i, e in enumerate(lst):
                if e is el:
                    del lst[i]
                    break
        self.flow = [s for s in self.flow if s[0] != name]
        axis = getattr(self, '_axis_before', {}).pop(name, None)
        getattr(self, '_axis_after', {}).pop(name, None)
        if was_last and axis is not None:
            self._axis_point, self._axis_dir = axis
        return el

    def reorder(self, names):
        """Reorder the default flow to match *names* (every current flow
        name must appear exactly once)."""
        steps = {s[0]: s for s in self.flow}
        if sorted(names) != sorted(steps):
            raise ValueError(f'reorder needs exactly {sorted(steps)}, '
                             f'got {sorted(names)}')
        self.flow = [steps[n] for n in names]

    def update(self, name, element):
        """Replace a registered element (elements are immutable pytrees; a
        modified copy goes back through here)."""
        old = self._elements[name]
        self._elements[name] = element
        for lst in (self.sources, self.oes, self.slits, self.screens):
            for i, e in enumerate(lst):
                if e is old:
                    lst[i] = element
        self.flow = [(n, k, m, kw) if n != name else (name, k, m, kw)
                     for (n, k, m, kw) in self.flow]

    # ------------------------------------------------------------------
    # auto-alignment along the nominal axis (cf. beamline.py:368-508)
    def place(self, name, element_cls, distance=None, center=None,
              pitch=None, bragg_material=None, deflection='up',
              autoOrient=True, after=None, flowKwargs=None, **kwargs):
        """Build and register an element auto-aligned on the current
        optical axis.

        *after*: name of an already-placed element to branch from — the
        axis cursor temporarily rewinds to that element's post-placement
        state, so *distance* is measured from it along ITS outgoing
        direction, and the trunk axis is restored afterwards (DAG
        beamlines: one mirror feeding several stations, cf. the
        reference Qook's beam wiring, qookbase.py:2-31).  *flowKwargs*
        go to the recorded flow step (e.g. {'_input': 'm1'} to feed this
        step from a non-adjacent upstream beam).

        *distance*: place the center at this distance along the axis from
        the previous element (alternative to explicit *center*).
        *pitch*: number, or 'auto' with *bragg_material* — then the Bragg
        angle (with refraction correction) at ``alignE`` is used.
        *deflection*: 'up'/'down'/'left'/'right' — how a reflecting element
        bends the axis.
        *autoOrient*: when the axis is no longer +y (after deflecting
        elements), rotate the element's frame into the beam frame by
        solving the conjugated extra angles (the analog of the reference's
        orientation auto-alignment, beamline.py:368-508) — essential e.g.
        for the second mirror of a KB pair."""
        trunk_axis = None
        if after is not None:
            st = getattr(self, '_axis_after', {}).get(after)
            if st is None:
                raise KeyError(f'place(after={after!r}): no such placed '
                               f'element')
            trunk_axis = (self._axis_point.copy(), self._axis_dir.copy())
            self._axis_point, self._axis_dir = (st[0].copy(),
                                                st[1].copy())
            if flowKwargs is None:
                flowKwargs = {}
            flowKwargs.setdefault('_input', after)
        if center is None:
            center = self._axis_point + self._axis_dir * float(distance)
        center = np.asarray(center, float)
        # unit strings ('17deg', '4 mrad') are parsed by element.create,
        # but the axis bookkeeping below needs numbers now
        from . import config as _config
        for angName in ('pitch', 'roll', 'yaw', 'positionRoll'):
            if angName in kwargs:
                kwargs[angName] = _config.auto_units_angle(kwargs[angName])
        pitch = _config.auto_units_angle(pitch)
        if pitch == 'auto':
            m = bragg_material or kwargs.get('material')
            pitch = float(m.get_Bragg_angle(self.alignE) -
                          m.get_dtheta(self.alignE))
        if pitch is not None:
            kwargs['pitch'] = pitch
        d = self._axis_dir / np.linalg.norm(self._axis_dir)
        canOrient = hasattr(element_cls, 'reflect') or \
            hasattr(element_cls, 'double_reflect')
        if autoOrient and canOrient and \
                not np.allclose(d, [0.0, 1.0, 0.0], atol=1e-12):
            ep, er, ey = _axis_extra_angles(
                d,
                float(kwargs.get('pitch', 0.0) or 0.0),
                float(kwargs.get('roll', 0.0) or 0.0) +
                float(kwargs.get('positionRoll', 0.0) or 0.0),
                float(kwargs.get('yaw', 0.0) or 0.0),
                kwargs.get('rotationSequence', 'RzRyRx'))
            kwargs.setdefault('extraPitch', ep)
            kwargs.setdefault('extraRoll', er)
            kwargs.setdefault('extraYaw', ey)
        if hasattr(element_cls, 'create'):
            element = element_cls.create(center=tuple(center), **kwargs)
        else:
            # factory functions (LaguerreGaussianBeam, ...) have no
            # create() classmethod — call them directly
            element = element_cls(center=tuple(center), **kwargs)
        name_ = name
        self.add(name_, element, **(flowKwargs or {}))
        # update the axis
        self._axis_point = center
        perp = getattr(element, 'cryst2perpTransl', None)
        if perp is not None and hasattr(element, 'double_reflect') and \
                float(perp) != 0.0:
            # DCM fixed exit: the axis jumps by 2*perp*cos(bragg) = the
            # fixedOffset, along beam-z
            fx = 2.0 * float(perp) * math.cos(float(element.braggAngle))
            x_b = np.cross(d, [0.0, 0.0, 1.0])
            nx = np.linalg.norm(x_b)
            x_b = np.array([1.0, 0.0, 0.0]) if nx < 1e-12 else x_b / nx
            z_b = np.cross(x_b, d)
            self._axis_point = self._axis_point + z_b * float(fx)
        if pitch and hasattr(element, 'reflect'):
            sign = {'up': 1.0, 'down': -1.0}.get(deflection, 1.0)
            dbl = 2.0 * float(pitch) * sign
            if hasattr(element, 'double_reflect') and \
                    not hasattr(element, 't'):
                dbl = 0.0  # DCM: fixed exit, axis direction unchanged
            if dbl:
                # rotate the axis in the BEAM frame: about the beam-local
                # x for up/down, about the beam-local z for left/right
                x_b = np.cross(d, [0.0, 0.0, 1.0])
                nx = np.linalg.norm(x_b)
                x_b = np.array([1.0, 0.0, 0.0]) if nx < 1e-12 else x_b / nx
                z_b = np.cross(x_b, d)
                if deflection in ('up', 'down'):
                    axis, ang = x_b, dbl
                else:
                    sgn = 1.0 if deflection == 'left' else -1.0
                    axis, ang = z_b, dbl * sgn
                self._axis_dir = _rodrigues(d, axis, ang)
        # the definitive post-placement axis state (incl. deflection /
        # fixed-exit jumps applied above) — branch anchors resume here
        self._axis_after[name_] = (self._axis_point.copy(),
                                   self._axis_dir.copy())
        if trunk_axis is not None:
            # a branch does not advance the trunk axis
            self._axis_point, self._axis_dir = trunk_axis
        return element

    @property
    def axis_point(self):
        return self._axis_point.copy()

    @property
    def axis_dir(self):
        return self._axis_dir.copy()

    # ------------------------------------------------------------------
    def propagate_flow(self, key=None, startFrom=0):
        """Run the recorded default flow and return {beamName: Beam}
        (cf. beamline.py:510-557).  Use inside jit via
        ``run_process=lambda bl, key: bl.propagate_flow(key)``."""
        if key is None:
            key = jax.random.PRNGKey(0)
        beams = {}
        globalBeams = {}
        beam = None
        for i, (name, kind, method, kwargs) in enumerate(self.flow):
            if i < startFrom and beam is not None:
                continue
            el = self._elements[name]
            key, sub = jax.random.split(key)
            fn = getattr(el, method)
            kwargs = dict(kwargs)
            # non-linear flows (e.g. Qook projects with several branches
            # off one source): '_input' names the upstream element whose
            # GLOBAL beam feeds this step
            inputName = kwargs.pop('_input', None)
            if inputName is not None and inputName in globalBeams:
                beam = globalBeams[inputName]
            if kind == 'source':
                beam = fn(sub, **kwargs)
                beams[name] = beam
            elif method in ('double_reflect', 'double_refract'):
                beam, lo1, lo2 = fn(beam, key=sub, **kwargs)
                beams[name] = beam
                beams[name + '_local1'] = lo1
                beams[name + '_local2'] = lo2
            elif method == 'reflect':
                beam, lo = fn(beam, key=sub, **kwargs)
                beams[name] = beam
                beams[name + '_local'] = lo
            elif method == 'propagate':
                lo = fn(beam, **kwargs)
                beams[name] = lo
                beam = _local_to_global_aperture(el, lo)
            elif method == 'expose':
                beams[name] = fn(beam, **kwargs)
            else:
                beam = fn(beam, **kwargs)
                beams[name] = beam
            globalBeams[name] = beam
        return beams

    def glow(self, beams=None, save='glow.html', maxRays=200, scan=None,
             flow=None, key=None):
        """Headless 3D view of the beamline layout and traced beams — the
        capability analog of the reference's ``bl.glow()`` Qt/OpenGL viewer
        (beamline.py:888, gui/xrtGlow).  Writes a standalone interactive
        HTML file (or a PNG if *save* ends with '.png') and returns the
        file name.  *beams*: an ordered {name: Beam} of global beams, e.g.
        from :meth:`propagate_flow`.

        *scan*: ``{'element': name, 'param': field, 'values': [...]}``
        animates a parameter sweep with a play slider (the reference's
        xrtGlow scan player, gui/xrtGlow/widgets/scan.py): each frame is
        a dirty-aware flow replay at one value.  Pass a recorded *flow*
        (xrt_tpu.flow.record_flow) or one is recorded here with *key*."""
        from . import glow as _glow
        if scan is not None:
            if flow is None:
                import jax
                from .flow import record_flow
                with record_flow(self) as flow:
                    self.propagate_flow(
                        jax.random.PRNGKey(0) if key is None else key)
            frames = _glow.build_scan_frames(
                self, flow, scan['element'], scan['param'],
                scan['values'], maxRays=maxRays)
            return _glow.export_scan_html(
                frames, fileName=save,
                title=f"{self.name or 'beamline'} — scan "
                      f"{scan['element']}.{scan['param']}")
        if str(save).endswith('.png'):
            return _glow.export_png(self, beams=beams, fileName=save,
                                    maxRays=maxRays)
        return _glow.export_html(self, beams=beams, fileName=save,
                                 maxRays=maxRays)

    def check_alarms(self, beams, threshold=0.5):
        """Flag elements that absorb more than *threshold* of the incoming
        rays (cf. reference alarmLevel, raycing/__init__.py:307-328).
        Host-side: call on concrete (fetched) beams."""
        self.alarms = []
        prev_alive = None
        for name, kind, method, _ in self.flow:
            if name not in beams:
                continue
            state = np.asarray(beams[name].state)
            alive = (state > 0).sum()
            if prev_alive and alive < prev_alive * (1 - threshold):
                self.alarms.append(
                    f'{name}: absorbed '
                    f'{(prev_alive - alive) / prev_alive:.1%} of rays')
            prev_alive = alive
        return self.alarms

    # ------------------------------------------------------------------
    # serialization (cf. beamline.py:1549-1640)
    def export_to_xml(self, fileName=None):
        """XML layout, the second Qook format (reference
        beamline.py:1549-1640).  Same content as the JSON layout."""
        import xml.etree.ElementTree as ET
        from xml.dom import minidom
        root = ET.Element('beamline', name=self.name,
                          azimuth=repr(self.azimuth),
                          height=repr(self.height),
                          alignE=repr(self.alignE))
        for name, kind, method, kwargs in self.flow:
            el = self._elements[name]
            e = ET.SubElement(root, 'element', name=name, kind=kind,
                              method=method,
                              **{'class': type(el).__name__,
                                 'module': type(el).__module__})
            for k, v in _element_params(el).items():
                p = ET.SubElement(e, 'param', name=k)
                p.text = json.dumps(v)
            for fname, mdict in _element_materials(el).items():
                m = ET.SubElement(e, 'material', name=fname)
                m.text = json.dumps(mdict)
            if kwargs:
                mk = ET.SubElement(e, 'methodKwargs')
                mk.text = json.dumps({
                    k: v for k, v in kwargs.items()
                    if isinstance(v, (str, int, float, bool))})
        text = minidom.parseString(ET.tostring(root)).toprettyxml(
            indent=' ')
        if fileName:
            with open(fileName, 'w') as f:
                f.write(text)
        return text

    @classmethod
    def load_from_xml(cls, fileName_or_text, materials=None):
        """Rebuild a beamline from its XML layout (see
        :meth:`export_to_xml`)."""
        import importlib
        import xml.etree.ElementTree as ET
        if isinstance(fileName_or_text, str) and \
                fileName_or_text.lstrip().startswith('<'):
            root = ET.fromstring(fileName_or_text)
        else:
            root = ET.parse(fileName_or_text).getroot()
        bl = cls(azimuth=float(root.get('azimuth', 0.0)),
                 height=float(root.get('height', 0.0)),
                 alignE=float(root.get('alignE', 9000.0)),
                 name=root.get('name', ''))
        for e in root.findall('element'):
            mod = importlib.import_module(e.get('module'))
            ecls = getattr(mod, e.get('class'))
            params = {p.get('name'): json.loads(p.text)
                      for p in e.findall('param')}
            for m in e.findall('material'):
                from .materials.serialize import material_from_dict
                params[m.get('name')] = material_from_dict(
                    json.loads(m.text))
            name = e.get('name')
            if materials and name in materials:
                params['material'] = materials[name]
            el = ecls.create(**params) if hasattr(ecls, 'create') \
                else ecls(**params)
            mk = e.findtext('methodKwargs')
            bl.add(name, el, kind=e.get('kind'), method=e.get('method'),
                   **(json.loads(mk) if mk else {}))
        return bl

    def export_to_json(self, fileName=None):
        layout = {'name': self.name, 'azimuth': self.azimuth,
                  'height': self.height, 'alignE': self.alignE,
                  # the auto-placement axis state (deflections applied by
                  # place() are not reconstructable from centers alone);
                  # load_from_json restores it so distance-placement and
                  # remove-undo keep working on a reloaded layout
                  'axis': {
                      'point': [float(v) for v in self._axis_point],
                      'dir': [float(v) for v in self._axis_dir],
                      'before': {
                          nm: [[float(v) for v in p],
                               [float(v) for v in d]]
                          for nm, (p, d) in
                          getattr(self, '_axis_before', {}).items()},
                      'after': {
                          nm: [[float(v) for v in p],
                               [float(v) for v in d]]
                          for nm, (p, d) in
                          getattr(self, '_axis_after', {}).items()},
                  },
                  'elements': []}
        for name, kind, method, kwargs in self.flow:
            el = self._elements[name]
            entry = {'name': name, 'kind': kind, 'method': method,
                     'class': type(el).__name__,
                     'module': type(el).__module__,
                     'params': _element_params(el)}
            if kwargs:
                entry['methodKwargs'] = {
                    k: v for k, v in kwargs.items()
                    if isinstance(v, (str, int, float, bool))}
            mats = _element_materials(el)
            if mats:
                entry['materials'] = mats
            layout['elements'].append(entry)
        text = json.dumps(layout, indent=1)
        if fileName:
            with open(fileName, 'w') as f:
                f.write(text)
        return text

    @classmethod
    def load_from_json(cls, fileName_or_text, materials=None):
        """Rebuild a beamline from its JSON layout.  *materials* maps
        element names to material objects (materials are not serialized
        numerically — reference them by catalog)."""
        import importlib
        if isinstance(fileName_or_text, str) and \
                fileName_or_text.lstrip().startswith('{'):
            layout = json.loads(fileName_or_text)
        else:
            with open(fileName_or_text) as f:
                layout = json.load(f)
        bl = cls(azimuth=layout.get('azimuth', 0.0),
                 height=layout.get('height', 0.0),
                 alignE=layout.get('alignE', 9000.0),
                 name=layout.get('name', ''))
        for entry in layout['elements']:
            mod = importlib.import_module(entry['module'])
            ecls = getattr(mod, entry['class'])
            params = dict(entry['params'])
            if entry.get('materials'):
                from .materials.serialize import material_from_dict
                for fname, mdict in entry['materials'].items():
                    params[fname] = material_from_dict(mdict)
            if materials and entry['name'] in materials:
                params['material'] = materials[entry['name']]
            el = ecls.create(**params) if hasattr(ecls, 'create') \
                else ecls(**params)
            bl.add(entry['name'], el, kind=entry['kind'],
                   method=entry['method'],
                   **(entry.get('methodKwargs') or {}))
        axis = layout.get('axis')
        if axis:
            bl._axis_point = np.asarray(axis['point'], float)
            bl._axis_dir = np.asarray(axis['dir'], float)
            bl._axis_before = {
                nm: (np.asarray(p, float), np.asarray(d, float))
                for nm, (p, d) in axis.get('before', {}).items()}
            if axis.get('after'):
                bl._axis_after = {
                    nm: (np.asarray(p, float), np.asarray(d, float))
                    for nm, (p, d) in axis['after'].items()}
        return bl


def _local_to_global_aperture(aperture, lo):
    """Aperture-local beam back to global coordinates."""
    import jax.numpy as jnp
    ex, ey, ez = aperture.ex, aperture.ey, aperture.ez
    gx = aperture.center[0] + lo.x * ex[0] + lo.y * ey[0] + lo.z * ez[0]
    gy = aperture.center[1] + lo.x * ex[1] + lo.y * ey[1] + lo.z * ez[1]
    gz = aperture.center[2] + lo.x * ex[2] + lo.y * ey[2] + lo.z * ez[2]
    ga = lo.a * ex[0] + lo.b * ey[0] + lo.c * ez[0]
    gb = lo.a * ex[1] + lo.b * ey[1] + lo.c * ez[1]
    gc = lo.a * ex[2] + lo.b * ey[2] + lo.c * ez[2]
    return lo.replace(x=gx, y=gy, z=gz, a=ga, b=gb, c=gc)


def _create_signature_names(cls):
    """Union of parameter names accepted by create() across the MRO (a
    subclass create forwards **kwargs to its parents).  Factory FUNCTIONS
    (e.g. materials.Coated, aperture factories) expose their own
    signature."""
    import inspect
    names = set()
    if not hasattr(cls, '__mro__'):
        for p in inspect.signature(cls).parameters.values():
            if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY):
                names.add(p.name)
        names.discard('kwargs')
        return names
    for c in cls.__mro__:
        fn = c.__dict__.get('create')
        if fn is None:
            continue
        fn = getattr(fn, '__func__', fn)
        for p in inspect.signature(fn).parameters.values():
            if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY):
                names.add(p.name)
    names.discard('cls')
    names.discard('kwargs')
    if not names:            # no create(): the dataclass ctor is the API
        for p in inspect.signature(cls.__init__).parameters.values():
            if p.name != 'self' and p.kind in (p.POSITIONAL_OR_KEYWORD,
                                               p.KEYWORD_ONLY):
                names.add(p.name)
    return names


def _element_params(el):
    """JSON-serializable creation parameters of a pytree element: the
    fields whose (renamed) name create() actually accepts, overlaid with
    the element's recorded user-facing createArgs (for classes that derive
    their fields, e.g. parametric conics) and the class's _export_params
    hook (for composite params, e.g. aperture blade openings)."""
    cls = type(el)
    accepted = _create_signature_names(cls)
    out = {}
    for fname in cls.__dataclass_fields__:
        val = getattr(el, fname)
        if val is None:
            continue
        if fname in ('material', 'material2', 'figure_error',
                     'createArgs'):
            continue
        cname = _create_name(cls, fname)
        if cname not in accepted:
            continue
        if hasattr(val, 'tolist'):
            out[cname] = val.tolist()
        elif isinstance(val, (int, float, str, bool, tuple, list)):
            out[cname] = list(val) if isinstance(val, tuple) else val
    ca = getattr(el, 'createArgs', None)
    if ca:
        out.update(dict(ca))
    hook = getattr(el, '_export_params', None)
    if hook is not None:
        drop, extra = hook()
        for k in drop:
            out.pop(k, None)
        out.update(extra)
    return out


def _element_materials(el):
    """Material-valued fields of an element, serialized (the reference
    Qook layouts carry material definitions next to the element tree,
    beamline.py:1549-1640).  Non-serializable materials (e.g. TXM voxel
    volumes) are silently left out — pass them via ``materials=`` on
    load."""
    from .materials.serialize import material_to_dict
    from .materials import Material, EmptyMaterial, Multilayer
    out = {}
    for fname in getattr(type(el), '__dataclass_fields__', {}):
        val = getattr(el, fname)
        if isinstance(val, (Material, EmptyMaterial, Multilayer)):
            try:
                out[fname] = material_to_dict(val)
            except ValueError:
                pass
    return out


_RENAMES = {'bragg_': 'bragg', 'braggAngle': 'bragg', 'E0': 'E',
            'theta_c': 'theta', 'b_': 'b', 'ex': 'x', 'ez': 'z',
            'f2Virtual': 'f2isVirtual'}


def _create_name(cls, fname):
    return _RENAMES.get(fname, fname)
