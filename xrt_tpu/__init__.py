"""xrt_tpu — a TPU-native differentiable x-ray beamline simulator.

A brand-new JAX/XLA/Pallas framework with the raycing capabilities of
`xrt (XRayTracer) <https://github.com/kklmn/xrt>`_: Monte-Carlo synchrotron
sources, sequential ray-surface tracing, dynamical crystal diffraction,
material reflectivities, apertures/screens with colored detector histograms,
and Fresnel-Kirchhoff wave propagation — implemented as pure, jit-compiled
functions over a ``Beam`` pytree, sharded over TPU meshes, and
differentiable end to end.
"""
__version__ = '0.1.0'

from . import config, physconsts
from .beam import Beam, new_beam, copy_beam


def __getattr__(name):
    # lazy subpackage access: xrt_tpu.sources, xrt_tpu.oes, ... without
    # importing the whole stack at package import
    import importlib
    if name in ('sources', 'oes', 'materials', 'waves', 'screens',
                'apertures', 'beamline', 'runner', 'plotspec', 'plotting',
                'coherence', 'modes', 'parallel', 'figure_error', 'kde',
                'stages', 'server', 'beamio', 'histogram', 'dummy',
                'flow', 'glow', 'wavechain', 'webui', 'epics', 'qook',
                'codegen', 'profiler', 'units', 'singletons'):
        return importlib.import_module('.' + name, __name__)
    raise AttributeError(name)


__all__ = ['config', 'physconsts', 'Beam', 'new_beam', 'copy_beam',
           '__version__']
