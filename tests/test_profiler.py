"""Structured per-stage profiler (the analog of the reference's ad-hoc
wall-clock prints, runner.py:214-218 / waves.py:826-828, made into a
subsystem)."""
import time

import jax
import jax.numpy as jnp

from xrt_tpu import profiler


def setup_function(_):
    profiler.reset()


def test_stage_accumulation_and_nesting():
    with profiler.stage('outer'):
        time.sleep(0.01)
        with profiler.stage('inner'):
            time.sleep(0.01)
        with profiler.stage('inner'):
            time.sleep(0.005)
    d = profiler.as_dict()
    assert d['outer']['calls'] == 1
    assert d['outer.inner']['calls'] == 2
    assert d['outer']['total'] >= d['outer.inner']['total']
    assert d['outer.inner']['best'] <= d['outer.inner']['worst']
    rep = profiler.report()
    assert 'outer.inner' in rep and 'calls' in rep


def test_decorator_blocks_on_device_result():
    @profiler.stage('mm')
    def matmul(a):
        return a @ a

    a = jnp.ones((256, 256))
    for _ in range(2):
        matmul(a)
    d = profiler.as_dict()
    assert d['mm']['calls'] == 2
    assert d['mm']['total'] > 0


def test_block_argument():
    a = jax.jit(lambda x: x * 2)(jnp.ones(16))
    with profiler.stage('blocked', block=a):
        pass
    assert profiler.as_dict()['blocked']['calls'] == 1


def test_runner_records_stages():
    from xrt_tpu.sources import GeometricSource
    from xrt_tpu.screens import Screen
    from xrt_tpu.plotspec import XYCPlot, XYCAxis
    from xrt_tpu.runner import run_ray_tracing

    src = GeometricSource.create(
        nrays=500, dx=0.1, dz=0.05, dxprime=1e-5, dzprime=1e-5,
        distE='flat', energies=(8990.0, 9010.0),
        polarization='horizontal')
    screen = Screen.create(center=(0, 1000.0, 0))

    def rp(bl, key):
        return {'scr': screen.expose(src.shine(key))}

    plot = XYCPlot(beam='scr', xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                   yaxis=XYCAxis('z', 'mm', limits=(-1, 1)),
                   caxis=XYCAxis('energy', 'eV', limits=(8990, 9010)))
    run_ray_tracing([plot], repeats=3, run_process=rp,
                    key=jax.random.PRNGKey(0))
    d = profiler.as_dict()
    assert d['runner.step']['calls'] == 3
    assert d['runner.accumulate']['calls'] == 3


def test_update_every_saves_intermediate(tmp_path):
    """updateEvery redraws the figures mid-run (reference
    runner.py:241-247)."""
    import os
    import jax
    from xrt_tpu.sources import GeometricSource
    from xrt_tpu.screens import Screen
    from xrt_tpu.plotspec import XYCPlot, XYCAxis
    from xrt_tpu.runner import run_ray_tracing

    src = GeometricSource.create(
        nrays=200, dx=0.1, dz=0.05, dxprime=1e-5, dzprime=1e-5,
        distE='flat', energies=(8990.0, 9010.0),
        polarization='horizontal')
    screen = Screen.create(center=(0, 1000.0, 0))

    def rp(bl, key):
        return {'scr': screen.expose(src.shine(key))}

    fn = str(tmp_path / 'live.png')
    saves = []
    plot = XYCPlot(beam='scr', xaxis=XYCAxis('x', 'mm', limits=(-1, 1)),
                   yaxis=XYCAxis('z', 'mm', limits=(-1, 1)),
                   caxis=XYCAxis('energy', 'eV', limits=(8990, 9010)),
                   saveName=fn)
    import xrt_tpu.plotting as plotting
    orig = plotting.save_plot
    plotting.save_plot = lambda *a, **k: saves.append(a[1]) or orig(*a, **k)
    try:
        run_ray_tracing([plot], repeats=4, run_process=rp, updateEvery=2,
                        key=jax.random.PRNGKey(0))
    finally:
        plotting.save_plot = orig
    # one mid-run refresh (it=2) + the final save
    assert saves.count(fn) == 2
    assert os.path.exists(fn)


def test_color_print_and_verbosity(capsys):
    from xrt_tpu import singletons as sg
    sg.colorPrint('hello', 'RED')
    sg.colorPrint('hidden', 'RED', verbosity=sg._VERBOSITY_ + 1)
    out = capsys.readouterr().out
    assert 'hello' in out and 'hidden' not in out
    assert sg.is_sequence([1, 2]) and sg.is_sequence((1,))
    assert not sg.is_sequence('abc') and not sg.is_sequence(3.0)
