"""Test harness configuration.

Golden-accuracy physics tests run on CPU with float64 enabled.  The
surrounding environment may pre-import jax with a TPU plugin at interpreter
start (sitecustomize); we therefore switch the platform to CPU in-process
(which works because backends initialize lazily) and enable x64 at runtime.

Multi-device sharding tests cannot get 8 virtual CPU devices in-process once
the plugin's sitecustomize has imported jaxlib (XLA flags are already
parsed), so they use :func:`run_in_clean_env` to execute a script in a fresh
subprocess with ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` and
the plugin's PYTHONPATH removed.
"""
import os
import subprocess
import sys

# stash the ambient platform so device tests (test_tpu_f32_accuracy) can
# restore it in their subprocesses after we force CPU here
os.environ.setdefault('XRT_TPU_AMBIENT_JAX_PLATFORMS',
                      os.environ.get('JAX_PLATFORMS', ''))
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

# JAX_PLATFORMS may already have been read at jax-import time (plugin
# sitecustomize); override at runtime as well.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest  # noqa: E402

CLEAN_ENV = {
    'JAX_PLATFORMS': 'cpu',
    'JAX_ENABLE_X64': '1',
    'XLA_FLAGS': '--xla_force_host_platform_device_count=8',
    'PYTHONPATH': os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'PATH': os.environ.get('PATH', ''),
    'HOME': os.environ.get('HOME', '/root'),
}


def run_in_clean_env(code: str, timeout=600, f32=False):
    """Run python *code* in a subprocess with an 8-device CPU mesh and
    return (stdout, stderr).  Raises on nonzero exit.

    *f32=True* adds ``--xla_backend_optimization_level=0``: XLA:CPU's
    LLVM codegen at O1+ breaks the exact two_sum/two_prod error
    extraction of the double-float (f32-pair) kernels under jit —
    verified by comparing jitted vs eager vs float64 truth; TPU codegen
    preserves exactness, so this is a CPU-validation-only flag.  Use it
    for any subprocess that asserts float32 double-float accuracy."""
    env = dict(CLEAN_ENV)
    if f32:
        env['XLA_FLAGS'] = env['XLA_FLAGS'] + \
            ' --xla_backend_optimization_level=0'
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=timeout, env=env)
    if r.returncode != 0:
        raise AssertionError(
            f'subprocess failed (exit {r.returncode}):\n--- stdout ---\n'
            f'{r.stdout}\n--- stderr ---\n{r.stderr}')
    return r.stdout, r.stderr


@pytest.fixture(scope='session')
def clean_env_runner():
    return run_in_clean_env
