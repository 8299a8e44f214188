"""Run every example script end to end at tiny sizes.

The xrt_tpu analog of the reference's example smoke runner
(tests/run_raycing_examples.py:1-60), which executes each example family
in a subprocess with small nrays/repeats: here each script honors
XRT_TPU_SMOKE=1 to shrink itself and XRT_TPU_PLATFORM=cpu to run off-TPU.
This is the de-facto integration suite over the public API.
"""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, 'examples', '*.py')))

# scripts that need the (virtual or real) multi-device mesh
NEEDS_MESH = {'05_multichip_sharded.py'}
# heavier wave scripts: larger timeout
SLOW = {'02_undulator_dcm_kb.py', '03_wave_slit_fzp.py',
        '12_softimax_waves.py'}


@pytest.mark.parametrize('path', EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path):
    name = os.path.basename(path)
    env = {
        'JAX_PLATFORMS': 'cpu',
        'XRT_TPU_PLATFORM': 'cpu',
        'XRT_TPU_SMOKE': '1',
        'PYTHONPATH': REPO,
        'PATH': os.environ.get('PATH', ''),
        'HOME': os.environ.get('HOME', '/root'),
        'MPLBACKEND': 'Agg',
    }
    if name in NEEDS_MESH:
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    r = subprocess.run(
        [sys.executable, path], capture_output=True, text=True,
        timeout=900 if name in SLOW else 600, env=env, cwd=REPO)
    assert r.returncode == 0, (
        f'{name} failed (exit {r.returncode}):\n--- stdout ---\n'
        f'{r.stdout[-3000:]}\n--- stderr ---\n{r.stderr[-3000:]}')


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
