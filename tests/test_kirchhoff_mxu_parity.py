"""CI-runnable parity of the Pallas MXU accumulation layout vs 'vpu'.

The MXU path packs all ten Kirchhoff accumulators into a 28-column weight
matrix contracted against (U_r, U_i) with per-dst post-combine slices
(ops/kirchhoff.py kernel_mxu).  An index slip in that layout would only
show on real TPU hardware via tools/bench_kirchhoff_modes.py; this test
runs the same kernel in Pallas interpret mode on CPU and checks
'mxu32'/'mxu'/'mxu-fast' against the all-f32 'vpu' contraction at the
documented error bounds.  Also covers the eager 1/A-series envelope
fallback (ADVICE r2, ops/kirchhoff.py:SERIES_E_MAX).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from xrt_tpu.ops import dd
from xrt_tpu.ops.kirchhoff import (kirchhoff_integral_pallas,
                                   recentred_series_e_max, SERIES_E_MAX)
from xrt_tpu.physconsts import CHBAR

E0 = 9000.0
K0 = E0 / CHBAR * 1e7  # 1/mm


def _args(rng, Ns, Nd, poly=False):
    xs = rng.uniform(-0.5, 0.5, Ns)
    ys = rng.uniform(-0.05, 0.05, Ns)
    zs = rng.uniform(-0.5, 0.5, Ns)
    xd = rng.uniform(-1, 1, Nd)
    yd = np.full(Nd, 10000.0)
    zd = rng.uniform(-1, 1, Nd)
    n = [np.full(Ns, 0.01), np.full(Ns, 0.99), np.full(Ns, 0.02)]
    Es = np.exp(1j * rng.uniform(0, 2 * np.pi, Ns))
    Ep = 0.3 * Es
    kk = np.full(Ns, K0)
    if poly:
        kk = kk * (1 + rng.uniform(-1e-4, 1e-4, Ns))
    nl = np.full(Ns, 0.9)
    w = np.ones(Ns)
    d = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
    f = lambda a: jnp.asarray(a, jnp.float32)
    return (d(xd), d(yd), d(zd), d(xs), d(ys), d(zs),
            jnp.asarray(Es, jnp.complex64), jnp.asarray(Ep, jnp.complex64),
            d(kk), [f(v) for v in n], f(nl), f(w))


def _run(args, acc, mono):
    return kirchhoff_integral_pallas(
        *args, dst_tile=128, src_chunk=256, sublanes=8,
        monochromatic=mono, accumulate=acc, interpret=True)


# documented bounds (fields Es/Ep, direction integrals a/b/c):
# 'mxu32' truncates operands to single bf16 on real hardware but
# interpret mode keeps f32 -> near-exact; 'mxu' two-pass bf16 fields
# ~2^-16/term, single-pass bf16 direction columns ~2^-9/term (random-
# phase sums keep the RELATIVE accumulator error at ~2e-3 — the
# direction noise after normalization is microradians, PERF.md);
# 'mxu-fast' single-pass bf16 everywhere
# 'mxu2' (two-term 1/A series): same field path as 'mxu'; the direction
# weights add an O(e^2) smooth truncation, negligible at this geometry
# (e ~ 1e-4)
_TOL = {'mxu32': (2e-5, 2e-5), 'mxu': (2e-4, 1e-2),
        'mxu2': (2e-4, 1e-2), 'mxu-fast': (1e-2, 1e-2)}


@pytest.mark.parametrize('mono', [True, False])
@pytest.mark.parametrize('acc', ['mxu32', 'mxu', 'mxu2', 'mxu-fast'])
def test_mxu_layout_parity_vs_vpu(acc, mono):
    rng = np.random.RandomState(3)
    # 1000 x 900: forces dst padding (900 -> 1024) and a multi-chunk
    # src fori_loop (1000 -> 4 chunks of 256)
    args = _args(rng, 1000, 900, poly=not mono)
    ref = _run(args, 'vpu', mono)
    got = _run(args, acc, mono)
    ftol, dtol = _TOL[acc]
    for i, (g, r) in enumerate(zip(got, ref)):
        g, r = np.asarray(g), np.asarray(r)
        rel = np.abs(g - r).max() / np.abs(r).max()
        tol = ftol if i < 2 else dtol
        assert rel < tol, (acc, mono, i, rel)
    # the physically consumed direction is the normalized per-dst ratio;
    # an index slip in the 28-column layout would scramble it wholesale
    def dirs(o):
        a = np.stack([np.asarray(v).real for v in o[2:5]])
        return a / np.linalg.norm(a, axis=0)
    ang = np.linalg.norm(dirs(got) - dirs(ref), axis=0)
    assert np.median(ang) < 5e-3, (acc, mono, np.median(ang))


def test_series_envelope_helper():
    rng = np.random.RandomState(4)
    args = _args(rng, 500, 300)
    e = recentred_series_e_max(*args[:6])
    assert e < 0.01  # compact clouds at 10 m
    # long grazing footprint at short distance exceeds the envelope
    ys = rng.uniform(-300, 300, 500)
    xs = np.zeros(500)
    zs = ys * 0.004
    xd = rng.uniform(-1, 1, 300)
    yd = np.full(300, 500.0)
    zd = np.full(300, 4.0) + rng.uniform(-1, 1, 300)
    e2 = recentred_series_e_max(xd, yd, zd, xs, ys, zs)
    assert e2 > SERIES_E_MAX


def test_eager_fallback_outside_envelope():
    """Eager 'mxu' calls beyond the series envelope must warn and produce
    the exact 'vpu' direction integrals."""
    rng = np.random.RandomState(5)
    Ns, Nd = 600, 300
    ys = rng.uniform(-300, 300, Ns)
    xs = rng.uniform(-1, 1, Ns)
    zs = ys * 0.004
    xd = rng.uniform(-1, 1, Nd)
    yd = np.full(Nd, 500.0)
    zd = np.full(Nd, 4.0) + rng.uniform(-0.5, 0.5, Nd)
    n = [np.zeros(Ns), np.full(Ns, -0.004), np.ones(Ns)]
    Es = np.exp(1j * rng.uniform(0, 2 * np.pi, Ns))
    Ep = np.zeros(Ns, complex)
    kk = np.full(Ns, K0)
    nl = np.full(Ns, 0.9)
    w = np.ones(Ns)
    d = lambda a: tuple(map(jnp.asarray, dd.from_f64(a)))
    f = lambda a: jnp.asarray(a, jnp.float32)
    args = (d(xd), d(yd), d(zd), d(xs), d(ys), d(zs),
            jnp.asarray(Es, jnp.complex64), jnp.asarray(Ep, jnp.complex64),
            d(kk), [f(v) for v in n], f(nl), f(w))
    with pytest.warns(UserWarning, match='series envelope'):
        got = _run(args, 'mxu', True)
    ref = _run(args, 'vpu', True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


import pytest as _pytest  # noqa: E402
# full-physics / subprocess module: excluded from the fast gate
# (`pytest -m "not slow"`); see pyproject [tool.pytest.ini_options]
pytestmark = _pytest.mark.slow
