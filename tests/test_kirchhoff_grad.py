"""Differentiability of the Pallas Kirchhoff kernel (custom VJP).

The reference's OpenCL integrate_kirchhoff (diffract.cl:80-152) is not
differentiable in any form; here `kirchhoff_integral_pallas` carries a
jax.custom_vjp whose backward re-evaluates the checkpointed XLA
formulation blocked over destination samples (ops/kirchhoff.py,
_kirchhoff_bwd_blocked), so jax.grad works straight through the TPU
kernel — including through waves.diffract with use_pallas=True.

These tests run the kernel in Pallas interpret mode on CPU float64 and
check gradients against (a) the XLA path's autodiff and (b) central
finite differences, for all inputs that carry physics parameters:
source/destination positions, fields, k, normals and weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xrt_tpu.physconsts import CHBAR
from xrt_tpu.ops.kirchhoff import (kirchhoff_integral_pallas,
                                   kirchhoff_integral_recentred)

KV = 9000.0 / CHBAR * 1e7


def _problem(Nd=37, Ns=61, seed=0):
    rng = np.random.default_rng(seed)
    xd = jnp.asarray(rng.normal(0, .5, Nd))
    yd = jnp.full((Nd,), 5000.0) + jnp.asarray(rng.normal(0, 0.1, Nd))
    zd = jnp.asarray(rng.normal(0, .5, Nd))
    xs = jnp.asarray(rng.normal(0, .3, Ns))
    ys = jnp.asarray(rng.normal(0, .3, Ns))
    zs = jnp.asarray(rng.normal(0, .1, Ns))
    Es = jnp.asarray(rng.normal(size=Ns) + 1j * rng.normal(size=Ns))
    Ep = 0.5 * Es
    k = jnp.full((Ns,), KV)
    n = [jnp.zeros(Ns), jnp.ones(Ns), jnp.zeros(Ns)]
    nl = jnp.asarray(rng.uniform(0.8, 1.0, Ns))
    w = jnp.ones(Ns)
    return xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, w


def _loss_pallas(args, **kw):
    out = kirchhoff_integral_pallas(*args, interpret=True, **kw)
    return jnp.sum(jnp.abs(out[0]) ** 2) + \
        jnp.sum(jnp.abs(out[2]) ** 2) * 1e-20


def _loss_xla(args):
    (xd, yd, zd, xs, ys, zs, Es, Ep, k, n, nl, w) = args

    def t(v):
        return (v, jnp.zeros_like(v))
    out = kirchhoff_integral_recentred(t(xd), t(yd), t(zd), t(xs), t(ys),
                                       t(zs), Es, Ep, t(k), n, nl, w)
    return jnp.sum(jnp.abs(out[0]) ** 2) + \
        jnp.sum(jnp.abs(out[2]) ** 2) * 1e-20


def test_grad_positions_vs_xla_and_fd():
    """d(loss)/d(src z) through the Pallas kernel (custom VJP, 'vpu'
    exact accumulate) matches the XLA path's plain autodiff and FD."""
    args = _problem()
    zs = args[5]

    def lp(zs_):
        a = list(args)
        a[5] = zs_
        return _loss_pallas(tuple(a), accumulate='vpu')

    def lx(zs_):
        a = list(args)
        a[5] = zs_
        return _loss_xla(tuple(a))

    g_p = jax.grad(lp)(zs)
    g_x = jax.grad(lx)(zs)
    scale = float(jnp.max(jnp.abs(g_x)))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-4 * scale)
    h = 1e-9
    e = jnp.zeros_like(zs).at[7].set(h)
    fd = (lp(zs + e) - lp(zs - e)) / (2 * h)
    np.testing.assert_allclose(float(g_p[7]), float(fd), rtol=1e-4)


def test_grad_dst_positions_fd():
    """Destination-side position gradients (the receiving surface moves,
    e.g. with a downstream element's figure error)."""
    args = _problem()
    zd = args[2]

    def lp(zd_):
        a = list(args)
        a[2] = zd_
        return _loss_pallas(tuple(a), accumulate='vpu')

    g = jax.grad(lp)(zd)
    h = 1e-9
    e = jnp.zeros_like(zd).at[3].set(h)
    fd = (lp(zd + e) - lp(zd - e)) / (2 * h)
    np.testing.assert_allclose(float(g[3]), float(fd), rtol=1e-4)


def test_grad_fields_and_weights():
    """Cotangents for the complex source fields and the area weights."""
    args = _problem(Nd=17, Ns=23)
    Es, w = args[6], args[10 + 1]

    def lE(E_):
        a = list(args)
        a[6] = E_
        return _loss_pallas(tuple(a), accumulate='vpu')

    def lw(w_):
        a = list(args)
        a[11] = w_
        return _loss_pallas(tuple(a), accumulate='vpu')

    gE = jax.grad(lE)(Es)
    h = 1e-6
    e = jnp.zeros_like(Es.real).at[5].set(h)
    fd_re = (lE(Es + e) - lE(Es - e)) / (2 * h)
    fd_im = (lE(Es + 1j * e) - lE(Es - 1j * e)) / (2 * h)
    # JAX convention: cotangent of a complex leaf packs (dL/dRe, dL/dIm)
    # as Re - i*Im for grad of a real loss
    np.testing.assert_allclose(float(gE[5].real), float(fd_re), rtol=3e-4)
    np.testing.assert_allclose(float(-gE[5].imag), float(fd_im), rtol=3e-4)

    gw = jax.grad(lw)(w)
    e = jnp.zeros_like(w).at[5].set(h)
    fdw = (lw(w + e) - lw(w - e)) / (2 * h)
    np.testing.assert_allclose(float(gw[5]), float(fdw), rtol=3e-4)


@pytest.mark.parametrize('mode', ['mono', 'fast'])
def test_grad_mono_and_fast_modes(mode):
    args = _problem(Nd=17, Ns=23)
    zs = args[5]
    kw = dict(accumulate='vpu', monochromatic=True) if mode == 'mono' \
        else dict(phase_mode='fast')

    def lp(zs_):
        a = list(args)
        a[5] = zs_
        return _loss_pallas(tuple(a), **kw)

    g = jax.grad(lp)(zs)
    h = 1e-9
    e = jnp.zeros_like(zs).at[7].set(h)
    fd = (lp(zs + e) - lp(zs - e)) / (2 * h)
    np.testing.assert_allclose(float(g[7]), float(fd), rtol=2e-4)


def test_grad_through_diffract_pallas_f32(clean_env_runner):
    """jax.grad straight through waves.diffract with the TPU kernel
    engaged (use_pallas=True -> Pallas interpret on CPU, float32 wave
    path with double-float phases): the gradient of a double-slit
    fringe-peak flux w.r.t. the slit separation agrees between the
    Pallas custom-VJP path and the f32 XLA path, and with FD."""
    code = r"""
import math
import numpy as np
import jax, jax.numpy as jnp
from xrt_tpu.physconsts import CH
from xrt_tpu.apertures import RectangularAperture
from xrt_tpu.screens import Screen
from xrt_tpu.waves import prepare_wave_on_screen, diffract, Wave
from xrt_tpu import config

jax.config.update('jax_enable_x64', False)
E0 = 9000.0
d, sep, L = 0.05, 0.4, 10000.0
lam = CH / E0 * 1e-7
n = 512
rng = np.random.default_rng(0)
u = np.concatenate([rng.uniform(-d/2, d/2, n//2) - 0.5,
                    rng.uniform(-d/2, d/2, n//2) + 0.5])
x_src = rng.uniform(-0.5, 0.5, n)
dt, cdt = jnp.float32, jnp.complex64
zero = jnp.zeros((n,), dt)
slit = RectangularAperture.create(center=(0, 0, 0),
                                  opening=(-0.5, 0.5, -0.5, 0.5))
screen = Screen.create(center=(0, L, 0))
period = lam * L / sep
zs = np.linspace(-1.2 * period, 1.2 * period, 33)
wave = prepare_wave_on_screen(screen, slit, np.asarray([0.0]), zs)

def peak(sepv, use_pallas):
    z_src = jnp.asarray(u, dt) * sepv
    src = Wave(
        x=jnp.asarray(x_src, dt), y=zero, z=z_src,
        a=zero, b=jnp.ones((n,), dt), c=zero,
        E=jnp.full((n,), E0, dt), state=jnp.ones((n,), jnp.int32),
        path=zero, Jss=jnp.ones((n,), dt), Jpp=zero,
        Jsp=jnp.zeros((n,), cdt),
        Es=jnp.ones((n,), cdt), Ep=jnp.zeros((n,), cdt),
        area=jnp.asarray(1.0 * 2 * d, dt))
    out = diffract(src, wave, use_pallas=use_pallas)
    I = out.Jss + out.Jpp
    wgt = jnp.exp(-(jnp.asarray(zs, dt) / (0.5 * period)) ** 2)
    return jnp.sum(I * wgt) * 1e-4

s0 = jnp.asarray(1.0, dt)
gp = float(jax.grad(lambda s: peak(s, True))(s0))
gx = float(jax.grad(lambda s: peak(s, False))(s0))
h = 1e-3
fd = (float(peak(s0 + h, False)) - float(peak(s0 - h, False))) / (2*h)
print('GP', gp, 'GX', gx, 'FD', fd)
assert abs(gp - gx) < 0.03 * max(abs(gx), 1e-9), (gp, gx)
assert abs(gx - fd) < 0.05 * abs(fd), (gx, fd)
print('OK')
"""
    out, _ = clean_env_runner(code, timeout=900, f32=True)
    assert 'OK' in out


import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
