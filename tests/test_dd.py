"""Double-float (f32-pair) arithmetic: exactness and phase reduction.

These run in x64 mode but exercise the f32 algorithms explicitly.
"""
import numpy as np
import jax.numpy as jnp

from xrt_tpu.ops import dd


def _f32(a):
    return jnp.asarray(np.asarray(a, np.float32))


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a64 = rng.uniform(-1e6, 1e6, 1000)
    b64 = rng.uniform(-1e-3, 1e-3, 1000)
    a = _f32(a64)
    b = _f32(b64)
    s, e = dd.two_sum(a, b)
    # s + e == a + b exactly (in f64)
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    assert np.array_equal(lhs, rhs)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = _f32(rng.uniform(-1e3, 1e3, 1000))
    b = _f32(rng.uniform(-1e3, 1e3, 1000))
    p, e = dd.two_prod(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    assert np.array_equal(lhs, rhs)


def test_dd_sqrt_accuracy():
    rng = np.random.default_rng(2)
    x64 = rng.uniform(1.0, 1e9, 1000)
    h, l = dd.from_f64(x64)
    sh, sl = dd.sqrt(jnp.asarray(h), jnp.asarray(l))
    got = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
    rel = np.abs(got - np.sqrt(x64)) / np.sqrt(x64)
    assert rel.max() < 1e-13


def test_mod_and_frac_two_pi_agree_with_f64():
    """Both reductions stay within the dd product error bound
    (~phase * 2^-47) against float64 truth."""
    rng = np.random.default_rng(3)
    r64 = rng.uniform(15000.0, 25000.0, 20000)
    k64 = np.full_like(r64, 4.56e7)
    phi64 = (k64 * r64) % (2 * np.pi)
    rh, rl = (jnp.asarray(v) for v in dd.from_f64(r64))
    kh, kl = (jnp.asarray(v) for v in dd.from_f64(k64))

    ph_h, ph_l = dd.mul(kh, kl, rh, rl)
    ph_mod = np.asarray(dd.mod_two_pi(ph_h, ph_l)) % (2 * np.pi)

    kah, kal = dd.mul(kh, kl, jnp.full_like(kh, dd.INV_TWO_PI_HI),
                      jnp.full_like(kh, dd.INV_TWO_PI_LO))
    mh, ml = dd.mul(kah, kal, rh, rl)
    ph_frac = np.asarray(dd.frac_two_pi(mh, ml)) % (2 * np.pi)

    bound = (k64 * r64).max() * 2.0 ** -46
    for ph in (ph_mod, ph_frac):
        err = np.abs(((ph - phi64 + np.pi) % (2 * np.pi)) - np.pi)
        assert err.max() < bound, (err.max(), bound)


def test_phase_fast_matches_phase_exact():
    from xrt_tpu.ops.kirchhoff import _phase_dd, _phase_dd_fast
    rng = np.random.default_rng(4)
    N = 5000
    t = lambda a: tuple(jnp.asarray(v) for v in dd.from_f64(a))
    xd = t(rng.uniform(-1, 1, N))
    yd = t(np.full(N, 20000.0))
    zd = t(rng.uniform(-1, 1, N))
    xs = t(rng.uniform(-50, 50, N))
    ys = t(rng.uniform(-1, 1, N))
    zs = t(rng.uniform(-0.5, 0.5, N))
    k = t(np.full(N, 4.56e7))
    ka = dd.mul(k[0], k[1], jnp.full(N, dd.INV_TWO_PI_HI),
                jnp.full(N, dd.INV_TWO_PI_LO))
    ph_e = np.asarray(_phase_dd(xd, yd, zd, xs, ys, zs, k)[0])
    cyc, r, rinv, a, b, c = (np.asarray(v) for v in
                             _phase_dd_fast(xd, yd, zd, xs, ys, zs, ka))
    ph_f = 2 * np.pi * cyc
    d = np.abs(((ph_f - ph_e + np.pi) % (2 * np.pi)) - np.pi)
    assert d.max() < 0.05  # fast path gives up ~1 bit vs exact
    # geometry outputs agree
    r64 = np.sqrt(
        (np.asarray(xd[0], np.float64) + np.asarray(xd[1], np.float64) -
         np.asarray(xs[0], np.float64) - np.asarray(xs[1], np.float64))**2 +
        (np.asarray(yd[0], np.float64) + np.asarray(yd[1], np.float64) -
         np.asarray(ys[0], np.float64) - np.asarray(ys[1], np.float64))**2 +
        (np.asarray(zd[0], np.float64) + np.asarray(zd[1], np.float64) -
         np.asarray(zs[0], np.float64) - np.asarray(zs[1], np.float64))**2)
    assert np.allclose(r, r64, rtol=1e-6)
    assert np.allclose(rinv, 1.0 / r64, rtol=1e-6)


def test_sincos_cycles_poly():
    c = jnp.linspace(-0.5, 0.5, 4001)
    s, co = dd.sincos_cycles(c)
    x = 2 * np.pi * np.asarray(c)
    assert np.abs(np.asarray(s) - np.sin(x)).max() < 5e-6
    assert np.abs(np.asarray(co) - np.cos(x)).max() < 5e-6
