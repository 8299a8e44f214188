"""fast_interp (gather-free TPU interpolation) vs jnp.interp."""
import numpy as np
import jax
import jax.numpy as jnp

from xrt_tpu.ops.interp import fast_interp


def test_matches_jnp_interp():
    rng = np.random.RandomState(0)
    xp = np.sort(rng.uniform(0, 100, 185))
    fp = rng.uniform(-5, 5, 185)
    x = rng.uniform(-10, 110, 10000)       # incl. out-of-range clamping
    a = np.asarray(fast_interp(jnp.asarray(x), jnp.asarray(xp),
                               jnp.asarray(fp)))
    b = np.interp(x, xp, fp)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_edges_scalars_shapes():
    xp = jnp.asarray([1.0, 2.0, 4.0])
    fp = jnp.asarray([10.0, 20.0, 40.0])
    assert float(fast_interp(0.5, xp, fp)) == 10.0     # clamp left
    assert float(fast_interp(4.0, xp, fp)) == 40.0     # right edge exact
    assert float(fast_interp(9.0, xp, fp)) == 40.0     # clamp right
    assert float(fast_interp(3.0, xp, fp)) == 30.0
    out = fast_interp(jnp.ones((3, 4)) * 1.5, xp, fp)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(out), 15.0)
    one = fast_interp(2.0, xp[:1], fp[:1])             # single-point table
    assert float(one) == 10.0


def test_differentiable():
    xp = jnp.linspace(0.0, 10.0, 11)
    fp = jnp.linspace(0.0, 10.0, 11) ** 2

    def f(x):
        return jnp.sum(fast_interp(x, xp, fp))
    g = jax.grad(f)(jnp.asarray([2.5, 7.5]))
    # piecewise-linear slope between the surrounding knots
    np.testing.assert_allclose(np.asarray(g), [9.0 - 4.0, 64.0 - 49.0],
                               rtol=1e-6)
