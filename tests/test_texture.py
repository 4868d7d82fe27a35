import jax
import jax.numpy as jnp
import numpy as np

from dirt_tpu.core.texture import sample_texture


def test_nearest_matches_texel_centers():
    tex = jnp.arange(16.0).reshape(4, 4, 1)
    # UV of texel (row 1, col 2) center: u=(2+.5)/4, v=1-(1+.5)/4.
    uv = jnp.array([[(2 + 0.5) / 4, 1 - (1 + 0.5) / 4]])
    out = sample_texture(tex, uv, mode="nearest")
    np.testing.assert_allclose(out[0, 0], 6.0)


def test_bilinear_at_texel_center_is_exact():
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    i, j = 3, 5
    uv = jnp.array([[(j + 0.5) / 8, 1 - (i + 0.5) / 8]])
    out = sample_texture(tex, uv)
    np.testing.assert_allclose(out[0], tex[i, j], atol=1e-6)


def test_bilinear_midpoint_averages():
    tex = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0)
    # Sample at the shared corner of all four texels: average = 0.25.
    uv = jnp.array([[0.5, 0.5]])
    out = sample_texture(tex, uv)
    np.testing.assert_allclose(out[0, 0], 0.25, atol=1e-6)


def test_gradients_flow_to_texture_and_uv():
    rng = np.random.RandomState(1)
    tex = jnp.asarray(rng.rand(8, 8, 2).astype(np.float32))
    uv = jnp.asarray(rng.rand(5, 2).astype(np.float32) * 0.8 + 0.1)

    def loss(tex, uv):
        return jnp.sum(sample_texture(tex, uv) ** 2)

    g_tex, g_uv = jax.grad(loss, argnums=(0, 1))(tex, uv)
    assert np.isfinite(np.asarray(g_tex)).all()
    assert np.abs(np.asarray(g_uv)).max() > 0

    # FD check on one UV coordinate.
    eps = 1e-3
    up = uv.at[0, 0].add(eps)
    um = uv.at[0, 0].add(-eps)
    fd = (float(loss(tex, up)) - float(loss(tex, um))) / (2 * eps)
    np.testing.assert_allclose(float(g_uv[0, 0]), fd, rtol=1e-2, atol=1e-3)


def test_wrap_modes():
    tex = jnp.arange(4.0).reshape(2, 2, 1)
    uv = jnp.array([[1.2, 0.5]])  # u out of range
    out_clamp = sample_texture(tex, uv, wrap="clamp")
    out_repeat = sample_texture(tex, uv, wrap="repeat")
    assert np.isfinite(np.asarray(out_clamp)).all()
    assert np.isfinite(np.asarray(out_repeat)).all()
