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


# --------------------------------------------------------------------------
# custom-VJP path (scatter-free texture gradients)


def test_segment_rows_sorted_matches_scatter_add():
    from dirt_tpu.core.texture import segment_rows_sorted

    rng = np.random.RandomState(3)
    n, t, k = 2000, 37, 5
    ids = jnp.asarray(rng.randint(0, t, size=n), jnp.int32)
    val = jnp.asarray(rng.randn(n, k).astype(np.float32))
    got = segment_rows_sorted(ids, val, t)
    want = jnp.zeros((t, k), jnp.float32).at[ids].add(val)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_segment_rows_sorted_empty_and_dense_ids():
    from dirt_tpu.core.texture import segment_rows_sorted

    # Some ids missing entirely, one id holding most rows.
    ids = jnp.asarray([2, 2, 2, 2, 5, 2], jnp.int32)
    val = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    got = np.asarray(segment_rows_sorted(ids, val, 8))
    want = np.zeros((8, 2), np.float32)
    for i, t in enumerate([2, 2, 2, 2, 5, 2]):
        want[t] += np.arange(12, dtype=np.float32).reshape(6, 2)[i]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _grad_pair(tex, uv, wrap, custom):
    def loss(tex, uv):
        out = sample_texture(tex, uv, wrap=wrap, custom_vjp=custom)
        return jnp.sum(out * jnp.cos(out * 3.0))

    return jax.grad(loss, argnums=(0, 1))(tex, uv)


def test_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(7)
    tex = jnp.asarray(rng.rand(16, 12, 3).astype(np.float32))
    for wrap in ("clamp", "repeat"):
        # Interior UVs away from texel-boundary ties (where clamp/floor
        # subgradients legitimately differ between the two paths).
        uv = jnp.asarray(
            (rng.randint(0, 200, size=(41, 7, 2)) + 0.37) / 200.0,
            jnp.float32,
        )
        g_tex_a, g_uv_a = _grad_pair(tex, uv, wrap, custom=False)
        g_tex_c, g_uv_c = _grad_pair(tex, uv, wrap, custom=True)
        np.testing.assert_allclose(
            np.asarray(g_tex_c), np.asarray(g_tex_a), rtol=1e-4, atol=1e-5,
            err_msg=f"texture grad mismatch wrap={wrap}")
        np.testing.assert_allclose(
            np.asarray(g_uv_c), np.asarray(g_uv_a), rtol=1e-4, atol=1e-5,
            err_msg=f"uv grad mismatch wrap={wrap}")


def test_custom_vjp_out_of_range_uv_clamp_grads_zero():
    rng = np.random.RandomState(9)
    tex = jnp.asarray(rng.rand(8, 8, 2).astype(np.float32))
    uv = jnp.asarray([[1.7, 0.4], [-0.3, 0.6], [0.5, 1.9]], jnp.float32)
    _, g_uv = _grad_pair(tex, uv, "clamp", custom=True)
    np.testing.assert_allclose(np.asarray(g_uv)[:, 0][[0, 1]], 0.0)
    np.testing.assert_allclose(np.asarray(g_uv)[2, 1], 0.0)
    # Texture gradients still sum to the full upstream weight.
    g_tex_a, _ = _grad_pair(tex, uv, "clamp", custom=False)
    g_tex_c, _ = _grad_pair(tex, uv, "clamp", custom=True)
    np.testing.assert_allclose(np.asarray(g_tex_c), np.asarray(g_tex_a),
                               rtol=1e-5, atol=1e-6)


def test_custom_vjp_channels_first_and_value_parity():
    rng = np.random.RandomState(11)
    tex = jnp.asarray(rng.rand(9, 13, 4).astype(np.float32))
    uv = jnp.asarray(rng.rand(6, 5, 2).astype(np.float32) * 0.9 + 0.05)
    a = sample_texture(tex, uv, custom_vjp=False)
    c = sample_texture(tex, uv, custom_vjp=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-7)
    cf = sample_texture(tex, uv, channels_first=True)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(cf, 0, -1)), np.asarray(a), atol=1e-7)
