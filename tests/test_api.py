"""Public API surface: batch rendering, shape inference, aux outputs.

Mirrors the reference's wrapper behaviors (``dirt/rasterise_ops.py``,
reconstructed — SURVEY.md section 2.2): ``rasterise`` with an explicit
background or with (height, width, channels), ``rasterise_batch`` mapping
over a leading batch dim with shared faces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dirt_tpu


def _tri(shift_x=0.0):
    verts = jnp.array(
        [[-0.5 + shift_x, -0.5, 0.0, 1.0],
         [0.5 + shift_x, -0.5, 0.0, 1.0],
         [shift_x, 0.6, 0.0, 1.0]], jnp.float32)
    colors = jnp.ones((3, 2), jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    return verts, colors, faces


def test_rasterise_none_background_requires_shape():
    verts, colors, faces = _tri()
    with pytest.raises(ValueError):
        dirt_tpu.rasterise(None, verts, colors, faces)


def test_rasterise_none_background_renders():
    verts, colors, faces = _tri()
    img = dirt_tpu.rasterise(
        None, verts, colors, faces, height=32, width=128, channels=2)
    assert img.shape == (32, 128, 2)
    assert float(jnp.max(img)) == 1.0
    assert float(jnp.min(img)) == 0.0


def test_rasterise_shape_inferred_from_background():
    verts, colors, faces = _tri()
    bg = jnp.full((32, 128, 2), 0.25, jnp.float32)
    img = dirt_tpu.rasterise(bg, verts, colors, faces)
    assert img.shape == bg.shape
    covered = np.asarray(img[..., 0]) == 1.0
    uncovered = np.asarray(img[..., 0]) == 0.25
    assert covered.sum() > 0 and (covered | uncovered).all()


def test_rasterise_batch_matches_individual():
    v0, colors, faces = _tri(0.0)
    v1, _, _ = _tri(0.3)
    verts = jnp.stack([v0, v1])
    cols = jnp.stack([colors, colors * 0.5])
    bg = jnp.zeros((2, 32, 128, 2), jnp.float32)
    batch = dirt_tpu.rasterise_batch(bg, verts, cols, faces)
    for i in range(2):
        single = dirt_tpu.rasterise(bg[i], verts[i], cols[i], faces)
        np.testing.assert_allclose(
            np.asarray(batch[i]), np.asarray(single), atol=1e-6)


def test_rasterise_batch_none_background():
    v0, colors, faces = _tri()
    verts = jnp.stack([v0, v0])
    cols = jnp.stack([colors, colors])
    batch = dirt_tpu.rasterise_batch(
        None, verts, cols, faces, height=32, width=128, channels=2)
    assert batch.shape == (2, 32, 128, 2)
    np.testing.assert_allclose(
        np.asarray(batch[0]), np.asarray(batch[1]), atol=0)


def test_rasterise_batch_gradients():
    v0, colors, faces = _tri()
    verts = jnp.stack([v0, v0 * 1.05])
    cols = jnp.stack([colors, colors])
    bg = jnp.zeros((2, 32, 128, 2), jnp.float32)

    def loss(v):
        return jnp.sum(dirt_tpu.rasterise_batch(bg, v, cols, faces) ** 2)

    g = jax.grad(loss)(verts)
    assert g.shape == verts.shape
    assert bool(jnp.any(g != 0.0))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_rasterise_with_aux_maps():
    verts, colors, faces = _tri()
    bg = jnp.zeros((32, 128, 2), jnp.float32)
    img, fid, zbuf, overflow = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces)
    assert not bool(overflow)
    covered = np.asarray(fid) == 0
    assert covered.sum() > 0
    assert (np.asarray(fid)[~covered] == -1).all()
    assert np.isfinite(np.asarray(zbuf)[covered]).all()


def test_overflow_flag_and_suggest_config():
    """VERDICT r1 #4: overflow must surface on the primary path, and
    count-then-allocate (suggest_raster_config) must make an over-cap
    scene render exactly."""
    rng = np.random.RandomState(3)
    n = 64
    # n small triangles piled onto the same few pixels: per-tile count = n.
    centers = rng.uniform(-0.05, 0.05, (n, 2)).astype(np.float32)
    verts = []
    for cx, cy in centers:
        verts += [[cx - 0.1, cy - 0.1, 0.0, 1.0],
                  [cx + 0.1, cy - 0.1, 0.0, 1.0],
                  [cx, cy + 0.1, 0.0, 1.0]]
    verts = jnp.asarray(verts, jnp.float32)
    colors = jnp.asarray(
        rng.rand(3 * n, 2).astype(np.float32))
    faces = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
    bg = jnp.zeros((32, 128, 2), jnp.float32)

    # Reference image with a cap that trivially fits everything.
    big = dirt_tpu.RasterConfig(bin_cap=3 * n)
    ref, _, _, ref_over = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=big)
    assert not bool(ref_over)

    # Deliberately-too-small cap: flag raised on the primary path.
    small = dirt_tpu.RasterConfig(bin_cap=8)
    img_s, _, _, over_s = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=small)
    assert bool(over_s)

    # Count-then-allocate: measured caps render exactly, no flag.
    cfg = dirt_tpu.suggest_raster_config(
        verts, faces, 32, 128, config=dirt_tpu.RasterConfig())
    assert cfg.bin_cap >= n
    img_c, _, _, over_c = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=cfg)
    assert not bool(over_c)
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(ref))


def test_suggest_config_streaming_expand_cap():
    # A face spanning the whole grid must get expand_cap >= its tile span.
    verts = jnp.array(
        [[-1.5, -1.5, 0.0, 1.0], [1.5, -1.5, 0.0, 1.0],
         [0.0, 1.5, 0.0, 1.0]], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    cfg = dirt_tpu.suggest_raster_config(
        verts, faces, 256, 256,
        config=dirt_tpu.RasterConfig(streaming=True))
    tiles = (256 // cfg.tile_h) * (256 // cfg.tile_w)
    assert cfg.expand_cap is not None and cfg.expand_cap >= tiles


def test_incidence_gather_grads_match_traced_faces():
    """The concrete-faces incidence-table vjp (row gather) must equal the
    traced-faces fallback (XLA scatter-add transpose) exactly."""
    rng = np.random.RandomState(31)
    verts = np.zeros((25, 4), np.float32)
    verts[:, :2] = rng.uniform(-0.9, 0.9, (25, 2))
    verts[:, 2] = rng.uniform(-0.5, 0.5, 25)
    verts[:, 3] = 1.0
    faces = jnp.asarray(rng.randint(0, 25, (18, 3)), jnp.int32)
    colors = jnp.asarray(rng.rand(25, 3).astype(np.float32))
    bg = jnp.asarray(rng.rand(64, 128, 3).astype(np.float32))
    verts = jnp.asarray(verts)

    def loss(v, c, f):
        img = dirt_tpu.rasterise(bg, v, c, f)
        return jnp.sum(img * jnp.sin(img))

    # Concrete faces -> incidence path (faces is a plain array here).
    g_inc = jax.grad(loss, argnums=(0, 1))(verts, colors, faces)
    # Traced faces -> plain gather + autodiff scatter transpose.
    g_tr = jax.jit(jax.grad(loss, argnums=(0, 1)))(verts, colors, faces)
    # Same math, different f32 reduction order (gather-sum vs the
    # scatter-add transpose): tolerance covers reassociation only.
    np.testing.assert_allclose(
        np.asarray(g_inc[0]), np.asarray(g_tr[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_inc[1]), np.asarray(g_tr[1]), rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(g_inc[0])).max() > 0
