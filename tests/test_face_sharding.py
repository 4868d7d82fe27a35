"""Face-list sharding (TP analogue): sharded render == single device.

VERDICT round-1 missing #2 / SURVEY.md section 2.3 TP row: the face list
splits across a mesh axis; per-chip partials composite by min-z with the
single-device tie rule. Runs on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import dirt_tpu
from dirt_tpu.ops.raster import RasterConfig
from dirt_tpu.parallel.face_sharding import rasterise_face_sharded

CFG = RasterConfig(tile_h=8, tile_w=128, bin_cap=64)


def _scene(seed=0, num_faces=48, num_verts=40):
    rng = np.random.RandomState(seed)
    verts = np.zeros((num_verts, 4), np.float32)
    verts[:, :2] = rng.uniform(-0.9, 0.9, (num_verts, 2))
    verts[:, 2] = rng.uniform(-0.5, 0.5, num_verts)
    verts[:, 3] = 1.0
    # Interleave faces so every shard's faces overlap other shards'
    # (cross-shard occlusion is the interesting case).
    faces = rng.randint(0, num_verts, (num_faces, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (num_verts, 3)).astype(np.float32)
    bg = rng.uniform(0, 1, (64, 128, 3)).astype(np.float32)
    return (jnp.asarray(verts), jnp.asarray(colors), jnp.asarray(faces),
            jnp.asarray(bg))


@pytest.mark.slow
def test_face_sharded_forward_matches_single_device():
    verts, colors, faces, bg = _scene()
    single = dirt_tpu.rasterise(
        bg, verts, colors, faces, config=CFG, clip=False
    )
    with Mesh(np.array(jax.devices()[:8]), ("faces",)) as mesh:
        out = rasterise_face_sharded(
            bg, verts, colors, faces, mesh, config=CFG
        )
    # f32 interpolation noise between differently-fused pipelines (the
    # public wrapper jits internally since r5); a few pixels at ~1e-5.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(single), atol=3e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("n_shards", [4, 8])
def test_face_sharded_gradients_match_single_device(n_shards):
    # n=8 makes the backward's row bands only 8 rows tall (H=64), so
    # cross-band boundary pairs and the ppermute halos are stressed.
    verts, colors, faces, bg = _scene(seed=4)
    target = jnp.zeros_like(bg)

    def loss_single(v, c, b):
        img = dirt_tpu.rasterise(b, v, c, faces, config=CFG, clip=False)
        return 0.5 * jnp.sum((img - target) ** 2)

    with Mesh(np.array(jax.devices()[:n_shards]), ("faces",)) as mesh:
        def loss_sharded(v, c, b):
            img = rasterise_face_sharded(
                b, v, c, faces, mesh, config=CFG
            )
            return 0.5 * jnp.sum((img - target) ** 2)

        g_s = jax.grad(loss_sharded, argnums=(0, 1, 2))(verts, colors, bg)
    g_1 = jax.grad(loss_single, argnums=(0, 1, 2))(verts, colors, bg)

    for got, want, name in zip(g_s, g_1, ["verts", "colors", "bg"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    assert np.abs(np.asarray(g_1[0])).max() > 0


def test_face_sharded_under_jit_with_z_ties():
    # Identical overlapping triangles in DIFFERENT shards: the tie must
    # resolve to the lowest global face id, like a single device.
    verts = jnp.asarray(
        [[-0.5, -0.5, 0.1, 1.0], [0.5, -0.5, 0.1, 1.0],
         [0.0, 0.6, 0.1, 1.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]] * 8, jnp.int32)  # 8 identical faces
    colors = jnp.asarray(np.random.RandomState(0).rand(3, 2), np.float32)
    bg = jnp.zeros((32, 128, 2), jnp.float32)
    single, fid_1, _, _ = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=CFG, clip=False
    )
    with Mesh(np.array(jax.devices()[:8]), ("faces",)) as mesh:
        out = jax.jit(
            lambda b, v, c: rasterise_face_sharded(
                b, v, c, faces, mesh, config=CFG
            )
        )(bg, verts, colors)
    # f32 interpolation noise between differently-fused pipelines (the
    # public wrapper jits internally since r5); a few pixels at ~1e-5.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(single), atol=3e-5
    )
    assert set(np.unique(np.asarray(fid_1))) == {-1, 0}
