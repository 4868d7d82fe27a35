"""Row-chunked, per-chunk-psum backward == unsharded gradients.

SURVEY.md section 5 / ROADMAP r2 #7: the overlap STRUCTURE (backward
split into row bands, each emitting its own parameter-grad psum) is
correctness-proven on the virtual 8-device mesh; the ICI overlap win
itself needs real multi-chip hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import dirt_tpu
from dirt_tpu.ops.raster import RasterConfig
from dirt_tpu.parallel.overlap import overlapped_loss_and_grads

CFG = RasterConfig(tile_h=8, tile_w=128, bin_cap=64)


def _scene(seed=3, num_faces=24, num_verts=30, size=128):
    rng = np.random.RandomState(seed)
    verts = np.zeros((num_verts, 4), np.float32)
    verts[:, :2] = rng.uniform(-0.9, 0.9, (num_verts, 2))
    verts[:, 2] = rng.uniform(-0.5, 0.5, num_verts)
    verts[:, 3] = 1.0
    faces = rng.randint(0, num_verts, (num_faces, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (num_verts, 3)).astype(np.float32)
    bg = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    return tuple(
        jnp.asarray(a) for a in (verts, colors, faces, bg, target)
    )


def test_overlapped_grads_match_unsharded():
    verts, colors, faces, bg, target = _scene()

    def loss_single(verts, colors, bg):
        img = dirt_tpu.rasterise(
            bg, verts, colors, faces, config=CFG, clip=False
        )
        return jnp.sum((img - target) ** 2)

    l_ref, g_ref = jax.value_and_grad(
        loss_single, argnums=(0, 1, 2)
    )(verts, colors, bg)

    with Mesh(np.array(jax.devices()[:4]), ("tiles",)) as mesh:
        loss, d_v, d_c, d_bg = jax.jit(
            lambda v, c, b: overlapped_loss_and_grads(
                b, v, c, faces, target, mesh, "tiles", CFG, n_chunks=2
            )
        )(verts, colors, bg)

    np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-5)
    for got, want, name in zip(
        (d_v, d_c, d_bg), g_ref, ["verts", "colors", "bg"]
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    assert np.abs(np.asarray(g_ref[0])).max() > 0


def test_overlapped_chunk_count_invariance():
    """1-chunk (no overlap structure) == 4-chunk gradients exactly."""
    verts, colors, faces, bg, target = _scene(seed=9, size=64)
    with Mesh(np.array(jax.devices()[:2]), ("tiles",)) as mesh:
        outs = [
            jax.jit(
                lambda v, c, b, k=k: overlapped_loss_and_grads(
                    b, v, c, faces, target, mesh, "tiles", CFG,
                    n_chunks=k,
                )
            )(verts, colors, bg)
            for k in (1, 4)
        ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


PACKED_CFG = RasterConfig(
    tile_h=8, tile_w=128, engine="packed", expand_cap=128, budget=2048
)


@pytest.mark.slow
def test_production_overlapped_arbitrary_cotangents():
    """rasterise_sharded(overlap_chunks=N): packed fused backward, sliced
    into per-chunk psums, under an ARBITRARY downstream loss (custom_vjp,
    not the bespoke L2 helper) == single-device jax.grad."""
    from dirt_tpu.parallel.sharding import rasterise_sharded

    verts, colors, faces, bg, target = _scene(seed=5, size=64)
    w = jnp.asarray(
        np.random.RandomState(7).rand(64, 64, 3), jnp.float32
    )

    def loss_single(verts, colors, bg):
        img = dirt_tpu.rasterise(
            bg, verts, colors, faces, config=PACKED_CFG, clip=False
        )
        return jnp.sum(jnp.sin(img * 2.0) * w + img * target)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(verts, colors, bg)

    with Mesh(np.array(jax.devices()[:4]), ("tiles",)) as mesh:
        def loss_sharded(verts, colors, bg):
            img = rasterise_sharded(
                bg, verts, colors, faces, mesh, "tiles", PACKED_CFG,
                overlap_chunks=3,
            )
            return jnp.sum(jnp.sin(img * 2.0) * w + img * target)

        g_s = jax.jit(
            jax.grad(loss_sharded, argnums=(0, 1, 2))
        )(verts, colors, bg)

    for got, want, name in zip(g_s, g_ref, ["verts", "colors", "bg"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    assert np.abs(np.asarray(g_ref[0])).max() > 0


@pytest.mark.slow
def test_production_overlapped_chunk_invariance():
    """overlap_chunks=1 == overlap_chunks=4 on the packed path."""
    from dirt_tpu.parallel.overlap import rasterise_overlapped

    verts, colors, faces, bg, target = _scene(seed=11, size=64)

    with Mesh(np.array(jax.devices()[:2]), ("tiles",)) as mesh:
        outs = []
        for k in (1, 4):
            def loss(v, c, b, k=k):
                img = rasterise_overlapped(
                    b, v, c, faces, mesh, "tiles", PACKED_CFG, n_chunks=k
                )
                return jnp.sum((img - target) ** 2)

            outs.append(
                jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(verts, colors, bg)
            )
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
