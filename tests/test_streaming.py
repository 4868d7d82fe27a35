"""Streaming (CSR) raster path: must match the dense path exactly.

Same kernels semantics over a different binning/layout, so images, fid
maps, z-buffers and gradients must agree to f32 reassociation tolerance
(coverage decisions are identical: both paths evaluate the same anchored
planes in the same per-tile face order).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.core import matrices, mesh
from dirt_tpu.ops import binning
from dirt_tpu.ops.raster import RasterConfig


def _scene(seed=0, n_faces=40, size=96):
    rng = np.random.RandomState(seed)
    verts = rng.uniform(-1.2, 1.2, (3 * n_faces, 4)).astype(np.float32)
    verts[:, 2] = rng.uniform(-0.9, 0.9, 3 * n_faces)
    verts[:, 3] = 1.0
    faces = np.arange(3 * n_faces, dtype=np.int32).reshape(n_faces, 3)
    colors = rng.rand(3 * n_faces, 3).astype(np.float32)
    bg = rng.rand(size, size, 3).astype(np.float32)
    return (jnp.asarray(verts), jnp.asarray(colors), jnp.asarray(faces),
            jnp.asarray(bg), size)


DENSE = RasterConfig(tile_h=16, tile_w=128, bin_cap=256, streaming=False)
STREAM = RasterConfig(tile_h=16, tile_w=128, bin_cap=256, streaming=True)


def test_streaming_forward_matches_dense():
    verts, colors, faces, bg, _ = _scene()
    img_d, fid_d, z_d, _ = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=DENSE)
    img_s, fid_s, z_s, _ = dirt_tpu.rasterise_with_aux(
        bg, verts, colors, faces, config=STREAM)
    np.testing.assert_array_equal(np.asarray(fid_d), np.asarray(fid_s))
    np.testing.assert_allclose(
        np.asarray(img_d), np.asarray(img_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_d), np.asarray(z_s), atol=1e-6)


@pytest.mark.slow
def test_streaming_gradients_match_dense():
    verts, colors, faces, bg, size = _scene(seed=1)
    w = jnp.asarray(np.random.RandomState(9).rand(size, size, 3), jnp.float32)

    def loss(config, v, c, b):
        img = dirt_tpu.rasterise(b, v, c, faces, config=config)
        return jnp.sum(img * w)

    g_d = jax.grad(lambda *a: loss(DENSE, *a), argnums=(0, 1, 2))(
        verts, colors, bg)
    g_s = jax.grad(lambda *a: loss(STREAM, *a), argnums=(0, 1, 2))(
        verts, colors, bg)
    for a, b in zip(g_d, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_streaming_quad_spanning_all_tiles():
    # A two-triangle quad covering the whole image exercises expand_cap
    # auto-sizing (each face overlaps every tile).
    verts3, faces = mesh.unit_quad()
    verts = jnp.concatenate(
        [jnp.asarray(verts3) * 2.0, jnp.ones((4, 1), jnp.float32)], axis=-1
    )  # beyond the NDC box: full coverage
    colors = jnp.ones((4, 1), jnp.float32)
    img = dirt_tpu.rasterise(
        None, verts, jnp.asarray(colors), jnp.asarray(faces),
        height=64, width=256, channels=1,
        config=RasterConfig(streaming=True),
    )
    assert float(jnp.min(img)) > 0.99


def test_csr_binning_matches_dense_binning():
    rng = np.random.RandomState(3)
    nf, h, w, th, tw = 200, 128, 256, 16, 128
    xmin = rng.randint(0, w - 1, nf)
    xmax = xmin + rng.randint(0, 40, nf)
    ymin = rng.randint(0, h - 1, nf)
    ymax = ymin + rng.randint(0, 40, nf)
    bbox = jnp.asarray(
        np.stack([xmin, np.minimum(xmax, w - 1),
                  ymin, np.minimum(ymax, h - 1)], -1), jnp.int32)
    cap = 128
    dense = binning.bin_faces(bbox, h, w, th, tw, cap)
    csr = binning.bin_faces_csr(bbox, h, w, th, tw, cap, expand_cap=16)
    total = dense.bins.shape[0]
    ef = np.asarray(csr.entry_face)
    sb = np.asarray(csr.start_block)
    cc = np.asarray(csr.counts)
    for t in range(total):
        got = ef[sb[t] * binning.CHUNK: sb[t] * binning.CHUNK + cc[t]]
        want = np.asarray(dense.bins[t][: int(dense.counts[t])])
        np.testing.assert_array_equal(got, want)
        # padding slots hold the sentinel
        pad_end = sb[t] * binning.CHUNK + int(np.ceil(cc[t] / 128) * 128)
        assert (ef[sb[t] * binning.CHUNK + cc[t]: pad_end] == nf).all()


def test_csr_overflow_flags():
    # One face spanning more tiles than expand_cap -> overflow set.
    bbox = jnp.asarray([[0, 255, 0, 127]], jnp.int32)  # whole 2x2+ grid
    csr = binning.bin_faces_csr(
        bbox, 128, 256, 16, 128, cap=128, expand_cap=4)
    assert bool(csr.overflow)


@pytest.mark.slow
def test_streaming_sphere_matches_dense():
    verts_obj, faces, _ = mesh.uv_sphere(n_lat=12, n_lon=16)
    mv = matrices.compose(
        matrices.rodrigues(jnp.array([0.3, 0.2, 0.1])),
        matrices.translation(jnp.array([0.0, 0.0, -3.0])),
    )
    proj = matrices.perspective_projection(0.1, 20.0, 0.045, 1.0)
    clip = matrices.transform_homogeneous(
        jnp.asarray(verts_obj), matrices.compose(mv, proj))
    colors = jnp.asarray(
        np.random.RandomState(0).rand(len(verts_obj), 3), jnp.float32)
    bg = jnp.zeros((128, 128, 3), jnp.float32)
    faces = jnp.asarray(faces)
    img_d, fid_d, _, _ = dirt_tpu.rasterise_with_aux(
        bg, clip, colors, faces, config=DENSE)
    img_s, fid_s, _, _ = dirt_tpu.rasterise_with_aux(
        bg, clip, colors, faces, config=STREAM)
    np.testing.assert_array_equal(np.asarray(fid_d), np.asarray(fid_s))
    np.testing.assert_allclose(
        np.asarray(img_d), np.asarray(img_s), atol=1e-6)
