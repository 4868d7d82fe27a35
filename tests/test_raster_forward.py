"""Forward kernel vs the slow oracle (SURVEY.md section 4: allclose oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from dirt_tpu.ops.raster import RasterConfig, rasterize_screen
from dirt_tpu.ref import slowref


def _screen_face(verts_xy, z=0.0, invw=1.0):
    """Build [F, 3, 4] screen-space faces from [F, 3, 2] screen xy."""
    verts_xy = np.asarray(verts_xy, np.float32)
    f = verts_xy.shape[0]
    z_arr = np.broadcast_to(np.asarray(z, np.float32), (f, 3))
    w_arr = np.broadcast_to(np.asarray(invw, np.float32), (f, 3))
    return np.concatenate(
        [verts_xy, z_arr[..., None], w_arr[..., None]], axis=-1
    ).astype(np.float32)


_raster_jit = jax.jit(rasterize_screen, static_argnums=(3,))


def _run_both(face_verts, face_attrs, background, config=None):
    config = config or RasterConfig()
    # Jitted: eager op-by-op execution pays a tiny XLA compile per op
    # (12+ s for one eager binning call on this 1-core CPU).
    pix, fid, zbuf, _ = _raster_jit(
        jnp.asarray(face_verts), jnp.asarray(face_attrs),
        jnp.asarray(background), config,
    )
    ref_pix, ref_fid, ref_z = slowref.oracle_forward(
        face_verts, face_attrs, background
    )
    return (
        np.asarray(pix), np.asarray(fid), np.asarray(zbuf),
        ref_pix, ref_fid, ref_z,
    )


def test_single_triangle_64():
    """Driver config #1: one flat triangle, 64x64, orthographic."""
    face_verts = _screen_face([[[10.3, 50.2], [54.1, 49.7], [32.2, 10.6]]])
    face_attrs = np.ones((1, 3, 1), np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(
        face_verts, face_attrs, background
    )
    assert (ref_fid == 0).sum() > 300  # sanity: triangle visible
    np.testing.assert_array_equal(fid, ref_fid)
    np.testing.assert_allclose(pix, ref_pix, atol=1e-5)


def test_interpolated_colors():
    face_verts = _screen_face([[[5.3, 58.4], [60.1, 55.2], [30.7, 5.1]]])
    face_attrs = np.array(
        [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]], np.float32
    )
    background = np.full((64, 64, 3), 0.25, np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(
        face_verts, face_attrs, background
    )
    np.testing.assert_array_equal(fid, ref_fid)
    np.testing.assert_allclose(pix, ref_pix, atol=1e-5)
    # Colors inside are barycentric: channels sum to 1 there.
    inside = fid >= 0
    np.testing.assert_allclose(pix[inside].sum(-1), 1.0, atol=1e-4)


def test_depth_ordering_two_triangles():
    # Same footprint, triangle 1 nearer (smaller z) despite higher index.
    tri = [[8.2, 55.3], [56.9, 54.8], [31.4, 8.9]]
    face_verts = np.stack(
        [_screen_face([tri], z=0.5)[0], _screen_face([tri], z=-0.5)[0]]
    )
    face_attrs = np.zeros((2, 3, 2), np.float32)
    face_attrs[0, :, 0] = 1.0
    face_attrs[1, :, 1] = 1.0
    background = np.zeros((64, 64, 2), np.float32)
    pix, fid, zbuf, ref_pix, ref_fid, ref_z = _run_both(
        face_verts, face_attrs, background
    )
    np.testing.assert_array_equal(fid, ref_fid)
    assert (fid == 1).sum() > 300 and (fid == 0).sum() == 0
    np.testing.assert_allclose(pix, ref_pix, atol=1e-5)
    covered = fid >= 0
    np.testing.assert_allclose(zbuf[covered], ref_z[covered], atol=1e-5)


def test_z_tie_lowest_face_wins():
    tri = [[8.2, 55.3], [56.9, 54.8], [31.4, 8.9]]
    face_verts = np.stack(
        [_screen_face([tri], z=0.25)[0], _screen_face([tri], z=0.25)[0]]
    )
    face_attrs = np.ones((2, 3, 1), np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    np.testing.assert_array_equal(fid, ref_fid)
    assert set(np.unique(fid)) == {-1, 0}


def test_both_windings_render():
    ccw = [[10.3, 50.2], [54.1, 49.7], [32.2, 10.6]]
    cw = [ccw[0], ccw[2], ccw[1]]
    face_verts = _screen_face([ccw, cw])
    face_verts[1, :, 0] += 0.0  # same footprint, opposite winding
    face_attrs = np.ones((2, 3, 1), np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    np.testing.assert_array_equal(fid, ref_fid)
    assert (fid >= 0).sum() > 300


def test_perspective_correct_interpolation():
    # A quad edge-on in depth: invw varies across the face -> perspective
    # interpolation differs measurably from affine.
    face_verts = np.array(
        [[[4.2, 4.3, -0.5, 1.0], [59.6, 4.1, 0.5, 0.2], [30.9, 59.8, 0.0, 0.6]]],
        np.float32,
    )
    face_attrs = np.array([[[0.0], [1.0], [0.5]]], np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    np.testing.assert_array_equal(fid, ref_fid)
    np.testing.assert_allclose(pix, ref_pix, atol=1e-4)


def test_degenerate_and_culled_faces_are_safe():
    face_verts = np.zeros((3, 3, 4), np.float32)
    # Face 0: zero area. Face 1: behind camera (invw <= 0). Face 2: valid.
    face_verts[0] = _screen_face([[[10, 10], [10, 10], [10, 10]]])[0]
    face_verts[1] = _screen_face([[[5.2, 5.3], [50.1, 6.2], [30.3, 50.4]]])[0]
    face_verts[1, :, 3] = -1.0
    face_verts[2] = _screen_face([[[12.2, 12.3], [52.7, 14.1], [33.3, 52.9]]])[0]
    face_attrs = np.ones((3, 3, 1), np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    # A couple of pixel centers land within f32 resolution of an edge of
    # face 2; allow those, but faces 0/1 must never appear.
    assert (fid != ref_fid).sum() <= 3
    assert set(np.unique(fid)) <= {-1, 2}
    assert np.isfinite(pix).all()


def test_non_tile_multiple_image_size():
    face_verts = _screen_face([[[9.3, 80.2], [95.1, 76.7], [52.2, 9.6]]])
    face_attrs = np.ones((1, 3, 2), np.float32) * np.array([0.3, 0.9], np.float32)
    background = np.zeros((100, 130, 2), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    np.testing.assert_array_equal(fid, ref_fid)
    np.testing.assert_allclose(pix, ref_pix, atol=1e-5)


def test_random_soup_matches_oracle():
    rng = np.random.RandomState(7)
    num_faces = 40
    height, width = 96, 160
    centers = rng.uniform([10, 10], [width - 10, height - 10], (num_faces, 1, 2))
    offsets = rng.uniform(-25, 25, (num_faces, 3, 2))
    xy = (centers + offsets).astype(np.float32)
    z = rng.uniform(-0.9, 0.9, (num_faces, 1)).astype(np.float32)
    face_verts = _screen_face(xy, z=z)
    face_attrs = rng.uniform(0, 1, (num_faces, 3, 4)).astype(np.float32)
    background = rng.uniform(0, 1, (height, width, 4)).astype(np.float32)

    pix, fid, _, ref_pix, ref_fid, _ = _run_both(face_verts, face_attrs, background)
    # f32 vs f64 edge decisions may differ on a handful of boundary pixels.
    mismatch = fid != ref_fid
    assert mismatch.mean() < 0.002, f"coverage mismatch {mismatch.mean():.4f}"
    agree = ~mismatch
    np.testing.assert_allclose(pix[agree], ref_pix[agree], atol=1e-4)


def test_bin_cap_smaller_than_faces():
    rng = np.random.RandomState(3)
    xy = rng.uniform(5, 59, (6, 3, 2)).astype(np.float32)
    z = np.linspace(-0.5, 0.5, 6).astype(np.float32)[:, None]
    face_verts = _screen_face(xy, z=z)
    face_attrs = rng.uniform(0, 1, (6, 3, 1)).astype(np.float32)
    background = np.zeros((64, 64, 1), np.float32)
    pix, fid, _, ref_pix, ref_fid, _ = _run_both(
        face_verts, face_attrs, background,
        RasterConfig(tile_h=32, tile_w=128, bin_cap=8),
    )
    mismatch = (fid != ref_fid).mean()
    assert mismatch < 0.002


def test_auto_bin_cap_no_overflow_dense_scene():
    """High face density at small resolution must not hit the auto cap
    (regression: the fixed 1024 cap truncated busy tiles at 256^2/10k)."""
    from dirt_tpu.core import matrices, mesh
    from dirt_tpu.ops.raster import RasterConfig, check_bin_overflow
    from dirt_tpu.ops.triangle_setup import screen_from_clip

    verts_obj, faces, _ = mesh.uv_sphere(n_lat=40, n_lon=40)
    mv = matrices.compose(
        matrices.rodrigues(jnp.array([0.4, 0.3, 0.0])),
        matrices.translation(jnp.array([0.0, 0.0, -3.0])),
    )
    proj = matrices.perspective_projection(0.1, 20.0, 0.045, 1.0)
    clip = matrices.transform_homogeneous(
        jnp.asarray(verts_obj), matrices.compose(mv, proj))
    faces = jnp.asarray(faces)
    size = 128
    bg = jnp.zeros((size, size, 2), jnp.float32)
    vs = screen_from_clip(clip, size, size)
    colors = jnp.ones((len(verts_obj), 2), jnp.float32)
    ov = check_bin_overflow(
        vs[faces], colors[faces], bg, RasterConfig())
    assert not bool(jnp.any(ov))


# ---------------------------------------------------------------------------
# v2 lane-packed engine: identical semantics to the v1 dense path.
# ---------------------------------------------------------------------------

import pytest

PACKED = RasterConfig(engine="packed")


@pytest.mark.parametrize("case", [
    pytest.param("single", marks=pytest.mark.slow),
    "depth", "perspective",
    pytest.param("odd_size", marks=pytest.mark.slow),
    "soup", "windings",
])
def test_packed_engine_matches_oracle(case):
    rng = np.random.RandomState(11)
    if case == "single":
        face_verts = _screen_face(
            [[[10.3, 50.2], [54.1, 49.7], [32.2, 10.6]]])
        face_attrs = np.ones((1, 3, 1), np.float32)
        background = np.zeros((64, 64, 1), np.float32)
    elif case == "depth":
        tri = [[8.2, 55.3], [56.9, 54.8], [31.4, 8.9]]
        face_verts = np.stack(
            [_screen_face([tri], z=0.5)[0], _screen_face([tri], z=-0.5)[0]])
        face_attrs = rng.rand(2, 3, 2).astype(np.float32)
        background = np.zeros((64, 64, 2), np.float32)
    elif case == "perspective":
        face_verts = np.array(
            [[[4.2, 4.3, -0.5, 1.0], [59.6, 4.1, 0.5, 0.2],
              [30.9, 59.8, 0.0, 0.6]]], np.float32)
        face_attrs = np.array([[[0.0], [1.0], [0.5]]], np.float32)
        background = np.zeros((64, 64, 1), np.float32)
    elif case == "odd_size":
        face_verts = _screen_face([[[9.3, 80.2], [95.1, 76.7], [52.2, 9.6]]])
        face_attrs = np.ones((1, 3, 2), np.float32) * np.array(
            [0.3, 0.9], np.float32)
        background = np.zeros((100, 130, 2), np.float32)
    elif case == "windings":
        ccw = [[10.3, 50.2], [54.1, 49.7], [32.2, 10.6]]
        face_verts = _screen_face([ccw, [ccw[0], ccw[2], ccw[1]]])
        face_attrs = np.ones((2, 3, 1), np.float32)
        background = np.zeros((64, 64, 1), np.float32)
    else:  # soup
        num_faces = 60
        height, width = 96, 160
        centers = rng.uniform(
            [10, 10], [width - 10, height - 10], (num_faces, 1, 2))
        offsets = rng.uniform(-25, 25, (num_faces, 3, 2))
        xy = (centers + offsets).astype(np.float32)
        z = rng.uniform(-0.9, 0.9, (num_faces, 1)).astype(np.float32)
        face_verts = _screen_face(xy, z=z)
        face_attrs = rng.uniform(0, 1, (num_faces, 3, 4)).astype(np.float32)
        background = rng.uniform(0, 1, (height, width, 4)).astype(np.float32)

    pix, fid, zbuf, ref_pix, ref_fid, ref_z = _run_both(
        face_verts, face_attrs, background, PACKED)
    mismatch = fid != ref_fid
    assert mismatch.mean() < 0.002, f"{case}: {mismatch.mean():.4f}"
    agree = ~mismatch
    np.testing.assert_allclose(pix[agree], ref_pix[agree], atol=1e-4)
    covered = (fid >= 0) & agree
    np.testing.assert_allclose(zbuf[covered], ref_z[covered], atol=1e-4)


def test_packed_engine_bitwise_matches_dense():
    """Packed and dense engines share plane setup and z rules: identical
    fid maps and bitwise-close images on the same scene."""
    rng = np.random.RandomState(23)
    num_faces = 80
    height, width = 128, 256
    centers = rng.uniform(
        [5, 5], [width - 5, height - 5], (num_faces, 1, 2))
    xy = (centers + rng.uniform(-20, 20, (num_faces, 3, 2))).astype(
        np.float32)
    z = rng.uniform(-0.9, 0.9, (num_faces, 1)).astype(np.float32)
    face_verts = _screen_face(xy, z=z)
    face_attrs = rng.rand(num_faces, 3, 3).astype(np.float32)
    background = rng.rand(height, width, 3).astype(np.float32)

    args = (jnp.asarray(face_verts), jnp.asarray(face_attrs),
            jnp.asarray(background))
    pix_d, fid_d, z_d, _ = _raster_jit(
        *args, RasterConfig(engine="dense"))
    pix_p, fid_p, z_p, _ = _raster_jit(*args, PACKED)
    np.testing.assert_array_equal(np.asarray(fid_d), np.asarray(fid_p))
    np.testing.assert_allclose(
        np.asarray(pix_d), np.asarray(pix_p), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(z_d), np.asarray(z_p), atol=1e-6)
