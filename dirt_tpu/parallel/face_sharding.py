"""Triangle-list (face) sharding across a mesh axis — the TP analogue.

SURVEY.md section 2.3 names per-chip triangle-list splitting as this
framework's closest analogue of tensor parallelism (VERDICT round 1,
missing #2): for meshes too large to bin/setup on every chip, the face
list is split across a mesh axis; every chip rasterizes ITS faces into a
full-image (z, global-face-id, color) partial and the partials composite
by a minimum-depth reduction with the single-device z-tie rule (lowest
global face id wins), so the sharded render is pixel-exact vs one device.

Compositing is two ``pmin`` collectives over ICI (z, then id-among-z
-winners) plus one masked ``psum`` for the winner's colors — O(H*W) bytes
per chip, no triangle-count-dependent communication.

Backward (custom_vjp): the composite image/fid/zbuf are replicated after
the reduction, so each chip recomputes the per-pixel cotangent fields on
the COMPOSITE maps (occlusion boundaries between faces of different
shards are seen exactly — the DIRT front-face rule needs the composite's
neighbor content) and scatters only the pixels its own faces won (fid in
the shard's global id range). Per-face gradients therefore stay
shard-local — nothing to all-reduce — matching how tensor-parallel
layers keep their weight gradients local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dirt_tpu.ops.raster import RasterConfig, _forward_impl
from dirt_tpu.ops.raster_bwd import backward_jax
from dirt_tpu.ops.raster_fwd import BIG_Z
from dirt_tpu.ops.triangle_setup import screen_from_clip, setup_planes

_BIG_ID = jnp.int32(2**30)


def _make_face_shard_op(config: RasterConfig, axis,
                        height: int, width: int):
    """custom_vjp: local faces -> composited full image (+ aux maps)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def shard_op(fv_local, fa_local, background):
        out, _ = _fwd(fv_local, fa_local, background)
        return out

    def _fwd(fv_local, fa_local, background):
        f_local = fv_local.shape[0]
        channels = fa_local.shape[-1]
        offset = jax.lax.axis_index(axis) * f_local
        neutral = jnp.zeros((height, width, channels), jnp.float32)
        pix_l, fid_l, z_l, _bins = _forward_impl(
            fv_local, fa_local, neutral, config
        )
        covered_l = fid_l >= 0
        gid = jnp.where(covered_l, fid_l + offset, _BIG_ID)
        zkey = jnp.where(covered_l, z_l, BIG_Z)

        # Lexicographic (z, gid) min across the face axis: single-device
        # tie rule (lowest global face id wins at equal z).
        zmin = jax.lax.pmin(zkey, axis)
        gid_at = jnp.where(zkey == zmin, gid, _BIG_ID)
        gmin = jax.lax.pmin(gid_at, axis)
        mine = (zkey == zmin) & (gid == gmin)

        covered = gmin < _BIG_ID
        pix = jax.lax.psum(jnp.where(mine[..., None], pix_l, 0.0), axis)
        # Composite over the background INSIDE the op: the boundary
        # gradient model needs the true image values and the upstream
        # gradient at BACKGROUND pixels too (silhouette pairs), so the
        # differentiation boundary must see the full image.
        pix = jnp.where(covered[..., None], pix, background)
        fid_g = jnp.where(covered, gmin, -1)
        zbuf = jnp.where(covered, zmin, BIG_Z)
        out = (pix, fid_g, zbuf)
        return out, (fv_local, fa_local, pix, fid_g, zbuf)

    def _bwd(residuals, cotangents):
        fv_local, fa_local, pix, fid_g, zbuf = residuals
        # The caller slices a per-device row slab out of the replicated
        # composite (so the output spec is honestly sharded); the
        # cotangent is therefore zero outside this device's slab and one
        # psum reassembles the full image gradient on every shard —
        # independent of shard_map's replicated-output transpose rules.
        grad_pixels = jax.lax.psum(cotangents[0], axis)
        f_local = fv_local.shape[0]
        offset = jax.lax.axis_index(axis) * f_local
        n = jax.lax.axis_size(axis)

        # Own pixels: those my shard's faces won. Other shards' pixels
        # keep the composite data for occlusion-aware boundary pairs but
        # never act as the front/interior pixel here (fid -> -1, exactly
        # how a background neighbor is treated by the pair rules).
        owned = (fid_g >= offset) & (fid_g < offset + f_local)
        fid_local = jnp.where(owned, fid_g - offset, -1)

        def planes(fv, fa):
            geo, att, _ = setup_planes(fv, fa)
            return geo, att

        (geo, att), vjp_fn = jax.vjp(planes, fv_local, fa_local)
        d_geo, d_att, _ = backward_jax(
            geo, att, fid_local, zbuf, pix, grad_pixels
        )
        d_fv, d_fa = vjp_fn((d_geo, d_att))
        # Background gradient uses the COMPOSITE coverage (pixels owned
        # by other shards are covered, even though they carry fid -1 in
        # this shard's local map). Every shard computes the identical
        # full-image d_bg; the all_gather transpose in the caller psums
        # the n copies, so each contributes 1/n.
        d_bg = jnp.where((fid_g >= 0)[..., None], 0.0, grad_pixels)
        return d_fv, d_fa, d_bg / n

    shard_op.defvjp(_fwd, _bwd)
    return shard_op


def rasterise_face_sharded(
    background, vertices, vertex_colors, faces, mesh, axis: str = "faces",
    config: RasterConfig | None = None,
):
    """Face-sharded equivalent of ``dirt_tpu.rasterise`` (pixel-exact).

    Args:
        background: [H, W, C] (replicated).
        vertices: [V, 4] clip space (replicated).
        vertex_colors: [V, C] (replicated).
        faces: [F, 3] int32; F must be divisible by ``mesh.shape[axis]``
            (pad with degenerate faces upstream if needed).
        mesh: Mesh containing ``axis``.
    Returns:
        [H, W, C] image equal to the single-device render; differentiable
        w.r.t. background, vertices, vertex_colors (vertex gradients
        assemble from the shards' disjoint per-face contributions).
    """
    height, width, channels = background.shape
    config = (config or RasterConfig()).concrete(height)
    faces = jnp.asarray(faces, jnp.int32)
    num_faces = faces.shape[0]
    n = mesh.shape[axis]
    if num_faces % n:
        raise ValueError(f"faces ({num_faces}) must divide by {n}")
    f_local = num_faces // n

    shard_op = _make_face_shard_op(config, axis, height, width)

    n_ax = mesh.shape[axis]
    slab = height // n_ax

    def device_fn(fv_shard, fa_shard, bg_slab):
        # The background also enters SHARDED (row slabs) and is
        # re-assembled with all_gather: primitive transposes (gather <->
        # psum+slice) make both image and background cotangents exact
        # without relying on shard_map's replicated-operand conventions.
        bg = jax.lax.all_gather(bg_slab, axis, axis=0, tiled=True)
        pix, fid_g, zbuf = shard_op(fv_shard[0], fa_shard[0], bg)
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(pix, i * slab, slab, 0)

    verts_screen = screen_from_clip(
        jnp.asarray(vertices, jnp.float32), height, width
    )
    face_verts = verts_screen[faces].reshape(n, f_local, 3, 4)
    face_attrs = jnp.asarray(vertex_colors, jnp.float32)[faces].reshape(
        n, f_local, 3, channels
    )

    if height % n:
        raise ValueError(f"height ({height}) must divide by {n}")
    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(
        face_verts, face_attrs, jnp.asarray(background, jnp.float32)
    )
