"""Gradient-overlapped collectives: row-chunked backward + per-chunk psum.

SURVEY.md section 5 (distributed comm): on a real pod the parameter-grad
all-reduce should ride ICI *while* the backward is still crunching pixel
tiles. shard_map's automatic transpose emits ONE psum after the whole
backward; this module restructures the slab backward into ``n_chunks``
row bands, each emitting its own ``psum`` of the partial parameter
gradients — giving XLA a dependency graph where chunk k's collective can
overlap chunk k+1's compute. (The reference is single-GPU — no analogue;
this is the TPU build's own scaling axis, deferred from round 2 as
ROADMAP #7.)

The win itself cannot be measured on this machine (one real chip); what
IS verified here (on the 8-device CPU mesh, `tests/test_overlap.py`) is
exactness: chunked + overlapped gradients == the unsharded `jax.grad`.

Design notes:

* The forward runs once per slab (any engine). The backward's pixel
  cotangent pass (`raster_bwd.pixel_cotangents_core`) is evaluated per
  row band on SLICED arrays — boundary pairs whose two pixels fall in
  different bands (or different slabs) are still each counted exactly
  once, because the neighbor maps are precomputed on the halo-extended
  slab (`sharding._halo_neighbor_stacks`) and sliced along with the
  band: the band owning the pair's front pixel sees the back pixel's
  data in its neighbor stack.
* Each band's per-face rows reduce to parameter space through the SAME
  `jax.vjp` chain as the one-shot path (setup_planes -> screen gather ->
  vertices), then `lax.psum` immediately. Summing psum'd chunks equals
  psum'd sums (the one-shot gradient) exactly up to f32 reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dirt_tpu.ops.raster import RasterConfig, _forward_impl
from dirt_tpu.ops.raster_bwd import (
    GEO_DEN,
    GEO_EDGE,
    anchor_cotangents,
    pixel_cotangents_core,
)
from dirt_tpu.ops.raster_fwd import BIG_Z
from dirt_tpu.ops.triangle_setup import (
    GEO_WIDTH,
    screen_from_clip,
    setup_planes,
)
from dirt_tpu.parallel.sharding import _halo_neighbor_stacks


def _band_face_rows(geo, att, fid_b, zbuf_b, pix_b, grad_b, nbrs_b, y0,
                    num_faces: int):
    """Per-face cotangent rows for one row band (pure-JAX engine).

    Mirrors ``raster_bwd.backward_jax`` but on row-sliced arrays with
    externally supplied neighbor stacks and a global row offset ``y0``
    (band rows are slab-local ``y0 .. y0 + band_h``).
    Returns (d_geo [F, GEO_WIDTH], d_att [F, 3C]) WITHOUT anchor
    cotangents (derived once after summing bands).
    """
    band_h, width = fid_b.shape
    channels = pix_b.shape[-1]
    covered = fid_b >= 0
    safe_fid = jnp.maximum(fid_b, 0)
    g16cf = jnp.transpose(geo[safe_fid], (2, 0, 1))
    pix_cf = jnp.transpose(pix_b, (2, 0, 1))
    grad_cf = jnp.transpose(grad_b, (2, 0, 1))

    col = jnp.arange(width, dtype=jnp.float32) + 0.5
    row = y0 + jnp.arange(band_h, dtype=jnp.float32) + 0.5
    xg = jnp.broadcast_to(col[None, :], (band_h, width))
    yg = jnp.broadcast_to(row[:, None], (band_h, width))

    nbrs = [
        (nbrs_b[0][i], nbrs_b[1][i], nbrs_b[2][i]) for i in range(4)
    ]
    d_geo_cols, d_att_cols = pixel_cotangents_core(
        g16cf, covered, fid_b, zbuf_b, pix_cf, grad_cf, nbrs, xg, yg
    )

    seg = safe_fid.reshape(-1)
    weight = covered.reshape(-1, 1).astype(jnp.float32)
    d_geo_pix = jnp.stack(d_geo_cols, axis=0).reshape(GEO_WIDTH, -1).T
    d_att_pix = jnp.stack(d_att_cols, axis=0).reshape(
        3 * channels, -1
    ).T
    d_geo = jax.ops.segment_sum(
        d_geo_pix * weight, seg, num_segments=num_faces
    )
    d_att = jax.ops.segment_sum(
        d_att_pix * weight, seg, num_segments=num_faces
    )
    return d_geo, d_att


def overlapped_loss_and_grads(
    background, vertices, vertex_colors, faces, target, mesh,
    axis: str = "tiles", config: RasterConfig | None = None,
    n_chunks: int = 2,
):
    """L2 render loss + gradients with row-chunked, per-chunk-psum backward.

    Args:
        background / target: [H, W, C] (sharded over rows by ``axis``).
        vertices: [V, 4] clip space (replicated); vertex_colors [V, C].
        faces: [F, 3] int32 static.
        mesh: Mesh containing ``axis``; n_chunks: row bands per slab.
    Returns:
        (loss [], d_vertices [V, 4], d_colors [V, C], d_background
        [H, W, C]) — loss/parameter grads replicated, d_background
        sharded. Gradients equal ``jax.grad`` of
        ``sum((rasterise(...) - target)**2)`` with ``clip=False``.
    """
    height, width, _ = background.shape
    n = mesh.shape[axis]
    config = (config or RasterConfig()).concrete(height // n)
    if height % (n * config.tile_h) != 0:
        raise ValueError("height must divide devices * tile_h")
    faces = jnp.asarray(faces, jnp.int32)
    num_faces = faces.shape[0]
    slab_h = height // n
    if slab_h % n_chunks != 0:
        raise ValueError("slab height must divide n_chunks")
    band_h = slab_h // n_chunks

    def per_device(bg_slab, target_slab, verts, colors):
        idx = jax.lax.axis_index(axis)
        row0 = (idx * slab_h).astype(jnp.float32)

        def to_planes(verts, colors):
            vs = screen_from_clip(verts, height, width)
            fv = vs[faces] - jnp.array([0.0, 1.0, 0.0, 0.0]) * row0
            fa = colors[faces]
            geo, att, _ = setup_planes(fv, fa)
            return geo, att

        def to_faces(verts, colors):
            vs = screen_from_clip(verts, height, width)
            fv = vs[faces] - jnp.array([0.0, 1.0, 0.0, 0.0]) * row0
            return fv, colors[faces]

        fv, fa = to_faces(verts, colors)
        (geo, att), vjp_planes = jax.vjp(to_planes, verts, colors)
        pixels, fid, zbuf, _ = _forward_impl(fv, fa, bg_slab, config)

        diff = pixels - target_slab
        loss = jax.lax.psum(jnp.sum(diff * diff), axis)
        grad_pixels = 2.0 * diff

        wp = -(-width // config.tile_w) * config.tile_w
        nfid4, nz4, sval4 = _halo_neighbor_stacks(
            fid, zbuf, pixels, grad_pixels, axis, slab_h, wp
        )
        nfid4, nz4, sval4 = (
            nfid4[:, :, :width], nz4[:, :, :width], sval4[:, :, :width]
        )

        d_geo_total = jnp.zeros((num_faces, GEO_WIDTH), jnp.float32)
        d_att_total = jnp.zeros_like(att)
        covered = fid >= 0
        d_bg = jnp.where(covered[..., None], 0.0, grad_pixels)

        d_verts = jnp.zeros_like(verts)
        d_colors = jnp.zeros_like(colors)
        for k in range(n_chunks):
            rows = slice(k * band_h, (k + 1) * band_h)
            nbrs_b = (
                nfid4[:, rows], nz4[:, rows], sval4[:, rows]
            )
            d_geo_k, d_att_k = _band_face_rows(
                geo, att, fid[rows], zbuf[rows], pixels[rows],
                grad_pixels[rows], nbrs_b, float(k * band_h), num_faces,
            )
            d_geo_k = anchor_cotangents(geo, att, d_geo_k, d_att_k)
            d_verts_k, d_colors_k = vjp_planes((d_geo_k, d_att_k))
            # The per-chunk collective: on a pod this psum (ICI) can
            # overlap the NEXT band's cotangent pass (compute).
            d_verts = d_verts + jax.lax.psum(d_verts_k, axis)
            d_colors = d_colors + jax.lax.psum(d_colors_k, axis)
        return loss, d_verts, d_colors, d_bg

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(axis)),
        check_vma=False,
    )
    return fn(
        jnp.asarray(background, jnp.float32),
        jnp.asarray(target, jnp.float32),
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(vertex_colors, jnp.float32),
    )
