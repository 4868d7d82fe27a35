"""Pallas forward rasterization kernel.

TPU-native replacement for the reference's GL forward op
(``csrc/rasterise_egl.cpp`` — REGISTER_OP("Rasterise"); SURVEY.md section
2.1): the grid walks image tiles; each grid step scan-converts that tile's
binned faces with a z-buffered fori_loop. All per-pixel work is affine plane
evaluation on the VPU plus one reciprocal for the perspective division.

Data movement (TPU-first design): the packed per-face plane table
(geometry planes + attribute numerator planes, one row per face) stays
**resident in VMEM** for the whole grid, and the kernel gathers each binned
face's row with a dynamic sublane index. Per-tile face-id lists are small
int32 blocks in SMEM, so loop indices and ids are scalar reads. This
replaces the XLA-level ``table[bins]`` pre-gather, which materializes a
[T, cap, width] tensor through TPU's slow row-gather path (measured ~35 ms
for 256x1024 rows — more than the whole kernel).

Layouts: images are channels-first [C, H, W] inside the op (lane dimension =
W, 128-aligned); the public wrapper converts from/to [H, W, C].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dirt_tpu import config as cfg
from dirt_tpu.ops.binning import CHUNK
from dirt_tpu.ops.triangle_setup import GEO_USED

BIG_Z = 3.0e38  # z-buffer clear value (acts as +inf in f32 compares)


def _fwd_kernel(
    counts_ref, bins_ref, table_ref, bg_ref,
    pix_ref, fid_ref, z_ref,
    *, channels: int, tile_h: int, tile_w: int, tiles_x: int,
):
    t = pl.program_id(0)
    ty = t // tiles_x
    tx = t % tiles_x

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xg = (tx * tile_w + col).astype(jnp.float32) + 0.5
    yg = (ty * tile_h + row).astype(jnp.float32) + 0.5

    count = counts_ref[t]  # scalar-prefetch array, full [T] in SMEM

    def body(i, carry):
        zbuf, fid, pix = carry
        face_id = bins_ref[0, 0, i]       # scalar read from SMEM
        g = table_ref[face_id, :]         # dynamic row gather from VMEM
        dx = xg - g[0]   # anchored coordinates (see triangle_setup)
        dy = yg - g[1]
        e0 = g[2] * dx + g[3] * dy + g[4]
        e1 = g[5] * dx + g[6] * dy + g[7]
        e2 = g[8] * dx + g[9] * dy + g[10]
        inside = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0
        zv = g[11] * dx + g[12] * dy + g[13]
        mask = inside & (zv < zbuf) & (zv >= -1.0) & (zv <= 1.0)
        den = g[14] * dx + g[15] * dy + g[16]
        recip = 1.0 / den
        new_pix = tuple(
            jnp.where(
                mask,
                (
                    g[GEO_USED + 3 * c] * dx
                    + g[GEO_USED + 3 * c + 1] * dy
                    + g[GEO_USED + 3 * c + 2]
                ) * recip,
                pix[c],
            )
            for c in range(channels)
        )
        zbuf = jnp.where(mask, zv, zbuf)
        fid = jnp.where(mask, face_id, fid)
        return zbuf, fid, new_pix

    init = (
        jnp.full((tile_h, tile_w), BIG_Z, jnp.float32),
        jnp.full((tile_h, tile_w), -1, jnp.int32),
        tuple(bg_ref[c] for c in range(channels)),
    )
    zbuf, fid, pix = jax.lax.fori_loop(0, count, body, init)

    z_ref[:] = zbuf
    fid_ref[:] = fid
    for c in range(channels):
        pix_ref[c] = pix[c]


def pack_face_table(geo, att):
    """Pack per-face geometry and attribute planes into one VMEM table.

    Returns [Fp, GEO_USED + 3C] f32 with one sentinel row appended (index
    F — the bin fill value; covers nothing, finite denominator) and rows
    padded to a multiple of 8 for sublane alignment. ``table[:F, :17]``
    round-trips geo's used columns; ``table[:F, 17:]`` is att.
    """
    num_faces = geo.shape[0]
    table = jnp.concatenate([geo[:, :GEO_USED], att], axis=1)
    width = table.shape[1]
    sentinel = jnp.zeros((1, width), jnp.float32)
    # Edge c0 values (offsets 4, 7, 10) = -1: nothing is inside.
    sentinel = sentinel.at[0, 4].set(-1.0).at[0, 7].set(-1.0)
    sentinel = sentinel.at[0, 10].set(-1.0)
    sentinel = sentinel.at[0, 16].set(1.0)  # den c0 = 1: finite reciprocal
    rows_padded = -(-(num_faces + 1) // 8) * 8
    pad = jnp.broadcast_to(sentinel, (rows_padded - num_faces, width))
    return jnp.concatenate([table, pad], axis=0)


def raster_forward(
    table, bins, counts, background_chw,
    *, tile_h: int, tile_w: int, interpret: bool | None = None,
):
    """Run the forward kernel over all tiles.

    Args:
        table: [Fp, GEO_USED + 3C] f32 packed face table (pack_face_table);
            stays VMEM-resident across the whole grid.
        bins: [T, cap] int32 face ids per tile (F = sentinel for empty
            slots); streamed to SMEM one tile row per grid step.
        counts: [T] int32.
        background_chw: [C, Hp, Wp] f32, already padded to tile multiples.
    Returns:
        pixels [C, Hp, Wp] f32, fid [Hp, Wp] int32, zbuf [Hp, Wp] f32.
    """
    channels, hp, wp = background_chw.shape
    total, cap = bins.shape
    tiles_y, tiles_x = hp // tile_h, wp // tile_w
    assert tiles_y * tiles_x == total
    assert table.shape[1] == GEO_USED + 3 * channels
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _fwd_kernel,
        channels=channels,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
    )

    img_map = lambda t: (0, t // tiles_x, t % tiles_x)
    flat_map = lambda t: (t // tiles_x, t % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts: full [T] array in SMEM
        grid=(total,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap), lambda t, c: (t, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                table.shape, lambda t, c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (channels, tile_h, tile_w),
                lambda t, c: img_map(t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (channels, tile_h, tile_w),
                lambda t, c: img_map(t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_h, tile_w), lambda t, c: flat_map(t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_h, tile_w), lambda t, c: flat_map(t),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        interpret=interpret,
    )(counts, bins[:, None, :], table, background_chw)


def _fwd_csr_kernel(
    meta_ref, ids_ref, table_ref, bg_ref,
    pix_ref, fid_ref, z_ref,
    *, channels: int, tile_h: int, tile_w: int, tiles_x: int, total: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        z_ref[:] = jnp.full((tile_h, tile_w), BIG_Z, jnp.float32)
        fid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        for c in range(channels):
            pix_ref[c] = bg_ref[c]

    count = meta_ref[total + t]
    base = j * CHUNK

    @pl.when(base < count)
    def _():
        ty = t // tiles_x
        tx = t % tiles_x
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        xg = (tx * tile_w + col).astype(jnp.float32) + 0.5
        yg = (ty * tile_h + row).astype(jnp.float32) + 0.5

        def body(i, carry):
            zbuf, fid, pix = carry
            face_id = ids_ref[0, 0, i]
            g = table_ref[i, :]
            dx = xg - g[0]
            dy = yg - g[1]
            e0 = g[2] * dx + g[3] * dy + g[4]
            e1 = g[5] * dx + g[6] * dy + g[7]
            e2 = g[8] * dx + g[9] * dy + g[10]
            inside = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0
            zv = g[11] * dx + g[12] * dy + g[13]
            mask = inside & (zv < zbuf) & (zv >= -1.0) & (zv <= 1.0)
            den = g[14] * dx + g[15] * dy + g[16]
            recip = 1.0 / den
            new_pix = tuple(
                jnp.where(
                    mask,
                    (
                        g[GEO_USED + 3 * c] * dx
                        + g[GEO_USED + 3 * c + 1] * dy
                        + g[GEO_USED + 3 * c + 2]
                    ) * recip,
                    pix[c],
                )
                for c in range(channels)
            )
            zbuf = jnp.where(mask, zv, zbuf)
            fid = jnp.where(mask, face_id, fid)
            return zbuf, fid, new_pix

        init = (z_ref[:], fid_ref[:], tuple(pix_ref[c] for c in range(channels)))
        n = jnp.minimum(count - base, CHUNK)
        zbuf, fid, pix = jax.lax.fori_loop(0, n, body, init)
        z_ref[:] = zbuf
        fid_ref[:] = fid
        for c in range(channels):
            pix_ref[c] = pix[c]


def raster_forward_csr(
    binned_table, entry_face, start_block, counts, background_chw,
    *, tile_h: int, tile_w: int, max_chunks: int,
    interpret: bool | None = None,
):
    """Streaming forward: per-tile CHUNK-row blocks of a CSR face layout.

    Unlike :func:`raster_forward` the face table is NOT VMEM-resident;
    each grid step DMAs one CHUNK-row slice of the pre-gathered per-tile
    face rows (``binned_table[csr.entry_face]`` at the XLA level), so
    triangle count is bounded by HBM, not VMEM. Chunks past a tile's bin
    count are skipped.

    Args:
        binned_table: [n_pad, GEO_USED + 3C] f32 rows in CSR order.
        entry_face: [n_pad] int32 face id per row (sentinel F on padding).
        start_block: [T] int32 first CHUNK-block of each tile.
        counts: [T] int32.
        background_chw: [C, Hp, Wp] f32 padded to tile multiples.
        max_chunks: static bound on ceil(count / CHUNK) (= cap // CHUNK).
    """
    channels, hp, wp = background_chw.shape
    total = start_block.shape[0]
    n_pad, width_cols = binned_table.shape
    n_blocks = n_pad // CHUNK
    tiles_y, tiles_x = hp // tile_h, wp // tile_w
    assert tiles_y * tiles_x == total
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _fwd_csr_kernel,
        channels=channels, tile_h=tile_h, tile_w=tile_w,
        tiles_x=tiles_x, total=total,
    )
    meta = jnp.concatenate([start_block, counts]).astype(jnp.int32)
    ids3 = entry_face.reshape(n_blocks, 1, CHUNK)

    def row_map(t, j, m):
        return (jnp.minimum(m[t] + j, n_blocks - 1), 0)

    def row_map3(t, j, m):
        return (jnp.minimum(m[t] + j, n_blocks - 1), 0, 0)

    img_map = lambda t, j, m: (0, t // tiles_x, t % tiles_x)
    flat_map = lambda t, j, m: (t // tiles_x, t % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), row_map3, memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, width_cols), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), img_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((channels, tile_h, tile_w), img_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), flat_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), flat_map,
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        interpret=interpret,
    )(meta, ids3, binned_table, background_chw)
