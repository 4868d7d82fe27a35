"""Fused backward kernel: gather + per-pixel cotangents + face scatter.

One Pallas pass per tile replaces three XLA/Pallas stages of the backward
(the [H*W, 17] face-row gather (~2.5 ms at 1024^2 on v5e), the per-pixel
cotangent fields (~1.3 ms of HBM round-trips), and the standalone scatter
kernel (~1.5 ms)):

  phase A (per slot-chunk): gather the owning face's geometry row per
      pixel as an MXU matmul  g16[17, px] += rows[CHUNK, 17]^T @ onehot,
      with onehot[s, p] = (bin id s == fid p);
  phase B (once per tile): evaluate the interior + occlusion-boundary
      cotangent fields on the tile (VPU; shares
      ``raster_bwd.pixel_cotangents_core`` with the XLA engine, neighbor
      maps passed in so cross-tile pairs are exact);
  phase C (per slot-chunk): scatter  rows[CHUNK, K] = onehot @ cot[K, px]^T
      and accumulate into the VMEM-resident per-face table.

Grid is (tiles, 2 * chunks + 1); chunks beyond a tile's bin count are
skipped, so chunk work tracks actual occupancy. Dense-path only (the face
table must fit the [T*cap, 17] pre-gather; the CSR path keeps the split
kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dirt_tpu import config as cfg
from dirt_tpu.ops.binning import CHUNK
from dirt_tpu.ops.raster_bwd import (
    GEO_DEN,
    GEO_EDGE,
    pixel_cotangents_core,
)

G_ROWS = 17   # geometry plane columns used by the cotangent engine


def _fused_kernel(
    counts_ref, bins_smem_ref, ids_ref, rows17_ref,
    fid_ref, zbuf_ref, pix_ref, grad_ref, nfid_ref, nz_ref, sval_ref,
    out_ref,
    g16_scratch, cot_scratch, rows_scratch,
    *, k_cols: int, channels: int, tile_h: int, tile_w: int,
    tiles_x: int, n_chunks: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    px = tile_h * tile_w
    count = counts_ref[t]

    @pl.when((t == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j == 0)
    def _():
        g16_scratch[:] = jnp.zeros_like(g16_scratch)

    # ---- phase A: per-pixel geometry-row gather via MXU ----------------
    @pl.when((j < n_chunks) & (j * CHUNK < count))
    def _():
        fid_flat = fid_ref[:].reshape(1, px)
        ids = ids_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)       # [CHUNK, px]
        g16_scratch[0:G_ROWS, :] += jax.lax.dot_general(
            rows17_ref[:], onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                     # [17, px]

    # ---- phase B: cotangent fields on the tile (VPU) -------------------
    @pl.when((j == n_chunks) & (count > 0))
    def _():
        g3d = g16_scratch[0:G_ROWS, :].reshape(G_ROWS, tile_h, tile_w)
        g16 = [g3d[k] for k in range(G_ROWS)]
        fid = fid_ref[:]
        covered = fid >= 0
        zbuf = zbuf_ref[:]
        pix = pix_ref[:]
        grad = grad_ref[:]
        nbrs = [
            (nfid_ref[c], nz_ref[c], sval_ref[c]) for c in range(4)
        ]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        xg = ((t % tiles_x) * tile_w + col).astype(jnp.float32) + 0.5
        yg = ((t // tiles_x) * tile_h + row).astype(jnp.float32) + 0.5

        d_geo, d_att = pixel_cotangents_core(
            g16, covered, fid, zbuf, pix, grad, nbrs, xg, yg
        )
        cot_cols = (
            [d_geo[GEO_EDGE + k] for k in range(9)]
            + [d_geo[GEO_DEN + k] for k in range(3)]
            + d_att
        )
        cot = jnp.stack(cot_cols, axis=0)                    # [K, th, tw]
        cot = jnp.where(covered[None], cot, 0.0)
        cot_scratch[:] = cot.reshape(k_cols, px)

    # ---- phase C: face scatter via MXU + row accumulate -----------------
    base = (j - n_chunks - 1) * CHUNK

    @pl.when((j > n_chunks) & (base < count))
    def _():
        fid_flat = fid_ref[:].reshape(1, px)
        ids = ids_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)       # [CHUNK, px]
        rows_scratch[:] = jax.lax.dot_general(
            onehot, cot_scratch[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                     # [CHUNK, K]

        def body(s, _):
            face = bins_smem_ref[0, 0, base + s]
            out_ref[face, :] = out_ref[face, :] + rows_scratch[s, :]
            return 0

        jax.lax.fori_loop(0, jnp.minimum(count - base, CHUNK), body, 0)


def fused_backward_rows(
    binned17, bins, counts, fid, zbuf, pix_cf, grad_cf,
    nfid4, nz4, sval4, num_rows: int,
    *, tile_h: int, tile_w: int, interpret: bool | None = None,
):
    """Per-face cotangent rows [12 + 3C columns] for the dense path.

    Args:
        binned17: [T * cap, G_ROWS] f32 geometry rows in bin-slot order
            (XLA row-gather of the face table's first 17 columns).
        bins: [T, cap] int32 (cap a CHUNK multiple; sentinel num_rows - 1).
        counts: [T] int32.
        fid: [Hp, Wp] int32; padding/-owned-elsewhere pixels MUST be -2 so
            they neither own cotangents nor form boundary pairs.
        zbuf: [Hp, Wp] f32 (BIG_Z at background/padding).
        pix_cf, grad_cf: [C, Hp, Wp] f32.
        nfid4, nz4, sval4: [4, Hp, Wp] neighbor maps over
            ``boundary_cases`` (from ``raster_bwd.neighbor_maps`` computed
            on the padded arrays).
        num_rows: F + 1 (sentinel row included).
    Returns:
        [num_rows_padded, 12 + 3C] f32; callers slice [:num_faces].
    """
    channels = pix_cf.shape[0]
    k_cols = 12 + 3 * channels
    total, cap = bins.shape
    hp, wp = fid.shape
    tiles_x = wp // tile_w
    assert (hp // tile_h) * tiles_x == total
    assert cap % CHUNK == 0 and binned17.shape == (total * cap, G_ROWS)
    n_chunks = cap // CHUNK
    rows_padded = -(-num_rows // 8) * 8
    px = tile_h * tile_w
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _fused_kernel,
        k_cols=k_cols, channels=channels, tile_h=tile_h, tile_w=tile_w,
        tiles_x=tiles_x, n_chunks=n_chunks,
    )

    def chunk_of(j):
        # Phase A chunk j; phase C chunk j - n - 1; clamp the B step.
        return jnp.clip(
            jnp.where(j < n_chunks, j, j - n_chunks - 1), 0, n_chunks - 1
        )

    bins3 = bins[:, None, :]
    ids_chunked = bins.reshape(total * n_chunks, 1, CHUNK)

    img = lambda t, j, c: (t // tiles_x, t % tiles_x)
    imgc = lambda t, j, c: (0, t // tiles_x, t % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total, 2 * n_chunks + 1),
        in_specs=[
            pl.BlockSpec((1, 1, cap), lambda t, j, c: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, CHUNK),
                lambda t, j, c, n=n_chunks: (t * n + chunk_of(j), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (CHUNK, G_ROWS),
                lambda t, j, c, n=n_chunks: (t * n + chunk_of(j), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile_h, tile_w), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows_padded, k_cols), lambda t, j, c: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((-(-G_ROWS // 8) * 8, px), jnp.float32),
            pltpu.VMEM((k_cols, px), jnp.float32),
            pltpu.VMEM((CHUNK, k_cols), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_padded, k_cols), jnp.float32),
        interpret=interpret,
    )(counts, bins3, ids_chunked, binned17,
      fid, zbuf, pix_cf, grad_cf, nfid4, nz4, sval4)


def _fused_csr_kernel(
    meta_ref, ids_ref, rows17_ref,
    fid_ref, zbuf_ref, pix_ref, grad_ref, nfid_ref, nz_ref, sval_ref,
    rows_out_ref,
    g16_scratch, cot_scratch,
    *, k_cols: int, channels: int, tile_h: int, tile_w: int,
    tiles_x: int, n_chunks: int, total: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    px = tile_h * tile_w
    count = meta_ref[total + t]

    @pl.when(j == 0)
    def _():
        g16_scratch[:] = jnp.zeros_like(g16_scratch)

    # ---- phase A: per-pixel geometry-row gather via MXU ----------------
    @pl.when((j < n_chunks) & (j * CHUNK < count))
    def _():
        fid_flat = fid_ref[:].reshape(1, px)
        ids = ids_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)
        g16_scratch[0:G_ROWS, :] += jax.lax.dot_general(
            rows17_ref[:], onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # ---- phase B: cotangent fields on the tile (VPU) -------------------
    @pl.when((j == n_chunks) & (count > 0))
    def _():
        g3d = g16_scratch[0:G_ROWS, :].reshape(G_ROWS, tile_h, tile_w)
        g16 = [g3d[k] for k in range(G_ROWS)]
        fid = fid_ref[:]
        covered = fid >= 0
        nbrs = [(nfid_ref[c], nz_ref[c], sval_ref[c]) for c in range(4)]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        xg = ((t % tiles_x) * tile_w + col).astype(jnp.float32) + 0.5
        yg = ((t // tiles_x) * tile_h + row).astype(jnp.float32) + 0.5
        d_geo, d_att = pixel_cotangents_core(
            g16, covered, fid, zbuf_ref[:], pix_ref[:], grad_ref[:],
            nbrs, xg, yg,
        )
        cot_cols = (
            [d_geo[GEO_EDGE + k] for k in range(9)]
            + [d_geo[GEO_DEN + k] for k in range(3)]
            + d_att
        )
        cot = jnp.stack(cot_cols, axis=0)
        cot = jnp.where(covered[None], cot, 0.0)
        cot_scratch[:] = cot.reshape(k_cols, px)

    # ---- phase C: emit compact per-bin-entry rows -----------------------
    base = (j - n_chunks - 1) * CHUNK

    @pl.when((j > n_chunks) & (base >= count))
    def _():
        # Inactive C steps own an (aliased, clamped) output block: zero it
        # so no garbage reaches the segment reduce. Phase A/B write-backs
        # of the same blocks are always overwritten by the later C step.
        rows_out_ref[:] = jnp.zeros_like(rows_out_ref)

    @pl.when((j > n_chunks) & (base < count))
    def _():
        fid_flat = fid_ref[:].reshape(1, px)
        ids = ids_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)
        rows_out_ref[:] = jax.lax.dot_general(
            onehot, cot_scratch[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def fused_backward_rows_csr(
    binned17, entry_face, start_block, counts, fid, zbuf, pix_cf, grad_cf,
    nfid4, nz4, sval4, num_faces: int,
    *, tile_h: int, tile_w: int, max_chunks: int,
    interpret: bool | None = None,
):
    """CSR-streaming fused backward: compact rows + one segment-sum.

    Same phases as :func:`fused_backward_rows`, but bin chunks are
    addressed through the CSR block starts (scalar-prefetched, like the
    streaming forward) and phase C writes compact [CHUNK, K] row blocks in
    the CSR layout instead of accumulating a VMEM-resident face table
    (which stops fitting above ~100k faces). Returns [num_faces, K].
    """
    channels = pix_cf.shape[0]
    k_cols = 12 + 3 * channels
    total = start_block.shape[0]
    n_pad = entry_face.shape[0]
    n_blocks = n_pad // CHUNK
    hp, wp = fid.shape
    tiles_x = wp // tile_w
    assert (hp // tile_h) * tiles_x == total
    assert binned17.shape == (n_pad, G_ROWS)
    px = tile_h * tile_w
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _fused_csr_kernel,
        k_cols=k_cols, channels=channels, tile_h=tile_h, tile_w=tile_w,
        tiles_x=tiles_x, n_chunks=max_chunks, total=total,
    )
    meta = jnp.concatenate([start_block, counts]).astype(jnp.int32)
    ids3 = entry_face.reshape(n_blocks, 1, CHUNK)

    def chunk_of(j, n=max_chunks):
        return jnp.clip(
            jnp.where(j < n, j, j - n - 1), 0, n - 1
        )

    def row_map3(t, j, m):
        return (jnp.minimum(m[t] + chunk_of(j), n_blocks - 1), 0, 0)

    def row_map(t, j, m):
        return (jnp.minimum(m[t] + chunk_of(j), n_blocks - 1), 0)

    img = lambda t, j, m: (t // tiles_x, t % tiles_x)
    imgc = lambda t, j, m: (0, t // tiles_x, t % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total, 2 * max_chunks + 1),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), row_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, G_ROWS), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, k_cols), row_map, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((-(-G_ROWS // 8) * 8, px), jnp.float32),
            pltpu.VMEM((k_cols, px), jnp.float32),
        ],
    )
    rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k_cols), jnp.float32),
        interpret=interpret,
    )(meta, ids3, binned17, fid, zbuf, pix_cf, grad_cf, nfid4, nz4, sval4)
    return jax.ops.segment_sum(
        rows, entry_face, num_segments=num_faces + 1
    )[:num_faces]
