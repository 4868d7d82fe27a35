"""Pallas per-face gradient scatter: pixel cotangents -> face rows.

TPU-native replacement for the reference backward op's CUDA ``atomicAdd``
scatter of per-pixel gradients onto triangle vertices
(``csrc/rasterise_grad_egl.cu`` — SURVEY.md section 3.2). A flat
``segment_sum`` over H*W pixel rows costs ~10 ms at 1024^2 on v5e (XLA
scatter-add is row-serial); this kernel instead reduces each tile's pixels
onto that tile's binned faces with an MXU matmul against a one-hot
(face == pixel-owner) matrix, and accumulates rows into a per-face table
that stays VMEM-resident across the whole (sequential) grid — no
materialized [H*W, K] rows, no final segment reduce.

Grid: (tiles, slot-chunks). Chunks beyond the tile's bin count are skipped
(``pl.when``), so cost scales with *actual* bin occupancy, not the static
cap. Within a chunk the [CHUNK, K] partial rows are added into the face
table by a scalar loop of dynamic-row read-modify-writes (bin ids are
unique within a tile and the grid is sequential, so there are no races).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dirt_tpu import config as cfg
from dirt_tpu.ops.binning import CHUNK  # slots per MXU scatter step


def _scatter_kernel(
    counts_ref, bins_smem_ref, bins_vmem_ref, fid_ref, cot_ref,
    out_ref, rows_scratch,
    *, k_cols: int, tile_h: int, tile_w: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((t == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    count = counts_ref[t]
    base = j * CHUNK

    @pl.when(base < count)
    def _():
        px = tile_h * tile_w
        fid_flat = fid_ref[:].reshape(1, px)
        ids = bins_vmem_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)      # [CHUNK, px]
        cot = cot_ref[:].reshape(k_cols, px)                # [K, px]
        rows = jax.lax.dot_general(
            onehot, cot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                    # [CHUNK, K]
        rows_scratch[:] = rows

        def body(s, _):
            face = bins_smem_ref[0, 0, base + s]
            out_ref[face, :] = out_ref[face, :] + rows_scratch[s, :]
            return 0

        jax.lax.fori_loop(0, jnp.minimum(count - base, CHUNK), body, 0)


def scatter_to_faces(
    cot_cf, fid, bins, counts, num_rows: int,
    *, tile_h: int, tile_w: int, interpret: bool | None = None,
):
    """Sum per-pixel cotangent rows onto their owning face's row.

    Args:
        cot_cf: [K, Hp, Wp] f32 per-pixel cotangents, channels-first,
            padded to tile multiples; non-covered pixels must be zero.
        fid: [Hp, Wp] int32 owning face per pixel (-1 = background; padding
            must also be -1).
        bins: [T, cap] int32 per-tile face ids (``num_rows - pad`` sentinel
            for empty slots); cap must be a multiple of CHUNK (padded here
            if not). Every fid >= 0 in a tile must appear in that tile's
            bin list (guaranteed by the forward).
        counts: [T] int32.
        num_rows: number of face rows of the output (>= max id + 1,
            including the sentinel row).
    Returns:
        [num_rows_padded, K] f32 with num_rows_padded = num_rows rounded up
        to 8; callers slice [:num_faces].
    """
    k_cols, hp, wp = cot_cf.shape
    total, cap = bins.shape
    tiles_x = wp // tile_w
    assert (hp // tile_h) * tiles_x == total
    if cap % CHUNK:
        pad = CHUNK - cap % CHUNK
        bins = jnp.pad(bins, ((0, 0), (0, pad)), constant_values=num_rows - 1)
        cap += pad
    n_chunks = cap // CHUNK
    rows_padded = -(-num_rows // 8) * 8
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _scatter_kernel,
        k_cols=k_cols, tile_h=tile_h, tile_w=tile_w,
    )
    bins3 = bins[:, None, :]
    bins_chunked = bins.reshape(total * n_chunks, 1, CHUNK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap), lambda t, j, c: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, CHUNK),
                lambda t, j, c, n=n_chunks: (t * n + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_h, tile_w),
                lambda t, j, c: (t // tiles_x, t % tiles_x),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_cols, tile_h, tile_w),
                lambda t, j, c: (0, t // tiles_x, t % tiles_x),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows_padded, k_cols), lambda t, j, c: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((CHUNK, k_cols), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_padded, k_cols), jnp.float32),
        interpret=interpret,
    )(counts, bins3, bins_chunked, fid, cot_cf)


def _scatter_csr_kernel(
    meta_ref, ids_smem_ref, ids_vmem_ref, fid_ref, cot_ref,
    rows_ref,
    *, k_cols: int, tile_h: int, tile_w: int, total: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    count = meta_ref[total + t]
    base = j * CHUNK

    @pl.when(base >= count)
    def _():
        # Inactive steps still own an (aliased, clamped) output block:
        # zero it so no garbage reaches the segment reduce.
        rows_ref[:] = jnp.zeros_like(rows_ref)

    @pl.when(base < count)
    def _():
        px = tile_h * tile_w
        fid_flat = fid_ref[:].reshape(1, px)
        ids = ids_vmem_ref[0, 0, :].reshape(CHUNK, 1)
        onehot = (ids == fid_flat).astype(jnp.float32)      # [CHUNK, px]
        cot = cot_ref[:].reshape(k_cols, px)
        rows_ref[:] = jax.lax.dot_general(
            onehot, cot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def scatter_to_faces_csr(
    cot_cf, fid, entry_face, start_block, counts, num_faces: int,
    *, tile_h: int, tile_w: int, max_chunks: int,
    interpret: bool | None = None,
):
    """CSR-streaming variant of :func:`scatter_to_faces`.

    Emits compact per-bin-entry rows in the CSR layout (the same chunk
    blocks the streaming forward reads), then segment-sums them by entry
    face id — cost scales with actual bin occupancy, and no face-table
    VMEM residency is needed (scales to HBM-sized meshes).

    Returns [num_faces, K] f32.
    """
    k_cols, hp, wp = cot_cf.shape
    total = start_block.shape[0]
    n_pad = entry_face.shape[0]
    n_blocks = n_pad // CHUNK
    tiles_x = wp // tile_w
    assert (hp // tile_h) * tiles_x == total
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _scatter_csr_kernel,
        k_cols=k_cols, tile_h=tile_h, tile_w=tile_w, total=total,
    )
    meta = jnp.concatenate([start_block, counts]).astype(jnp.int32)
    ids3 = entry_face.reshape(n_blocks, 1, CHUNK)

    def row_map3(t, j, m):
        return (jnp.minimum(m[t] + j, n_blocks - 1), 0, 0)

    def out_map(t, j, m):
        return (jnp.minimum(m[t] + j, n_blocks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), row_map3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK), row_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_h, tile_w),
                lambda t, j, m: (t // tiles_x, t % tiles_x),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_cols, tile_h, tile_w),
                lambda t, j, m: (0, t // tiles_x, t % tiles_x),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, k_cols), out_map, memory_space=pltpu.VMEM
        ),
    )
    rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k_cols), jnp.float32),
        interpret=interpret,
    )(meta, ids3, ids3, fid, cot_cf)
    return jax.ops.segment_sum(
        rows, entry_face, num_segments=num_faces + 1
    )[:num_faces]
