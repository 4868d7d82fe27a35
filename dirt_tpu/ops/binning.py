"""Tile binning: assign faces to image tiles (pure JAX, static shapes).

The reference leans on GL's hardware binning; on TPU this is an explicit
pass (SURVEY.md sections 2.1 and 7). Output shapes are static: a
[num_tiles, cap] slot table plus per-tile counts. Overflow beyond ``cap``
is *reported* (per-tile boolean), never silently dropped without a flag.

The current implementation materialises a [num_tiles, F] overlap matrix —
fine up to ~100k faces x ~1k tiles; a segment-sort variant is the planned
upgrade for larger scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BinningResult(NamedTuple):
    bins: jax.Array      # [num_tiles, cap] int32, face index or F (sentinel)
    counts: jax.Array    # [num_tiles] int32, clamped to cap
    overflow: jax.Array  # [num_tiles] bool, True where count exceeded cap


def num_tiles(height: int, width: int, tile_h: int, tile_w: int):
    return (-(-height // tile_h), -(-width // tile_w))


def bin_faces(
    bbox, height: int, width: int, tile_h: int, tile_w: int, cap: int
) -> BinningResult:
    """Bin faces by conservative bbox/tile overlap.

    Args:
        bbox: [F, 4] int32 (xmin, xmax, ymin, ymax) inclusive pixel indices;
            empty boxes have max < min.
    """
    bbox = jnp.asarray(bbox, jnp.int32)
    nf = bbox.shape[0]
    tiles_y, tiles_x = num_tiles(height, width, tile_h, tile_w)
    total = tiles_y * tiles_x

    txmin = bbox[:, 0] // tile_w
    txmax = bbox[:, 1] // tile_w
    tymin = bbox[:, 2] // tile_h
    tymax = bbox[:, 3] // tile_h

    tile_ids = jnp.arange(total, dtype=jnp.int32)
    tx = tile_ids % tiles_x
    ty = tile_ids // tiles_x

    overlap = (
        (txmin[None, :] <= tx[:, None])
        & (tx[:, None] <= txmax[None, :])
        & (tymin[None, :] <= ty[:, None])
        & (ty[:, None] <= tymax[None, :])
    )  # [total, F]

    raw_counts = jnp.sum(overlap, axis=1, dtype=jnp.int32)
    overflow = raw_counts > cap
    counts = jnp.minimum(raw_counts, cap)

    # Left-compact each row's set bits into face-id lists. top_k on a key
    # that is positive exactly on overlaps and decreasing in face index
    # yields the first `cap` overlapping ids in ascending order; it is the
    # fastest row compaction on TPU by a wide margin (vmap'd nonzero:
    # ~23 ms for 256x10k on v5e; top_k: ~0.5 ms).
    face_ids = jax.lax.broadcasted_iota(jnp.int32, (total, nf), 1)
    key = jnp.where(overlap, nf - face_ids, 0)
    val, idx = jax.lax.top_k(key, cap)
    bins = jnp.where(val > 0, idx, nf).astype(jnp.int32)
    return BinningResult(bins=bins, counts=counts, overflow=overflow)
