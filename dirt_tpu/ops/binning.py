"""Tile binning: assign faces to image tiles (pure JAX, static shapes).

The reference leans on GL's hardware binning; on TPU this is an explicit
pass (SURVEY.md sections 2.1 and 7). Overflow beyond the static caps is
*reported* (boolean flags), never silently dropped without a flag.

Two implementations:

* ``bin_faces`` — dense: a [num_tiles, F] overlap matrix compacted per row
  with top_k. O(T*F) memory/work; the fastest option for small scenes
  (<~20k faces) and supports faces of any screen size.
* ``bin_faces_csr`` — scalable: expand each face into its (tile, face)
  overlap pairs (capped at ``expand_cap`` tiles per face), sort pairs by
  (tile, face), and lay the per-tile runs out in a chunk-padded CSR layout
  that the streaming kernels consume directly (contiguous CHUNK-row blocks
  per tile, indexed by scalar-prefetched block starts). O(F * E log) work,
  no T*F matrix — this is the production path for large meshes
  (nvdiffrast-style binned software rasterization; PAPERS.md "Modular
  Primitives", "CuRast").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CHUNK = 128  # CSR chunk granularity (rows per streamed block)


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


class CSRBins(NamedTuple):
    """Chunk-padded CSR tile bins for the streaming kernels.

    ``entry_face[start_block[t] * CHUNK + i]`` for ``i < counts[t]`` are the
    face ids overlapping tile ``t`` in ascending order; slots between
    ``counts[t]`` and the next tile's start hold the sentinel id F. Every
    tile's run begins at a CHUNK-aligned row, so kernels can stream blocks
    ``start_block[t] + j`` for ``j in range(ceil(counts[t] / CHUNK))``.
    """

    entry_face: jax.Array   # [n_pad] int32, sentinel = F
    start_block: jax.Array  # [num_tiles] int32, in units of CHUNK rows
    counts: jax.Array       # [num_tiles] int32, clamped to cap
    overflow: jax.Array     # [] bool — any tile over cap OR face over
                            # expand_cap (its tail tiles were dropped)


def csr_pad_bound(num_faces: int, expand_cap: int, num_tiles: int) -> int:
    """Static upper bound on the padded CSR length."""
    pairs = num_faces * expand_cap
    return -(-pairs // CHUNK) * CHUNK + num_tiles * CHUNK


def auto_expand_cap(num_faces: int, num_tiles: int) -> int:
    """Default per-face tile-overlap cap.

    Expansion work is O(F * E), so large meshes (whose triangles are
    necessarily small relative to the tile grid) get a tight cap; low-poly
    scenes get one that lets a single face span the whole grid. Faces
    spanning more tiles than the cap are truncated and flagged via
    ``overflow`` — raise ``RasterConfig.expand_cap`` for scenes mixing
    huge triangle counts with individually huge triangles.
    """
    if num_faces > 65536:
        return 8
    target = max(16, (16 * num_tiles) // max(num_faces, 1))
    cap = 16
    while cap < target and cap < num_tiles:
        cap *= 2
    return min(max(cap, 16), max(num_tiles, 16))


def bin_faces_csr(
    bbox, height: int, width: int, tile_h: int, tile_w: int, cap: int,
    expand_cap: int,
) -> CSRBins:
    """Scalable pair-expansion binning (see module docstring).

    Args:
        bbox: [F, 4] int32 (xmin, xmax, ymin, ymax) inclusive pixel indices;
            empty boxes have max < min.
        cap: per-tile face cap (clamped, overflow-flagged); rounded up to a
            CHUNK multiple.
        expand_cap: max tiles a single face may overlap (truncated beyond,
            overflow-flagged).
    """
    bbox = jnp.asarray(bbox, jnp.int32)
    nf = bbox.shape[0]
    tiles_y, tiles_x = num_tiles(height, width, tile_h, tile_w)
    total = tiles_y * tiles_x
    cap = -(-cap // CHUNK) * CHUNK
    n_pad = csr_pad_bound(nf, expand_cap, total)

    txmin = bbox[:, 0] // tile_w
    txmax = bbox[:, 1] // tile_w
    tymin = bbox[:, 2] // tile_h
    tymax = bbox[:, 3] // tile_h
    valid = (bbox[:, 1] >= bbox[:, 0]) & (bbox[:, 3] >= bbox[:, 2])
    span_x = jnp.where(valid, txmax - txmin + 1, 0)
    span_y = jnp.where(valid, tymax - tymin + 1, 0)
    n_e = span_x * span_y
    face_overflow = n_e > expand_cap

    # Expand: pair e of face f covers tile (tymin + e // span_x,
    # txmin + e % span_x); pairs beyond n_e (or expand_cap) get the
    # sentinel tile id `total` and sort to the end.
    e = jnp.arange(expand_cap, dtype=jnp.int32)[None, :]          # [1, E]
    sx = jnp.maximum(span_x, 1)[:, None]
    ey = e // sx
    ex = e - ey * sx
    tile = (tymin[:, None] + ey) * tiles_x + (txmin[:, None] + ex)
    pair_valid = e < jnp.minimum(n_e, expand_cap)[:, None]
    tile = jnp.where(pair_valid, tile, total).astype(jnp.int32)   # [F, E]
    face = jnp.broadcast_to(
        jnp.arange(nf, dtype=jnp.int32)[:, None], tile.shape
    )

    tile_s, face_s = jax.lax.sort(
        (tile.reshape(-1), face.reshape(-1)), num_keys=2
    )
    npairs = tile_s.shape[0]

    # Per-tile raw counts / raw starts (T-sized vectorized binary search).
    tile_ids = jnp.arange(total, dtype=jnp.int32)
    starts_raw = jnp.searchsorted(tile_s, tile_ids).astype(jnp.int32)
    ends_raw = jnp.searchsorted(tile_s, tile_ids, side="right")
    counts_raw = (ends_raw - starts_raw).astype(jnp.int32)
    overflow = jnp.any(counts_raw > cap) | jnp.any(face_overflow & valid)
    counts = jnp.minimum(counts_raw, cap)
    padded_counts = -(-counts // CHUNK) * CHUNK
    start_block = (
        jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(padded_counts)[:-1]]) // CHUNK
    ).astype(jnp.int32)

    # Per-pair destination WITHOUT any [npairs]-sized gather from a small
    # table (slow on TPU): rank within run via cummax of run starts, and
    # the cumulative pad correction via a cumsum of per-run deltas placed
    # at run starts.
    iota = jnp.arange(npairs, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), tile_s[1:] != tile_s[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    rank = iota - run_start
    # At each run start: pad delta of the PREVIOUS run
    # (padded(min(raw, cap)) - raw); raw = this_start - prev_start.
    prev_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), run_start[:-1]])
    prev_raw = jnp.where(is_start, iota - prev_start, 0)
    prev_capped = jnp.minimum(prev_raw, cap)
    prev_padded = -(-prev_capped // CHUNK) * CHUNK
    delta = jnp.where(is_start, prev_padded - prev_raw, 0)
    delta = delta.at[0].set(0)
    cum_pad = jnp.cumsum(delta)
    dest = run_start + cum_pad + rank

    keep = (tile_s < total) & (rank < cap)
    dest = jnp.where(keep, dest, n_pad - 1)
    entry_face = jnp.full((n_pad,), nf, jnp.int32)
    entry_face = entry_face.at[dest].set(jnp.where(keep, face_s, nf))
    # Reset the dump slot (clobbered by dropped pairs). No kept pair can
    # land there: sum of padded runs <= ceil(F*E/CHUNK)*CHUNK +
    # T*(CHUNK-1) = n_pad - T < n_pad.
    entry_face = entry_face.at[n_pad - 1].set(nf)

    return CSRBins(
        entry_face=entry_face,
        start_block=start_block,
        counts=counts,
        overflow=overflow,
    )
