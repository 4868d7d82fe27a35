"""Fused backward for the packed-subtile engine (round 2).

TPU-native equivalent of the reference's gradient op
(``csrc/rasterise_grad_egl.*`` — SURVEY.md sections 2.1, 3.2), third
generation: one Pallas pass over the SAME packed bins the forward used
(``binning.bin_faces_packed``), with a flat chunk grid (zero skipped
steps — the v1 fused backward's (tiles, 2*cap_chunks+1) grid burned
~1.2 us per mostly-skipped step, ~3 ms at 1024^2).

Per (128-row window, strip) with any binned content, ONE kernel step:

  gather   g = rows^T @ onehot            (MXU, HIGHEST — exact one-hot
           value transfer; a ones-column rides along as the "this
           window holds the pixel's winner" indicator, so windows/
           chunks compose without cross-talk)
  cotangents = pixel_cotangents_core      (VPU, shared with all other
           backward engines; neighbor maps precomputed at XLA level and
           pre-permuted to the flat-subtile layout)
  scatter  contrib = onehot @ cot^T       (MXU) -> written as compact
           per-entry rows (STATIC stores; in-kernel dynamic-row
           accumulation costs ~100-200 ns per row even with SMEM-sourced
           indices) and reduced to faces by one XLA segment_sum.

Duplicate-face guard: a face can be binned in several subtiles of one
strip (one row per lane group); the one-hot therefore also matches rows
to their OWN group's pixels (a static [rows, px] mask), so each pixel
pairs with exactly one row.

All image-space fields run in the flat-subtile layout
(``raster_fwd.flat_subtile_swap``) so pixel positions line up with the
forward's bins; compute stays on [8, 128]-shaped values (full vreg
utilization — a [1, 1024] strip-flat layout wastes 7/8 of every sublane
and made the cotangent core ~8x slower when tried).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dirt_tpu import config as cfg
from dirt_tpu.ops.binning import (
    GROUPS,
    PACK_CHUNK,
    PACK_ITERS,
    SUB_H,
    SUB_W,
)
from dirt_tpu.ops.raster_bwd import (
    GEO_DEN,
    GEO_EDGE,
    assemble_face_gradients,
    boundary_cases,
    pixel_cotangents_core,
)
from dirt_tpu.ops.raster_fwd import (
    BIG_Z,
    COL_ATT,
    COL_ID,
    flat_subtile_swap,
    flat_subtile_swap_pallas,
    pack_face_table_v2,
)

WINDOW = 128  # rows per matmul window (16 iterations)


def _dot3_onehot(values, onehot_bf16, dims):
    """f32-faithful values x one-hot matmul in 3 bf16 MXU passes.

    The one-hot side is exactly representable in bf16, so splitting only
    the VALUE side into three bf16 terms (hi + mid + lo covers the full
    24-bit significand) gives a faithful f32 product at half the cost of
    Precision.HIGHEST's 6 passes (Mosaic lacks the 3-pass HIGH mode, and
    1-pass DEFAULT rounds coefficients to bf16, flipping edge-sign tests
    in the cotangent core).
    """
    hi = values.astype(jnp.bfloat16)
    r1 = values - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(
            part, onehot_bf16, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _bwd_packed_kernel(
    meta_ref, rows_ref, fidflat_ref, bits_ref, pix_ref, grad_ref,
    sval_ref,
    out_ref,
    rows_scratch,
    *, channels: int, k_cols: int, col_one: int, tile_h: int,
    tile_w: int, tiles_x: int, total: int, budget_chunks: int,
    width: int, c_off: int = 0,
):
    strips = tile_h // SUB_H
    px = SUB_H * tile_w                     # strip pixels, flattened
    # ``c_off`` lets one pass cover a STATIC SLICE of the budget chunks
    # (grid = slice length): the gradient-overlap path runs the backward
    # as several such slices so each slice's parameter-grad psum can ride
    # ICI while the next slice computes (parallel/overlap.py). c_off = 0
    # with a full grid is the ordinary single-pass backward.
    c = pl.program_id(0) + c_off
    t = meta_ref[c]
    sb = meta_ref[budget_chunks + t]
    n_it = meta_ref[budget_chunks + total + t]
    off_base = budget_chunks + 2 * total
    cnt_base = off_base + total * strips
    j = c - sb
    content = j * PACK_ITERS < n_it

    @pl.when(jnp.logical_not(content))
    def _():
        # Skipped chunks still own an output block: zero it so the
        # XLA-side segment reduction sees no garbage.
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(content)
    def _():
        tx = t % tiles_x
        ty = t // tiles_x
        # Flat-subtile pixel coordinates (see flat_subtile_swap): sublane
        # k owns lane group k's 8x16 subtile; lane l = 16*r + c.
        subl = jax.lax.broadcasted_iota(jnp.int32, (SUB_H, tile_w), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB_H, tile_w), 1)
        pxi = lane % (tile_w // GROUPS)
        pyi = lane // (tile_w // GROUPS)
        xgf = (
            tx * tile_w + subl * (tile_w // GROUPS) + pxi
        ).astype(jnp.float32) + 0.5
        chunk_lo = j * PACK_ITERS
        chunk_hi = jnp.minimum(chunk_lo + PACK_ITERS, n_it)

        # Static constants for the row <-> pixel-group pairing.
        row_i = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 1), 0)
        pxg = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, px), 1) // tile_w
        grp_mask = (row_i % GROUPS) == pxg                # [WINDOW, px]

        def _window_strips(w, w_lo, w_hi):
            rows_w = rows_ref[w * WINDOW:(w + 1) * WINDOW, :]
            fidv = rows_w[:, COL_ID:COL_ID + 1]           # [WINDOW, 1]

            for s in range(strips):
                lo = jnp.maximum(
                    meta_ref[off_base + t * strips + s], chunk_lo
                )
                hi = jnp.minimum(
                    meta_ref[off_base + t * strips + s]
                    + meta_ref[cnt_base + t * strips + s],
                    chunk_hi,
                )
                a = jnp.maximum(lo, w_lo)
                b = jnp.minimum(hi, w_hi)

                @pl.when(a < b)
                def _(s=s, lo=lo, hi=hi):
                    rs = slice(s * SUB_H, (s + 1) * SUB_H)
                    ygf = (
                        ty * tile_h + s * SUB_H + pyi
                    ).astype(jnp.float32) + 0.5
                    # Pre-permuted [1, px] float fid row: an in-kernel
                    # [8,128]->[1,1024] reshape is a sublane->lane
                    # relayout repeated per (window, strip) pair.
                    fid_flat = fidflat_ref[0, s:s + 1, :]
                    it_of_row = (
                        chunk_lo
                        + (w * WINDOW + row_i) // GROUPS
                    )                                      # [WINDOW, 1]
                    active = (it_of_row >= lo) & (it_of_row < hi)
                    onehot = (
                        (fidv == fid_flat) & grp_mask & active
                    ).astype(jnp.bfloat16)                 # [WINDOW, px]

                    g = _dot3_onehot(
                        rows_w, onehot, (((0,), (0,)), ((), ()))
                    )                                       # [W, px]
                    g3 = g.reshape(width, SUB_H, tile_w)
                    g16 = [g3[k] for k in range(17)]
                    covered = g3[col_one] > 0.5            # [8, 128]

                    # Boundary pair & front tests ride the swap as one
                    # int32 bit plane (bit n = boundary_cases()[n]
                    # active), replacing 8 nfid/nz planes + zbuf.
                    bits_s = bits_ref[rs, :]
                    nbrs = [
                        (((bits_s >> n) & 1) > 0, sval_ref[n, rs, :])
                        for n in range(4)
                    ]
                    d_geo, d_att = pixel_cotangents_core(
                        g16, covered, None, None,
                        pix_ref[:, rs, :], grad_ref[:, rs, :],
                        nbrs, xgf, ygf,
                    )
                    cot_cols = (
                        [d_geo[GEO_EDGE + k] for k in range(9)]
                        + [d_geo[GEO_DEN + k] for k in range(3)]
                        + d_att
                    )
                    cot = jnp.stack(cot_cols, axis=0)       # [K, 8, 128]
                    cot = jnp.where(covered[None], cot, 0.0)
                    contrib = _dot3_onehot(
                        cot.reshape(k_cols, px), onehot,
                        (((1,), (1,)), ((), ())),
                    ).T                                     # [WINDOW, K]
                    # Accumulate strips of this window in scratch; each
                    # row's face lives in exactly one strip, so sums are
                    # disjoint.
                    rows_scratch[:] = rows_scratch[:] + contrib

        for w in range(PACK_CHUNK // WINDOW):
            # Window's iteration range (static offset within chunk).
            w_lo = chunk_lo + w * (WINDOW // GROUPS)
            w_hi = w_lo + WINDOW // GROUPS
            rows_scratch[:] = jnp.zeros_like(rows_scratch)

            @pl.when(w_lo < chunk_hi)
            def _(w=w, w_lo=w_lo, w_hi=w_hi):
                _window_strips(w, w_lo, w_hi)

            # Unconditional STATIC store of the window's compact rows.
            out_ref[w * WINDOW:(w + 1) * WINDOW, :] = rows_scratch[:]


def _roll_rows_m1(v, v_next, rows_ax=0):
    """rows shifted by -1 (row r <- row r+1; last row from ``v_next[0]``)."""
    n = v.shape[rows_ax]
    rolled = pltpu.roll(v, n - 1, rows_ax)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, rows_ax)
    nxt = pltpu.roll(v_next, n - 1, rows_ax)   # row n-1 holds v_next[0]
    return jnp.where(row == n - 1, nxt, rolled)


def _roll_rows_p1(v, v_prev, rows_ax=0):
    """rows shifted by +1 (row r <- row r-1; first row from ``v_prev[-1]``)."""
    n = v.shape[rows_ax]
    rolled = pltpu.roll(v, 1, rows_ax)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, rows_ax)
    prv = pltpu.roll(v_prev, 1, rows_ax)       # row 0 holds v_prev[n-1]
    return jnp.where(row == 0, prv, rolled)


def _roll_lanes(v, offset, fill, lane_ax=1):
    """lanes shifted by ``offset`` (lane l <- l + offset), edge-filled."""
    wp = v.shape[lane_ax]
    rolled = pltpu.roll(v, (-offset) % wp, lane_ax)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, lane_ax)
    if offset > 0:
        bad = lane >= wp - offset
    else:
        bad = lane < -offset
    return jnp.where(bad, jnp.full_like(v, fill), rolled)


def _butterfly8(v):
    """Flat-subtile swap of ONE 8-row strip block [8, wp] (wp % 128 == 0).

    Same three-stage butterfly as ``raster_fwd._butterfly_swap_block`` but
    with the lane group taken modulo each 128-lane tile, so one full-width
    strip row swaps all its tiles at once. Selected exchanges never cross
    a 128-lane tile (k, r < 8 => lane offset 16*bit stays inside).
    """
    rows_ax, lane_ax = 0, 1
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, rows_ax)
    grp = (
        jax.lax.broadcasted_iota(jnp.int32, v.shape, lane_ax) % 128
    ) // SUB_W
    n_rows = v.shape[rows_ax]
    wp = v.shape[lane_ax]
    for i in range(3):
        bit = 1 << i
        rb = (row // bit) % 2
        kb = (grp // bit) % 2
        need = rb != kb
        down = pltpu.roll(
            pltpu.roll(v, n_rows - bit, rows_ax), SUB_W * bit, lane_ax
        )
        up = pltpu.roll(
            pltpu.roll(v, bit, rows_ax), wp - SUB_W * bit, lane_ax
        )
        v = jnp.where(need & (rb == 1), up, jnp.where(need, down, v))
    return v


def _prologue_kernel(
    fid_pv, fid_cu, fid_nx, z_pv, z_cu, z_nx,
    pix_pv, pix_cu, pix_nx, grad_pv, grad_cu, grad_nx,
    fid_o, bits_o, pix_o, grad_o, sval_o,
    *, channels: int, n_strips: int,
):
    from dirt_tpu.ops.raster_bwd import boundary_cases

    i = pl.program_id(0)
    fid = fid_cu[:]
    z = z_cu[:]
    at_top = i == 0
    at_bot = i == n_strips - 1

    bits = jnp.zeros(fid.shape, jnp.int32)
    for n, (axis, offset, horizontal, strict) in enumerate(
        boundary_cases()
    ):
        if horizontal:
            nfid = _roll_lanes(fid, offset, -2)
            nz = _roll_lanes(z, offset, BIG_Z)
            npx = [
                _roll_lanes(pix_cu[c], offset, 0.0) for c in range(channels)
            ]
            ngr = [
                _roll_lanes(grad_cu[c], offset, 0.0)
                for c in range(channels)
            ]
        elif offset > 0:   # below
            nfid = _roll_rows_m1(fid, fid_nx[:])
            nz = _roll_rows_m1(z, z_nx[:])
            npx = [
                _roll_rows_m1(pix_cu[c], pix_nx[c]) for c in range(channels)
            ]
            ngr = [
                _roll_rows_m1(grad_cu[c], grad_nx[c])
                for c in range(channels)
            ]
            row = jax.lax.broadcasted_iota(jnp.int32, fid.shape, 0)
            edge = at_bot & (row == SUB_H - 1)
            nfid = jnp.where(edge, -2, nfid)
            nz = jnp.where(edge, BIG_Z, nz)
            npx = [jnp.where(edge, 0.0, p) for p in npx]
            ngr = [jnp.where(edge, 0.0, g) for g in ngr]
        else:              # above
            nfid = _roll_rows_p1(fid, fid_pv[:])
            nz = _roll_rows_p1(z, z_pv[:])
            npx = [
                _roll_rows_p1(pix_cu[c], pix_pv[c]) for c in range(channels)
            ]
            ngr = [
                _roll_rows_p1(grad_cu[c], grad_pv[c])
                for c in range(channels)
            ]
            row = jax.lax.broadcasted_iota(jnp.int32, fid.shape, 0)
            edge = at_top & (row == 0)
            nfid = jnp.where(edge, -2, nfid)
            nz = jnp.where(edge, BIG_Z, nz)
            npx = [jnp.where(edge, 0.0, p) for p in npx]
            ngr = [jnp.where(edge, 0.0, g) for g in ngr]

        pair = (fid != nfid) & (nfid != -2)
        front = (z < nz) if strict else (z <= nz)
        bits = bits | ((pair & front).astype(jnp.int32) << n)
        sval = jnp.zeros(fid.shape, jnp.float32)
        for c in range(channels):
            sval = sval + (grad_cu[c] + ngr[c]) * (pix_cu[c] - npx[c])
        sval_o[n] = _butterfly8(0.5 * sval)

    fid_o[:] = _butterfly8(fid)
    bits_o[:] = _butterfly8(bits)
    for c in range(channels):
        pix_o[c] = _butterfly8(pix_cu[c])
        grad_o[c] = _butterfly8(grad_cu[c])


def fused_neighbor_prologue(fid_p, zbuf_p, pix_cf, grad_cf,
                            interpret: bool | None = None):
    """One Pallas pass: neighbor shifts -> (pair & front) bit plane +
    per-direction sval + flat-subtile layout swap.

    Replaces the XLA-level ``neighbor_maps`` + bit combine +
    ``flat_subtile_swap_pallas`` chain of the single-device packed
    backward prologue (0.65 ms at 1024^2, r5 profile): the grid walks
    8-row strips with clamped prev/next strip views for the vertical
    halos (horizontal neighbors are lane rolls inside the full-width
    strip), so every field is read ~3x and written once instead of the
    shift chain's materialized intermediates. Outputs equal the
    reference construction exactly (integer tests; sval same op order).

    Args:
        fid_p: [hp, wp] int32 (padding rows/cols = -2).
        zbuf_p: [hp, wp] f32 (padding = BIG_Z).
        pix_cf, grad_cf: [C, hp, wp] f32 (padding = 0).
    Returns:
        (fid_f, bits_f, pix_f, grad_f, sval_f) — flat-subtile layout.
    """
    if interpret is None:
        interpret = cfg.use_interpret()
    hp, wp = fid_p.shape
    channels = pix_cf.shape[0]
    n_strips = hp // SUB_H

    cur = lambda i: (i, 0)
    prev = lambda i: (jnp.maximum(i - 1, 0), 0)
    nxt = lambda i: (jnp.minimum(i + 1, n_strips - 1), 0)
    cur3 = lambda i: (0, i, 0)
    prev3 = lambda i: (0, jnp.maximum(i - 1, 0), 0)
    nxt3 = lambda i: (0, jnp.minimum(i + 1, n_strips - 1), 0)

    def spec2(m):
        return pl.BlockSpec((SUB_H, wp), m, memory_space=pltpu.VMEM)

    def spec3(lead, m):
        return pl.BlockSpec((lead, SUB_H, wp), m, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _prologue_kernel, channels=channels, n_strips=n_strips,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[
            spec2(prev), spec2(cur), spec2(nxt),
            spec2(prev), spec2(cur), spec2(nxt),
            spec3(channels, prev3), spec3(channels, cur3),
            spec3(channels, nxt3),
            spec3(channels, prev3), spec3(channels, cur3),
            spec3(channels, nxt3),
        ],
        out_specs=(
            spec2(cur), spec2(cur), spec3(channels, cur3),
            spec3(channels, cur3), spec3(4, lambda i: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        ),
        interpret=interpret,
    )(fid_p, fid_p, fid_p, zbuf_p, zbuf_p, zbuf_p,
      pix_cf, pix_cf, pix_cf, grad_cf, grad_cf, grad_cf)


def pool_reduce_rows(entry_rows, pair_rows, pool_offs, num_faces: int,
                     bmax: int, row_base: int = 0):
    """Reduce per-entry cotangent rows to faces via the pool backpointers.

    ``entry_rows`` may be a SLICE of the budget rows starting at global
    row ``row_base`` (the gradient-overlap path reduces each slice
    separately; contributions of rows outside the slice are zero, so the
    per-slice face rows sum to the one-pass result exactly up to f32
    reassociation). Backpointers outside [row_base, row_base + len) —
    including the sentinel — contribute zero via a clipped gather + mask
    (no padded copy of the 11 MB row table; ROADMAP round-3 #2).
    """
    from dirt_tpu.ops.binning import POOL_ALIGN

    k_cols = entry_rows.shape[1]
    nrows = entry_rows.shape[0]
    idx = pair_rows - row_base
    valid = (idx >= 0) & (idx < nrows)
    pool_rows = entry_rows[jnp.clip(idx, 0, nrows - 1)]
    pool_rows = jnp.where(valid[:, None], pool_rows, 0.0)
    nblk = pool_rows.shape[0] // POOL_ALIGN
    blk = pool_rows.reshape(nblk, POOL_ALIGN, k_cols).sum(axis=1)
    blk = jnp.concatenate([blk, jnp.zeros((1, k_cols), jnp.float32)])
    offs = pool_offs
    bidx = offs[:num_faces, None] + jnp.arange(
        bmax, dtype=jnp.int32
    )[None, :]
    mask = (bidx < offs[1:num_faces + 1, None]) & (bidx < nblk)
    take = jnp.where(mask, bidx, nblk)
    return blk[take.reshape(-1)].reshape(
        num_faces, bmax, k_cols
    ).sum(axis=1)


def backward_packed(
    geo, att, fid, zbuf, pixels, grad_pixels, bins, num_faces: int,
    tile_h: int, tile_w: int, interpret: bool | None = None,
    nbrs=None, bmax: int | None = None,
):
    """Gradients w.r.t. plane coefficients over packed bins.

    Same semantics as ``raster_bwd.backward_fused`` (interior exact +
    occlusion-aware boundary; see module docstring); returns
    (d_geo [F, 24], d_att [F, 3C], d_background [H, W, C]).

    ``nbrs`` optionally overrides the boundary-pair neighbor maps with
    precomputed ``(nfid4, nz4, sval4)`` stacks of shape [4, Hp, Wp] (in
    :func:`raster_bwd.boundary_cases` order, at the tile-padded image
    shape). The sharded slab path uses this to splice halo rows fetched
    from mesh neighbors into the pair graph, so cross-slab boundary pairs
    are seen by the device owning the front pixel
    (``parallel.sharding``); the geometry stays in slab-local
    coordinates — no shifted re-setup is needed.
    """
    prep = prepare_backward_packed(
        geo, att, fid, zbuf, pixels, grad_pixels, bins, tile_h, tile_w,
        interpret=interpret, nbrs=nbrs,
    )
    geo, att = prep.geo, prep.att
    covered = fid >= 0
    entry_rows = packed_entry_rows(prep)
    channels = prep.channels

    with jax.named_scope("dirt_packed_bwd_reduce"):
        if bins.pair_rows is not None and bmax is not None:
            # Gather-based reduce via the binning's pool backpointers
            # (PackedBins.pair_rows): pool slots fetch their budget rows
            # with one clipped row gather (+ validity mask), 8-slot
            # blocks sum densely, and each face gathers its <= bmax
            # blocks (pool runs are 8-aligned). Replaces the XLA
            # scatter-add (~9 ns/row: 1.08 -> 0.33 ms at 1024^2/10k
            # faces) and scales with real candidates, not the budget.
            face_rows = pool_reduce_rows(
                entry_rows, bins.pair_rows, bins.pool_offs, num_faces,
                bmax,
            )
        else:
            face_rows = jax.ops.segment_sum(
                entry_rows, bins.entries // 8,
                num_segments=num_faces + 1,
            )[:num_faces]
    d_geo, d_att = assemble_face_gradients(
        geo, att, face_rows, channels
    )
    d_background = jnp.where(covered[..., None], 0.0, grad_pixels)
    return d_geo, d_att, d_background


class _PackedBwdPrep:
    """Prepared inputs for :func:`packed_entry_rows` (plain container)."""

    def __init__(self, kernel_args, bins, geo, att, channels, k_cols,
                 tile_h, tile_w, tiles_x, total, strips_n, px_n,
                 interpret):
        self.kernel_args = kernel_args
        self.bins = bins
        self.geo, self.att = geo, att
        self.channels, self.k_cols = channels, k_cols
        self.tile_h, self.tile_w = tile_h, tile_w
        self.tiles_x, self.total = tiles_x, total
        self.strips_n, self.px_n = strips_n, px_n
        self.interpret = interpret

    @property
    def budget_chunks(self) -> int:
        return self.bins.entries.shape[0] // PACK_CHUNK


def prepare_backward_packed(
    geo, att, fid, zbuf, pixels, grad_pixels, bins, tile_h: int,
    tile_w: int, interpret: bool | None = None, nbrs=None,
) -> _PackedBwdPrep:
    """XLA-level prologue shared by all packed-backward entry points.

    Pads/permutes the image-space fields into the flat-subtile layout and
    builds the boundary-pair neighbor stacks (or splices in externally
    supplied halo-aware ones — see :func:`backward_packed`). The result
    feeds :func:`packed_entry_rows` one or more times (full range, or
    budget-chunk slices for the gradient-overlap path).
    """
    geo = jnp.asarray(geo, jnp.float32)
    att = jnp.asarray(att, jnp.float32)
    channels = pixels.shape[-1]
    k_cols = 12 + 3 * channels
    height, width_img = fid.shape
    hp = -(-height // tile_h) * tile_h
    wp = -(-width_img // tile_w) * tile_w
    tiles_x = wp // tile_w
    total = (hp // tile_h) * tiles_x
    if interpret is None:
        interpret = cfg.use_interpret()

    pad2 = ((0, hp - height), (0, wp - width_img))
    fid_p = jnp.pad(fid, pad2, constant_values=-2)
    zbuf_p = jnp.pad(zbuf, pad2, constant_values=BIG_Z)
    pix_cf = jnp.pad(jnp.transpose(pixels, (2, 0, 1)), ((0, 0),) + pad2)
    grad_cf = jnp.pad(
        jnp.transpose(grad_pixels, (2, 0, 1)), ((0, 0),) + pad2
    )
    strips_n = tile_h // SUB_H
    px_n = SUB_H * tile_w

    # The boundary pair & front tests pre-combine into ONE int32 bit
    # plane (bit n = boundary_cases()[n] active at this pixel): the
    # kernel only ever consumes nfid/nz/zbuf through these boolean
    # tests, so evaluating them early removes 9 of the 13 swapped planes
    # (nfid4 + nz4 + zbuf = 36 MB of permute traffic at 1024^2) and
    # their VMEM blocks from every kernel step.
    if nbrs is None:
        # Single-device path: shifts + bits + sval + layout swap fuse
        # into one strip-halo Pallas pass (fused_neighbor_prologue).
        fid_f, bits_f, pix_f, grad_f, sval_f = fused_neighbor_prologue(
            fid_p, zbuf_p, pix_cf, grad_cf, interpret=interpret,
        )
    else:
        # Halo path (sharded slabs): neighbor stacks arrive precomputed
        # with mesh-neighbor rows spliced in; combine to bits here and
        # swap the five planes.
        nfid4, nz4, sval4 = nbrs
        nfid4 = jnp.asarray(nfid4, jnp.int32)
        bits = jnp.zeros(fid_p.shape, jnp.int32)
        for n, (_, _, _, strict) in enumerate(boundary_cases()):
            pair = (fid_p != nfid4[n]) & (nfid4[n] != -2)
            front = (zbuf_p < nz4[n]) if strict else (zbuf_p <= nz4[n])
            bits = bits | ((pair & front).astype(jnp.int32) << n)
        fid_f, bits_f, pix_f, grad_f, sval_f = flat_subtile_swap_pallas(
            [fid_p, bits, pix_cf, grad_cf, sval4]
        )
    fid_flat = (
        fid_f.astype(jnp.float32)
        .reshape(hp // tile_h, strips_n, SUB_H, tiles_x, tile_w)
        .transpose(0, 3, 1, 2, 4)
        .reshape(total, strips_n, px_n)
    )

    return _PackedBwdPrep(
        kernel_args=(fid_flat, bits_f, pix_f, grad_f, sval_f),
        bins=bins, geo=geo, att=att, channels=channels, k_cols=k_cols,
        tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x, total=total,
        strips_n=strips_n, px_n=px_n, interpret=interpret,
    )


def packed_entry_rows(prep: _PackedBwdPrep, c_lo: int = 0,
                      c_hi: int | None = None):
    """Run the packed backward kernel over budget chunks [c_lo, c_hi).

    Returns the per-entry cotangent rows for that STATIC slice of the
    budget ([rows_slice, k_cols]); chunks carry no cross-chunk state, so
    slices compose exactly. The gradient-overlap path
    (``parallel.overlap``) runs one slice per row band and psums each
    band's parameter gradients while the next band computes; the default
    full range is the ordinary one-pass backward.
    """
    bins = prep.bins
    channels, k_cols = prep.channels, prep.k_cols
    tile_h, tile_w = prep.tile_h, prep.tile_w
    strips_n, px_n = prep.strips_n, prep.px_n

    from dirt_tpu.ops.raster_fwd import packed_table_width

    width = packed_table_width(channels)
    col_one = COL_ATT + 3 * channels
    assert col_one < width, "packed table needs a spare ones column"
    if bins.rows is not None:
        # The forward already gathered the entry rows (ones column
        # pre-set) and handed them through the residuals — reuse.
        rows = bins.rows
    else:
        table2 = pack_face_table_v2(prep.geo, prep.att)
        table2 = table2.at[:, col_one].set(1.0)
        with jax.named_scope("dirt_packed_bwd_gather"):
            rows = table2[bins.entries // 8]

    budget_rows = bins.entries.shape[0]
    budget_chunks = budget_rows // PACK_CHUNK
    if c_hi is None:
        c_hi = budget_chunks
    n_c = c_hi - c_lo
    meta = jnp.concatenate(
        [bins.chunk_tile, bins.start_block, bins.n_iters,
         bins.iter_off, bins.strip_iters]
    ).astype(jnp.int32)

    kernel = functools.partial(
        _bwd_packed_kernel,
        channels=channels, k_cols=k_cols, col_one=col_one,
        tile_h=tile_h, tile_w=tile_w, tiles_x=prep.tiles_x,
        total=prep.total, budget_chunks=budget_chunks, width=width,
        c_off=c_lo,
    )
    tiles_x = prep.tiles_x
    img = lambda c, m: (m[c + c_lo] // tiles_x, m[c + c_lo] % tiles_x)
    imgc = lambda c, m: (0, m[c + c_lo] // tiles_x, m[c + c_lo] % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_c,),
        in_specs=[
            pl.BlockSpec((PACK_CHUNK, width), lambda c, m: (c + c_lo, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strips_n, px_n),
                         lambda c, m: (m[c + c_lo], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_h, tile_w), imgc,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (PACK_CHUNK, k_cols), lambda c, m: (c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WINDOW, k_cols), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_c * PACK_CHUNK, k_cols), jnp.float32
        ),
        interpret=prep.interpret,
    )(meta, rows, *prep.kernel_args)
