"""Pallas forward rasterization kernel.

TPU-native replacement for the reference's GL forward op
(``csrc/rasterise_egl.cpp`` — REGISTER_OP("Rasterise"); SURVEY.md section
2.1): the grid walks image tiles; each grid step streams that tile's binned
face planes (HBM -> VMEM, pipelined by Pallas) and scan-converts them with a
z-buffered fori_loop. All per-pixel work is affine plane evaluation on the
VPU plus one reciprocal for the perspective division.

Layouts: images are channels-first [C, H, W] inside the op (lane dimension =
W, 128-aligned); the public wrapper converts from/to [H, W, C]. Per-tile bin
id lists live in SMEM so the loop can read face ids as scalars; plane data
is read as dynamic sublane rows of VMEM blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dirt_tpu import config as cfg
from dirt_tpu.ops.triangle_setup import GEO_WIDTH

BIG_Z = 3.0e38  # z-buffer clear value (acts as +inf in f32 compares)


def _fwd_kernel(
    counts_ref, bins_ref, geo_ref, att_ref, bg_ref,
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
        g = geo_ref[0, i, :]
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
        face_id = bins_ref[0, i, 0]
        a = att_ref[0, i, :]
        new_pix = tuple(
            jnp.where(
                mask,
                (a[3 * c] * dx + a[3 * c + 1] * dy + a[3 * c + 2]) * recip,
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


def raster_forward(
    binned_geo, binned_att, bins, counts, background_chw,
    *, tile_h: int, tile_w: int, interpret: bool | None = None,
):
    """Run the forward kernel over all tiles.

    Args:
        binned_geo: [T, cap, 16] f32 per-tile gathered plane data.
        binned_att: [T, cap, 3*C] f32.
        bins: [T, cap] int32 global face ids (F = sentinel for empty slots).
        counts: [T] int32.
        background_chw: [C, Hp, Wp] f32, already padded to tile multiples.
    Returns:
        pixels [C, Hp, Wp] f32, fid [Hp, Wp] int32, zbuf [Hp, Wp] f32.
    """
    channels, hp, wp = background_chw.shape
    total, cap, _ = binned_geo.shape
    tiles_y, tiles_x = hp // tile_h, wp // tile_w
    assert tiles_y * tiles_x == total
    if interpret is None:
        interpret = cfg.use_interpret()

    kernel = functools.partial(
        _fwd_kernel,
        channels=channels,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
    )

    att_width = binned_att.shape[-1]
    img_map = lambda t: (0, t // tiles_x, t % tiles_x)
    flat_map = lambda t: (t // tiles_x, t % tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts: full [T] array in SMEM
        grid=(total,),
        in_specs=[
            pl.BlockSpec(
                (1, cap, 1), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, cap, GEO_WIDTH), lambda t, c: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cap, att_width), lambda t, c: (t, 0, 0),
                memory_space=pltpu.VMEM,
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
    )(counts, bins[..., None], binned_geo, binned_att, background_chw)
