"""On-chip stage profiler for the packed engine (round-4 perf work).

Times each pipeline stage of the flagship 1024^2 / 10k-tri bench scene at
HONEST caps with utils.benchtime.device_time, so optimization targets are
chosen from measured numbers, not guesses. Stages:

  setup        triangle setup + bbox columns
  binning      bin_faces_packed (the full pass)
  fwd_kernel   row gather + raster_forward_packed (+ layout swaps)
  fwd_total    rasterise forward
  bwd_total    grad step minus fwd_total
  bwd pieces   neighbor prologue, entry-row gather, kernel, pool reduce

Run: python tools/prof_stages.py [size]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dirt_tpu.utils.compilecache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import dirt_tpu  # noqa: E402
from dirt_tpu.ops import binning  # noqa: E402
from dirt_tpu.ops.raster import suggest_config  # noqa: E402
from dirt_tpu.ops.triangle_setup import (  # noqa: E402
    edge_filter_cols,
    face_bbox_cols,
    screen_from_clip,
    setup_planes,
)
from dirt_tpu.utils.benchtime import device_time  # noqa: E402


def build(size):
    from bench import build as bench_build  # same flagship scene

    clip, colors, faces, bg, weights, _ = bench_build(size)
    return clip, colors, faces, bg, weights


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    clip, colors, faces, bg, weights = build(size)
    fv, fa = jax.jit(
        lambda cv, co, f: (screen_from_clip(cv, size, size)[f], co[f])
    )(clip, colors, faces)
    config = suggest_config(fv, size, size)
    config = config.concrete(size)
    print(f"# config: {config}", file=sys.stderr)

    tile_h, tile_w = config.tile_h, config.tile_w
    hp = -(-size // tile_h) * tile_h
    wp = -(-size // tile_w) * tile_w

    def stage_setup(fv, fa):
        geo, att, valid = setup_planes(fv, fa)
        bbox = face_bbox_cols(fv, valid, size, size)
        edges = edge_filter_cols(fv)
        return geo, att, bbox, edges

    def stage_binning(fv, fa):
        geo, att, bbox, edges = stage_setup(fv, fa)
        bins = binning.bin_faces_packed(
            bbox, hp, wp, tile_h, tile_w, config.budget,
            config.expand_cap, edges=edges, pool_cap=config.pool_cap,
            work_cap=config.work_cap,
        )
        return bins

    # Big arrays are ARGUMENTS everywhere below: closure-captured image-
    # size constants invite XLA constant-folding passes inside the timing
    # loop (227 MB executables, ~10 min compiles — see bench.py).
    def fwd(c, co, b, w):
        return dirt_tpu.rasterise(
            b, c, co, faces, config=config, clip=False
        )

    def loss(c, co, b, w):
        img = dirt_tpu.rasterise(
            b, c, co, faces, config=config, clip=False
        )
        return jnp.sum(img * w)

    step = jax.grad(loss, argnums=(0, 1, 2))

    t_setup = device_time(stage_setup, (fv, fa))
    t_bin = device_time(stage_binning, (fv, fa))
    t_fwd = device_time(fwd, (clip, colors, bg, weights))
    t_step = device_time(step, (clip, colors, bg, weights))
    print(f"setup+bbox+edges   {t_setup*1e3:7.3f} ms")
    print(f"setup+binning      {t_bin*1e3:7.3f} ms "
          f"(binning ~{(t_bin-t_setup)*1e3:.3f})")
    print(f"fwd total          {t_fwd*1e3:7.3f} ms "
          f"(kernel+glue ~{(t_fwd-t_bin)*1e3:.3f})")
    print(f"fwd+bwd total      {t_step*1e3:7.3f} ms "
          f"(bwd ~{(t_step-t_fwd)*1e3:.3f})")

    # ---- backward pieces over fixed forward results --------------------
    bins = jax.jit(stage_binning)(fv, fa)
    geo, att, valid = setup_planes(fv, fa)
    from dirt_tpu.ops.raster_fwd import (
        flat_subtile_swap_pallas,
        pack_face_table_v2,
        raster_forward_packed,
    )

    table2 = pack_face_table_v2(geo, att)
    bg_chw = jnp.transpose(bg, (2, 0, 1))
    bg_chw = jnp.pad(bg_chw, ((0, 0), (0, hp - size), (0, wp - size)))
    pix_chw, fid, zbuf = jax.jit(
        lambda t, b: raster_forward_packed(
            t, bins, b, tile_h=tile_h, tile_w=tile_w
        )
    )(table2, bg_chw)
    pixels = jnp.transpose(pix_chw, (1, 2, 0))[:size, :size]
    fid_c = fid[:size, :size]
    zbuf_c = zbuf[:size, :size]
    grad_pixels = weights

    num_faces = fv.shape[0]
    from dirt_tpu.ops.packed_bwd import backward_packed

    expand = config.expand_cap
    bmax = -(-expand // binning.POOL_ALIGN)

    def bwd_full(geo, att, fid_c, zbuf_c, pixels, grad_pixels):
        return backward_packed(
            geo, att, fid_c, zbuf_c, pixels, grad_pixels, bins,
            num_faces, tile_h, tile_w, bmax=bmax,
        )

    t_bwdcore = device_time(
        bwd_full, (geo, att, fid_c, zbuf_c, pixels, grad_pixels)
    )
    print(f"bwd core (backward_packed) {t_bwdcore*1e3:7.3f} ms")

    # neighbor prologue alone (mirror of prepare_backward_packed's
    # XLA-level work: shifts + pair/front bit plane + layout swap)
    from dirt_tpu.ops.raster_bwd import boundary_cases, neighbor_maps

    def prologue(fid, zbuf, pixels, grad_pixels):
        from dirt_tpu.ops.raster_fwd import BIG_Z
        pad2 = ((0, hp - size), (0, wp - size))
        fid_p = jnp.pad(fid, pad2, constant_values=-2)
        zbuf_p = jnp.pad(zbuf, pad2, constant_values=BIG_Z)
        pix_cf = jnp.pad(jnp.transpose(pixels, (2, 0, 1)), ((0, 0),) + pad2)
        grad_cf = jnp.pad(
            jnp.transpose(grad_pixels, (2, 0, 1)), ((0, 0),) + pad2
        )
        nbr = neighbor_maps(fid_p, zbuf_p, pix_cf, grad_cf)
        nfid4 = jnp.stack([n[0] for n in nbr])
        nz4 = jnp.stack([n[1] for n in nbr])
        sval4 = jnp.stack([n[2] for n in nbr])
        bits = jnp.zeros(fid_p.shape, jnp.int32)
        for n, (_, _, _, strict) in enumerate(boundary_cases()):
            pair = (fid_p != nfid4[n]) & (nfid4[n] != -2)
            front = (zbuf_p < nz4[n]) if strict else (zbuf_p <= nz4[n])
            bits = bits | ((pair & front).astype(jnp.int32) << n)
        out = flat_subtile_swap_pallas(
            [fid_p, bits, pix_cf, grad_cf, sval4]
        )
        return out

    t_pro = device_time(prologue, (fid_c, zbuf_c, pixels, grad_pixels))
    print(f"bwd neighbor prologue + swaps {t_pro*1e3:7.3f} ms")

    # entry-row gather alone
    def egather(table2):
        return table2[bins.entries // 8]

    t_eg = device_time(egather, (table2,))
    print(f"bwd entry-row gather {t_eg*1e3:7.3f} ms "
          f"(rows={bins.entries.shape[0]})")

    # pool reduce alone (mirror of packed_bwd reduce block)
    k_cols = 12 + 9
    entry_rows = jnp.asarray(
        np.random.RandomState(2).rand(bins.entries.shape[0], k_cols),
        jnp.float32,
    )

    def reduce_pool(entry_rows):
        padded = jnp.concatenate(
            [entry_rows, jnp.zeros((1, k_cols), jnp.float32)]
        )
        pool_rows = padded[bins.pair_rows]
        nblk = pool_rows.shape[0] // binning.POOL_ALIGN
        blk = pool_rows.reshape(nblk, binning.POOL_ALIGN, k_cols).sum(axis=1)
        blk = jnp.concatenate([blk, jnp.zeros((1, k_cols), jnp.float32)])
        offs = bins.pool_offs
        idx = offs[:num_faces, None] + jnp.arange(bmax, dtype=jnp.int32)[None]
        mask = (idx < offs[1:num_faces + 1, None]) & (idx < nblk)
        take = jnp.where(mask, idx, nblk)
        return blk[take.reshape(-1)].reshape(num_faces, bmax, k_cols).sum(1)

    t_red = device_time(reduce_pool, (entry_rows,))
    print(f"bwd pool reduce {t_red*1e3:7.3f} ms "
          f"(pool={bins.pair_rows.shape[0]}, bmax={bmax})")


if __name__ == "__main__":
    main()
