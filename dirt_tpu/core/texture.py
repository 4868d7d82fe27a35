"""Differentiable texture sampling (pure JAX).

The reference does bilinear sampling in user TF code (``samples/textured.py``,
reconstructed — SURVEY.md section 2.2) with manual gather + lerp; here it is
a library function. Gradients flow both to the texture and to the UVs.

TPU note: XLA's multi-dimensional gather (``texture[v, u]`` with 2D index
arrays) lowers to a slow per-element path (~30 ms for 1M samples on v5e).
Bilinear sampling instead packs the four corner texels per texel into one
row table and does a SINGLE flat row-gather (~2 ms for 1M samples) — row
gathers are the one fast gather shape on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(texture, uv, mode: str = "bilinear", wrap: str = "clamp",
                   channels_first: bool = False):
    """Sample a texture at continuous UV coordinates.

    Args:
        texture: [Ht, Wt, C] float.
        uv: [..., 2] float, u right / v up in [0, 1]; (0, 0) is the
            bottom-left texel corner (OpenGL convention).
        mode: "bilinear" or "nearest".
        wrap: "clamp" or "repeat".
        channels_first: return [C, ...] instead of [..., C] (cheaper for
            TPU pipelines that shade channels-first).
    Returns:
        [..., C] sampled colors ([C, ...] if ``channels_first``).
    """
    texture = jnp.asarray(texture)
    uv = jnp.asarray(uv)
    ht, wt, channels = texture.shape

    # Peel the uv channels through one transpose; [..., 0] on a minor-dim-2
    # array is a strided lane read (a full relayout pass on TPU).
    uv_cf = jnp.moveaxis(uv, -1, 0)
    u = uv_cf[0] * wt - 0.5
    # v=0 is the bottom row; texture row 0 is the top.
    v = (1.0 - uv_cf[1]) * ht - 0.5

    batch_shape = uv.shape[:-1]

    def finish(rows_c):  # [C, *batch] -> requested layout
        if channels_first:
            return rows_c
        return jnp.moveaxis(rows_c, 0, -1)

    if mode == "nearest":
        iu = jnp.round(u).astype(jnp.int32)
        iv = jnp.round(v).astype(jnp.int32)
        iu, iv = _wrap_index(iu, wt, wrap), _wrap_index(iv, ht, wrap)
        flat = texture.reshape(ht * wt, channels)
        rows = flat[(iv * wt + iu).reshape(-1)]        # [N, C]
        rows_c = rows.T.reshape((channels,) + batch_shape)
        return finish(rows_c)

    if mode != "bilinear":
        raise ValueError(f"unknown sampling mode: {mode!r}")

    if wrap == "clamp":
        # Clamp the continuous coordinate: edge samples then get fu/fv = 0
        # against the (self-neighboring) last texel, matching the
        # corner-wise clamp semantics exactly.
        u = jnp.clip(u, 0.0, wt - 1.0)
        v = jnp.clip(v, 0.0, ht - 1.0)
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    fu = u - u0f
    fv = v - v0f
    u0 = _wrap_index(u0f.astype(jnp.int32), wt, wrap)
    v0 = _wrap_index(v0f.astype(jnp.int32), ht, wrap)

    # Pack each texel's (self, right, down, down-right) neighbors into one
    # row, honoring the wrap mode, so one flat row-gather fetches all four
    # bilinear corners. Differentiable: the pack is shifts + concat, so
    # texture gradients flow through all four copies.
    if wrap == "repeat":
        right = jnp.roll(texture, -1, axis=1)
        down = jnp.roll(texture, -1, axis=0)
        downright = jnp.roll(down, -1, axis=1)
    else:  # clamp: the last row/column are their own neighbors
        right = jnp.concatenate([texture[:, 1:], texture[:, -1:]], axis=1)
        down = jnp.concatenate([texture[1:], texture[-1:]], axis=0)
        downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate(
        [texture, right, down, downright], axis=-1
    ).reshape(ht * wt, 4 * channels)

    rows = packed[(v0 * wt + u0).reshape(-1)]          # [N, 4C]
    # One transpose to channels-first, then all lerps run on [C, *batch]
    # slabs (free leading-dim slices, full-lane vector ops).
    rows_c = rows.T.reshape((4 * channels,) + batch_shape)
    t00 = rows_c[0 * channels:1 * channels]
    t01 = rows_c[1 * channels:2 * channels]
    t10 = rows_c[2 * channels:3 * channels]
    t11 = rows_c[3 * channels:4 * channels]

    fu = fu[None]
    fv = fv[None]
    top = t00 * (1.0 - fu) + t01 * fu
    bottom = t10 * (1.0 - fu) + t11 * fu
    return finish(top * (1.0 - fv) + bottom * fv)


def _wrap_index(idx, size, wrap):
    if wrap == "clamp":
        return jnp.clip(idx, 0, size - 1)
    if wrap == "repeat":
        return jnp.mod(idx, size)
    raise ValueError(f"unknown wrap mode: {wrap!r}")
