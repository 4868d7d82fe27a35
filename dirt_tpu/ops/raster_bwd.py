"""Backward pass: exact interior gradients + occlusion-aware edge gradients.

TPU-native replacement for the reference's CUDA/GL gradient op
(``csrc/rasterise_grad_egl.cpp`` — REGISTER_OP("RasteriseGrad"); SURVEY.md
sections 2.1 and 3.2). Semantics (shared with the oracle in
``dirt_tpu/ref/slowref.py`` — see its module docstring for the derivation):

* Interior: gradient of ``num_plane / den_plane`` w.r.t. the plane
  coefficients at fixed coverage (exact; chained to screen vertices and
  attributes through ``jax.vjp`` of ``setup_planes``).
* Boundary: for each adjacent pixel pair with differing face ids, the
  frontmost face's crossing edge receives the intensity-difference x
  edge-motion term ``d(a,b,c0) += S * (x*-ax, y*-ay, 1) / (|a|+|b|)``
  (anchored plane form — see triangle_setup).

Anchor cotangents: every plane depends on the anchor (ax, ay) only through
``c_global = c0 - a*ax - b*ay``, so ``d_ax = -sum_p a_p * d_c0_p`` and
``d_ay = -sum_p b_p * d_c0_p`` over all planes of the face (edges, z, den,
attribute numerators). They are derived after the per-face scatter.

This module holds the vectorized pure-JAX implementation, used as the
engine on CPU and as the scale reference for the Pallas backward kernel.
Every pair case is oriented so the *own* pixel's face is the front face,
letting one ``geo[fid]`` gather serve all terms, with a single segment-sum
scattering per-pixel contributions to faces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dirt_tpu.ops.raster_fwd import BIG_Z
from dirt_tpu.ops.triangle_setup import (
    GEO_AX,
    GEO_AY,
    GEO_DEN,
    GEO_EDGE,
    GEO_WIDTH,
    GEO_Z,
)

A_EPS = 1e-12


def _shift(arr, axis, offset, fill):
    """Shift ``arr`` by ``offset`` along ``axis`` filling vacated slots."""
    rolled = jnp.roll(arr, -offset, axis=axis)
    idx = jnp.arange(arr.shape[axis])
    valid = (idx + offset >= 0) & (idx + offset <= arr.shape[axis] - 1)
    shape = [1] * arr.ndim
    shape[axis] = arr.shape[axis]
    valid = valid.reshape(shape)
    return jnp.where(valid, rolled, fill)


def backward_jax(geo, att, fid, zbuf, pixels, grad_pixels, own_mask=None):
    """Gradients w.r.t. plane coefficients.

    Args:
        geo: [F, 24] anchored plane data from ``setup_planes``.
        att: [F, 3*C].
        fid: [H, W] int32 face-id map (-1 background) from the forward.
        zbuf: [H, W] f32 (BIG_Z at background).
        pixels: [H, W, C] forward output.
        grad_pixels: [H, W, C] upstream cotangent.
        own_mask: optional [H, W] bool — pixels this shard OWNS. Non-owned
            (halo) rows supply neighbor-side data for boundary pairs but
            never act as the front/interior pixel, so each cross-shard pair
            is counted by exactly one device (front-pixel ownership).
    Returns:
        (d_geo [F, 24], d_att [F, 3*C], d_background [H, W, C]).
    """
    geo = jnp.asarray(geo, jnp.float32)
    att = jnp.asarray(att, jnp.float32)
    num_faces = geo.shape[0]
    height, width = fid.shape
    channels = pixels.shape[-1]

    covered = fid >= 0
    if own_mask is not None:
        covered = covered & own_mask
    safe_fid = jnp.maximum(fid, 0)
    g16 = geo[safe_fid]          # [H, W, 24]
    a3c = att[safe_fid]          # [H, W, 3C]

    col = jnp.arange(width, dtype=jnp.float32) + 0.5
    row = jnp.arange(height, dtype=jnp.float32) + 0.5
    xg = jnp.broadcast_to(col[None, :], (height, width))
    yg = jnp.broadcast_to(row[:, None], (height, width))
    dxg = xg - g16[..., GEO_AX]
    dyg = yg - g16[..., GEO_AY]

    d_geo_pix = jnp.zeros((height, width, GEO_WIDTH), jnp.float32)
    d_att_pix = jnp.zeros((height, width, 3 * channels), jnp.float32)

    # ---- interior term -------------------------------------------------
    den = (
        g16[..., GEO_DEN] * dxg
        + g16[..., GEO_DEN + 1] * dyg
        + g16[..., GEO_DEN + 2]
    )
    recip = jnp.where(covered, 1.0 / den, 0.0)
    s_acc = jnp.zeros((height, width), jnp.float32)
    for c in range(channels):
        num_c = (
            a3c[..., 3 * c] * dxg
            + a3c[..., 3 * c + 1] * dyg
            + a3c[..., 3 * c + 2]
        )
        g_c = grad_pixels[..., c]
        w_c = jnp.where(covered, g_c * recip, 0.0)
        d_att_pix = d_att_pix.at[..., 3 * c].set(w_c * dxg)
        d_att_pix = d_att_pix.at[..., 3 * c + 1].set(w_c * dyg)
        d_att_pix = d_att_pix.at[..., 3 * c + 2].set(w_c)
        s_acc = s_acc + g_c * num_c
    t_den = jnp.where(covered, -recip * recip * s_acc, 0.0)
    d_geo_pix = d_geo_pix.at[..., GEO_DEN].set(t_den * dxg)
    d_geo_pix = d_geo_pix.at[..., GEO_DEN + 1].set(t_den * dyg)
    d_geo_pix = d_geo_pix.at[..., GEO_DEN + 2].set(t_den)

    # ---- boundary term --------------------------------------------------
    # Neighbor maps; -2 marks out-of-image so border pairs are excluded.
    def neighbors(axis, offset):
        nfid = _shift(fid, axis, offset, -2)
        nz = _shift(zbuf, axis, offset, BIG_Z)
        npix = _shift(pixels, axis, offset, 0.0)
        ng = _shift(grad_pixels, axis, offset, 0.0)
        return nfid, nz, npix, ng

    # Each case keeps the OWN pixel as the front pixel; ``offset`` points at
    # the back pixel. Tie rule matches the oracle: for a horizontal pair the
    # left pixel is front iff z_left < z_right (so own-front with back on
    # the left requires z_own <= z_left); likewise vertically with top/down.
    cases = [
        (1, +1, True, True),    # back = right neighbor: front iff z < z_r
        (1, -1, True, False),   # back = left:  front iff z <= z_l
        (0, +1, False, True),   # back = below: front iff z < z_d
        (0, -1, False, False),  # back = above: front iff z <= z_u
    ]

    for axis, offset, horizontal, strict in cases:
        nfid, nz, npix, ng = neighbors(axis, offset)
        pair = (fid != nfid) & (nfid != -2) & covered
        if strict:
            front = zbuf < nz
        else:
            front = zbuf <= nz
        active = pair & front
        s_val = 0.5 * jnp.sum(
            (grad_pixels + ng) * (pixels - npix), axis=-1
        )  # [H, W]

        # Crossing-edge selection on the own (front) face's edges.
        chosen = jnp.zeros((height, width), jnp.bool_)
        for j in range(3):
            a_j = g16[..., GEO_EDGE + 3 * j]
            b_j = g16[..., GEO_EDGE + 3 * j + 1]
            c_j = g16[..., GEO_EDGE + 3 * j + 2]
            e_own = a_j * dxg + b_j * dyg + c_j
            # Edge function at the back pixel center (one pixel away).
            if horizontal:
                e_back = e_own + offset * a_j
            else:
                e_back = e_own + offset * b_j
            crossing = (e_own >= 0.0) & (e_back < 0.0) & ~chosen
            chosen = chosen | crossing

            denom = jnp.abs(a_j) + jnp.abs(b_j)
            if horizontal:
                guard = jnp.abs(a_j) >= A_EPS
                safe_a = jnp.where(guard, a_j, 1.0)
                # Crossing x in anchored coordinates (x* - ax).
                coord = -(b_j * dyg + c_j) / safe_a
                lo = jnp.minimum(dxg, dxg + offset)
                hi = jnp.maximum(dxg, dxg + offset)
                xs = jnp.clip(coord, lo, hi)
                vec = (xs, dyg, jnp.ones_like(xs))
            else:
                guard = jnp.abs(b_j) >= A_EPS
                safe_b = jnp.where(guard, b_j, 1.0)
                coord = -(a_j * dxg + c_j) / safe_b
                lo = jnp.minimum(dyg, dyg + offset)
                hi = jnp.maximum(dyg, dyg + offset)
                ys = jnp.clip(coord, lo, hi)
                vec = (dxg, ys, jnp.ones_like(ys))

            scale = jnp.where(
                active & crossing & guard & (denom >= A_EPS),
                s_val / jnp.maximum(denom, A_EPS),
                0.0,
            )
            for k in range(3):
                d_geo_pix = d_geo_pix.at[..., GEO_EDGE + 3 * j + k].add(
                    scale * vec[k]
                )

    # ---- scatter to faces ------------------------------------------------
    seg = safe_fid.reshape(-1)
    weight = covered.reshape(-1, 1).astype(jnp.float32)
    d_geo = jax.ops.segment_sum(
        d_geo_pix.reshape(-1, GEO_WIDTH) * weight, seg, num_segments=num_faces
    )
    d_att = jax.ops.segment_sum(
        d_att_pix.reshape(-1, 3 * channels) * weight, seg,
        num_segments=num_faces,
    )

    # ---- anchor cotangents -----------------------------------------------
    # d_ax = -sum over all planes of (a_p * d_c0_p); likewise for ay with b.
    plane_a_cols = [GEO_EDGE, GEO_EDGE + 3, GEO_EDGE + 6, GEO_Z, GEO_DEN]
    d_ax = jnp.zeros((num_faces,), jnp.float32)
    d_ay = jnp.zeros((num_faces,), jnp.float32)
    for a_col in plane_a_cols:
        d_ax = d_ax - geo[:, a_col] * d_geo[:, a_col + 2]
        d_ay = d_ay - geo[:, a_col + 1] * d_geo[:, a_col + 2]
    for c in range(channels):
        d_ax = d_ax - att[:, 3 * c] * d_att[:, 3 * c + 2]
        d_ay = d_ay - att[:, 3 * c + 1] * d_att[:, 3 * c + 2]
    d_geo = d_geo.at[:, GEO_AX].set(d_ax)
    d_geo = d_geo.at[:, GEO_AY].set(d_ay)

    d_background = jnp.where(covered[..., None], 0.0, grad_pixels)
    return d_geo, d_att, d_background
