"""Differentiable texture sampling (pure JAX).

The reference does bilinear sampling in user TF code (``samples/textured.py``,
reconstructed — SURVEY.md section 2.2) with manual gather + lerp; here it is
a library function. Gradients flow both to the texture and to the UVs.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(texture, uv, mode: str = "bilinear", wrap: str = "clamp"):
    """Sample a texture at continuous UV coordinates.

    Args:
        texture: [Ht, Wt, C] float.
        uv: [..., 2] float, u right / v up in [0, 1]; (0, 0) is the
            bottom-left texel corner (OpenGL convention).
        mode: "bilinear" or "nearest".
        wrap: "clamp" or "repeat".
    Returns:
        [..., C] sampled colors.
    """
    texture = jnp.asarray(texture)
    uv = jnp.asarray(uv)
    ht, wt = texture.shape[0], texture.shape[1]

    u = uv[..., 0] * wt - 0.5
    # v=0 is the bottom row; texture row 0 is the top.
    v = (1.0 - uv[..., 1]) * ht - 0.5

    if mode == "nearest":
        iu = jnp.round(u).astype(jnp.int32)
        iv = jnp.round(v).astype(jnp.int32)
        iu, iv = _wrap_index(iu, wt, wrap), _wrap_index(iv, ht, wrap)
        return texture[iv, iu]

    if mode != "bilinear":
        raise ValueError(f"unknown sampling mode: {mode!r}")

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1, v1 = u0 + 1, v0 + 1
    u0, u1 = _wrap_index(u0, wt, wrap), _wrap_index(u1, wt, wrap)
    v0, v1 = _wrap_index(v0, ht, wrap), _wrap_index(v1, ht, wrap)

    fu = fu[..., None]
    fv = fv[..., None]
    t00 = texture[v0, u0]
    t01 = texture[v0, u1]
    t10 = texture[v1, u0]
    t11 = texture[v1, u1]
    top = t00 * (1.0 - fu) + t01 * fu
    bottom = t10 * (1.0 - fu) + t11 * fu
    return top * (1.0 - fv) + bottom * fv


def _wrap_index(idx, size, wrap):
    if wrap == "clamp":
        return jnp.clip(idx, 0, size - 1)
    if wrap == "repeat":
        return jnp.mod(idx, size)
    raise ValueError(f"unknown wrap mode: {wrap!r}")
