"""G-buffer rendering: rasterize arbitrary named attribute sets in one pass.

Mirrors the reference's deferred-shading sample structure
(``samples/deferred.py``, reconstructed — SURVEY.md sections 2.2 and 3.3):
world positions / normals / UVs / mask are barycentrically interpolated
into image-space buffers by a single rasterization, and shading happens
per-pixel afterwards in plain JAX (``dirt_tpu.render.deferred``).

All channels ride one kernel launch: attributes are concatenated on the
channel axis, rasterized, and split back by name.
"""

from __future__ import annotations

import jax.numpy as jnp

from dirt_tpu.ops.raster import RasterConfig, rasterize_screen


def render_gbuffer(
    vertices_clip, faces, attributes, height: int, width: int,
    config: RasterConfig | None = None, include_mask: bool = True,
    clip: bool = True,
):
    """Rasterize named per-vertex attributes into image-space buffers.

    Args:
        vertices_clip: [V, 4] clip-space positions.
        faces: [F, 3] int32.
        attributes: dict name -> [V, K] per-vertex attributes.
        include_mask: add a "mask" buffer (1 where covered, 0 background).
        clip: near-plane clip crossing faces (GL parity; see
            ``rasterise_ops.rasterise``). "fid" reports original face ids.
    Returns:
        dict name -> [H, W, K] buffers (plus "mask" -> [H, W, 1]);
        differentiable w.r.t. vertices and attribute values.
    """
    config = config or RasterConfig()
    names = list(attributes.keys())
    widths = [jnp.asarray(attributes[n]).shape[-1] for n in names]
    parts = [jnp.asarray(attributes[n], jnp.float32) for n in names]
    if include_mask:
        num_vertices = parts[0].shape[0] if parts else jnp.asarray(
            vertices_clip
        ).shape[0]
        parts.append(jnp.ones((num_vertices, 1), jnp.float32))
        names.append("mask")
        widths.append(1)
    stacked = jnp.concatenate(parts, axis=-1)  # [V, sum(K)]
    channels = stacked.shape[-1]

    background = jnp.zeros((height, width, channels), jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    from dirt_tpu.rasterise_ops import _clip_space_faces

    face_verts, face_attrs, config, orig_id, clip_ovf = _clip_space_faces(
        jnp.asarray(vertices_clip, jnp.float32), stacked, faces,
        height, width, config, clip,
    )
    pixels, fid, zbuf, overflow = rasterize_screen(
        face_verts, face_attrs, background, config
    )
    overflow = overflow | clip_ovf
    if clip:
        # Clipped sub-triangles live at compacted slots; report the
        # ORIGINAL face id like the reference would.
        fid = jnp.where(fid >= 0, orig_id[jnp.maximum(fid, 0)], fid)

    out = {}
    offset = 0
    for name, k in zip(names, widths):
        out[name] = pixels[..., offset:offset + k]
        offset += k
    out["fid"] = fid
    out["zbuf"] = zbuf
    out["overflow"] = overflow
    return out
