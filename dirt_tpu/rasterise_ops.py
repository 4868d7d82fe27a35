"""Public rasterization API, mirroring the reference's ``dirt/rasterise_ops.py``
(reconstructed — SURVEY.md section 2.2).

``rasterise`` renders one mesh; ``rasterise_batch`` maps over a leading batch
dimension. Vertices are OpenGL-style clip-space homogeneous coordinates
``[V, 4]``; ``vertex_colors`` may carry any number of channels (colors, UVs,
normals, masks — anything barycentrically interpolable); ``faces`` is a
shared ``[F, 3]`` int32 triangle list.

Unlike the reference there is no op library to load: the op is a
``jax.custom_vjp`` around Pallas kernels and composes with ``jit``, ``grad``
and ``shard_map``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dirt_tpu.ops.raster import (
    RasterConfig,
    rasterize_screen,
    suggest_config,
)
from dirt_tpu.ops.triangle_setup import screen_from_clip


def _resolve_shape(background, height, width, channels):
    if background is not None:
        h, w, c = background.shape[-3], background.shape[-2], background.shape[-1]
        return h, w, c
    if height is None or width is None or channels is None:
        raise ValueError(
            "height, width and channels must be given when background is None"
        )
    return height, width, channels


def rasterise(
    background, vertices, vertex_colors, faces,
    height=None, width=None, channels=None, config: RasterConfig | None = None,
):
    """Rasterize one triangle mesh with z-buffering and attribute interp.

    Args:
        background: [H, W, C] image the mesh is composited over, or None
            (zeros; then height/width/channels are required).
        vertices: [V, 4] clip-space positions.
        vertex_colors: [V, C] per-vertex attributes.
        faces: [F, 3] int32.
    Returns:
        [H, W, C] rendered image (differentiable w.r.t. background,
        vertices and vertex_colors).
    """
    h, w, c = _resolve_shape(background, height, width, channels)
    if background is None:
        background = jnp.zeros((h, w, c), jnp.float32)
    config = config or RasterConfig()

    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    verts_screen = screen_from_clip(vertices, h, w)   # [V, 4]
    face_verts = verts_screen[faces]                  # [F, 3, 4]
    face_attrs = vertex_colors[faces]                 # [F, 3, C]
    pixels, _, _, _ = rasterize_screen(
        face_verts, face_attrs, background, config
    )
    return pixels


def rasterise_with_aux(
    background, vertices, vertex_colors, faces, config: RasterConfig | None = None
):
    """Like ``rasterise`` but also returns non-diff aux outputs.

    Returns:
        (pixels [H, W, C], fid [H, W] int32, zbuf [H, W] f32,
         overflow [] bool). ``overflow`` True means a static bin cap
        truncated faces and the image may be missing coverage — rebuild
        the config with :func:`suggest_raster_config` and re-render
        (GL, the reference, can never drop triangles; here the caps are
        what make shapes static for XLA).
    """
    h, w, c = background.shape
    config = config or RasterConfig()
    verts_screen = screen_from_clip(jnp.asarray(vertices, jnp.float32), h, w)
    face_verts = verts_screen[jnp.asarray(faces, jnp.int32)]
    face_attrs = jnp.asarray(vertex_colors, jnp.float32)[
        jnp.asarray(faces, jnp.int32)
    ]
    return rasterize_screen(face_verts, face_attrs, background, config)


def suggest_raster_config(
    vertices, faces, height: int, width: int,
    config: RasterConfig | None = None, margin: float = 1.25,
):
    """Count-then-allocate: a RasterConfig that cannot overflow this scene.

    Measures exact per-tile occupancy / per-face tile span for the given
    clip-space geometry (O(F) pass, host-synchronizing — call outside
    jit) and returns a concrete config with just-large-enough caps.
    """
    verts_screen = screen_from_clip(
        jnp.asarray(vertices, jnp.float32), height, width
    )
    face_verts = verts_screen[jnp.asarray(faces, jnp.int32)]
    return suggest_config(face_verts, height, width, config, margin)


def rasterise_batch(
    background, vertices, vertex_colors, faces,
    height=None, width=None, channels=None, config: RasterConfig | None = None,
):
    """Batched rasterization over leading dims of background/vertices/colors.

    ``faces`` is shared across the batch, matching the reference op. Scenes
    are rendered sequentially with ``lax.map`` — a single render already
    fills the chip, so batching adds no parallelism loss, and ``lax.map``
    composes cleanly with the custom VJP.
    """
    h, w, c = _resolve_shape(background, height, width, channels)
    vertices = jnp.asarray(vertices, jnp.float32)
    batch = vertices.shape[0]
    if background is None:
        background = jnp.zeros((batch, h, w, c), jnp.float32)
    config = config or RasterConfig()
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    def render_one(args):
        bg, verts, colors = args
        return rasterise(bg, verts, colors, faces, config=config)

    return jax.lax.map(render_one, (background, vertices, vertex_colors))
