"""Vertex normals and per-vertex lighting models (pure JAX).

Functional parity with the reference's ``dirt/lighting.py`` (reconstructed;
see SURVEY.md section 2.2): ``vertex_normals``, ``vertex_normals_pre_split``,
``split_vertices_by_face``, ``diffuse_directional``, ``specular_directional``.

Conventions:

* Meshes are counter-clockwise wound when viewed from outside; normals point
  outward.
* ``light_direction`` is the unit vector pointing **from the surface toward
  the light** (so a light overhead along +y has direction (0, 1, 0)).
* All functions broadcast over leading batch dimensions of the vertex
  arrays; ``faces`` is shared across the batch (``[F, 3] int32``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _face_cross_products(vertices, faces):
    """Unnormalised face normals (2x face area magnitude), [..., F, 3]."""
    v0 = jnp.take(vertices, faces[:, 0], axis=-2)
    v1 = jnp.take(vertices, faces[:, 1], axis=-2)
    v2 = jnp.take(vertices, faces[:, 2], axis=-2)
    return jnp.cross(v1 - v0, v2 - v0)


def vertex_normals(vertices, faces, epsilon: float = 1e-12):
    """Area-weighted smooth vertex normals.

    Each face's (unnormalised) normal is scatter-added to its three vertices
    — the cross-product magnitude is twice the face area, giving the usual
    area weighting — then normalised.

    Args:
        vertices: [..., V, 3] float.
        faces: [F, 3] int32.
    Returns:
        [..., V, 3] unit normals.
    """
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces, jnp.int32)
    num_vertices = vertices.shape[-2]
    cross = _face_cross_products(vertices, faces)  # [..., F, 3]

    def scatter(c):
        acc = jnp.zeros((num_vertices, 3), c.dtype)
        for k in range(3):
            acc = acc.at[faces[:, k]].add(c)
        return acc

    batch = vertices.shape[:-2]
    flat = cross.reshape((-1,) + cross.shape[-2:])
    acc = jax.vmap(scatter)(flat).reshape(batch + (num_vertices, 3))
    norm = jnp.sqrt(jnp.sum(acc * acc, axis=-1, keepdims=True) + epsilon)
    return acc / norm


def split_vertices_by_face(vertices, faces):
    """Duplicate vertices so every face owns a private copy of its corners.

    Used for flat shading and per-face attributes, mirroring the reference's
    helper of the same name.

    Args:
        vertices: [..., V, 3-or-D] float.
        faces: [F, 3] int32.
    Returns:
        (new_vertices [..., F*3, D], new_faces [F, 3] = arange(F*3)).
    """
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces, jnp.int32)
    flat_idx = faces.reshape(-1)  # [F*3]
    new_vertices = jnp.take(vertices, flat_idx, axis=-2)
    new_faces = jnp.arange(faces.shape[0] * 3, dtype=jnp.int32).reshape(-1, 3)
    return new_vertices, new_faces


def vertex_normals_pre_split(vertices, faces, epsilon: float = 1e-12):
    """Normals for a mesh already split by ``split_vertices_by_face``.

    Every vertex belongs to exactly one face, so its normal is that face's
    unit normal (flat shading).
    """
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces, jnp.int32)
    cross = _face_cross_products(vertices, faces)  # [..., F, 3]
    norm = jnp.sqrt(jnp.sum(cross * cross, axis=-1, keepdims=True) + epsilon)
    face_normals = cross / norm
    # Each face's three vertices receive its normal.
    per_vertex = jnp.repeat(face_normals, 3, axis=-2)  # [..., F*3, 3]
    num_vertices = vertices.shape[-2]
    # For a pre-split mesh faces == arange, so per_vertex rows already align
    # with vertex rows; guard anyway by scattering through the face indices.
    flat_idx = faces.reshape(-1)

    def scatter(src):
        return jnp.zeros((num_vertices, 3), src.dtype).at[flat_idx].set(src)

    batch = vertices.shape[:-2]
    flat = per_vertex.reshape((-1,) + per_vertex.shape[-2:])
    out = jax.vmap(scatter)(flat).reshape(batch + (num_vertices, 3))
    return out


def _clamped_cosine(normals, direction, double_sided):
    cos = jnp.sum(normals * direction, axis=-1, keepdims=True)
    if double_sided:
        return jnp.abs(cos)
    return jnp.maximum(cos, 0.0)


def diffuse_directional(
    vertex_normals, vertex_colors, light_direction, light_color,
    double_sided: bool = False,
):
    """Lambertian shading from a directional light.

    Args:
        vertex_normals: [..., V, 3] unit normals.
        vertex_colors: [..., V, C] albedo.
        light_direction: [..., 3] unit vector toward the light.
        light_color: [..., C].
        double_sided: light both faces (|N.L| instead of max(N.L, 0)).
    Returns:
        [..., V, C] reflected color.
    """
    normals = jnp.asarray(vertex_normals)
    colors = jnp.asarray(vertex_colors)
    direction = jnp.asarray(light_direction)[..., None, :]
    lcolor = jnp.asarray(light_color)[..., None, :]
    cos = _clamped_cosine(normals, direction, double_sided)
    return colors * lcolor * cos


def specular_directional(
    vertex_positions, vertex_normals, vertex_colors, camera_position,
    light_direction, light_color, shininess, double_sided: bool = False,
):
    """Phong specular highlight from a directional light.

    The light direction is reflected about the vertex normal and dotted with
    the view direction, raised to ``shininess``.

    Args:
        vertex_positions: [..., V, 3] world/eye-space positions.
        vertex_normals: [..., V, 3] unit normals.
        vertex_colors: [..., V, C] specular albedo.
        camera_position: [..., 3] position the scene is viewed from.
        light_direction: [..., 3] unit vector toward the light.
        light_color: [..., C].
        shininess: scalar Phong exponent.
    Returns:
        [..., V, C] specular contribution.
    """
    positions = jnp.asarray(vertex_positions)
    normals = jnp.asarray(vertex_normals)
    colors = jnp.asarray(vertex_colors)
    cam = jnp.asarray(camera_position)[..., None, :]
    ldir = jnp.asarray(light_direction)[..., None, :]
    lcolor = jnp.asarray(light_color)[..., None, :]

    view = cam - positions
    view = view / jnp.sqrt(jnp.sum(view * view, axis=-1, keepdims=True) + 1e-12)
    cos_nl = jnp.sum(normals * ldir, axis=-1, keepdims=True)
    if double_sided:
        sign = jnp.sign(jnp.where(cos_nl == 0.0, 1.0, cos_nl))
        normals = normals * sign
        cos_nl = jnp.abs(cos_nl)
    # Reflection of the (toward-light) direction about the normal.
    reflected = 2.0 * cos_nl * normals - ldir
    cos_rv = jnp.maximum(jnp.sum(reflected * view, axis=-1, keepdims=True), 0.0)
    # No highlight on faces turned away from the light.
    lit = (cos_nl > 0.0).astype(positions.dtype)
    return colors * lcolor * lit * jnp.power(cos_rv, shininess)
