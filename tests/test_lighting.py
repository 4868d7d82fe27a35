import jax
import jax.numpy as jnp
import numpy as np

from dirt_tpu.core import lighting, mesh


def test_vertex_normals_flat_quad():
    vertices, faces = mesh.unit_quad()
    n = lighting.vertex_normals(jnp.asarray(vertices), jnp.asarray(faces))
    np.testing.assert_allclose(n, np.tile([0.0, 0.0, 1.0], (4, 1)), atol=1e-6)


def test_vertex_normals_cube_point_outward():
    vertices, faces = mesh.cube()
    n = np.asarray(lighting.vertex_normals(jnp.asarray(vertices), jnp.asarray(faces)))
    # Unit length, and each corner normal points into the corner's octant
    # (area weighting skews it off the exact diagonal on a split cube).
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    corner_dir = vertices / np.linalg.norm(vertices, axis=1, keepdims=True)
    assert (np.sum(n * corner_dir, axis=1) > 0.5).all()


def test_vertex_normals_batched():
    vertices, faces = mesh.cube()
    batch = jnp.stack([jnp.asarray(vertices), jnp.asarray(vertices) * 2.0])
    n = lighting.vertex_normals(batch, jnp.asarray(faces))
    assert n.shape == (2, 8, 3)
    np.testing.assert_allclose(n[0], n[1], atol=1e-5)


def test_split_vertices_by_face():
    vertices, faces = mesh.cube()
    sv, sf = lighting.split_vertices_by_face(
        jnp.asarray(vertices), jnp.asarray(faces)
    )
    assert sv.shape == (36, 3)
    assert sf.shape == (12, 3)
    np.testing.assert_array_equal(np.asarray(sf).reshape(-1), np.arange(36))
    np.testing.assert_allclose(sv[:3], vertices[faces[0]])


def test_vertex_normals_pre_split_flat():
    vertices, faces = mesh.cube()
    sv, sf = lighting.split_vertices_by_face(
        jnp.asarray(vertices), jnp.asarray(faces)
    )
    n = np.asarray(lighting.vertex_normals_pre_split(sv, sf))
    # First two faces are the -z face of the cube.
    np.testing.assert_allclose(n[:6], np.tile([0, 0, -1.0], (6, 1)), atol=1e-5)


def test_diffuse_directional():
    normals = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    colors = jnp.ones((2, 3))
    out = lighting.diffuse_directional(
        normals, colors, jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.5, 0.25])
    )
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0], atol=1e-6)
    both = lighting.diffuse_directional(
        normals, colors, jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.5, 0.25]), double_sided=True,
    )
    np.testing.assert_allclose(both[1], [1.0, 0.5, 0.25], atol=1e-6)


def test_specular_directional_peak_at_mirror_angle():
    # Surface at origin facing +z, camera straight above, light straight
    # above: the reflection of the light is exactly the view direction.
    pos = jnp.zeros((1, 3))
    nrm = jnp.array([[0.0, 0.0, 1.0]])
    col = jnp.ones((1, 3))
    out = lighting.specular_directional(
        pos, nrm, col,
        camera_position=jnp.array([0.0, 0.0, 5.0]),
        light_direction=jnp.array([0.0, 0.0, 1.0]),
        light_color=jnp.ones(3),
        shininess=10.0,
    )
    np.testing.assert_allclose(out[0], [1.0, 1.0, 1.0], atol=1e-5)
    # Grazing light from behind: no highlight.
    out2 = lighting.specular_directional(
        pos, nrm, col,
        camera_position=jnp.array([0.0, 0.0, 5.0]),
        light_direction=jnp.array([0.0, 0.0, -1.0]),
        light_color=jnp.ones(3),
        shininess=10.0,
    )
    np.testing.assert_allclose(out2[0], [0.0, 0.0, 0.0], atol=1e-6)


def test_lighting_is_differentiable():
    vertices, faces = mesh.cube()
    vertices = jnp.asarray(vertices)

    def loss(v):
        n = lighting.vertex_normals(v, jnp.asarray(faces))
        shaded = lighting.diffuse_directional(
            n, jnp.ones((8, 3)), jnp.array([0.577, 0.577, 0.577]), jnp.ones(3)
        )
        return jnp.sum(shaded**2)

    g = jax.grad(loss)(vertices)
    assert g.shape == vertices.shape
    assert np.isfinite(np.asarray(g)).all()
