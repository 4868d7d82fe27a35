"""OBJ loader: native C++ parser vs pure-Python reference, semantics."""

import os
import time

import numpy as np
import pytest

from dirt_tpu.io.objloader import _native_lib, load_obj

CUBE_OBJ = """\
# comment line
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
vn 0 0 -1
f 1/1/1 2/2/1 3/3/1 4/4/1
f 6/1/2 5/2/2 8/3/2 7/4/2
"""


def _write(tmp_path, text):
    p = os.path.join(tmp_path, "mesh.obj")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_python_parser_quads_and_split(tmp_path):
    p = _write(tmp_path, CUBE_OBJ)
    m = load_obj(p, native=False)
    # two quads -> 4 triangles; 8 unique corner triplets
    assert m.faces.shape == (4, 3)
    assert m.vertices.shape == (8, 3)
    assert m.has_uv and m.has_normal
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(m.faces[1], [0, 2, 3])
    np.testing.assert_allclose(m.uvs[0], [0, 0])
    np.testing.assert_allclose(m.normals[0], [0, 0, 1])


def test_negative_and_mixed_indices(tmp_path):
    p = _write(tmp_path, "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m = load_obj(p, native=False)
    assert m.faces.shape == (1, 3)
    assert not m.has_uv and not m.has_normal
    np.testing.assert_allclose(m.vertices[m.faces[0]][:, 0], [0, 1, 0])


def test_trailing_comment_on_face_line(tmp_path):
    # ADVICE.md round 1: 'f 1 2 3 # 4' must yield ONE triangle (tokens
    # after '#' are comment text), matching the C++ break-at-comment rule.
    text = (
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0  # vertex comment\n"
        "f 1 2 3 # 4\n"
        "f 1 2 4 #4\n"
    )
    p = _write(tmp_path, text)
    mp = load_obj(p, native=False)
    assert mp.faces.shape == (2, 3)
    assert mp.vertices.shape[0] == 4
    if _native_lib() is not None:
        mn = load_obj(p, native=True)
        np.testing.assert_array_equal(mp.faces, mn.faces)
        np.testing.assert_allclose(mp.vertices, mn.vertices, atol=1e-6)


def test_native_matches_python(tmp_path):
    if _native_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    lines = []
    nv = 200
    for v in rng.rand(nv, 3):
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for t in rng.rand(50, 2):
        lines.append(f"vt {t[0]:.6f} {t[1]:.6f}")
    for n in rng.rand(30, 3):
        lines.append(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}")
    for _ in range(300):
        ids = rng.randint(1, nv + 1, 3)
        tid = rng.randint(1, 51, 3)
        nid = rng.randint(1, 31, 3)
        style = rng.randint(4)
        if style == 0:
            lines.append(f"f {ids[0]} {ids[1]} {ids[2]}")
        elif style == 1:
            lines.append(
                f"f {ids[0]}/{tid[0]} {ids[1]}/{tid[1]} {ids[2]}/{tid[2]}")
        elif style == 2:
            lines.append(
                f"f {ids[0]}//{nid[0]} {ids[1]}//{nid[1]} {ids[2]}//{nid[2]}")
        else:
            lines.append(
                f"f {ids[0]}/{tid[0]}/{nid[0]} {ids[1]}/{tid[1]}/{nid[1]} "
                f"{ids[2]}/{tid[2]}/{nid[2]}")
    p = _write(tmp_path, "\n".join(lines) + "\n")

    mp = load_obj(p, native=False)
    mn = load_obj(p, native=True)
    np.testing.assert_array_equal(mp.faces, mn.faces)
    np.testing.assert_allclose(mp.vertices, mn.vertices, atol=1e-6)
    np.testing.assert_allclose(mp.uvs, mn.uvs, atol=1e-6)
    np.testing.assert_allclose(mp.normals, mn.normals, atol=1e-6)
    assert mp.has_uv == mn.has_uv and mp.has_normal == mn.has_normal


def test_native_speed_on_large_mesh(tmp_path):
    if _native_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(1)
    nv = 120_000
    verts = rng.rand(nv, 3).astype(np.float32)
    faces = rng.randint(1, nv + 1, (240_000, 3))
    with open(os.path.join(tmp_path, "big.obj"), "w") as f:
        np.savetxt(f, verts, fmt="v %.6f %.6f %.6f")
        np.savetxt(f, faces, fmt="f %d %d %d")
    p = os.path.join(tmp_path, "big.obj")
    t0 = time.time()
    m = load_obj(p, native=True)
    dt = time.time() - t0
    assert m.faces.shape == (240_000, 3)
    # The C++ parser chews ~10 MB of OBJ text in well under a second on an
    # idle machine; the bound is a loose catastrophic-slowdown guard only —
    # wall clock under concurrent test load is not a benchmark (a 2 s bound
    # flaked whenever the suite shared the box with another run).
    assert dt < 15.0, f"native load took {dt:.2f}s"


def test_loaded_mesh_renders(tmp_path):
    import jax.numpy as jnp
    import dirt_tpu

    p = _write(tmp_path, CUBE_OBJ)
    m = load_obj(p, native=False)
    scale = 0.5
    verts = jnp.concatenate(
        [jnp.asarray(m.vertices) * scale,
         jnp.ones((len(m.vertices), 1), jnp.float32)], axis=-1)
    colors = jnp.ones((len(m.vertices), 1), jnp.float32)
    img = dirt_tpu.rasterise(
        None, verts, colors, jnp.asarray(m.faces),
        height=32, width=128, channels=1)
    assert float(jnp.max(img)) == 1.0
