"""Config #2: 12-triangle cube, perspective camera, z-buffer + vertex-color
interpolation at 256^2."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import dirt_tpu
from dirt_tpu.core import matrices, mesh
from dirt_tpu.utils.image import save_ppm

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    os.makedirs(OUT, exist_ok=True)
    verts_obj, faces = mesh.cube()

    model_view = matrices.compose(
        matrices.rodrigues(jnp.array([0.5, 0.8, 0.0])),
        matrices.translation(jnp.array([0.0, 0.0, -3.0])),
    )
    projection = matrices.perspective_projection(
        near=0.1, far=20.0, right=0.05, aspect=1.0
    )
    clip = matrices.transform_homogeneous(
        jnp.asarray(verts_obj), matrices.compose(model_view, projection)
    )
    colors = jnp.asarray(verts_obj + 0.5, jnp.float32)  # RGB from position

    image = dirt_tpu.rasterise(
        jnp.full((256, 256, 3), 0.1, jnp.float32), clip, colors,
        jnp.asarray(faces),
    )
    image = np.asarray(image)
    cov = (image.sum(-1) > 0.4).mean()
    print(f"cube: coverage fraction {cov:.3f}")
    save_ppm(os.path.join(OUT, "demo2_cube.ppm"), image)
    assert 0.05 < cov
    print("saved", os.path.join(OUT, "demo2_cube.ppm"))


if __name__ == "__main__":
    main()
