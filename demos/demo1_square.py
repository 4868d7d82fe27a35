"""Config #1: single flat-color triangle + square, 64x64, orthographic.

The dirt_tpu equivalent of the reference's minimal smoke sample
(``samples/square.py``, reconstructed — SURVEY.md section 2.2).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import dirt_tpu
from dirt_tpu.utils.image import save_ppm

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    os.makedirs(OUT, exist_ok=True)
    # A white square (two triangles) in clip space, orthographic (w = 1).
    vertices = jnp.array(
        [
            [-0.5, -0.5, 0.0, 1.0],
            [0.5, -0.5, 0.0, 1.0],
            [0.5, 0.5, 0.0, 1.0],
            [-0.5, 0.5, 0.0, 1.0],
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors = jnp.ones((4, 1), jnp.float32)

    image = dirt_tpu.rasterise(
        None, vertices, colors, faces, height=64, width=64, channels=1
    )
    image = np.asarray(image)
    coverage = (image[..., 0] > 0.5).sum()
    print(f"square: {coverage} covered pixels (expect 1024 = 32x32)")
    save_ppm(os.path.join(OUT, "demo1_square.ppm"), image)
    assert abs(int(coverage) - 1024) <= 64
    print("saved", os.path.join(OUT, "demo1_square.ppm"))


if __name__ == "__main__":
    main()
