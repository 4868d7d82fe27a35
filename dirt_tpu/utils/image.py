"""Minimal image IO (PPM/PGM writers) — keeps demos dependency-free.

The reference's samples save images via matplotlib/cv2; here demos write
binary PPM (P6) which every viewer reads, avoiding extra deps in the image.
"""

from __future__ import annotations

import numpy as np


def to_uint8(image):
    """Clamp a float image [..., C] in [0, 1] to uint8."""
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_ppm(path: str, image) -> None:
    """Save [H, W, 3] (P6) or [H, W]/[H, W, 1] (P5) image, values in [0,1]."""
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    data = to_uint8(img)
    if data.ndim == 2:
        header = f"P5\n{data.shape[1]} {data.shape[0]}\n255\n"
    elif data.ndim == 3 and data.shape[-1] == 3:
        header = f"P6\n{data.shape[1]} {data.shape[0]}\n255\n"
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())


def load_ppm(path: str):
    """Load a binary P5/P6 file written by save_ppm; returns float [0,1]."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        dims = f.readline().split()
        maxval = int(f.readline())
        w, h = int(dims[0]), int(dims[1])
        data = np.frombuffer(f.read(), np.uint8)
    if magic == b"P5":
        img = data.reshape(h, w)
    elif magic == b"P6":
        img = data.reshape(h, w, 3)
    else:
        raise ValueError(f"unsupported magic {magic!r}")
    return img.astype(np.float32) / maxval
