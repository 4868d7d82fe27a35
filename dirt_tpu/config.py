"""Global configuration for dirt_tpu.

The Pallas kernels compile for TPU via Mosaic; on any other backend (CPU in
tests / CI) they run under the Pallas interpreter, which is bit-compatible
with the compiled path for the f32 math used here.
"""

from __future__ import annotations

import os

import jax

# Allow forcing interpreter mode (e.g. for debugging on a real TPU).
_FORCE_INTERPRET = os.environ.get("DIRT_TPU_FORCE_INTERPRET", "") == "1"


def use_interpret() -> bool:
    """Whether pallas_call should run in interpreter mode."""
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() != "tpu"


# Default image-space tile size for the raster kernels. The lane (width)
# dimension is 128 to match the VPU's 8x128 register shape; the sublane
# (height) dimension is a multiple of 8.
TILE_H = 32
TILE_W = 128

# Default cap on the number of triangles binned to a single tile. Binned
# face lists are static-shape [num_tiles, bin_cap]; overflow is reported via
# the `overflow` field of the binning result (never silently truncated
# without a flag).
DEFAULT_BIN_CAP = 1024
