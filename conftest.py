"""Test configuration: force an 8-device CPU mesh.

SURVEY.md section 4: multi-chip behavior is tested on CPU with
xla_force_host_platform_device_count=8; Pallas kernels run in interpreter
mode off-TPU (dirt_tpu.config.use_interpret).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
