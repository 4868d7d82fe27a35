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

# Persistent compilation cache for the suite: tests re-jit many identical
# HLO programs (same kernels, same shapes, different test functions) and
# the cache is keyed by HLO hash, so it dedups compiles both within one
# run and across runs on this 1-core CPU environment.
from dirt_tpu.utils.compilecache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.environ.get("DIRT_TPU_TEST_CACHE", "/tmp/dirt_tpu_test_xla_cache")
)
