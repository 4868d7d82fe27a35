"""Persistent XLA compilation cache (process-spanning).

The axon transport compiles remotely and a cold 1024^2 packed fwd+bwd
step costs tens of seconds of compile time; round 3's driver benchmark
timed out INSIDE compiles and recorded a null metric. The JAX persistent
cache works on this transport (verified: second-process compile of a
cached executable drops ~1.3 s -> ~0.02 s), so every entrypoint that
jits production shapes (bench.py, bench_configs.py, demos, tools)
enables it first thing. Tests keep their own jit behavior (CPU
interpret mode compiles are cheap and the suite sets its own flags).
"""

from __future__ import annotations

import os

CACHE_DIR = os.environ.get(
    "DIRT_TPU_COMPILE_CACHE", "/root/.cache/dirt_tpu_xla"
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = cache_dir or CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        # Cache is an optimization only — never fail an entrypoint on it.
        pass
