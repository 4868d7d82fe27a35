"""Persistent store of count-then-allocate RasterConfigs, keyed by scene.

The bench's honest-caps policy (BASELINE.md round-3 correction) requires a
``suggest_config`` pass per scene: two jitted counting programs plus an
overflow-check render. On the tunneled chip a COLD run of that setup costs
minutes of compile time, and round 4's driver bench burned its whole
secondary budget inside it (VERDICT r4 weak #1) — no A/B, 256², clip or
100k number made the official record. Suggested configs are deterministic
for a deterministic scene, so they are cached here (a small JSON file,
committed to the repo) and each bench run only re-VALIDATES the cached
caps with one cheap jitted overflow check, falling back to a fresh
``suggest_config`` when the check trips (scene changed, stale entry).

Reference parity note: the reference needs nothing like this — GL sizes
its own buffers (csrc/rasterise_egl.cpp ≈L1-500, reconstructed); on TPU
the static-shape caps are explicit, and this store is bookkeeping for the
bench harness only, not part of the rendering API.
"""

from __future__ import annotations

import json
import os

DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "bench_cache",
    "configs.json",
)

# Bump when RasterConfig fields or suggest_config semantics change in a
# way that invalidates stored caps wholesale.
FORMAT = 4  # 4: work_cap field (r5 live-prefix binning slice)


def _load_all(path: str) -> dict:
    try:
        with open(path) as f:
            data = json.load(f)
        if data.get("format") != FORMAT:
            return {"format": FORMAT}
        return data
    except Exception:
        return {"format": FORMAT}


def load_config(key: str, path: str | None = None):
    """Return the stored RasterConfig for ``key``, or None."""
    from dirt_tpu.ops.raster import RasterConfig

    path = path or DEFAULT_PATH
    entry = _load_all(path).get(key)
    if not isinstance(entry, dict):
        return None
    fields = set(RasterConfig._fields)
    if set(entry) - fields:
        return None
    try:
        return RasterConfig(**entry)
    except TypeError:
        return None


def save_config(key: str, config, path: str | None = None) -> None:
    """Persist ``config`` under ``key`` (best-effort; never raises)."""
    path = path or DEFAULT_PATH
    try:
        data = _load_all(path)
        data[key] = dict(config._asdict())
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except Exception:
        pass
