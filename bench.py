"""Benchmark: forward+backward rasterization throughput (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene: ~10k-triangle UV sphere, perspective camera, 3 color channels,
1024x1024 (plus a 256x256 secondary measurement in the human-readable log).
value = Mpixels/s for one fused forward+backward step (render + L2 loss +
gradients w.r.t. vertices and colors), median of repeated timed runs.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
is this framework's round-1 first measurement on one TPU v5e chip, so the
series tracks self-improvement.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from dirt_tpu.utils.compilecache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from dirt_tpu.core import matrices, mesh  # noqa: E402
from dirt_tpu.ops.raster import RasterConfig  # noqa: E402
from dirt_tpu.utils.benchtime import device_time, device_time_stats  # noqa: E402
import dirt_tpu  # noqa: E402

# Wall-clock budget for the LOW-priority secondary measurements. The
# driver runs bench.py under a timeout; round 3's official metric was
# lost to rc=124 because the JSON line printed last (it now prints
# FIRST), and round 4's secondaries were ALL lost because the budget
# clock started before the tracked line's cold compiles (520 s of setup
# ate the whole 420 s budget — VERDICT r4 weak #1). The clock now starts
# AFTER the tracked line prints, the dense A/B and 256^2 lines are
# UNGATED (they always run — cheap with the persistent compile cache +
# configstore), and only the clip-path and 100k-tri lines check this
# budget.
SECONDARY_BUDGET_S = 600.0

# Round-1 first *honest* measurement on one TPU v5e chip (Mpix/s fwd+bwd at
# 1024^2, 10k-tri sphere), measured with utils/benchtime.device_time (the
# axon transport pipelines pipeline dispatch, so naive block_until_ready
# loops measure enqueue rate, not device time). Later rounds divide by this
# to show self-improvement.
BASELINE_MPIX_S = 18.8

# v5e single-chip peaks, for roofline context (how far each stage is from
# physics, not just from round 1): HBM bandwidth and bf16 MXU throughput.
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def _roofline(t_s, hbm_bytes):
    """(achieved GB/s over the *minimum* HBM traffic, % of speed of light).

    ``hbm_bytes`` is the information-theoretic floor: bytes that MUST cross
    HBM for the op (inputs read once + outputs written once). Achieved
    fraction near 100% => bandwidth-bound at speed of light; a small
    fraction (the usual case here) => the op is bound by iteration/compute
    cost, i.e. there is headroom that more fusion/packing could claim.
    """
    gbps = hbm_bytes / t_s / 1e9
    return gbps, 100.0 * gbps / V5E_HBM_GBPS


def _fwd_min_bytes(size, num_faces, channels=3):
    # Read: per-face screen verts + attrs (f32); write: the [H,W,C] image.
    read = num_faces * 3 * (4 + channels) * 4
    write = size * size * channels * 4
    return read + write


def _fwdbwd_min_bytes(size, num_faces, channels=3):
    # Forward traffic + read the [H,W,C] cotangent + re-read the G-buffer
    # coverage (fid + z) + write per-vertex grads (small).
    fwd = _fwd_min_bytes(size, num_faces, channels)
    bwd = size * size * (channels + 2) * 4 + num_faces * 3 * (4 + channels) * 4
    return fwd + bwd


@jax.jit
def _to_clip(verts_obj):
    # Jitted: ~30 eagerly dispatched matrix ops cost ~20 s of transport
    # round trips on the tunneled chip.
    mv = matrices.compose(
        matrices.rodrigues(jnp.array([0.4, 0.3, 0.0])),
        matrices.translation(jnp.array([0.0, 0.0, -3.0])),
    )
    proj = matrices.perspective_projection(0.1, 20.0, 0.045, 1.0)
    return matrices.transform_homogeneous(
        verts_obj, matrices.compose(mv, proj)
    )


def build(size):
    verts_obj, faces, _ = mesh.uv_sphere(n_lat=72, n_lon=72)
    clip = _to_clip(jnp.asarray(verts_obj))
    colors = jnp.asarray(
        np.random.RandomState(0).rand(len(verts_obj), 3), jnp.float32
    )
    bg = jnp.zeros((size, size, 3), jnp.float32)
    weights = jnp.asarray(
        np.random.RandomState(1).rand(size, size, 3), jnp.float32
    )
    return clip, colors, jnp.asarray(faces), bg, weights, len(verts_obj)


def honest_config(clip_verts, colors, faces, size, base=None, key=None):
    """Count-then-allocate caps that render the scene with NO truncation.

    The round-3 audit found the auto heuristics' expand cap silently (but
    flagged) truncating ~18% of covered pixels on this very scene at
    1024^2 — every number in this series is only meaningful if the render
    is complete, so the bench measures exact-cap configs and ASSERTS the
    overflow flag is clear.

    With ``key`` given, the suggested config is persisted in
    ``bench_cache/configs.json`` (utils/configstore) and later runs skip
    the two counting programs: they load the caps and only run the cheap
    jitted overflow CHECK, recomputing on a trip (stale entry). This is
    what keeps the driver's bench run inside its timeout with a cold
    process (VERDICT r4 weak #1).
    """
    import functools

    from dirt_tpu.ops.raster import suggest_config
    from dirt_tpu.ops.triangle_setup import screen_from_clip
    from dirt_tpu.utils import configstore

    def checked(config):
        check = jax.jit(functools.partial(
            dirt_tpu.rasterise_with_aux, config=config, clip=False
        ))
        _, _, _, overflow = check(
            jnp.zeros((size, size, 3), jnp.float32), clip_verts, colors,
            faces,
        )
        return not bool(overflow)

    if key is not None:
        cached = configstore.load_config(key)
        if cached is not None and checked(cached):
            return cached

    # Everything device-side is jitted: eager dispatch pays a transport
    # round trip PER OP on the tunneled chip (an eager check render took
    # minutes; jitted, seconds).
    fv = jax.jit(
        lambda cv, f: screen_from_clip(cv, size, size)[f]
    )(clip_verts, faces)
    config = suggest_config(fv, size, size, config=base)
    assert checked(config), "bench scene must render untruncated"
    if key is not None:
        configstore.save_config(key, config)
    return config


def bench_size(size, config=None, engine=None):
    clip, colors, faces, bg, weights, _ = build(size)
    if config is None:
        base = RasterConfig(engine=engine) if engine else None
        key = f"sphere72_{size}_{engine or 'auto'}"
        config = honest_config(
            clip, colors, faces, size, base=base, key=key
        )

    # clip=False keeps the tracked series measurement-compatible with
    # rounds 0-1 (near-plane clipping landed in round 2 and doubles the
    # static face array; the scene is entirely in front of the camera, so
    # the rendered image is identical). The GL-parity clip-on path is
    # reported separately in the human-readable log.
    #
    # ``weights`` is an ARGUMENT, not a closure capture: a closure-
    # captured [1024, 1024, 3] array becomes an embedded constant whose
    # derived values (shifts/pads of the upstream cotangent) XLA
    # constant-folds inside the timing loop — measured 227 MB executables
    # and ~10 min compiles vs 8 MB / ~60 s with it passed as a parameter.
    def loss(clip, colors, bg, w):
        img = dirt_tpu.rasterise(
            bg, clip, colors, faces, config=config, clip=False
        )
        return jnp.sum(img * w)

    step = jax.grad(loss, argnums=(0, 1, 2))
    fwd = lambda c, co, b, w: dirt_tpu.rasterise(
        b, c, co, faces, config=config, clip=False
    )

    # Small sizes need a wider rep spread: the differencing wants
    # (r2 - r1) * t well above the ~30 ms transport jitter, and a ~3 ms
    # 256^2 step at the default spread of 10 reps is marginal (one run
    # produced an invalid "0.00 ms" min before benchtime dropped
    # non-positive diffs).
    r2 = 12 if size >= 1024 else 42
    t_full, t_full_med = device_time_stats(
        step, (clip, colors, bg, weights), r2=r2
    )
    t_fwd, t_fwd_med = device_time_stats(
        fwd, (clip, colors, bg, weights), r2=r2
    )
    mpix = size * size / 1e6
    return {
        "size": size,
        "fwd_ms": t_fwd * 1e3,
        "fwd_med_ms": t_fwd_med * 1e3,
        "fwdbwd_ms": t_full * 1e3,
        "fwdbwd_med_ms": t_full_med * 1e3,
        "fwd_mpix_s": mpix / t_fwd,
        "fwdbwd_mpix_s": mpix / t_full,
    }


def bench_streaming_100k(size=1024):
    """Large-mesh CSR streaming path (~100k tris)."""
    verts_obj, faces, _ = mesh.uv_sphere(n_lat=224, n_lon=224)
    clip = _to_clip(jnp.asarray(verts_obj))
    colors = jnp.asarray(
        np.random.RandomState(0).rand(len(verts_obj), 3), jnp.float32
    )
    bg = jnp.zeros((size, size, 3), jnp.float32)
    faces = jnp.asarray(faces)
    # NOTE: auto resolves this 100k-face scene to the PACKED engine (the
    # round-2 auto switch) — the "streaming/CSR" label is historical.
    # Honest caps, same as the tracked scenes.
    config = honest_config(
        clip, colors, faces, size, key=f"sphere224_{size}_auto"
    )
    t, t_med = device_time_stats(
        lambda c, co, b: dirt_tpu.rasterise(
            b, c, co, faces, config=config, clip=False
        ),
        (clip, colors, bg), r1=2, r2=8, samples=3,
    )
    return faces.shape[0], t, t_med


def bench_clip_path(size=1024):
    """GL-parity path (near-plane clipping on, the public default)."""
    clip, colors, faces, bg, weights, _ = build(size)
    config = honest_config(
        clip, colors, faces, size, key=f"sphere72_{size}_auto"
    )

    def loss(c, co, b, w):
        img = dirt_tpu.rasterise(b, c, co, faces, config=config)
        return jnp.sum(img * w)

    return device_time_stats(
        jax.grad(loss, argnums=(0, 1, 2)), (clip, colors, bg, weights),
        r1=2, r2=12, samples=3,
    )


def _size_line(r, nf_sphere, backend):
    s = r["size"]
    g_f, p_f = _roofline(r["fwd_ms"] / 1e3, _fwd_min_bytes(s, nf_sphere))
    g_b, p_b = _roofline(
        r["fwdbwd_ms"] / 1e3, _fwdbwd_min_bytes(s, nf_sphere)
    )
    print(
        f"# {s}^2: fwd {r['fwd_ms']:.2f} ms (med {r['fwd_med_ms']:.2f}) "
        f"({r['fwd_mpix_s']:.1f} Mpix/s, {g_f:.0f} GB/s = {p_f:.1f}% of "
        f"HBM speed-of-light), fwd+bwd {r['fwdbwd_ms']:.2f} ms "
        f"(med {r['fwdbwd_med_ms']:.2f}) "
        f"({r['fwdbwd_mpix_s']:.1f} Mpix/s, {g_b:.0f} GB/s = {p_b:.1f}% "
        f"SOL) [{backend}]",
        file=sys.stderr,
    )


def main():
    backend = jax.default_backend()
    nf_sphere = 10224

    # THE TRACKED MEASUREMENT, and nothing before it: the JSON line must
    # reach the driver even if a later (secondary) measurement times out.
    r1024 = bench_size(1024)
    value = r1024["fwdbwd_mpix_s"]
    print(json.dumps({
        "metric": "Mpix/s fwd+bwd, 1024^2, 10k-tri sphere, 1 chip",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 3),
    }), flush=True)
    _size_line(r1024, nf_sphere, backend)

    # The budget clock starts AFTER the tracked line: its cold compiles
    # must never eat the secondaries' budget (VERDICT r4 weak #1).
    t_start = time.monotonic()

    def budget_left(label):
        spent = time.monotonic() - t_start
        if spent < SECONDARY_BUDGET_S:
            return True
        print(
            f"# secondary budget spent ({spent:.0f}s) — skipping {label}",
            file=sys.stderr,
        )
        return False

    # Tier 1 — UNGATED secondaries (always measured, every round).
    # Engine A/B at honest caps on the flagship scene: the packed
    # engine is the auto default and must re-earn that spot against
    # the v1 dense engine at every round (the round-2 packed "win"
    # was measured on a truncated render).
    r_dense = bench_size(1024, engine="dense")
    print(
        f"# 1024^2 dense-engine A/B: fwd {r_dense['fwd_ms']:.2f} ms "
        f"(med {r_dense['fwd_med_ms']:.2f}), fwd+bwd "
        f"{r_dense['fwdbwd_ms']:.2f} ms "
        f"(med {r_dense['fwdbwd_med_ms']:.2f}) "
        f"({r_dense['fwdbwd_mpix_s']:.1f} Mpix/s) vs packed "
        f"{r1024['fwdbwd_ms']:.2f} ms",
        file=sys.stderr,
    )
    _size_line(bench_size(256), nf_sphere, backend)

    # Tier 2 — budget-gated extras.
    if budget_left("clip path"):
        t_clip, t_clip_med = bench_clip_path()
        print(
            f"# 1024^2 with GL-parity clipping (public default): fwd+bwd "
            f"{t_clip*1e3:.2f} ms (med {t_clip_med*1e3:.2f}) "
            f"({1024*1024/1e6/t_clip:.1f} Mpix/s)",
            file=sys.stderr,
        )
    if budget_left("100k-tri"):
        nf, t100, t100_med = bench_streaming_100k()
        g_s, p_s = _roofline(t100, _fwd_min_bytes(1024, nf))
        print(
            f"# {nf}-tri fwd 1024^2: {t100*1e3:.1f} ms "
            f"(med {t100_med*1e3:.1f}) "
            f"({1024*1024/1e6/t100:.1f} Mpix/s, {g_s:.0f} GB/s = "
            f"{p_s:.1f}% SOL)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
