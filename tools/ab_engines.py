"""Engine A/B at honest caps: packed vs dense, 1024^2 and 256^2.

VERDICT round-3 #2: the auto default engine must re-earn its spot each
round on measured numbers. Prints fwd / fwd+bwd for both engines on the
flagship 10k-tri sphere at both driver resolutions.

Run: python tools/ab_engines.py [sizes...]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dirt_tpu.utils.compilecache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import bench_size  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 256]
    for size in sizes:
        for engine in ("packed", "dense"):
            r = bench_size(size, engine=engine)
            print(
                f"{size}^2 {engine:7s} fwd {r['fwd_ms']:6.2f} ms "
                f"(med {r['fwd_med_ms']:6.2f})  fwd+bwd "
                f"{r['fwdbwd_ms']:6.2f} ms (med {r['fwdbwd_med_ms']:6.2f})"
                f"  {r['fwdbwd_mpix_s']:6.1f} Mpix/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
