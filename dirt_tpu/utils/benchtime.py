"""Honest device timing under asynchronous/remote JAX runtimes.

On tunneled platforms (e.g. the ``axon`` TPU transport) ``block_until_ready``
returns before the computation actually retires, and a host scalar fetch
carries ~tens of ms of round-trip latency. Naive ``perf_counter`` loops
therefore measure enqueue rate, not device time.

``device_time`` measures honestly by compiling a fori_loop that re-runs the
workload R times with a data-dependent perturbation (so XLA cannot CSE the
iterations), fetching a scalar (which forces completion), and differencing
two repetition counts so the fixed round-trip latency and dispatch overhead
cancel exactly:

    t_per_rep = (T(r2) - T(r1)) / (r2 - r1)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _loop_runner(fn, example_args, reps):
    """Build a jitted scalar-returning function running ``fn`` reps times."""

    def run():
        def body(i, acc):
            # Perturb the first argument by a tiny data-dependent amount so
            # iterations cannot be collapsed; the perturbation (1e-30 * acc)
            # is far below f32 resolution of any practical input.
            eps = acc * 1e-30
            args = [example_args[0] + eps] + list(example_args[1:])
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)
            return acc + s * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return jax.jit(run)


def device_time(fn, example_args, r1: int = 2, r2: int = 12,
                samples: int = 3) -> float:
    """Median seconds per invocation of ``fn(*example_args)`` on device."""
    f1 = _loop_runner(fn, example_args, r1)
    f2 = _loop_runner(fn, example_args, r2)
    float(f1())  # compile + warm
    float(f2())

    def sample(f):
        vals = []
        for _ in range(samples):
            t0 = time.perf_counter()
            float(f())
            vals.append(time.perf_counter() - t0)
        # Timing noise is one-sided (spikes); min is the robust estimator
        # and keeps the t2 - t1 difference unbiased.
        return min(vals)

    t1 = sample(f1)
    t2 = sample(f2)
    return max(t2 - t1, 1e-9) / (r2 - r1)
