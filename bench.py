"""Benchmark: genome-pairs/s of the all-vs-all sketch screen on one
chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (galah) publishes no numbers (BASELINE.md);
its compute engine skani sweeps ~1e6 genome-pairs/s on a 32-core host
for triangle mode (order-of-magnitude from the skani paper's
50k-genomes-in-minutes claim). vs_baseline is pairs_per_s / 1e6 against
that documented estimate.

Timing notes for this environment: the tunneled axon TPU has ~25ms
per-dispatch overhead and block_until_ready does not reliably block, so
the workload is sized to make device time dominate and results are
fetched to host for timing.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/galah_tpu_jax_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    # Workload: 8192 genome sketches, 2^17-bit indicators (~10% load at
    # the default scale for ~3Mb genomes) -> 33.5M pairs per sweep.
    # Synthetic sketches are generated ON DEVICE: the tunneled test rig
    # has very low host<->device bandwidth, and the screen's production
    # input (sketches) is tiny compared to the indicator matrix anyway.
    N = 8192
    B = 1 << 17
    K = 15

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def make_inputs(key):
        x = jax.random.bernoulli(key, 0.1, (N, B)).astype(dtype)
        sizes = jnp.sum(x.astype(jnp.float32), axis=1)
        return x, sizes

    print(f"bench: backend={jax.default_backend()}", file=sys.stderr, flush=True)
    t_setup = time.perf_counter()
    x, sizes = make_inputs(jax.random.PRNGKey(0))
    x.block_until_ready()
    print(
        f"bench: inputs ready in {time.perf_counter() - t_setup:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    @jax.jit
    def screen(xs, sz):
        counts = jax.lax.dot_general(
            xs,
            xs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = sz[:, None]
        b = sz[None, :]
        bits_f = float(B)
        c1 = jnp.maximum(counts - a * b / bits_f, 0.0)
        c = jnp.maximum(counts - (a - c1) * (b - c1) / bits_f, 0.0)
        cont = jnp.minimum(c / jnp.maximum(jnp.minimum(a, b), 1.0), 1.0)
        ani = jnp.power(jnp.maximum(cont, 1e-30), 1.0 / K) * 100.0
        # sparse-extraction proxy: count of above-threshold pairs
        return jnp.sum(ani >= 85.0)

    # compile + warmup; fetch the scalar so async dispatch can't fool
    # the timer.
    t_compile = time.perf_counter()
    float(screen(x, sizes))
    print(
        f"bench: compile+warmup {time.perf_counter() - t_compile:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        float(screen(x, sizes))
    dt = (time.perf_counter() - t0) / iters

    pairs = N * (N - 1) / 2
    pairs_per_s = pairs / dt

    baseline_pairs_per_s = 1e6  # 32-core skani triangle, documented estimate
    print(
        json.dumps(
            {
                "metric": "screen_genome_pairs_per_s",
                "value": round(pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
