"""Platform helpers.

This container's sitecustomize registers the `axon` TPU plugin and
pins jax_platforms via jax.config, so plain JAX_PLATFORMS env settings
are ignored. force_cpu() is the reliable way to run host-only."""

from __future__ import annotations


def force_cpu() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")


def backend() -> str:
    import jax

    return jax.default_backend()


def enable_compile_cache() -> None:
    """Point JAX at the persistent compilation cache.

    Remote-relay TPU compiles cost minutes per program; every entry
    point that can touch the chip (CLI, bench.py, benchmarks/) must
    call this before the first trace or a cold process pays the full
    compile bill again (a 256-genome verify probe measured 202s of
    compiles out of a 209s cold run). Disable with
    GALAH_TPU_NO_COMPILE_CACHE=1; JAX_COMPILATION_CACHE_DIR overrides
    the location."""
    import os

    if os.environ.get("GALAH_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "galah_tpu", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
