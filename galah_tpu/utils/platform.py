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
