import os

# Force the CPU backend with 8 virtual devices so multi-chip sharding
# paths are exercised without TPU hardware. The XLA flag must be set
# before backend init; the platform is forced via jax.config because
# this environment's sitecustomize overrides JAX_PLATFORMS.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DATA = "/root/reference/tests/data"


def data(path: str) -> str:
    return os.path.join(REFERENCE_DATA, path)
