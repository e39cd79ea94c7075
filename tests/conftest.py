import os

# Force the CPU backend with 8 virtual devices so multi-chip sharding
# paths are exercised without TPU hardware. Must run before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REFERENCE_DATA = "/root/reference/tests/data"


def data(path: str) -> str:
    return os.path.join(REFERENCE_DATA, path)
