"""Worker for test_multiprocess.py: one JAX process of a 2-process
sharded screen over gloo. Run as:
    python mp_screen_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from galah_tpu.parallel.distance import (  # noqa: E402
    sharded_screen_triangle_packed,
    sharded_screen_triangle_rowsharded,
)

rng = np.random.default_rng(0)
n, w = 3000, 16
x = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
for t in range(50):
    x[2 * t + 1] = x[2 * t]
sizes = np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)
mesh = Mesh(np.array(jax.devices()), ("rows",))
want = sorted((2 * t, 2 * t + 1) for t in range(50))

res = sharded_screen_triangle_packed(
    list(x), sizes, 15, 0.5, w * 32, mesh=mesh, block=512
)
got = sorted(map(tuple, res.pairs.tolist()))
assert got == want, f"proc {pid}: tiled pair mismatch ({len(got)} pairs)"

# The >HBM-budget row-sharded sweep over the same processes must agree.
res_rs = sharded_screen_triangle_rowsharded(
    list(x), sizes, 15, 0.5, w * 32, mesh=mesh, block=512
)
got_rs = sorted(map(tuple, res_rs.pairs.tolist()))
assert got_rs == want, (
    f"proc {pid}: rowsharded pair mismatch ({len(got_rs)} pairs)"
)
print(f"MP_OK proc={pid} pairs={len(got)} devices={jax.device_count()}")
