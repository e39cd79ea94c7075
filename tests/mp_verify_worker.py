"""Worker for test_multiprocess.py: one JAX process of a multi-process
END-TO-END dereplication (sharded screen + partitioned verify). Run as:
    python mp_verify_worker.py <process_id> <num_processes> <port> <corpus_dir>
"""

import glob
import os
import re
import sys

pid, nprocs, port, corpus = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)

import logging  # noqa: E402

logging.basicConfig(level=logging.INFO)

from galah_tpu.api import ClusterParameters, cluster_genomes  # noqa: E402

paths = sorted(glob.glob(os.path.join(corpus, "*.fna")))
assert paths, f"no corpus in {corpus}"
res = cluster_genomes(paths, ClusterParameters(threads=2))
got = sorted(sorted(c) for c in res.clusters)
fams = [re.match(r"fam(\d+)_", os.path.basename(p)).group(1) for p in paths]
want = sorted(
    sorted(i for i, f in enumerate(fams) if f == g) for g in sorted(set(fams))
)
assert got == want, f"proc {pid}: clusters {got} != families {want}"
print(f"MP_VERIFY_OK proc={pid} clusters={len(got)}")
