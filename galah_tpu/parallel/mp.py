"""Multi-process coordination helpers.

Every multi-process feature here relies on the lockstep contract the
sharded screen established (parallel/distance.py): the host-side
pipeline is deterministic and runs identically on every process, so
each process reaches the same collectives in the same order.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Callable, Dict, List, Sequence

import numpy as np

logger = logging.getLogger(__name__)


_governed_cache: Dict[str, bool] = {}


def governed_flag(env_name: str) -> bool:
    """True unless process 0 set `env_name=0`.

    Process 0's setting is broadcast to every process: a per-host env
    mismatch must not desynchronize the collective schedule (one
    process skipping an allgather = silent deadlock). Call this from
    EVERY process (it is itself a collective when process_count > 1).
    The broadcast result is memoized per env name — env cannot change
    mid-run, and hot paths (one bidirectional() per verify flush) must
    not pay a DCN round trip just to re-read a flag.
    """
    import jax

    local = os.environ.get(env_name) != "0"
    if jax.process_count() <= 1:
        return local
    if env_name not in _governed_cache:
        from jax.experimental import multihost_utils

        flag = np.array([local], np.bool_)
        _governed_cache[env_name] = bool(
            np.asarray(multihost_utils.broadcast_one_to_all(flag))[0]
        )
    return _governed_cache[env_name]


def exchange_blobs(
    n_items: int,
    my_blob: Callable[[int], bytes],
    on_blob: Callable[[int, bytes], None],
    chunk: int = 16,
) -> None:
    """All-to-all exchange of round-robin-owned byte blobs.

    Item i is owned by process `i % process_count`; `my_blob(i)` is
    called for owned items, and `on_blob(i, blob)` for every item
    another process produced. Blobs travel through padded uint8
    process_allgathers, `chunk` owned items per round — two collectives
    per round, bounded peak memory of ~nproc x chunk x max_blob.
    """
    import jax
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    me = jax.process_index()
    kmax = math.ceil(n_items / nproc)
    for k0 in range(0, kmax, chunk):
        ks = range(k0, min(k0 + chunk, kmax))
        lens = np.zeros(len(ks), np.int64)
        parts: List[bytes] = []
        for j, k in enumerate(ks):
            gi = me + k * nproc
            if gi < n_items:
                b = my_blob(gi)
                lens[j] = len(b)
                parts.append(b)
        payload = b"".join(parts)
        lens_g = np.asarray(multihost_utils.process_allgather(lens))
        maxlen = int(lens_g.sum(axis=1).max())
        buf = np.zeros(maxlen, np.uint8)
        if payload:
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        buf_g = np.asarray(multihost_utils.process_allgather(buf))
        for p in range(nproc):
            if p == me:
                continue
            off = 0
            for j, k in enumerate(ks):
                gi = p + k * nproc
                ln = int(lens_g[p, j])
                if gi < n_items and ln:
                    on_blob(gi, buf_g[p, off : off + ln].tobytes())
                    off += ln


def exchange_sketches(
    paths: Sequence[str],
    get_local,
    put,
    expect_params=None,
) -> None:
    """Share round-robin-partitioned sketches across all processes.

    `get_local(path)` returns the locally computed NativeSketch for
    owned paths; `put(path, sketch)` stores a received one.
    `expect_params` (the local context's NativeSketchParams) rejects
    peers that sketched at different bitmap widths — mixed widths in
    one batch crash far away from the cause (screen stacking,
    pair-table fixed shapes), so fail fast with the culprit named.
    """
    import io

    from galah_tpu.sketch.store import dump_sketch, load_sketch

    def my_blob(i: int) -> bytes:
        fh = io.BytesIO()
        dump_sketch(get_local(paths[i]), fh, compress=False)
        return fh.getvalue()

    def on_blob(i: int, blob: bytes) -> None:
        sk = load_sketch(io.BytesIO(blob))
        if expect_params is not None and sk.params != expect_params:
            raise RuntimeError(
                f"sketch for {paths[i]} arrived from a peer with "
                f"different sketch parameters ({sk.params} != "
                f"{expect_params}); hosts must resolve identical "
                "bitmap widths (check per-host filesystem visibility "
                "of the genome files)"
            )
        put(paths[i], sk)

    exchange_blobs(len(paths), my_blob, on_blob)
