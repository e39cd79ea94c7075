"""Screen scalability: the sharded tiled sweep must handle corpus
sizes far beyond the old dense-matrix path (which was capped at 32,768
genomes and materialized O(n^2) host memory) with only sparse results
ever reaching the host.

Rows are random ~50%-load bitmaps, so the collision correction cancels
unrelated pairs exactly (E[|A&B|] = a*b/bits) and only planted
duplicate pairs survive the cutoff — ground truth is known at any n.

The default test runs 20k rows; the 100k north-star shape (BASELINE.md
config #3) runs when GALAH_TPU_SCALE_TESTS=1 and additionally asserts
peak RSS stays orders of magnitude under the 40GB a dense n^2 pull
would need.
"""

import os
import resource

import numpy as np
import pytest
from conftest import data  # noqa: F401  (forces CPU backend via conftest)

import jax

from galah_tpu.parallel.distance import (
    sharded_screen_triangle_packed,
    sharded_screen_triangle_rowsharded,
)
from galah_tpu.parallel.mesh import make_mesh


def _planted_corpus(n: int, w: int, n_planted: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    planted = []
    for t in range(n_planted):
        i = 2 * t
        j = 2 * t + 1
        x[j] = x[i]
        planted.append((i, j))
    sizes = np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)
    return x, sizes, planted


def _run(n: int, block: int, fn=sharded_screen_triangle_packed):
    w = 16  # 512-bit bitmaps keep the CPU matmul tractable at scale
    x, sizes, planted = _planted_corpus(n, w, n_planted=200)
    mesh = make_mesh(jax.devices()[:8])
    res = fn(
        list(x), sizes, k=15, min_containment=0.5, bits=w * 32,
        mesh=mesh, block=block,
    )
    got = sorted(map(tuple, res.pairs.tolist()))
    assert got == sorted(planted)


def test_sharded_screen_20k():
    _run(20_000, block=4096)


@pytest.mark.skipif(
    not os.environ.get("GALAH_TPU_SCALE_TESTS"),
    reason="set GALAH_TPU_SCALE_TESTS=1 for the 100k north-star shape",
)
def test_sharded_screen_100k_bounded_memory():
    _run(100_000, block=4096)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb < 8.0, f"peak RSS {peak_gb:.1f}GB — dense-path regression?"


def test_rowsharded_screen_20k():
    _run(20_000, block=4096, fn=sharded_screen_triangle_rowsharded)


@pytest.mark.skipif(
    not os.environ.get("GALAH_TPU_SCALE_TESTS"),
    reason="set GALAH_TPU_SCALE_TESTS=1 for the 300k north-star shape",
)
def test_rowsharded_screen_300k_bounded_memory():
    """BASELINE.md north-star config #5 shape (300k genomes, >=4 hosts)
    on the 8-device virtual mesh: the row-sharded sweep keeps per-device
    residency at n/8 rows and only sparse hits reach the host."""
    _run(300_000, block=4096, fn=sharded_screen_triangle_rowsharded)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb < 12.0, f"peak RSS {peak_gb:.1f}GB — dense-path regression?"


def _planted_rectangle(nq: int, nr: int, w: int, n_planted: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 2**32, size=(nq, w), dtype=np.uint32)
    r = rng.integers(0, 2**32, size=(nr, w), dtype=np.uint32)
    planted = []
    for t in range(n_planted):
        qi = (t * 97) % nq
        rj = (t * 13) % nr
        q[qi] = r[rj]
        planted.append((qi, rj))
    qs = np.unpackbits(q.view(np.uint8), axis=1).sum(axis=1)
    rs = np.unpackbits(r.view(np.uint8), axis=1).sum(axis=1)
    # planting can alias (same qi twice): keep the LAST write per query
    final = {}
    for qi, rj in planted:
        final[qi] = rj
    return q, qs, r, rs, sorted(final.items())


def _run_rect(nq: int, nr: int, block: int):
    from galah_tpu.parallel.distance import sharded_screen_rectangle_packed

    w = 16
    q, qs, r, rs, planted = _planted_rectangle(nq, nr, w, n_planted=100)
    mesh = make_mesh(jax.devices()[:8])
    res = sharded_screen_rectangle_packed(
        list(q), qs, list(r), rs, k=15, min_containment=0.5, bits=w * 32,
        mesh=mesh, block=block,
    )
    got = sorted(map(tuple, res.pairs.tolist()))
    assert got == planted


def test_sharded_rectangle_4k_x_512():
    _run_rect(4_096, 512, block=1024)


@pytest.mark.skipif(
    not os.environ.get("GALAH_TPU_SCALE_TESTS"),
    reason="set GALAH_TPU_SCALE_TESTS=1 for the 20k-query reference-mode shape",
)
def test_sharded_rectangle_20k_x_1k_bounded_memory():
    """Reference-mode scale shape (VERDICT r2 item 2): 20k queries x 1k
    reference genomes through the mesh-sharded rectangle, sparse-only."""
    _run_rect(20_000, 1_000, block=4096)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb < 8.0, f"peak RSS {peak_gb:.1f}GB — dense-path regression?"
