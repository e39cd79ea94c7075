"""Exactness of the Pallas fused unpack+matmul (ops/packed_matmul.py)
against a numpy popcount-intersection oracle. Runs in interpret mode
on the CPU backend; the TPU compiled path is measured on-chip by
benchmarks/screen_tile_probe.py and exactness there follows from the
kernel being a permutation-invariant integer dot."""

import numpy as np
import jax.numpy as jnp
import pytest

from galah_tpu.ops.packed_matmul import packed_intersect_matmul


def _pack(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits, axis=1, bitorder="little").view(np.uint32)


@pytest.mark.parametrize(
    "m,n,bits,tm,tn,kw",
    [
        (128, 128, 4096, 128, 128, 64),
        (256, 128, 8192, 128, 128, 128),
        (128, 256, 4096, 128, 128, 32),
    ],
)
def test_packed_intersect_matmul_exact(m, n, bits, tm, tn, kw):
    rng = np.random.default_rng(m + n + bits)
    a = rng.random((m, bits)) < 0.15
    b = rng.random((n, bits)) < 0.15
    want = a.astype(np.int64) @ b.astype(np.int64).T
    got = np.asarray(
        packed_intersect_matmul(
            jnp.asarray(_pack(a)), jnp.asarray(_pack(b)),
            tm=tm, tn=tn, kw=kw, interpret=True,
        )
    )
    assert got.dtype == np.int32
    assert (got == want).all()


def test_packed_intersect_matmul_dense_and_empty_rows():
    rng = np.random.default_rng(7)
    a = rng.random((128, 4096)) < 0.9
    a[3] = False  # empty row
    a[4] = True   # full row
    b = rng.random((128, 4096)) < 0.9
    want = a.astype(np.int64) @ b.astype(np.int64).T
    got = np.asarray(
        packed_intersect_matmul(
            jnp.asarray(_pack(a)), jnp.asarray(_pack(b)),
            tm=128, tn=128, kw=64, interpret=True,
        )
    )
    assert (got == want).all()


def test_packed_intersect_matmul_shape_validation():
    a = jnp.zeros((100, 64), jnp.uint32)
    with pytest.raises(ValueError, match="not tiled"):
        packed_intersect_matmul(a, a, tm=128, tn=128, kw=64, interpret=True)
    b = jnp.zeros((128, 32), jnp.uint32)
    a = jnp.zeros((128, 64), jnp.uint32)
    with pytest.raises(ValueError, match="mismatch"):
        packed_intersect_matmul(a, b, tm=128, tn=128, kw=32, interpret=True)


def test_grouped_tile_dispatch_matches_single(monkeypatch):
    """GALAH_TPU_SCREEN_TILE_GROUP>1 batches resident-sweep tiles into
    lax.map dispatches; results must be identical to per-tile
    dispatches (same kernel body)."""
    import numpy as np

    from galah_tpu.ops.popcount_screen import pack_indicator
    from galah_tpu.ops.prefilter import screen_triangle_packed

    rng = np.random.default_rng(17)
    n, bits = 700, 4096
    ind = (rng.random((n, bits)) < 0.06).astype(np.uint8)
    # plant duplicates so hits exist, including on a diagonal tile
    ind[1] = ind[0]
    ind[650] = ind[649]
    sizes = ind.sum(axis=1)
    packed = [
        np.packbits(row.astype(bool), bitorder="little").view(np.uint32)
        for row in ind
    ]

    def run(group):
        monkeypatch.setenv("GALAH_TPU_SCREEN_TILE_GROUP", str(group))
        monkeypatch.setenv("GALAH_TPU_SCREEN_BLOCK", "128")
        res = screen_triangle_packed(
            packed, sizes, k=15, min_containment=0.3, bits=bits
        )
        monkeypatch.delenv("GALAH_TPU_SCREEN_BLOCK")
        order = np.lexsort((res.pairs[:, 1], res.pairs[:, 0]))
        return res.pairs[order], res.ani_est[order]

    p1, a1 = run(1)
    p3, a3 = run(3)
    p8, a8 = run(8)
    np.testing.assert_array_equal(p1, p3)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_array_equal(a1, a3)
    np.testing.assert_array_equal(a1, a8)
    assert len(p1) >= 2


def test_grouped_rectangle_dispatch_matches_single(monkeypatch):
    """The rectangle (reference-mode) resident sweep groups tiles the
    same way; results must be identical to per-tile dispatches."""
    import numpy as np

    from galah_tpu.ops.prefilter import screen_rectangle_packed

    rng = np.random.default_rng(23)
    nq, nr, bits = 500, 300, 4096
    qi = (rng.random((nq, bits)) < 0.06).astype(np.uint8)
    ri = (rng.random((nr, bits)) < 0.06).astype(np.uint8)
    ri[5] = qi[3]  # plant a hit
    ri[250] = qi[480]
    qs = qi.sum(axis=1)
    rs = ri.sum(axis=1)
    qp = [np.packbits(r.astype(bool), bitorder="little").view(np.uint32) for r in qi]
    rp = [np.packbits(r.astype(bool), bitorder="little").view(np.uint32) for r in ri]

    def run(group):
        monkeypatch.setenv("GALAH_TPU_SCREEN_TILE_GROUP", str(group))
        monkeypatch.setenv("GALAH_TPU_SCREEN_BLOCK", "128")
        res = screen_rectangle_packed(qp, qs, rp, rs, k=15,
                                      min_containment=0.3, bits=bits)
        monkeypatch.delenv("GALAH_TPU_SCREEN_BLOCK")
        order = np.lexsort((res.pairs[:, 1], res.pairs[:, 0]))
        return res.pairs[order], res.ani_est[order]

    p1, a1 = run(1)
    p3, a3 = run(3)
    np.testing.assert_array_equal(p1, p3)
    np.testing.assert_array_equal(a1, a3)
    assert len(p1) >= 2


def test_grouped_dispatch_group_cap_overflow_fallback(monkeypatch):
    """When a group's total survivors exceed the shared cap region the
    drain re-dispatches tiles singly; a fully-dense corpus (every pair
    passes) exercises that path and must match per-tile results."""
    import numpy as np

    from galah_tpu.ops.prefilter import screen_triangle_packed

    rng = np.random.default_rng(31)
    n, bits = 600, 4096
    base = (rng.random(bits) < 0.06).astype(np.uint8)
    ind = np.tile(base, (n, 1))  # identical rows: all pairs hit
    sizes = ind.sum(axis=1)
    packed = [
        np.packbits(row.astype(bool), bitorder="little").view(np.uint32)
        for row in ind
    ]

    def run(group):
        monkeypatch.setenv("GALAH_TPU_SCREEN_TILE_GROUP", str(group))
        monkeypatch.setenv("GALAH_TPU_SCREEN_BLOCK", "128")
        res = screen_triangle_packed(
            packed, sizes, k=15, min_containment=0.0, bits=bits
        )
        monkeypatch.delenv("GALAH_TPU_SCREEN_BLOCK")
        order = np.lexsort((res.pairs[:, 1], res.pairs[:, 0]))
        return res.pairs[order], res.ani_est[order]

    p1, a1 = run(1)
    p4, a4 = run(4)
    np.testing.assert_array_equal(p1, p4)
    np.testing.assert_array_equal(a1, a4)
    assert len(p1) == n * (n - 1) // 2


def test_padded_remainder_group_does_not_spuriously_overflow(monkeypatch):
    """A force-flushed remainder group pads with repeats of its first
    tile; the padding must not count toward the shared compaction cap.
    One real tile with ~5k survivors (well under the 16384 cap at
    block=256) padded 8x would read as ~40k > cap under padding-blind
    accounting and spuriously fall back to single re-dispatches."""
    import numpy as np

    from galah_tpu.ops import prefilter as pf

    rng = np.random.default_rng(41)
    n, bits = 200, 4096  # < block -> ONE diag tile, padded to group 8
    ind = (rng.random((n, bits)) < 0.06).astype(np.uint8)
    ind[:100] = ind[0]  # ~C(100,2)=4950 surviving pairs, < cap=16384
    sizes = ind.sum(axis=1)
    packed = [
        np.packbits(r.astype(bool), bitorder="little").view(np.uint32)
        for r in ind
    ]

    fallbacks = []
    orig = pf._decode_group_result

    def spy(buf, k_tiles, cap, block, nreal):
        cnts, per = orig(buf, k_tiles, cap, block, nreal)
        fallbacks.append(per is None)
        return cnts, per

    monkeypatch.setattr(pf, "_decode_group_result", spy)
    monkeypatch.setenv("GALAH_TPU_SCREEN_TILE_GROUP", "8")
    monkeypatch.setenv("GALAH_TPU_SCREEN_BLOCK", "256")
    res = pf.screen_triangle_packed(
        packed, sizes, k=15, min_containment=0.3, bits=bits
    )
    monkeypatch.delenv("GALAH_TPU_SCREEN_BLOCK")
    monkeypatch.delenv("GALAH_TPU_SCREEN_TILE_GROUP")
    assert fallbacks and not any(fallbacks)
    assert len(res.pairs) >= 100 * 99 // 2
