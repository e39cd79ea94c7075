"""Oracle tests for the scatter-free routing primitives (ops/routing):
monotone compaction / expansion and the bitonic network must agree with
numpy exactly on randomized inputs, including degenerate masks."""

import numpy as np
import pytest
from conftest import data  # noqa: F401  (forces CPU backend)

import jax.numpy as jnp

from galah_tpu.ops.routing import (
    bitonic_sort,
    monotone_compact,
    monotone_expand,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [8, 128, 1024, 4096])
def test_monotone_compact_oracle(seed, n):
    rng = np.random.default_rng(seed)
    g = 3
    mask = rng.random((g, n)) < rng.uniform(0.02, 0.9)
    a = rng.integers(0, 2**30, (g, n)).astype(np.int32)
    b = rng.integers(0, 2**30, (g, n)).astype(np.int32)
    (ra, rb), n_live = monotone_compact(
        jnp.asarray(mask), [jnp.asarray(a), jnp.asarray(b)], [-1, -7]
    )
    ra, rb, n_live = np.asarray(ra), np.asarray(rb), np.asarray(n_live)
    for gi in range(g):
        k = mask[gi].sum()
        assert n_live[gi] == k
        assert np.array_equal(ra[gi, :k], a[gi][mask[gi]])
        assert np.array_equal(rb[gi, :k], b[gi][mask[gi]])
        assert np.all(ra[gi, k:] == -1)
        assert np.all(rb[gi, k:] == -7)


def test_monotone_compact_degenerate():
    n = 64
    zeros = jnp.zeros((1, n), bool)
    ones = jnp.ones((1, n), bool)
    vals = jnp.arange(n, dtype=jnp.int32)[None, :]
    (r0,), l0 = monotone_compact(zeros, [vals], [0])
    assert int(l0[0]) == 0 and np.all(np.asarray(r0) == 0)
    (r1,), l1 = monotone_compact(ones, [vals], [0])
    assert int(l1[0]) == n
    assert np.array_equal(np.asarray(r1)[0], np.arange(n))


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("m,out", [(64, 256), (512, 512), (1000, 4096)])
def test_monotone_expand_oracle(seed, m, out):
    rng = np.random.default_rng(seed)
    g = 3
    want = np.full((g, out), -1, np.int32)
    vals = np.zeros((g, m), np.int32)
    dests = np.zeros((g, m), np.int32)
    n_live = np.zeros(g, np.int32)
    for gi in range(g):
        k = int(rng.integers(0, min(m, out) + 1))
        d = np.sort(rng.choice(out, size=k, replace=False)).astype(np.int32)
        v = rng.integers(1, 2**30, k).astype(np.int32)
        vals[gi, :k] = v
        dests[gi, :k] = d
        n_live[gi] = k
        want[gi, d] = v
    got = monotone_expand(
        jnp.asarray(vals), jnp.asarray(dests), jnp.asarray(n_live), out, -1
    )
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("w", [2, 128, 1024, 8192])
def test_bitonic_sort_oracle(w):
    rng = np.random.default_rng(w)
    x = rng.integers(0, 2**32, (4, w), dtype=np.uint32)
    (s,) = bitonic_sort([jnp.asarray(x)])
    assert np.array_equal(np.asarray(s), np.sort(x, axis=-1))


def test_bitonic_sort_two_keys_with_payload():
    rng = np.random.default_rng(5)
    w = 512
    k1 = rng.integers(0, 8, (2, w)).astype(np.int32)
    k2 = rng.integers(0, 1000, (2, w)).astype(np.int32)
    pay = np.arange(2 * w, dtype=np.int32).reshape(2, w)
    s1, s2, sp = (
        np.asarray(a)
        for a in bitonic_sort(
            [jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(pay)], n_keys=2
        )
    )
    for gi in range(2):
        order = np.lexsort((pay[gi], k2[gi], k1[gi]))
        assert np.array_equal(s1[gi], k1[gi][order])
        assert np.array_equal(s2[gi], k2[gi][order])
        # payload must ride with its keys (stability not required —
        # verify the multiset per (k1, k2) group)
        got = {}
        exp = {}
        for i in range(w):
            got.setdefault((s1[gi, i], s2[gi, i]), []).append(sp[gi, i])
            exp.setdefault((k1[gi, i], k2[gi, i]), []).append(pay[gi, i])
        assert {k: sorted(v) for k, v in got.items()} == {
            k: sorted(v) for k, v in exp.items()
        }


def test_bitonic_sort_uint32_full_range():
    """Padding keys of 0xFFFFFFFF must sort to the end as uint32."""
    x = np.array(
        [[3, 0xFFFFFFFF, 1, 0x80000000, 0, 0xFFFFFFFF, 7, 2]],
        dtype=np.uint32,
    )
    (s,) = bitonic_sort([jnp.asarray(x)])
    assert np.array_equal(np.asarray(s), np.sort(x, axis=-1))


# --- tiled (lane-aligned) variants must match the plain ones exactly ---

from galah_tpu.ops.routing import (  # noqa: E402
    bitonic_sort_tiled,
    monotone_compact_tiled,
    monotone_expand_tiled,
)


@pytest.mark.parametrize("seed", [0, 4])
@pytest.mark.parametrize("n", [512, 4096, 65536])
def test_monotone_compact_tiled_matches_plain(seed, n):
    rng = np.random.default_rng(seed)
    mask = rng.random((2, n)) < 0.2
    a = rng.integers(0, 2**30, (2, n)).astype(np.int32)
    b = rng.integers(0, 2**30, (2, n)).astype(np.int32)
    (pa, pb), pl = monotone_compact(
        jnp.asarray(mask), [jnp.asarray(a), jnp.asarray(b)], [-1, -7]
    )
    (ta, tb), tl = monotone_compact_tiled(
        jnp.asarray(mask), [jnp.asarray(a), jnp.asarray(b)], [-1, -7]
    )
    assert np.array_equal(np.asarray(pa), np.asarray(ta))
    assert np.array_equal(np.asarray(pb), np.asarray(tb))
    assert np.array_equal(np.asarray(pl), np.asarray(tl))


@pytest.mark.parametrize("m,out", [(256, 1024), (4096, 65536)])
def test_monotone_expand_tiled_matches_plain(m, out):
    rng = np.random.default_rng(11)
    g = 2
    vals = np.zeros((g, m), np.int32)
    dests = np.zeros((g, m), np.int32)
    n_live = np.zeros(g, np.int32)
    for gi in range(g):
        k = int(rng.integers(0, m + 1))
        dests[gi, :k] = np.sort(
            rng.choice(out, size=k, replace=False)
        ).astype(np.int32)
        vals[gi, :k] = rng.integers(1, 2**30, k)
        n_live[gi] = k
    args = (jnp.asarray(vals), jnp.asarray(dests), jnp.asarray(n_live))
    plain = monotone_expand(*args, out, -1)
    tiled = monotone_expand_tiled(*args, out, -1)
    assert np.array_equal(np.asarray(plain), np.asarray(tiled))


@pytest.mark.parametrize("w", [512, 8192, 262144])
def test_bitonic_sort_tiled_oracle(w):
    rng = np.random.default_rng(w)
    x = rng.integers(0, 2**32, (2, w), dtype=np.uint32)
    (s,) = bitonic_sort_tiled([jnp.asarray(x)])
    assert np.array_equal(np.asarray(s), np.sort(x, axis=-1))


def test_bitonic_sort_tiled_two_keys():
    rng = np.random.default_rng(6)
    w = 2048
    k1 = rng.integers(0, 8, (2, w)).astype(np.int32)
    k2 = rng.integers(0, 1000, (2, w)).astype(np.int32)
    s1, s2 = (
        np.asarray(a)
        for a in bitonic_sort_tiled(
            [jnp.asarray(k1), jnp.asarray(k2)], n_keys=2
        )
    )
    for gi in range(2):
        order = np.lexsort((k2[gi], k1[gi]))
        assert np.array_equal(s1[gi], k1[gi][order])
        assert np.array_equal(s2[gi], k2[gi][order])


from galah_tpu.ops.routing import bitonic_sort_scan  # noqa: E402


@pytest.mark.parametrize("w", [512, 2048, 1 << 14])
def test_bitonic_sort_scan_matches_tiled(w):
    """The fori_loop formulation must be BIT-identical to the unrolled
    tiled network (same exchanges in the same order), including
    payload placement under duplicate keys."""
    rng = np.random.default_rng(w)
    # duplicate-heavy keys to exercise equal-key payload swaps
    keys = jnp.asarray(
        rng.integers(0, 97, w, dtype=np.int64).astype(np.uint32)
    )
    payload = jnp.asarray(np.arange(w, dtype=np.int32))
    ref = bitonic_sort_tiled([keys, payload], n_keys=1)
    got = bitonic_sort_scan([keys, payload], n_keys=1)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_bitonic_sort_scan_two_keys_leading_dims():
    rng = np.random.default_rng(3)
    w = 4096
    a = jnp.asarray(
        rng.integers(0, 50, (3, w), dtype=np.int64).astype(np.int32)
    )
    b = jnp.asarray(
        rng.integers(0, 50, (3, w), dtype=np.int64).astype(np.int32)
    )
    pay = jnp.asarray(
        np.broadcast_to(np.arange(w, dtype=np.int32), (3, w)).copy()
    )
    ref = bitonic_sort_tiled([a, b, pay], n_keys=2)
    got = bitonic_sort_scan([a, b, pay], n_keys=2)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_bitonic_sort_scan_uint32_full_range():
    rng = np.random.default_rng(11)
    w = 2048
    vals = rng.integers(0, 2**32, w, dtype=np.uint64).astype(np.uint32)
    vals[:7] = 0xFFFFFFFF  # the padding sentinel must sort to the top
    got = bitonic_sort_scan([jnp.asarray(vals)])[0]
    np.testing.assert_array_equal(np.asarray(got), np.sort(vals))


def test_bitonic_sort_scan_under_vmap():
    import jax

    rng = np.random.default_rng(5)
    w = 1024
    keys = jnp.asarray(
        rng.integers(0, 2**32, (4, w), dtype=np.uint64).astype(np.uint32)
    )
    got = jax.vmap(lambda x: bitonic_sort_scan([x])[0])(keys)
    np.testing.assert_array_equal(
        np.asarray(got), np.sort(np.asarray(keys), axis=1)
    )
