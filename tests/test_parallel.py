"""Multi-device sharding tests on the 8-way virtual CPU mesh.

The distributed invariant (SURVEY.md §4): identical sparse pair lists
and identical clusters for any mesh size — the host-side greedy stage
is device-count independent by construction."""

import numpy as np
import pytest
from conftest import data

import jax

from galah_tpu.ops.prefilter import screen_triangle
from galah_tpu.parallel.distance import sharded_screen_triangle
from galah_tpu.parallel.mesh import make_mesh


def synthetic_indicators(n=24, bits=4096, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, bits)) < 0.08).astype(np.uint8)
    # plant related pairs: genome 1 ~ genome 0, genome 5 subset of 4
    x[1] = x[0]
    flips = rng.random(bits) < 0.01
    x[1] = np.where(flips, 1 - x[1], x[1])
    x[5] = x[4] * (rng.random(bits) < 0.5)
    return x, x.sum(axis=1)


def test_sharded_matches_blocked():
    x, sizes = synthetic_indicators()
    blocked = screen_triangle(list(x), sizes, k=15, min_containment=0.2)
    for ndev in (1, 2, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        sharded = sharded_screen_triangle(x, sizes, 15, 0.2, mesh=mesh)
        assert np.array_equal(
            np.sort(blocked.pairs, axis=0), np.sort(sharded.pairs, axis=0)
        )
        np.testing.assert_allclose(
            np.sort(blocked.ani_est), np.sort(sharded.ani_est), rtol=2e-3
        )


def test_sharded_2d_mesh_psum():
    x, sizes = synthetic_indicators()
    mesh1 = make_mesh(jax.devices()[:8])
    mesh2 = make_mesh(jax.devices()[:8], bucket_axis=2)
    r1 = sharded_screen_triangle(x, sizes, 15, 0.2, mesh=mesh1)
    r2 = sharded_screen_triangle(x, sizes, 15, 0.2, mesh=mesh2)
    assert np.array_equal(r1.pairs, r2.pairs)
    np.testing.assert_allclose(r1.ani_est, r2.ani_est, rtol=1e-4)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_cluster_invariance_across_mesh_sizes(ndev, monkeypatch, tmp_path):
    """Same clusters.tsv on any device count (BASELINE.md north star)."""
    from galah_tpu.engines.native import NativeContext, NativePreclusterer
    from galah_tpu.parallel import distance as dist_mod

    D = data("")
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
    ]
    orig = dist_mod.sharded_screen_triangle_packed

    def limited(packed, sizes, k, min_cont, bits, mesh=None, **kw):
        return orig(
            packed, sizes, k, min_cont, bits,
            mesh=make_mesh(jax.devices()[:ndev]), **kw,
        )

    monkeypatch.setattr(dist_mod, "sharded_screen_triangle_packed", limited)
    ctx = NativeContext(threads=2)
    pre = NativePreclusterer(threshold=99.0, min_aligned_threshold=0.15, ctx=ctx)
    cache = pre.distances(genomes)
    got = sorted((k, round(v, 2)) for k, v in cache.items())
    assert [k for k, _ in got] == [(0, 1), (0, 3), (1, 3)]


def test_sharded_packed_matches_blocked_large():
    """Beyond one tile per device: n spanning many tiles, overflow-free
    path and tile-boundary indexing."""
    from galah_tpu.ops.prefilter import screen_triangle_packed
    from galah_tpu.parallel.distance import sharded_screen_triangle_packed

    n, bits = 700, 2048
    rng = np.random.default_rng(3)
    x = (rng.random((n, bits)) < 0.08).astype(np.uint8)
    for src in range(0, 40, 4):
        x[src + 1] = x[src]
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    single = screen_triangle_packed(packed, sizes, 15, 0.2, bits, block=256)
    mesh = make_mesh(jax.devices()[:8])
    sharded = sharded_screen_triangle_packed(
        packed, sizes, 15, 0.2, bits, mesh=mesh, block=128
    )
    key = lambda r: sorted(map(tuple, r.pairs.tolist()))
    assert key(single) == key(sharded)
    assert len(sharded.pairs) >= 10


def test_sharded_packed_overflow_tile():
    """cnt > cap per tile falls back to the dense pull for that tile."""
    from galah_tpu.parallel.distance import sharded_screen_triangle_packed

    n, bits = 96, 1024
    x = np.zeros((n, bits), dtype=np.uint8)
    x[:, :64] = 1  # all genomes identical -> every pair passes
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    mesh = make_mesh(jax.devices()[:2])
    res = sharded_screen_triangle_packed(
        packed, sizes, 15, 0.2, bits, mesh=mesh, block=128, cap=64
    )
    assert len(res.pairs) == n * (n - 1) // 2


def test_rowsharded_matches_replicated():
    """Row-sharded resident matrix (cyclic block ownership + per-stage
    column psum broadcast) produces the identical sparse pair list."""
    from galah_tpu.ops.prefilter import screen_triangle_packed
    from galah_tpu.parallel.distance import sharded_screen_triangle_rowsharded

    n, bits = 700, 2048
    rng = np.random.default_rng(3)
    x = (rng.random((n, bits)) < 0.08).astype(np.uint8)
    for src in range(0, 40, 4):
        x[src + 1] = x[src]
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    single = screen_triangle_packed(packed, sizes, 15, 0.2, bits, block=256)
    key = lambda r: sorted(map(tuple, r.pairs.tolist()))
    for ndev, bucket in ((2, 1), (8, 1), (8, 2)):
        mesh = make_mesh(jax.devices()[:ndev], bucket_axis=bucket)
        rs = sharded_screen_triangle_rowsharded(
            packed, sizes, 15, 0.2, bits, mesh=mesh, block=128
        )
        assert key(single) == key(rs), (ndev, bucket)
    assert len(single.pairs) >= 10


def test_rowsharded_overflow_tile():
    """Per-tile cnt > cap falls back to a dense recompute of that tile."""
    from galah_tpu.parallel.distance import sharded_screen_triangle_rowsharded

    n, bits = 96, 1024
    x = np.zeros((n, bits), dtype=np.uint8)
    x[:, :64] = 1
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    mesh = make_mesh(jax.devices()[:2])
    res = sharded_screen_triangle_rowsharded(
        packed, sizes, 15, 0.2, bits, mesh=mesh, block=128, cap=64
    )
    assert len(res.pairs) == n * (n - 1) // 2


def test_rowsharded_stream_overflow():
    """A device-stage whose compacted stream overflows is recomputed
    densely (stage_cap floor is 2*cap, so force many full tiles)."""
    from galah_tpu.parallel.distance import sharded_screen_triangle_rowsharded

    n, bits = 1024, 1024
    x = np.zeros((n, bits), dtype=np.uint8)
    x[:, :64] = 1
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    mesh = make_mesh(jax.devices()[:2])
    res = sharded_screen_triangle_rowsharded(
        packed, sizes, 15, 0.2, bits, mesh=mesh, block=128,
        cap=16384, stage_cap=16384,
    )
    assert len(res.pairs) == n * (n - 1) // 2


def test_rowshard_env_forces_path(monkeypatch):
    """GALAH_TPU_ROWSHARD=1 routes the packed entry point through the
    row-sharded sweep; results match the replicated default."""
    from galah_tpu.parallel.distance import sharded_screen_triangle_packed

    x, sizes = synthetic_indicators()
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    mesh = make_mesh(jax.devices()[:8])
    base = sharded_screen_triangle_packed(
        packed, sizes, 15, 0.2, x.shape[1], mesh=mesh
    )
    monkeypatch.setenv("GALAH_TPU_ROWSHARD", "1")
    forced = sharded_screen_triangle_packed(
        packed, sizes, 15, 0.2, x.shape[1], mesh=mesh
    )
    key = lambda r: sorted(map(tuple, r.pairs.tolist()))
    assert key(base) == key(forced)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(2)


def test_rowsharded_zero_slot_clobber_after_clamp():
    """Regression: an empty slot scanned AFTER the running offset
    crossed stage_cap - cap used to write its cap-sized zero buffer at
    the clamped offset, silently clobbering the tail of the previous
    segment's real hits (pair lost + spurious (i*block, j*block) pair
    emitted) — undetected because the host replay only flags stored>0
    clamped writes. Shapes force: slot0 3 hits, slot1 2 hits (second
    lands at offset 4 = stage_cap - cap), slot2 0 hits."""
    from galah_tpu.parallel.distance import sharded_screen_triangle_rowsharded

    n, bits = 16, 1024
    rng = np.random.default_rng(0)
    x = (rng.random((n, bits)) < 0.5).astype(np.uint8)
    x[8] = x[0]; x[9] = x[1]; x[10] = x[2]; x[5] = x[4]; x[11] = x[4]
    packed = list(
        np.packbits(x.astype(bool), axis=1, bitorder="little").view(np.uint32)
    )
    sizes = x.sum(axis=1)
    want = sorted([(0, 8), (1, 9), (2, 10), (4, 5), (4, 11), (5, 11)])
    for ndev in (1, 2, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        res = sharded_screen_triangle_rowsharded(
            packed, sizes, 15, 0.5, bits, mesh=mesh, block=4, cap=4,
            stage_cap=8,
        )
        assert sorted(map(tuple, res.pairs.tolist())) == want, ndev


def test_verify_multidevice_matches_single(tmp_path, monkeypatch):
    """The grouped verify fans source groups out over every local
    device; results must equal the single-device run exactly, and the
    fan-out must actually place work on more than one device."""
    from galah_tpu.engines.native import NativeContext
    from galah_tpu.ops.fragment_ani import FragmentAniConfig, FragmentAniEngine
    from galah_tpu.utils.synth import make_families

    paths, _ = make_families(
        str(tmp_path), n_families=3, members_per_family=3,
        genome_length=30_000, within_ani=0.97, seed=5,
    )
    ctx = NativeContext(threads=1)
    sketches = ctx.sketch_many(paths)
    by_key = {s.name: s for s in sketches}
    keys = [s.name for s in sketches]
    pairs = [(keys[i], keys[j]) for i in range(len(keys))
             for j in range(i + 1, len(keys))]
    monkeypatch.setenv("GALAH_TPU_VERIFY", "grouped")

    def run(n_devices):
        monkeypatch.setenv("GALAH_TPU_VERIFY_DEVICES", str(n_devices))
        eng = FragmentAniEngine(FragmentAniConfig(
            k=ctx.params.k, member_bits=ctx.params.member_bits,
            min_fragment_hashes=ctx.params.min_fragment_hashes,
        ))
        res = eng.bidirectional(pairs, by_key)
        dev_ids = set(eng._pools)
        return res, dev_ids

    single, ids1 = run(1)
    multi, ids8 = run(8)
    assert single == multi
    assert len(ids1) == 1
    assert len(ids8) > 1, "fan-out never left the first device"


def test_pairtable_multidevice_matches_single(tmp_path, monkeypatch):
    """Pair-table dispatches round-robin over local devices; a capped
    max_pairs forces several dispatches, whose results must equal the
    single-device run exactly."""
    from galah_tpu.engines.native import NativeContext
    from galah_tpu.ops.fragment_ani import FragmentAniConfig, FragmentAniEngine
    from galah_tpu.ops.pair_table import PairTableConfig, PairTableVerifier
    from galah_tpu.utils.synth import make_families

    paths, _ = make_families(
        str(tmp_path), n_families=3, members_per_family=3,
        genome_length=20_000, within_ani=0.97, seed=9,
    )
    ctx = NativeContext(threads=1)
    sketches = ctx.sketch_many(paths)
    by_key = {s.name: s for s in sketches}
    keys = [s.name for s in sketches]
    directed = [(a, b) for a in keys for b in keys if a != b]

    def run(n_devices):
        monkeypatch.setenv("GALAH_TPU_VERIFY_DEVICES", str(n_devices))
        eng = FragmentAniEngine(FragmentAniConfig(
            k=ctx.params.k, member_bits=ctx.params.member_bits,
            min_fragment_hashes=ctx.params.min_fragment_hashes,
        ))
        ver = PairTableVerifier(
            PairTableConfig(
                member_bits=ctx.params.member_bits, k=ctx.params.k,
                min_fragment_hashes=ctx.params.min_fragment_hashes,
                min_fragment_identity=0.8, max_pairs=8,
            ),
            eng.bitmap_stack,
        )
        res = ver.run(directed, by_key)
        return res, set(eng._pools)

    single, ids1 = run(1)
    multi, ids8 = run(8)
    assert single == multi
    assert len(ids1) == 1
    assert len(ids8) > 1, "pair-table fan-out never left the first device"


def test_sharded_rectangle_matches_single_device():
    """Mesh-sharded reference-mode (rectangular) screen: identical
    sparse pair list to the single-device resident rectangle, beyond
    one tile per device and across the query/ref padding boundaries."""
    from galah_tpu.ops.prefilter import screen_rectangle_packed
    from galah_tpu.parallel.distance import sharded_screen_rectangle_packed

    nq, nr, bits = 700, 300, 2048
    rng = np.random.default_rng(7)
    q = (rng.random((nq, bits)) < 0.08).astype(np.uint8)
    r = (rng.random((nr, bits)) < 0.08).astype(np.uint8)
    # plant cross-group near-duplicates (the only pairs that matter in
    # reference mode) at positions spanning several tiles
    for t in range(0, 280, 17):
        q[t * 2 % nq] = r[t]
    qp = list(np.packbits(q.astype(bool), axis=1, bitorder="little").view(np.uint32))
    rp = list(np.packbits(r.astype(bool), axis=1, bitorder="little").view(np.uint32))
    qs, rs = q.sum(axis=1), r.sum(axis=1)

    single = screen_rectangle_packed(qp, qs, rp, rs, 15, 0.2, bits, block=256)
    mesh = make_mesh(jax.devices()[:8])
    sharded = sharded_screen_rectangle_packed(
        qp, qs, rp, rs, 15, 0.2, bits, mesh=mesh, block=128
    )
    key = lambda res: sorted(map(tuple, res.pairs.tolist()))
    assert key(single) == key(sharded)
    assert len(sharded.pairs) >= 15


def test_sharded_rectangle_overflow_tile():
    """A tile whose hits exceed the extraction cap falls back without
    losing or duplicating pairs (dense recompute of that tile only)."""
    from galah_tpu.ops.prefilter import screen_rectangle_packed
    from galah_tpu.parallel.distance import sharded_screen_rectangle_packed

    nq, nr, bits = 96, 96, 1024
    rng = np.random.default_rng(8)
    base = (rng.random(bits) < 0.1).astype(np.uint8)
    q = np.tile(base, (nq, 1))
    r = np.tile(base, (nr, 1))
    qp = list(np.packbits(q.astype(bool), axis=1, bitorder="little").view(np.uint32))
    rp = list(np.packbits(r.astype(bool), axis=1, bitorder="little").view(np.uint32))
    qs, rs = q.sum(axis=1), r.sum(axis=1)
    single = screen_rectangle_packed(qp, qs, rp, rs, 15, 0.2, bits, block=128)
    sharded = sharded_screen_rectangle_packed(
        qp, qs, rp, rs, 15, 0.2, bits,
        mesh=make_mesh(jax.devices()[:8]), block=128, cap=64,
    )
    key = lambda res: sorted(map(tuple, res.pairs.tolist()))
    assert key(single) == key(sharded)
    assert len(sharded.pairs) == nq * nr


def test_rectangle_rowsharded_matches_single_device():
    """Row-sharded rectangle (concatenated query+ref matrix distributed
    cyclically, one REF column block psum-broadcast per stage) produces
    the identical sparse pair list at any mesh shape — the reference-
    mode analog of test_rowsharded_matches_replicated."""
    from galah_tpu.ops.prefilter import screen_rectangle_packed
    from galah_tpu.parallel.distance import sharded_screen_rectangle_rowsharded

    nq, nr, bits = 500, 300, 2048
    rng = np.random.default_rng(11)
    q = (rng.random((nq, bits)) < 0.08).astype(np.uint8)
    r = (rng.random((nr, bits)) < 0.08).astype(np.uint8)
    for t in range(0, 280, 17):
        q[t * 2 % nq] = r[t]
    qp = list(np.packbits(q.astype(bool), axis=1, bitorder="little").view(np.uint32))
    rp = list(np.packbits(r.astype(bool), axis=1, bitorder="little").view(np.uint32))
    qs, rs = q.sum(axis=1), r.sum(axis=1)

    single = screen_rectangle_packed(qp, qs, rp, rs, 15, 0.2, bits, block=256)
    key = lambda res: sorted(map(tuple, res.pairs.tolist()))
    for ndev, bucket in ((2, 1), (8, 1), (8, 2)):
        mesh = make_mesh(jax.devices()[:ndev], bucket_axis=bucket)
        rowsharded = sharded_screen_rectangle_rowsharded(
            qp, qs, rp, rs, 15, 0.2, bits, mesh=mesh, block=128
        )
        assert key(single) == key(rowsharded), (ndev, bucket)
    assert len(single.pairs) >= 15


def test_rectangle_rowsharded_overflow_tile():
    """Per-tile cnt > cap in the row-sharded rectangle falls back to a
    dense recompute of that tile (no lost or duplicated pairs)."""
    from galah_tpu.parallel.distance import sharded_screen_rectangle_rowsharded

    nq, nr, bits = 96, 96, 1024
    rng = np.random.default_rng(12)
    base = (rng.random(bits) < 0.1).astype(np.uint8)
    q = np.tile(base, (nq, 1))
    r = np.tile(base, (nr, 1))
    qp = list(np.packbits(q.astype(bool), axis=1, bitorder="little").view(np.uint32))
    rp = list(np.packbits(r.astype(bool), axis=1, bitorder="little").view(np.uint32))
    qs, rs = q.sum(axis=1), r.sum(axis=1)
    res = sharded_screen_rectangle_rowsharded(
        qp, qs, rp, rs, 15, 0.2, bits,
        mesh=make_mesh(jax.devices()[:2]), block=128, cap=64,
    )
    assert len(res.pairs) == nq * nr


def test_rowshard_env_forces_rectangle_path(monkeypatch):
    """GALAH_TPU_ROWSHARD=1 routes the replicated rectangle entry point
    through the row-sharded sweep; results match the default — the
    budget-check fallback the replicated rectangle takes past the
    per-device HBM budget."""
    from galah_tpu.parallel.distance import sharded_screen_rectangle_packed

    nq, nr, bits = 300, 200, 2048
    rng = np.random.default_rng(13)
    q = (rng.random((nq, bits)) < 0.08).astype(np.uint8)
    r = (rng.random((nr, bits)) < 0.08).astype(np.uint8)
    for t in range(0, 190, 13):
        q[t] = r[t]
    qp = list(np.packbits(q.astype(bool), axis=1, bitorder="little").view(np.uint32))
    rp = list(np.packbits(r.astype(bool), axis=1, bitorder="little").view(np.uint32))
    qs, rs = q.sum(axis=1), r.sum(axis=1)
    mesh = make_mesh(jax.devices()[:8])
    base = sharded_screen_rectangle_packed(
        qp, qs, rp, rs, 15, 0.2, bits, mesh=mesh, block=128
    )
    monkeypatch.setenv("GALAH_TPU_ROWSHARD", "1")
    forced = sharded_screen_rectangle_packed(
        qp, qs, rp, rs, 15, 0.2, bits, mesh=mesh, block=128
    )
    key = lambda res: sorted(map(tuple, res.pairs.tolist()))
    assert key(base) == key(forced)
    assert len(base.pairs) >= 10


def test_reference_mode_engine_uses_mesh(tmp_path, monkeypatch):
    """distances_with_references routes through the sharded rectangle
    when several devices are available, and its verified cache equals
    the forced-single-device run exactly."""
    from galah_tpu.engines.native import NativeContext, NativePreclusterer
    from galah_tpu.parallel import distance as dist_mod
    from galah_tpu.utils.synth import make_families

    paths, _ = make_families(
        str(tmp_path), n_families=3, members_per_family=3,
        genome_length=30_000, within_ani=0.97, seed=6,
    )
    # one reference per family (paths are family-major: fam0_m0,
    # fam0_m1, ... fam2_m2), so every non-reference genome has a
    # cross-group near-duplicate
    refs = [paths[0], paths[3], paths[6]]

    calls = []
    orig = dist_mod.sharded_screen_rectangle_packed

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(
        dist_mod, "sharded_screen_rectangle_packed", spy
    )

    def run(force_single):
        if force_single:
            monkeypatch.setenv("GALAH_TPU_SCREEN", "packed")
            monkeypatch.setenv("GALAH_TPU_VERIFY_DEVICES", "1")
        else:
            monkeypatch.delenv("GALAH_TPU_SCREEN", raising=False)
            monkeypatch.delenv("GALAH_TPU_VERIFY_DEVICES", raising=False)
        ctx = NativeContext(threads=1)
        pre = NativePreclusterer(
            threshold=90.0, min_aligned_threshold=0.15, ctx=ctx
        )
        cache = pre.distances_with_references(paths, refs)
        return sorted(cache.items())

    multi = run(force_single=False)
    assert calls, "mesh rectangle sweep never engaged"
    single = run(force_single=True)
    assert multi == single
    assert len(multi) >= 4  # cross-group near-duplicates found


def test_low_memory_uses_rowsharded_mesh(tmp_path, monkeypatch):
    """SURVEY P8: --low-memory no longer forfeits the mesh. The screen
    routes through the row-sharded sweep fed lazily from the disk
    sketch store, and the clusters are byte-identical to the
    non-low-memory (replicated mesh) run."""
    from galah_tpu.cli.main import main as cli_main
    from galah_tpu.parallel import distance as dist_mod
    from galah_tpu.utils.synth import make_families

    paths, _ = make_families(
        str(tmp_path / "corpus"), n_families=4, members_per_family=4,
        genome_length=40_000, within_ani=0.98, seed=12,
    )

    calls = []
    orig = dist_mod.sharded_screen_triangle_rowsharded

    def spy(packed, *a, **kw):
        # Lazy feed: the row source must be the on-access packed view,
        # not a materialized ndarray (host memory stays O(n/n_dev)).
        calls.append(type(packed).__name__)
        return orig(packed, *a, **kw)

    monkeypatch.setattr(
        dist_mod, "sharded_screen_triangle_rowsharded", spy
    )

    def run(low_memory):
        out = tmp_path / f"clusters_{low_memory}.tsv"
        argv = [
            "cluster", "-f", *paths, "--ani", "95",
            "--output-cluster-definition", str(out), "-q",
        ]
        if low_memory:
            argv.append("--low-memory")
        assert cli_main(argv) == 0
        return out.read_bytes()

    normal = run(low_memory=False)
    assert not calls
    lowmem = run(low_memory=True)
    assert calls == ["_LazyPackedRows"], (
        "--low-memory did not route through the row-sharded mesh sweep"
    )
    assert normal == lowmem
