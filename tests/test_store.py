"""Sketch/cache persistence and low-memory mode tests (reference:
low-memory golden tests/test_cmdline.rs:676-731; persistable phase
artifacts per SURVEY §5)."""

import numpy as np
from conftest import data

from galah_tpu.cli.main import main
from galah_tpu.cluster.cache import SortedPairDistanceCache
from galah_tpu.sketch.fracminhash import NativeSketchParams, sketch_file_native
from galah_tpu.sketch.store import (
    DiskSketchStore,
    load_distance_cache,
    load_sketch,
    save_distance_cache,
    save_sketch,
)


def test_sketch_roundtrip(tmp_path):
    params = NativeSketchParams()
    sk = sketch_file_native(data("set1/500kb.fna"), params)
    p = str(tmp_path / "s.npz")
    save_sketch(sk, p)
    sk2 = load_sketch(p)
    assert sk2.name == sk.name
    assert sk2.total_len == sk.total_len
    assert sk2.params == params
    for f in ("prefilter_buckets", "member_buckets", "frag_buckets", "frag_offsets"):
        assert np.array_equal(getattr(sk2, f), getattr(sk, f))


def test_disk_store_lru(tmp_path):
    params = NativeSketchParams()
    store = DiskSketchStore(str(tmp_path), params, max_resident=1)
    a = sketch_file_native(data("set1/500kb.fna"), params)
    b = sketch_file_native(data("set1/1mbp.fna"), params)
    store.put("a", a)
    store.put("b", b)  # evicts a from RAM
    got_a = store.get("a")  # reloaded from disk
    assert np.array_equal(got_a.member_buckets, a.member_buckets)
    assert "a" in store and "b" in store
    assert store.get("missing") is None


def test_distance_cache_roundtrip(tmp_path):
    cache = SortedPairDistanceCache()
    cache.insert((0, 3), 97.5)
    cache.insert((1, 2), None)
    p = str(tmp_path / "cache.npz")
    save_distance_cache(
        cache, p, names=["a", "b", "c", "d"], threshold=95.0,
        min_af=0.15, method="native", mode="triangle",
    )
    cache2, names, meta = load_distance_cache(p)
    assert names == ["a", "b", "c", "d"]
    assert meta["threshold"] == 95.0
    assert meta["min_af"] == 0.15
    assert meta["method"] == "native"
    assert meta["mode"] == "triangle"
    assert cache2.get((3, 0)) == (97.5,)
    assert cache2.get((1, 2)) == (None,)
    assert len(cache2) == 2


def test_low_memory_same_clusters(tmp_path):
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
        data("antonio_mags/BE_RX_R2_MAG52.fna"),
    ]
    out1 = tmp_path / "normal.tsv"
    out2 = tmp_path / "lowmem.tsv"
    main([
        "cluster", "--genome-fasta-files", *genomes, "--ani", "99",
        "--output-cluster-definition", str(out1),
    ])
    main([
        "cluster", "--genome-fasta-files", *genomes, "--ani", "99",
        "--low-memory",
        "--output-cluster-definition", str(out2),
    ])
    content = open(out1).read()
    assert content == open(out2).read()
    assert len(content.splitlines()) == 5  # {0,1,3},{2},{4}


def test_distance_cache_save_and_resume(tmp_path):
    """--output-distance-cache then --input-distance-cache must produce
    identical clusters without recomputing the device phases."""
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
    ]
    cache_path = tmp_path / "dist.npz"
    out1 = tmp_path / "c1.tsv"
    main([
        "cluster", "-f", *genomes, "--ani", "99",
        "--output-distance-cache", str(cache_path),
        "--output-cluster-definition", str(out1),
    ])
    assert cache_path.exists()

    out2 = tmp_path / "c2.tsv"
    main([
        "cluster", "-f", *genomes, "--ani", "99",
        "--input-distance-cache", str(cache_path),
        "--output-cluster-definition", str(out2),
    ])
    assert open(out1).read() == open(out2).read()

    # resume with a reordered subset: remapped by name
    out3 = tmp_path / "c3.tsv"
    main([
        "cluster", "-f", genomes[2], genomes[0], "--ani", "99",
        "--input-distance-cache", str(cache_path),
        "--output-cluster-definition", str(out3),
    ])
    lines = open(out3).read().splitlines()
    assert len(lines) == 2  # two singletons (0 and 2 are not 99% related)

    # a genome absent from the cache errors cleanly
    import pytest

    with pytest.raises(SystemExit, match="does not cover"):
        main([
            "cluster", "-f", genomes[0], data("set1/1mbp.fna"), "--ani", "99",
            "--input-distance-cache", str(cache_path),
            "--output-cluster-definition", "/dev/null",
        ])


def test_distance_cache_exact_path_no_npz_suffix(tmp_path):
    """np.savez appends .npz to bare paths; ours must write exactly
    where asked so --input-distance-cache round-trips."""
    cache = SortedPairDistanceCache()
    cache.insert((0, 1), 99.0)
    p = str(tmp_path / "cache_no_suffix")
    save_distance_cache(cache, p, names=["a", "b"])
    import os

    assert os.path.exists(p)
    cache2, names, _ = load_distance_cache(p)
    assert cache2.get((0, 1)) == (99.0,)


def test_resume_rejects_lower_threshold(tmp_path):
    import pytest

    from galah_tpu.cli.main import main as cli_main

    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
    ]
    cache_path = tmp_path / "c.npz"
    cli_main([
        "cluster", "-f", *genomes, "--ani", "99",
        "--output-distance-cache", str(cache_path),
        "--output-cluster-definition", "/dev/null",
    ])
    with pytest.raises(SystemExit, match="recorded at ANI"):
        cli_main([
            "cluster", "-f", *genomes, "--ani", "95",
            "--input-distance-cache", str(cache_path),
            "--output-cluster-definition", "/dev/null",
        ])
