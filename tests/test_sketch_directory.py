"""Persistent cross-run sketch cache (--sketch-directory).

SURVEY §5 names sketches as first-class persistable artifacts; the
reference's analog is skani's reusable on-disk sketch DB
(src/skani.rs:265-290). A second run over the same corpus must skip
the sketch phase entirely (genome AND contig modes), results must be
identical, and a changed input file or changed parameters must
invalidate its cached sketches.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def corpus(tmp_path):
    from galah_tpu.utils.synth import make_families

    d = tmp_path / "corpus"
    make_families(
        str(d), n_families=4, members_per_family=3,
        genome_length=24_000, within_ani=0.97, seed=3,
    )
    return sorted(str(p) for p in d.iterdir() if p.suffix == ".fna")


def _run(paths, out_tsv, skdir, monkeypatch, extra=()):
    from galah_tpu.cli.main import main as cli_main
    from galah_tpu.utils import metrics

    metrics.reset()
    rc = cli_main([
        "cluster", "-f", *paths, "--ani", "95",
        "--sketch-directory", skdir,
        "--output-cluster-definition", out_tsv, "-q", *extra,
    ])
    assert rc == 0
    return dict(metrics.current().counters)


def test_second_run_skips_sketching(corpus, tmp_path, monkeypatch):
    skdir = str(tmp_path / "sketches")
    c1 = _run(corpus, str(tmp_path / "a.tsv"), skdir, monkeypatch)
    assert c1.get("genomes_sketched", 0) == len(corpus)
    c2 = _run(corpus, str(tmp_path / "b.tsv"), skdir, monkeypatch)
    assert c2.get("genomes_sketched", 0) == 0
    assert (
        open(tmp_path / "b.tsv", "rb").read()
        == open(tmp_path / "a.tsv", "rb").read()
    )


def test_changed_file_invalidates_its_sketch(corpus, tmp_path, monkeypatch):
    skdir = str(tmp_path / "sketches")
    _run(corpus, str(tmp_path / "a.tsv"), skdir, monkeypatch)
    # Rewrite one genome (same name, different content + mtime).
    from galah_tpu.utils.synth import random_genome, write_fasta

    rng = np.random.default_rng(9)
    write_fasta(corpus[0], random_genome(rng, 24_000), "changed")
    c2 = _run(corpus, str(tmp_path / "b.tsv"), skdir, monkeypatch)
    assert c2.get("genomes_sketched", 0) == 1  # only the changed file


def test_contig_mode_bundles(tmp_path, monkeypatch):
    from galah_tpu.cli.main import main as cli_main
    from galah_tpu.utils import metrics
    from galah_tpu.utils.synth import (
        mutate,
        random_genome,
        write_fasta_contigs,
    )

    rng = np.random.default_rng(11)
    base = random_genome(rng, 8_000)
    p = tmp_path / "contigs.fna"
    write_fasta_contigs(
        str(p),
        [base, mutate(rng, base, 0.97), random_genome(rng, 8_000)],
        "c",
    )
    skdir = str(tmp_path / "sketches")

    def run(out):
        metrics.reset()
        rc = cli_main([
            "cluster", "--cluster-contigs", "--small-contigs",
            "-f", str(p), "--sketch-directory", skdir,
            "--output-cluster-definition", out, "-q",
        ])
        assert rc == 0
        return dict(metrics.current().counters)

    c1 = run(str(tmp_path / "a.tsv"))
    assert c1.get("contigs_sketched", 0) == 3
    c2 = run(str(tmp_path / "b.tsv"))
    assert c2.get("contigs_sketched", 0) == 0
    assert (
        open(tmp_path / "b.tsv", "rb").read()
        == open(tmp_path / "a.tsv", "rb").read()
    )


def test_widened_params_never_reuse_other_width(corpus, tmp_path, monkeypatch):
    """--min-aligned-fraction widening rebinds ctx.params AFTER the
    store exists; the store must fingerprint with the WIDENED params
    or run 2 at default width would silently reuse wrong-width
    sketches (review r5 finding: wrong containments / out-of-range
    bucket indices)."""
    skdir = str(tmp_path / "sketches")
    c1 = _run(
        corpus, str(tmp_path / "a.tsv"), skdir, monkeypatch,
        extra=("--min-aligned-fraction", "0.05"),
    )
    assert c1.get("genomes_sketched", 0) == len(corpus)
    # Default width: different params -> different fingerprints ->
    # full re-sketch, not a cache hit on wide sketches.
    c2 = _run(corpus, str(tmp_path / "b.tsv"), skdir, monkeypatch)
    assert c2.get("genomes_sketched", 0) == len(corpus)
    # And the widened config itself IS reusable.
    c3 = _run(
        corpus, str(tmp_path / "c.tsv"), skdir, monkeypatch,
        extra=("--min-aligned-fraction", "0.05"),
    )
    assert c3.get("genomes_sketched", 0) == 0
    assert (
        open(tmp_path / "c.tsv", "rb").read()
        == open(tmp_path / "a.tsv", "rb").read()
    )


def test_low_memory_uses_directory_as_spill(corpus, tmp_path, monkeypatch):
    skdir = str(tmp_path / "sketches")
    c1 = _run(
        corpus, str(tmp_path / "a.tsv"), skdir, monkeypatch,
        extra=("--low-memory",),
    )
    assert c1.get("genomes_sketched", 0) == len(corpus)
    c2 = _run(
        corpus, str(tmp_path / "b.tsv"), skdir, monkeypatch,
        extra=("--low-memory",),
    )
    assert c2.get("genomes_sketched", 0) == 0
    assert (
        open(tmp_path / "b.tsv", "rb").read()
        == open(tmp_path / "a.tsv", "rb").read()
    )
