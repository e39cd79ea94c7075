"""Edge-case coverage: degenerate inputs the reference's regression
tests enumerate (SURVEY §7 'ragged real-world inputs') plus run-to-run
determinism."""

import gzip

import pytest
from conftest import data

from galah_tpu.cli.main import main


def test_all_n_genome_is_singleton(tmp_path):
    # A genome of only Ns has no valid k-mers: no sketch, no pairs —
    # it must survive as its own cluster, not crash.
    g1 = tmp_path / "ns.fna"
    g1.write_text(">c1\n" + "N" * 5000 + "\n")
    out = tmp_path / "c.tsv"
    rc = main([
        "cluster", "-f", str(g1), data("set1/500kb.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2  # two singletons


def test_empty_fasta_errors(tmp_path):
    g1 = tmp_path / "empty.fna"
    g1.write_text("")
    rc = main([
        "cluster", "-f", str(g1), data("set1/500kb.fna"),
        "--output-cluster-definition", "/dev/null",
    ])
    # empty file has no records -> genome stats/sketching yields nothing;
    # either a clean nonzero exit or a singleton treatment is acceptable,
    # but it must not traceback
    assert rc in (0, 1)


def test_tiny_genome(tmp_path):
    # shorter than k: no k-mers at all
    g1 = tmp_path / "tiny.fna"
    g1.write_text(">c1\nACGTACGT\n")
    out = tmp_path / "c.tsv"
    rc = main([
        "cluster", "-f", str(g1), data("set1/500kb.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert rc == 0
    assert len(open(out).read().splitlines()) == 2


def test_determinism_across_runs(tmp_path):
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
    ]
    outs = []
    for i in range(2):
        out = tmp_path / f"c{i}.tsv"
        main([
            "cluster", "-f", *genomes, "--ani", "99",
            "--output-cluster-definition", str(out),
        ])
        outs.append(open(out).read())
    assert outs[0] == outs[1]


def test_mixed_gzip_and_plain(tmp_path):
    out = tmp_path / "c.tsv"
    rc = main([
        "cluster", "-f",
        data("abisko4/73.20120800_S1D.21.fna.gz"),
        data("abisko4/73.20110800_S2M.16.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert rc == 0
    assert len(open(out).read().splitlines()) == 2


def test_duplicate_genome_path(tmp_path):
    # The same path given twice: both entries cluster together (they are
    # 100% identical); must not crash on key collisions.
    out = tmp_path / "c.tsv"
    rc = main([
        "cluster", "-f", data("set1/500kb.fna"), data("set1/500kb.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2
    assert all(line.split("\t")[0] == data("set1/500kb.fna") for line in lines)


def test_crlf_fasta(tmp_path):
    g1 = tmp_path / "crlf.fna"
    g1.write_bytes(b">c1\r\nACGT" * 1 + b"ACGTACGTAGGCTTACGATCGATCGTACGATCGAT\r\n")
    from galah_tpu.io.fasta import read_fasta

    recs = list(read_fasta(str(g1)))
    assert recs[0].name == "c1"
    assert b"\r" not in recs[0].seq
