"""Reference-genome (rectangular) mode tests, ported from the
reference's 11-test suite (tests/test_cmdline.rs:734-1093). Clusters
only form across the query<->reference boundary, never within a group."""

import pytest
from conftest import data

from galah_tpu.cli.main import main


def read(path):
    with open(path) as f:
        return f.read()


def test_reference_genomes_argument(tmp_path):
    out = tmp_path / "c.tsv"
    assert main([
        "cluster", "--genome-fasta-files",
        data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--reference-genomes", data("set2/1mbp.fna"),
        "--output-cluster-definition", str(out),
    ]) == 0
    assert out.exists()


def test_reference_genomes_list_argument(tmp_path):
    ref_list = tmp_path / "refs.txt"
    # empty lines ignored (tests/test_cmdline.rs:855-878)
    ref_list.write_text(f"{data('set2/1mbp.fna')}\n\n\n")
    out = tmp_path / "c.tsv"
    assert main([
        "cluster", "--genome-fasta-files",
        data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--reference-genomes-list", str(ref_list),
        "--output-cluster-definition", str(out),
    ]) == 0


def test_reference_genomes_mutual_exclusion(tmp_path):
    ref_list = tmp_path / "refs.txt"
    ref_list.write_text(f"{data('set2/1mbp.fna')}\n")
    with pytest.raises(SystemExit):
        main([
            "cluster", "--genome-fasta-files", data("set1/500kb.fna"),
            "--reference-genomes", data("set2/1mbp.fna"),
            "--reference-genomes-list", str(ref_list),
            "--output-cluster-definition", "/dev/null",
        ])


def test_reference_genomes_list_file_not_found():
    rc_or_exc = None
    try:
        rc_or_exc = main([
            "cluster", "--genome-fasta-files", data("set1/500kb.fna"),
            "--reference-genomes-list", "/nonexistent/file.txt",
            "--output-cluster-definition", "/dev/null",
        ])
    except SystemExit:
        return
    assert rc_or_exc == 1


def test_reference_genomes_with_contig_clustering_not_supported():
    with pytest.raises(SystemExit):
        main([
            "cluster", "--genome-fasta-files", data("contigs/contigs.fna"),
            "--cluster-contigs", "--small-contigs",
            "--reference-genomes", data("set2/1mbp.fna"),
            "--output-cluster-definition", "/dev/null",
        ])


def test_reference_genomes_finch_unsupported(capsys):
    # tests/test_cmdline.rs:903-941: finch preclusterer cannot do
    # reference mode.
    rc = main([
        "cluster", "--genome-fasta-files",
        data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--reference-genomes", data("set2/1mbp.fna"),
        "--precluster-method", "finch",
        "--output-cluster-definition", "/dev/null",
    ])
    assert rc == 1
    assert "only supported" in capsys.readouterr().err


def test_reference_genomes_clustering_output(tmp_path):
    # tests/test_cmdline.rs:976-1011: refs are prepended, cross-group
    # clusters only, precluster order by size then first-seen.
    out = tmp_path / "c.tsv"
    main([
        "cluster", "--genome-fasta-files",
        data("abisko4/73.20120800_S1X.13.fna"), data("set1/500kb.fna"),
        "--reference-genomes",
        data("set1/1mbp.fna"), data("abisko4/73.20120600_S2D.19.fna"),
        "--precluster-ani", "90", "--ani", "95",
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        f"{data('set1/1mbp.fna')}\t{data('set1/1mbp.fna')}\n"
        f"{data('set1/1mbp.fna')}\t{data('set1/500kb.fna')}\n"
        f"{data('abisko4/73.20120600_S2D.19.fna')}\t{data('abisko4/73.20120600_S2D.19.fna')}\n"
        f"{data('abisko4/73.20120600_S2D.19.fna')}\t{data('abisko4/73.20120800_S1X.13.fna')}\n"
    )


def test_reference_genomes_no_intra_group_clusters(tmp_path):
    # Two near-identical queries must NOT cluster with each other when
    # only a distant reference is given.
    out = tmp_path / "c.tsv"
    main([
        "cluster", "--genome-fasta-files",
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        "--reference-genomes", data("set2/1mbp.fna"),
        "--output-cluster-definition", str(out),
    ])
    lines = read(out).splitlines()
    # three singletons: the reference and both queries
    assert len(lines) == 3
    for line in lines:
        a, b = line.split("\t")
        assert a == b


def test_reference_genomes_with_checkm2_quality(tmp_path):
    # tests/test_cmdline.rs:1013-1047: the higher-quality genome becomes
    # the representative regardless of which group it came from.
    out = tmp_path / "c.tsv"
    main([
        "cluster", "--genome-fasta-files", data("abisko4/73.20110800_S2M.16.fna"),
        "--reference-genomes", data("abisko4/73.20110600_S2D.10.fna"),
        "--precluster-ani", "90", "--ani", "95",
        "--output-cluster-definition", str(out),
        "--checkm2-quality-report", data("abisko4/abisko4_quality_report.tsv"),
    ])
    assert read(out) == (
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t{data('abisko4/73.20110800_S2M.16.fna')}\n"
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t{data('abisko4/73.20110600_S2D.10.fna')}\n"
    )


def test_reference_genomes_with_checkm2_quality_hq_reference(tmp_path):
    # tests/test_cmdline.rs:1049-1082: same pair, groups swapped — the
    # same (higher-quality) genome remains the representative.
    out = tmp_path / "c.tsv"
    main([
        "cluster", "--genome-fasta-files", data("abisko4/73.20110600_S2D.10.fna"),
        "--reference-genomes", data("abisko4/73.20110800_S2M.16.fna"),
        "--precluster-ani", "90", "--ani", "95",
        "--output-cluster-definition", str(out),
        "--checkm2-quality-report", data("abisko4/abisko4_quality_report.tsv"),
    ])
    assert read(out) == (
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t{data('abisko4/73.20110800_S2M.16.fna')}\n"
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t{data('abisko4/73.20110600_S2D.10.fna')}\n"
    )


def test_reference_genome_high_contamination_excluded(tmp_path):
    # tests/test_cmdline.rs:1084-1093(+): over-contaminated reference is
    # filtered out; the query ends up alone.
    out = tmp_path / "c.tsv"
    main([
        "cluster", "--genome-fasta-files", data("abisko4/73.20110600_S2D.10.fna"),
        "--reference-genomes", data("abisko4/73.20110800_S2M.16.fna"),
        "--output-cluster-definition", str(out),
        "--checkm2-quality-report",
        data("abisko4/abisko4_quality_report_high_contam.tsv"),
        "--max-contamination", "10",
    ])
    assert read(out) == (
        f"{data('abisko4/73.20110600_S2D.10.fna')}\t{data('abisko4/73.20110600_S2D.10.fna')}\n"
    )


def test_reference_mode_packed_matches_indicator(tmp_path, monkeypatch):
    """The packed rectangular screen must give the same reference-mode
    clusters as the indicator path."""
    argsets = []
    for backend in ("indicator", "packed"):
        monkeypatch.setenv("GALAH_TPU_SCREEN", backend)
        out = tmp_path / f"c_{backend}.tsv"
        main([
            "cluster", "--genome-fasta-files",
            data("abisko4/73.20120800_S1X.13.fna"), data("set1/500kb.fna"),
            "--reference-genomes",
            data("set1/1mbp.fna"), data("abisko4/73.20120600_S2D.19.fna"),
            "--ani", "95",
            "--output-cluster-definition", str(out),
        ])
        argsets.append(read(out))
    assert argsets[0] == argsets[1]
    assert len(argsets[0].splitlines()) == 4


def _install_shims(tmp_path, monkeypatch):
    """skani/fastANI bash shims on PATH (same canned-TSV pattern as
    test_subprocess_backends.py, reused via import)."""
    import os
    import stat

    from test_subprocess_backends import FASTANI_SHIM, SKANI_SHIM

    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("skani", SKANI_SHIM), ("fastANI", FASTANI_SHIM)):
        p = bindir / name
        p.write_text(body)
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.delenv("SKANI_SHIM_LOG", raising=False)
    monkeypatch.delenv("SKANI_SHIM_DIST_EMPTY", raising=False)


def test_reference_genomes_with_different_precluster_methods(
    tmp_path, monkeypatch
):
    # tests/test_cmdline.rs:904-940 first half: --precluster-method
    # skani works in reference mode (the finch refusal half is
    # test_reference_genomes_finch_unsupported). Driven via the shim
    # binary's sketch+search path.
    _install_shims(tmp_path, monkeypatch)
    out = tmp_path / "c.tsv"
    assert main([
        "cluster", "--genome-fasta-files",
        data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--reference-genomes", data("set2/1mbp.fna"),
        "--precluster-method", "skani",
        "--output-cluster-definition", str(out),
    ]) == 0
    assert out.exists()


def test_reference_genomes_with_different_cluster_methods(
    tmp_path, monkeypatch
):
    # tests/test_cmdline.rs:943-975: --cluster-method skani and fastani
    # both work in reference mode (native preclusterer feeds candidate
    # pairs to the passthrough verifier).
    _install_shims(tmp_path, monkeypatch)
    for method in ("skani", "fastani"):
        out = tmp_path / f"c_{method}.tsv"
        assert main([
            "cluster", "--genome-fasta-files",
            data("set1/500kb.fna"), data("set1/1mbp.fna"),
            "--reference-genomes", data("set2/1mbp.fna"),
            "--cluster-method", method,
            "--output-cluster-definition", str(out),
        ]) == 0, method
        assert out.exists(), method
