"""CLI golden tests for `cluster`, ported from the reference's
tests/test_cmdline.rs (same fixtures, same expected outputs, with the
native engine standing in for the external skani/fastANI backends)."""

import os

import pytest
from conftest import data

from galah_tpu.cli.main import main


def run_cli(args):
    return main(args)


ABISKO_TWO = [
    data("abisko4/73.20120800_S1D.21.fna"),
    data("abisko4/73.20110800_S2M.16.fna"),
]


def read(path):
    with open(path) as f:
        return f.read()


def test_completeness_4contamination_quality_score(tmp_path):
    # tests/test_cmdline.rs:12-35
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--quality-formula", "completeness-4contamination",
        "--genome-fasta-files", *ABISKO_TWO,
        "--output-cluster-definition", str(out),
        "--checkm-tab-table", data("abisko4/abisko4.csv"),
    ])
    assert read(out) == (
        f"{ABISKO_TWO[0]}\t{ABISKO_TWO[0]}\n"
        f"{ABISKO_TWO[0]}\t{ABISKO_TWO[1]}\n"
    )


def test_parks2020_reduced_quality_score(tmp_path):
    # tests/test_cmdline.rs:38-61
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--quality-formula", "Parks2020_reduced",
        "--genome-fasta-files", *ABISKO_TWO,
        "--output-cluster-definition", str(out),
        "--checkm-tab-table", data("abisko4/abisko4.csv"),
    ])
    assert read(out) == (
        f"{ABISKO_TWO[1]}\t{ABISKO_TWO[1]}\n"
        f"{ABISKO_TWO[1]}\t{ABISKO_TWO[0]}\n"
    )


def test_output_symlink_directory(tmp_path):
    # tests/test_cmdline.rs:64-91: no quality info -> input order; rep
    # is 500kb; only the rep is linked.
    d = tmp_path / "reps"
    run_cli([
        "cluster",
        "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-representative-fasta-directory", str(d),
    ])
    assert (d / "500kb.fna").is_symlink()
    assert not (d / "1mbp.fna").exists()


def test_output_symlink_directory_must_be_empty(tmp_path):
    d = tmp_path / "reps"
    d.mkdir()
    (d / "existing").write_text("x")
    with pytest.raises(SystemExit):
        run_cli([
            "cluster",
            "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
            "--output-representative-fasta-directory", str(d),
        ])


def test_output_symlink_directory_names_clash(tmp_path):
    # tests/test_cmdline.rs:126-159
    d = tmp_path / "reps"
    run_cli([
        "cluster",
        "--genome-fasta-files",
        data("set1_name_clash/500kb.fna"), data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-representative-fasta-directory", str(d),
    ])
    assert (d / "500kb.fna").is_symlink()
    assert (d / "500kb.fna.1.fna").exists()
    assert not (d / "1mbp.fna").exists()


def test_output_copy_directory_names_clash(tmp_path):
    # tests/test_cmdline.rs:184-217
    d = tmp_path / "reps"
    run_cli([
        "cluster",
        "--genome-fasta-files",
        data("set1_name_clash/500kb.fna"), data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-representative-fasta-directory-copy", str(d),
    ])
    assert (d / "500kb.fna").exists()
    assert not (d / "500kb.fna").is_symlink()
    assert (d / "500kb.fna.1.fna").exists()


def test_output_representative_list(tmp_path):
    # tests/test_cmdline.rs:162-182: biggest precluster first, then the
    # singleton name-clash genome.
    out = tmp_path / "reps.txt"
    run_cli([
        "cluster",
        "--genome-fasta-files",
        data("set1_name_clash/500kb.fna"), data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-representative-list", str(out),
    ])
    assert read(out) == (
        f"{data('set1/500kb.fna')}\n{data('set1_name_clash/500kb.fna')}\n"
    )


def test_headers_with_tab_characters(tmp_path):
    # tests/test_cmdline.rs:220-240
    genomes = [
        data("abisko_tabs/73.20120800_S1D.21.fna"),
        data("abisko_tabs/73.20110800_S2M.16.fna"),
    ]
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--output-cluster-definition", str(out),
        "--checkm-tab-table", data("abisko_tabs/abisko4.csv"),
    ])
    assert read(out) == (
        f"{genomes[1]}\t{genomes[1]}\n{genomes[1]}\t{genomes[0]}\n"
    )


def test_genome_input_file_with_tab_characters(tmp_path):
    # tests/test_cmdline.rs:242-260: genome list entries keep only the
    # part before a tab.
    listfile = tmp_path / "genomes.tsv"
    g1 = data("abisko4/73.20120800_S1D.21.fna")
    g2 = data("abisko4/73.20110800_S2M.16.fna")
    listfile.write_text(f"{g1}\textra_column\n{g2}\tanother\n")
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-list", str(listfile),
        "--output-cluster-definition", str(out),
        "--checkm-tab-table", data("abisko_tabs/abisko4.csv"),
    ])
    assert read(out) == (f"{g2}\t{g2}\n{g2}\t{g1}\n")


def test_min_aligned_fraction_flip(tmp_path):
    # tests/test_cmdline.rs:263-302: AF ~50% pair clusters at
    # --min-aligned-fraction 0.2 but not at 0.6.
    genomes = [data("set2/1mbp.fna"), data("set2/1mbp.half_aligned.fna")]
    out = tmp_path / "reps1.txt"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--min-aligned-fraction", "0.2",
        "--output-representative-list", str(out),
    ])
    assert read(out) == f"{genomes[0]}\n"

    out2 = tmp_path / "reps2.txt"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--min-aligned-fraction", "0.6",
        "--output-representative-list", str(out2),
    ])
    assert read(out2) == f"{genomes[0]}\n{genomes[1]}\n"


def test_checkm2_quality_report_input(tmp_path):
    # tests/test_cmdline.rs:330-352
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-files", *ABISKO_TWO,
        "--output-cluster-definition", str(out),
        "--checkm2-quality-report", data("abisko4/abisko4_quality_report.tsv"),
    ])
    assert read(out) == (
        f"{ABISKO_TWO[1]}\t{ABISKO_TWO[1]}\n"
        f"{ABISKO_TWO[1]}\t{ABISKO_TWO[0]}\n"
    )


def test_skip_clusterer_uses_final_ani_for_precluster(tmp_path):
    # tests/test_cmdline.rs:386-416 (test_skani_skani_clusterer): when
    # precluster and cluster methods coincide, --precluster-ani is
    # ignored and the single pass runs at --ani.
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
    ]
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--precluster-ani", "99", "--ani", "95",
        "--output-cluster-definition", str(out),
        "--checkm-tab-table", data("abisko4/abisko4.csv"),
    ])
    assert read(out) == (
        f"{genomes[0]}\t{genomes[0]}\n"
        f"{genomes[0]}\t{genomes[3]}\n"
        f"{genomes[0]}\t{genomes[1]}\n"
        f"{genomes[0]}\t{genomes[2]}\n"
    )


def test_low_ani_rejected(capsys):
    # tests/test_cmdline.rs:418-441: ANI < 85 is refused (clean error,
    # nonzero exit).
    rc = run_cli([
        "cluster",
        "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--precluster-ani", "80", "--ani", "80",
        "--output-cluster-definition", "/dev/null",
    ])
    assert rc == 1
    assert "85" in capsys.readouterr().err


def test_github7_aligned_fraction_from_fragment_counts(tmp_path):
    # tests/test_cmdline.rs:443-458 analog: the antonio MAG pair passes
    # AF 60% and clusters together.
    genomes = [
        data("antonio_mags/BE_RX_R2_MAG52.fna"),
        data("antonio_mags/BE_RX_R3_MAG189.fna"),
    ]
    out = tmp_path / "reps.txt"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--precluster-ani", "90", "--ani", "95",
        "--min-aligned-fraction", "60",
        "--output-representative-list", str(out),
    ])
    assert read(out) == f"{genomes[0]}\n"


def test_gzip_input(tmp_path):
    # tests/test_cmdline.rs:612-629 (test_github53): exact rep/member
    # golden — the checkm2 report makes S2M.16 the representative.
    genomes = [
        data("abisko4/73.20120800_S1D.21.fna.gz"),
        data("abisko4/73.20110800_S2M.16.fna.gz"),
    ]
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-files", *genomes,
        "--output-cluster-definition", str(out),
        "--checkm2-quality-report",
        data("abisko4/abisko4_quality_report.tsv"),
    ])
    assert read(out) == (
        f"{genomes[1]}\t{genomes[1]}\n"
        f"{genomes[1]}\t{genomes[0]}\n"
    )


def test_finch_preclusterer_with_native_clusterer(tmp_path):
    # finch precluster at 90% passes 500kb/1mbp (finch ANI 0.9808);
    # native verify clusters them (subset, ANI 100).
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--precluster-method", "finch",
        "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        f"{data('set1/500kb.fna')}\t{data('set1/500kb.fna')}\n"
        f"{data('set1/500kb.fna')}\t{data('set1/1mbp.fna')}\n"
    )


def test_finch_high_precluster_ani_separates(tmp_path):
    # finch ANI(1mbp,500kb)=0.9808 < 0.99 -> no precluster edge
    # (src/finch.rs:121-128).
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--precluster-method", "finch",
        "--precluster-ani", "99",
        "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        f"{data('set1/500kb.fna')}\t{data('set1/500kb.fna')}\n"
        f"{data('set1/1mbp.fna')}\t{data('set1/1mbp.fna')}\n"
    )


def test_duplicate_contig_names_rejected(tmp_path):
    f1 = tmp_path / "a.fna"
    f1.write_text(">c1\nACGT\n>c1\nTTTT\n")
    with pytest.raises(SystemExit, match="Duplicate contig name"):
        run_cli([
            "cluster", "--cluster-contigs", "--small-contigs",
            "--genome-fasta-files", str(f1),
            "--output-cluster-definition", "/dev/null",
        ])


def test_contig_cluster_flag_validation(tmp_path):
    with pytest.raises(SystemExit):
        run_cli([
            "cluster", "--cluster-contigs",
            "--genome-fasta-files", data("contigs/contigs.fna"),
            "--output-cluster-definition", "/dev/null",
        ])
    with pytest.raises(SystemExit):
        run_cli([
            "cluster", "--cluster-contigs", "--small-contigs", "--large-contigs",
            "--genome-fasta-files", data("contigs/contigs.fna"),
            "--output-cluster-definition", "/dev/null",
        ])


def test_contig_cluster(tmp_path):
    # tests/test_cmdline.rs:461-480
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--cluster-contigs", "--large-contigs",
        "--genome-fasta-files", data("contigs/contigs.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        "73.20110600_S2D.10_contig_13024\t73.20110600_S2D.10_contig_13024\n"
        "73.20110600_S2D.10_contig_13024\t73.20110600_S2D.10_contig_13024_2\n"
        "73.20110600_S2D.10_contig_50844\t73.20110600_S2D.10_contig_50844\n"
        "73.20110600_S2D.10_contig_37820\t73.20110600_S2D.10_contig_37820\n"
    )


def test_contig_cluster_specific(tmp_path):
    # tests/test_cmdline.rs:483-508: crafted contigs named by their true
    # ANI/AF vs contig_13024; 96%-ANI joins at threshold 95, 94% doesn't.
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--cluster-contigs", "--small-contigs",
        "--genome-fasta-files", data("contigs/contigs_specific.fna"),
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        "73.20110600_S2D.10_contig_13024\t73.20110600_S2D.10_contig_13024\n"
        "73.20110600_S2D.10_contig_13024\t100ANI_100AF\n"
        "73.20110600_S2D.10_contig_13024\t100ANI_100refAF_90queryAF\n"
        "73.20110600_S2D.10_contig_13024\t100ANI_90refAF_90queryAF\n"
        "73.20110600_S2D.10_contig_13024\t100ANI_80refAF_80queryAF\n"
        "73.20110600_S2D.10_contig_13024\t96ANI_80refAF_80queryAF\n"
        "94ANI_80refAF_80queryAF\t94ANI_80refAF_80queryAF\n"
        "73.20110600_S2D.10_contig_50844\t73.20110600_S2D.10_contig_50844\n"
        "73.20110600_S2D.10_contig_37820\t73.20110600_S2D.10_contig_37820\n"
    )


def test_genome_fasta_directory(tmp_path):
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--genome-fasta-directory", data("set1"),
        "-x", "fna",
        "--output-cluster-definition", str(out),
    ])
    # sorted directory listing: 1mbp.fna then 500kb.fna -> rep is 1mbp
    assert read(out) == (
        f"{data('set1/1mbp.fna')}\t{data('set1/1mbp.fna')}\n"
        f"{data('set1/1mbp.fna')}\t{data('set1/500kb.fna')}\n"
    )


def test_drep_quality_formula(tmp_path):
    # dRep formula uses CheckM1 strain heterogeneity + 0.5*log10(N50)
    # (src/cluster_argument_parsing.rs:1100-1137)
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster", "--quality-formula", "dRep",
        "--genome-fasta-files", *ABISKO_TWO,
        "--checkm-tab-table", data("abisko4/abisko4.csv"),
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        f"{ABISKO_TWO[0]}\t{ABISKO_TWO[0]}\n"
        f"{ABISKO_TWO[0]}\t{ABISKO_TWO[1]}\n"
    )


def test_drep_requires_checkm1():
    with pytest.raises(SystemExit):
        run_cli([
            "cluster", "--quality-formula", "dRep",
            "--genome-fasta-files", data("set1/1mbp.fna"),
            "--checkm2-quality-report", data("abisko4/abisko4_quality_report.tsv"),
            "--output-cluster-definition", "/dev/null",
        ])


def test_drep_rejects_genome_info():
    # src/cluster_argument_parsing.rs:903-910
    with pytest.raises(SystemExit):
        run_cli([
            "cluster", "--quality-formula", "dRep",
            "--genome-fasta-files", data("set1/1mbp.fna"), data("set1/500kb.fna"),
            "--genome-info", data("set1/genomeInfo.csv"),
            "--output-cluster-definition", "/dev/null",
        ])


def test_genome_info_quality_input(tmp_path):
    # genomeInfo CSV drives ordering: 1mbp (100%) outranks 500kb (50%)
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster",
        "--genome-fasta-files", data("set1/500kb.fna"), data("set1/1mbp.fna"),
        "--genome-info", data("set1/genomeInfo.csv"),
        "--quality-formula", "completeness-5contamination",
        "--output-cluster-definition", str(out),
    ])
    assert read(out) == (
        f"{data('set1/1mbp.fna')}\t{data('set1/1mbp.fna')}\n"
        f"{data('set1/1mbp.fna')}\t{data('set1/500kb.fna')}\n"
    )


def test_fragment_length_flag(tmp_path):
    """--fragment-length is plumbed through to the verify stage at both
    granularities and the fraglen_test fixture merges either way
    (sequence1 is contained in sequence2: every 3000bp fragment has
    >=83% of its 21-mers in sequence2 at ~99% identity). The
    reference's own expectation of an AF flip here lives in a
    commented-OUT test (tests/test_cmdline.rs:631-676) that contradicts
    that k-mer content, so the merge — not the flip — is pinned."""
    s1 = data("fraglen_test/sequence1.fna")
    s2 = data("fraglen_test/sequence2.fna")
    for extra in ([], ["--fragment-length", "1000"]):
        out = tmp_path / "reps.txt"
        run_cli([
            "cluster", "--genome-fasta-files", s2, s1,
            "--min-aligned-fraction", "0.8",
            "--output-representative-list", str(out),
        ] + extra)
        assert read(out) == f"{s2}\n", extra


def test_small_genomes_forwards_fragment_length():
    """--small-genomes with an explicit --fragment-length must honor the
    flag; without one the preset's denser 1000bp default applies
    (reference: skani's dense preset still accepts fragment flags,
    src/skani.rs:152-154)."""
    from galah_tpu.engines.native import NativeContext

    explicit = NativeContext(threads=1, small_genomes=True, fragment_length=700)
    assert explicit.params.fragment_length == 700
    preset = NativeContext(threads=1, small_genomes=True)
    assert preset.params.fragment_length == 1000
    # Explicitly requesting the GLOBAL default (3000) must also be
    # honored — None, not a sentinel value, encodes "flag not given".
    explicit_default = NativeContext(
        threads=1, small_genomes=True, fragment_length=3000
    )
    assert explicit_default.params.fragment_length == 3000


def test_low_af_refusal_only_when_native_screen_used():
    """An extreme --min-aligned-fraction is refused only when the native
    prefilter screen will actually run; with --precluster-method skani
    the screening is skani's job and the native clusterer (which only
    verifies pairs handed to it) must not abort the run."""
    import pytest

    from galah_tpu.api import ClusterParameters, _build_engines

    # Native preclusterer screens: the impossible AF must refuse.
    with pytest.raises(ValueError, match="min-aligned-fraction"):
        _build_engines(ClusterParameters(
            min_aligned_fraction=0.0005, precluster_ani=85.0,
            precluster_method="native", cluster_method="native",
        ))
    # skani preclusterer + native clusterer: no native screen, no refusal.
    pre, clu = _build_engines(ClusterParameters(
        min_aligned_fraction=0.0005, precluster_ani=85.0,
        precluster_method="skani", cluster_method="native",
    ))
    assert clu.method_name() == "native"


def test_abisko4_full_directory_clustering(tmp_path):
    """All 18 real abisko4 MAGs (the reference's own fixture set,
    tests/data/abisko4) at the default 95% ANI: one population, one
    cluster, quality-ranked representative. No reference golden exists
    for the full directory; this pins our own deterministic output as
    a real-data regression (reps + membership + order)."""
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster",
        "--genome-fasta-directory", data("abisko4"),
        "--genome-fasta-extension", "fna",
        "--checkm-tab-table", data("abisko4/abisko4.csv"),
        "--ani", "95",
        "--output-cluster-definition", str(out),
    ])
    lines = read(out).splitlines()
    got = [
        tuple(os.path.basename(p) for p in ln.split("\t")) for ln in lines
    ]
    # The contract (reference write_galah_outputs,
    # cluster_argument_parsing.rs:728-740): one cluster, its
    # quality-ranked representative on every line, `rep\trep` first.
    # Member ORDER within a cluster is an implementation detail
    # (assignment order), so assert the set — a tie-break change must
    # not churn this real-data regression.
    rep = "73.20110800_S2M.16.fna"
    members = {
        "73.20120800_S1D.21.fna", "73.20120800_S1X.13.fna",
        "73.20110800_S2D.13.fna", "73.20120800_S2X.9.fna",
        "73.20120700_S3D.12.fna", "73.20120700_S2X.9.fna",
        "73.20110700_S2M.14.fna", "73.20110800_S3D.14.fna",
        "73.20120600_S2D.19.fna", "73.20110800_S1D.9.fna",
        "73.20120700_S1X.9.fna", "73.20120700_S3X.12.fna",
        "73.20120700_S1D.20.fna", "73.20110600_S3M.17.fna",
        "73.20110600_S2D.10.fna", "73.20110700_S2D.12.fna",
        "73.20120600_E3D.30.fna",
    }
    assert got[0] == (rep, rep)
    assert all(r == rep for r, _ in got)
    assert {m for _, m in got[1:]} == members
    assert len(got) == 1 + len(members)
