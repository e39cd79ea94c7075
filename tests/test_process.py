"""`process` (analyse + cluster fused) and `cluster-validate` tests
(reference: tests/test_process.rs, src/cluster_validation.rs)."""

import pytest
from conftest import data

from galah_tpu.cli.main import main
from galah_tpu.cli.validate_cmd import read_clustering_file

GENOMES = [
    data("abisko4/73.20120800_S1D.21.fna"),
    data("abisko4/73.20110800_S2M.16.fna"),
]
HEADER = "genome\tcompleteness\tcontamination\trRNA_5S\trRNA_16S\trRNA_23S\ttRNAs\tMIMAG_quality\n"


def test_process_with_precomputed_inputs(tmp_path):
    """process runs analyse then cluster; the quality report is injected
    into clustering so genomes are quality-ordered (src/process.rs:128-137)."""
    fi = data("analyse_file_inputs")
    barrnap_list = tmp_path / "barrnap_list.tsv"
    barrnap_list.write_text(
        f"{GENOMES[0]}\t{fi}/barrnap3.gff\n{GENOMES[1]}\t{fi}/barrnap4.gff\n"
    )
    trna_list = tmp_path / "trna_list.tsv"
    trna_list.write_text(
        f"{GENOMES[0]}\t{fi}/trnascan3.out\n{GENOMES[1]}\t{fi}/trnascan4.out\n"
    )
    mimag_out = tmp_path / "mimag.tsv"
    clusters_out = tmp_path / "clusters.tsv"
    main([
        "process", "--genome-fasta-files", *GENOMES,
        "--checkm2-quality-report", data("abisko4/abisko4_quality_report.tsv"),
        "--barrnap-gff-list", str(barrnap_list),
        "--trnascan-out-list", str(trna_list),
        "--output-mimag-summary", str(mimag_out),
        "--output-cluster-definition", str(clusters_out),
    ])
    mimag = open(mimag_out).read()
    assert mimag.startswith(HEADER)
    assert len(mimag.splitlines()) == 3
    # quality ordering from the checkm2 report: S2M.16 (higher
    # completeness-5*cont... Parks2020 on the same values) is rep
    clusters = open(clusters_out).read()
    assert clusters == (
        f"{GENOMES[1]}\t{GENOMES[1]}\n{GENOMES[1]}\t{GENOMES[0]}\n"
    )


def test_process_rejects_cluster_contigs():
    with pytest.raises(SystemExit, match="not yet implemented"):
        main([
            "process", "--cluster-contigs", "--small-contigs",
            "--genome-fasta-files", data("contigs/contigs.fna"),
            "--output-mimag-summary", "/dev/null",
        ])


def test_read_clustering_file(tmp_path):
    # src/cluster_validation.rs:80-113: a new cluster starts when
    # col0 == col1
    f = tmp_path / "clusters.tsv"
    f.write_text("a\ta\na\tb\na\tc\nd\td\ne\te\ne\tf\n")
    clusters = read_clustering_file(str(f))
    assert clusters == [["a", "b", "c"], ["d"], ["e", "f"]]


def test_cluster_validate_ok(tmp_path, caplog):
    clusters_out = tmp_path / "clusters.tsv"
    main([
        "cluster", "--genome-fasta-files", *GENOMES,
        "--output-cluster-definition", str(clusters_out),
    ])
    from galah_tpu.cli.main import build_parser
    from galah_tpu.cli.validate_cmd import run_validate

    args = build_parser().parse_args([
        "cluster-validate", "--cluster-file", str(clusters_out),
        "--ani", "95", "--min-aligned-fraction", "15",
    ])
    errors = run_validate(args)
    assert errors == 0


def test_cluster_validate_detects_bad_member(tmp_path):
    # A cluster claiming two unrelated genomes violates the within-
    # cluster ANI property.
    f = tmp_path / "bad.tsv"
    g1 = data("set1/1mbp.fna")
    g2 = data("antonio_mags/BE_RX_R2_MAG52.fna")
    f.write_text(f"{g1}\t{g1}\n{g1}\t{g2}\n")
    from galah_tpu.cli.main import build_parser
    from galah_tpu.cli.validate_cmd import run_validate

    args = build_parser().parse_args([
        "cluster-validate", "--cluster-file", str(f), "--ani", "95",
    ])
    errors = run_validate(args)
    assert errors == 1
