import pytest
from conftest import data

from galah_tpu.quality.checkm import (
    read_checkm1_tab_table,
    read_checkm2_quality_report,
    read_genome_info_file,
)
from galah_tpu.quality.filter import filter_and_order_genomes


def test_genome_info_parse():
    # src/genome_info_file.rs:89-110
    r = read_genome_info_file(data("set1/genomeInfo.csv"))
    assert r.genome_to_quality["500kb"].completeness == pytest.approx(0.5)
    assert r.genome_to_quality["500kb"].contamination == pytest.approx(0.01)
    assert r.genome_to_quality["1mbp"].completeness == pytest.approx(1.0)
    assert r.genome_to_quality["1mbp"].contamination == pytest.approx(0.0)


def test_genome_info_rejects_checkm_table():
    # src/genome_info_file.rs:112-117
    with pytest.raises(ValueError):
        read_genome_info_file(data("set1/checkm.tsv"))


def test_checkm1_parse_and_stem_lookup():
    r = read_checkm1_tab_table(data("abisko4/abisko4.csv"))
    q = r.retrieve_via_fasta_path(data("abisko4/73.20110600_S2D.10.fna"))
    assert q.completeness == pytest.approx(0.7854)
    assert q.contamination == pytest.approx(0.0065)
    assert q.strain_heterogeneity == pytest.approx(0.0)


def test_checkm2_parse():
    r = read_checkm2_quality_report(data("abisko4/abisko4_quality_report.tsv"))
    q = r.retrieve_via_fasta_path(data("abisko4/73.20110600_S2D.10.fna"))
    assert q.completeness == pytest.approx(0.7854)


def test_order_by_formulas():
    # Golden orderings from tests/test_cmdline.rs:12-61
    paths = [
        data("abisko4/73.20120800_S1D.21.fna"),
        data("abisko4/73.20110800_S2M.16.fna"),
    ]
    checkm = read_checkm1_tab_table(data("abisko4/abisko4.csv"))
    order_c4 = filter_and_order_genomes(paths, checkm, "completeness-4contamination")
    assert order_c4[0].endswith("73.20120800_S1D.21.fna")
    order_parks = filter_and_order_genomes(paths, checkm, "Parks2020_reduced")
    assert order_parks[0].endswith("73.20110800_S2M.16.fna")
    order_drep = filter_and_order_genomes(
        paths, checkm, "dRep", checkm1_for_drep=checkm
    )
    assert len(order_drep) == 2


def test_min_completeness_filter():
    paths = [
        data("abisko4/73.20120800_S1D.21.fna"),  # 95.21
        data("abisko4/73.20110600_S2D.10.fna"),  # 78.54
    ]
    checkm = read_checkm1_tab_table(data("abisko4/abisko4.csv"))
    kept = filter_and_order_genomes(
        paths, checkm, "completeness-5contamination", min_completeness=0.9
    )
    assert kept == [paths[0]]


def test_max_contamination_filter():
    paths = [
        data("abisko4/73.20120800_S1D.21.fna"),  # cont 0.00
        data("abisko4/73.20110600_S3M.17.fna"),  # cont 1.36
    ]
    checkm = read_checkm1_tab_table(data("abisko4/abisko4.csv"))
    kept = filter_and_order_genomes(
        paths, checkm, "completeness-5contamination", max_contamination=0.01
    )
    assert kept == [paths[0]]


def test_missing_genome_raises():
    checkm = read_checkm1_tab_table(data("abisko4/abisko4.csv"))
    with pytest.raises(KeyError):
        filter_and_order_genomes(
            ["/nonexistent/unknown_genome.fna"], checkm, "completeness-5contamination"
        )
