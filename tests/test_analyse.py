"""`analyse` tests using the reference's fake-backend shim pattern
(tests/test_analyse.rs:11-85): bash scripts named checkm2 / barrnap /
tRNAscan-SE are generated into a tempdir which is prepended to PATH,
enabling hermetic runs without the real ML tools."""

import os
import stat

import pytest
from conftest import data

from galah_tpu.annotate.analyse import mimag_tier
from galah_tpu.cli.main import main

STANDARD_AND_FAKE_TRNAS = [
    "Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His", "Ile",
    "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp", "Tyr", "Val",
    "Fake",
]


def setup_mock_bin(d, genome, completeness, contamination, r5s, r16s, r23s, trnas):
    checkm2 = [
        "#!/bin/bash",
        'out=""',
        "while [[ $# -gt 0 ]]; do",
        "  case $1 in",
        "    -o) out=$2; shift 2;;",
        "    *) shift;;",
        "  esac",
        "done",
        'mkdir -p "$out"',
        "echo -e 'Name\\tCompleteness\\tContamination\\tCompleteness_Model_Used' > \"$out/quality_report.tsv\"",
        f"echo -e '{genome}\\t{completeness}\\t{contamination}\\tGradient Boost' >> \"$out/quality_report.tsv\"",
    ]
    barrnap = ["#!/bin/bash"]
    for count, name in ((r5s, "5S_rRNA"), (r16s, "16S_rRNA"), (r23s, "23S_rRNA")):
        if count > 0:
            barrnap.append(
                f"echo -e '##gff-version 3\\nmock_contig\\tbarrnap\\trRNA\\t1\\t100\\t.\\t+\\t.\\tName={name};product=x'"
            )
    trnascan = [
        "#!/bin/bash",
        'out=""',
        "while [[ $# -gt 0 ]]; do",
        "  case $1 in",
        "    -o) out=$2; shift 2;;",
        "    *) shift;;",
        "  esac",
        "done",
        "echo -e 'Sequence\\t\\ttRNA\\tBounds\\ttRNA\\tAnti\\tIntron Bounds\\tInf' > \"$out\"",
        "echo -e 'Name\\ttRNA #\\tBegin\\tEnd\\tType\\tCodon\\tBegin\\tEnd\\tScore' >> \"$out\"",
        "echo -e '--------\\t------\\t-----\\t------\\t----\\t-----\\t-----\\t----\\t------' >> \"$out\"",
    ]
    for trna in STANDARD_AND_FAKE_TRNAS[:trnas]:
        trnascan.append(
            f"echo -e 'mock_contig\\t1\\t101\\t200\\t{trna}\\tGCC\\t0\\t0\\t20.0' >> \"$out\""
        )
    for name, lines in (("checkm2", checkm2), ("barrnap", barrnap), ("tRNAscan-SE", trnascan)):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)


@pytest.fixture
def mock_path(tmp_path, monkeypatch):
    def activate(genome, comp, cont, r5s, r16s, r23s, trnas):
        setup_mock_bin(str(tmp_path), genome, comp, cont, r5s, r16s, r23s, trnas)
        monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
        monkeypatch.setenv("CHECKM2DB", "/tmp/mockdb")

    return activate


GENOME = "abisko4/73.20120800_S1D.21.fna"


def run_analyse_to(tmp_path, extra=()):
    out = tmp_path / "mimag.tsv"
    main([
        "analyse", "--genome-fasta-files", data(GENOME),
        "--output-mimag-summary", str(out), *extra,
    ])
    with open(out) as f:
        return f.read()


HEADER = "genome\tcompleteness\tcontamination\trRNA_5S\trRNA_16S\trRNA_23S\ttRNAs\tMIMAG_quality\n"


def test_analyse_mock_high_quality(mock_path, tmp_path):
    # tests/test_analyse.rs:116-153
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 1, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t1\t1\t20\tHigh quality\n"
    )


def test_analyse_mock_fake_trnas_not_counted(mock_path, tmp_path):
    # tests/test_analyse.rs:156-193: 21st 'Fake' tRNA is not standard
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 1, 1, 21)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t1\t1\t20\tHigh quality\n"
    )


def test_analyse_mock_missing_rrnas(mock_path, tmp_path):
    # tests/test_analyse.rs:196-232
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 0, 0, 15)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t0\t0\t15\tMedium quality\n"
    )


def test_analyse_mock_insufficient_trnas(mock_path, tmp_path):
    # tests/test_analyse.rs:275-311
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 1, 1, 16)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t1\t1\t16\tMedium quality\n"
    )


def test_analyse_precomputed_file_inputs(tmp_path):
    """All three precomputed bypasses: no external tool runs at all."""
    genomes = [
        data("set1/1mbp.fna"),
        data("set1/500kb.fna"),
        data("abisko4/73.20120800_S1D.21.fna"),
        data("abisko4/73.20110800_S2M.16.fna"),
    ]
    fi = data("analyse_file_inputs")
    barrnap_list = tmp_path / "barrnap_list.tsv"
    barrnap_list.write_text(
        "".join(
            f"{g}\t{fi}/barrnap{i+1}.gff\n" for i, g in enumerate(genomes)
        )
    )
    trna_list = tmp_path / "trna_list.tsv"
    trna_list.write_text(
        "".join(
            f"{g}\t{fi}/trnascan{i+1}.out\n" for i, g in enumerate(genomes)
        )
    )
    out = tmp_path / "mimag.tsv"
    main([
        "analyse", "--genome-fasta-files", *genomes,
        "--checkm2-quality-report", f"{fi}/checkm2_quality_report.tsv",
        "--barrnap-gff-list", str(barrnap_list),
        "--trnascan-out-list", str(trna_list),
        "--output-mimag-summary", str(out),
    ])
    content = open(out).read()
    lines = content.splitlines()
    assert lines[0] == HEADER.strip()
    assert len(lines) == 5
    # CheckM2 fixture values flow through (1mbp: 95.5/1.2)
    assert lines[1].startswith(f"{genomes[0]}\t95.50\t1.20\t")


def test_analyse_requires_an_output():
    with pytest.raises(SystemExit):
        main(["analyse", "--genome-fasta-files", data(GENOME)])


def test_mimag_tier_rule():
    # src/analyse.rs:187-199
    assert mimag_tier(49.9, 0, 1, 1, 1, 20) == "Low quality"
    assert mimag_tier(95, 10.0, 1, 1, 1, 20) == "Low quality"
    assert mimag_tier(90.0, 0, 1, 1, 1, 20) == "Medium quality"  # <= 90
    assert mimag_tier(95, 5.0, 1, 1, 1, 20) == "Medium quality"
    assert mimag_tier(95, 0, 0, 1, 1, 20) == "Medium quality"
    assert mimag_tier(95, 0, 1, 1, 1, 17) == "Medium quality"
    assert mimag_tier(90.1, 4.9, 1, 1, 1, 18) == "High quality"


def test_analyse_mock_no_16s(mock_path, tmp_path):
    # tests/test_analyse.rs:235-272
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 0, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t0\t1\t20\tMedium quality\n"
    )


def test_analyse_mock_insufficient_completeness(mock_path, tmp_path):
    # tests/test_analyse.rs:313-350: 89.9 <= 90 -> Medium
    mock_path("73.20120800_S1D.21", 89.9, 2.0, 1, 1, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t89.90\t2.00\t1\t1\t1\t20\tMedium quality\n"
    )


def test_analyse_mock_over_contamination(mock_path, tmp_path):
    # tests/test_analyse.rs:352-389: 5.1 >= 5 -> Medium
    mock_path("73.20120800_S1D.21", 95.0, 5.1, 1, 1, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t5.10\t1\t1\t1\t20\tMedium quality\n"
    )


def test_analyse_mock_low_completeness(mock_path, tmp_path):
    # tests/test_analyse.rs:391-428: < 50 -> Low
    mock_path("73.20120800_S1D.21", 49.0, 2.0, 1, 1, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t49.00\t2.00\t1\t1\t1\t20\tLow quality\n"
    )


def test_analyse_mock_high_contamination(mock_path, tmp_path):
    # tests/test_analyse.rs:430-467: >= 10 -> Low
    mock_path("73.20120800_S1D.21", 95.0, 11.0, 1, 1, 1, 20)
    assert run_analyse_to(tmp_path) == (
        HEADER + f"{data(GENOME)}\t95.00\t11.00\t1\t1\t1\t20\tLow quality\n"
    )


GENOMES4 = [
    data("set1/1mbp.fna"),
    data("set1/500kb.fna"),
    data("abisko4/73.20120800_S1D.21.fna"),
    data("abisko4/73.20110800_S2M.16.fna"),
]


def _fixture_lists(tmp_path):
    fi = data("analyse_file_inputs")
    barrnap_list = tmp_path / "barrnap_list.tsv"
    barrnap_list.write_text(
        "".join(f"{g}\t{fi}/barrnap{i+1}.gff\n" for i, g in enumerate(GENOMES4))
    )
    trna_list = tmp_path / "trna_list.tsv"
    trna_list.write_text(
        "".join(f"{g}\t{fi}/trnascan{i+1}.out\n" for i, g in enumerate(GENOMES4))
    )
    return str(barrnap_list), str(trna_list)


def test_analyse_with_checkm2_quality_report_golden(tmp_path):
    # tests/test_analyse.rs:469-497: exact 4-row golden off fixtures
    barrnap_list, trna_list = _fixture_lists(tmp_path)
    out = tmp_path / "mimag.tsv"
    main([
        "analyse", "--genome-fasta-files", *GENOMES4,
        "--checkm2-quality-report",
        data("analyse_file_inputs/checkm2_quality_report.tsv"),
        "--barrnap-gff-list", barrnap_list,
        "--trnascan-out-list", trna_list,
        "--output-mimag-summary", str(out),
    ])
    assert open(out).read() == (
        HEADER
        + f"{GENOMES4[0]}\t95.50\t1.20\t1\t1\t1\t19\tHigh quality\n"
        + f"{GENOMES4[1]}\t68.37\t2.91\t0\t1\t1\t10\tMedium quality\n"
        + f"{GENOMES4[2]}\t95.50\t1.20\t0\t0\t1\t1\tMedium quality\n"
        + f"{GENOMES4[3]}\t95.37\t2.91\t0\t0\t0\t0\tMedium quality\n"
    )


def test_analyse_with_checkm_tab_table_golden(tmp_path):
    # tests/test_analyse.rs:499-527: CheckM1 tab-table input
    barrnap_list, trna_list = _fixture_lists(tmp_path)
    out = tmp_path / "mimag.tsv"
    main([
        "analyse", "--genome-fasta-files", *GENOMES4,
        "--checkm-tab-table",
        data("analyse_file_inputs/checkm_tab_table.tsv"),
        "--barrnap-gff-list", barrnap_list,
        "--trnascan-out-list", trna_list,
        "--output-mimag-summary", str(out),
    ])
    assert open(out).read() == (
        HEADER
        + f"{GENOMES4[0]}\t95.50\t1.20\t1\t1\t1\t19\tHigh quality\n"
        + f"{GENOMES4[1]}\t58.37\t12.91\t0\t1\t1\t10\tLow quality\n"
        + f"{GENOMES4[2]}\t48.37\t1.20\t0\t0\t1\t1\tLow quality\n"
        + f"{GENOMES4[3]}\t38.37\t2.91\t0\t0\t0\t0\tLow quality\n"
    )


def test_analyse_mock_with_quality_report_output(mock_path, tmp_path):
    # tests/test_analyse.rs:529-569: CheckM2-format quality report out
    mock_path("73.20120800_S1D.21", 95.0, 2.0, 1, 1, 1, 20)
    quality = tmp_path / "quality_report.tsv"
    assert run_analyse_to(
        tmp_path, extra=("--output-quality-report", str(quality))
    ) == (HEADER + f"{data(GENOME)}\t95.00\t2.00\t1\t1\t1\t20\tHigh quality\n")
    content = open(quality).read()
    # verbatim copy of the CheckM2 report, same as the reference
    # (src/analyse.rs:125-141 copies the file; the digits below are the
    # shim's float formatting)
    assert "Name\tCompleteness\tContamination" in content
    assert "73.20120800_S1D.21\t95.0\t2.0" in content
