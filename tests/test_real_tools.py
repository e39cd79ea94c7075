"""Real-external-tool integration tests (the analog of the reference's
#[ignore]-gated suite): they run ONLY where the actual CheckM2 /
barrnap / tRNAscan-SE binaries and the CheckM2 database exist
(reference tests/test_analyse.rs:87-114, tests/test_cmdline.rs:1095-1125,
tests/test_process.rs:110-159 — gated there on CHECKM2DB the same way).

On rigs without the tools these skip; the subprocess contracts are
still exercised hermetically by the bash-shim suites
(test_run_checkm2.py, test_analyse.py, test_process.py)."""

import shutil

import pytest
from conftest import data

from galah_tpu.cli.main import main


def run_cli(args):
    return main(args)


def _checkm2_available() -> bool:
    import os

    return bool(shutil.which("checkm2")) and bool(os.environ.get("CHECKM2DB"))


requires_checkm2 = pytest.mark.skipif(
    not _checkm2_available(),
    reason="needs the real checkm2 binary and CHECKM2DB",
)
requires_annotators = pytest.mark.skipif(
    not (
        _checkm2_available()
        and shutil.which("barrnap")
        and shutil.which("tRNAscan-SE")
    ),
    reason="needs real checkm2 + barrnap + tRNAscan-SE",
)


@requires_annotators
def test_analyse_real(tmp_path):
    """Exact 8-column MIMAG TSV with real-CheckM2 completeness values
    (reference tests/test_analyse.rs:87-114)."""
    out = tmp_path / "mimag.tsv"
    run_cli([
        "analyse",
        "--genome-fasta-files",
        data("set1/1mbp.fna"), data("set1/500kb.fna"),
        data("abisko4/73.20120800_S1D.21.fna"),
        data("abisko4/73.20110800_S2M.16.fna"),
        "--output-mimag-summary", str(out),
    ])
    lines = out.read_text().rstrip("\n").split("\n")
    assert lines[0] == (
        "genome\tcompleteness\tcontamination\trRNA_5S\trRNA_16S"
        "\trRNA_23S\ttRNAs\tMIMAG_quality"
    )
    rows = {l.split("\t")[0]: l.split("\t") for l in lines[1:]}
    r = rows[data("set1/1mbp.fna")]
    assert float(r[1]) == pytest.approx(6.35, abs=0.5)  # CheckM2-version tolerant
    assert r[7] == "Low quality"
    r = rows[data("abisko4/73.20110800_S2M.16.fna")]
    assert float(r[1]) == pytest.approx(84.95, abs=1.0)
    assert r[4] == "1" and r[7] == "Medium quality"


@requires_checkm2
def test_cluster_real_checkm2(tmp_path):
    """--run-checkm2 end-to-end cluster golden (reference
    tests/test_cmdline.rs:1095-1125): S2M.16 and 500kb become the reps
    under completeness-4contamination ordering."""
    out = tmp_path / "clusters.tsv"
    run_cli([
        "cluster",
        "--quality-formula", "completeness-4contamination",
        "--run-checkm2",
        "--genome-fasta-files",
        data("set1/1mbp.fna"), data("set1/500kb.fna"),
        data("abisko4/73.20120800_S1D.21.fna"),
        data("abisko4/73.20110800_S2M.16.fna"),
        "--precluster-method", "finch",
        "--output-cluster-definition", str(out),
    ])
    got = out.read_text()
    want = (
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t"
        f"{data('abisko4/73.20110800_S2M.16.fna')}\n"
        f"{data('abisko4/73.20110800_S2M.16.fna')}\t"
        f"{data('abisko4/73.20120800_S1D.21.fna')}\n"
        f"{data('set1/500kb.fna')}\t{data('set1/500kb.fna')}\n"
        f"{data('set1/500kb.fna')}\t{data('set1/1mbp.fna')}\n"
    )
    assert got == want
