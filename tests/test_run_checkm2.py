"""--run-checkm2 and process-with-real-tools paths, exercised via the
bash-shim fake backend pattern (reference tests/test_process.rs)."""

import os
import stat

from conftest import data

from galah_tpu.cli.main import main

GENOMES = [
    data("abisko4/73.20120800_S1D.21.fna"),
    data("abisko4/73.20110800_S2M.16.fna"),
]


def make_checkm2_shim(d, rows):
    """checkm2 shim emitting a quality report for the given
    (name, completeness, contamination) rows."""
    lines = [
        "#!/bin/bash",
        'out=""',
        "while [[ $# -gt 0 ]]; do",
        "  case $1 in",
        "    -o) out=$2; shift 2;;",
        "    *) shift;;",
        "  esac",
        "done",
        'mkdir -p "$out"',
        "echo -e 'Name\\tCompleteness\\tContamination\\tModel' > \"$out/quality_report.tsv\"",
    ]
    for name, comp, cont in rows:
        lines.append(
            f"echo -e '{name}\\t{comp}\\t{cont}\\tGB' >> \"$out/quality_report.tsv\""
        )
    p = os.path.join(d, "checkm2")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)


def make_noop_annotators(d):
    for name, body in (
        ("barrnap", ["#!/bin/bash",
                     "echo -e 'mock\\tbarrnap\\trRNA\\t1\\t9\\t.\\t+\\t.\\tName=5S_rRNA'"]),
        ("tRNAscan-SE", [
            "#!/bin/bash",
            'out=""',
            "while [[ $# -gt 0 ]]; do case $1 in -o) out=$2; shift 2;; *) shift;; esac; done",
            'printf "h\\nh\\nh\\n" > "$out"',
        ]),
    ):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            f.write("\n".join(body) + "\n")
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)


def test_cluster_run_checkm2(tmp_path, monkeypatch):
    """--run-checkm2 invokes the checkm2 subprocess contract (symlinked
    genome staging dir, -o output, quality_report.tsv parse) and orders
    genomes by the resulting quality."""
    make_checkm2_shim(
        str(tmp_path),
        [("73.20120800_S1D.21", 50.0, 0.0), ("73.20110800_S2M.16", 99.0, 0.0)],
    )
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.setenv("CHECKM2DB", "/tmp/mockdb")
    out = tmp_path / "clusters.tsv"
    rc = main([
        "cluster", "--genome-fasta-files", *GENOMES,
        "--run-checkm2",
        "--quality-formula", "completeness-5contamination",
        "--output-cluster-definition", str(out),
    ])
    assert rc == 0
    content = open(out).read()
    # S2M.16 (comp 99) outranks S1D.21 (comp 50) -> rep
    assert content.splitlines()[0].startswith(GENOMES[1])


def test_cluster_run_checkm2_requires_db(tmp_path, monkeypatch):
    monkeypatch.delenv("CHECKM2DB", raising=False)
    import pytest

    with pytest.raises(SystemExit, match="CHECKM2DB"):
        main([
            "cluster", "--genome-fasta-files", *GENOMES, "--run-checkm2",
            "--output-cluster-definition", "/dev/null",
        ])


def test_process_with_mock_tools(tmp_path, monkeypatch):
    """Full process flow with all three shimmed tools: CheckM2 runs
    once; its report is injected into clustering."""
    make_checkm2_shim(
        str(tmp_path),
        [("73.20120800_S1D.21", 95.0, 1.0), ("73.20110800_S2M.16", 85.0, 1.0)],
    )
    make_noop_annotators(str(tmp_path))
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.setenv("CHECKM2DB", "/tmp/mockdb")
    mimag = tmp_path / "mimag.tsv"
    clusters = tmp_path / "clusters.tsv"
    rc = main([
        "process", "--genome-fasta-files", *GENOMES,
        "--quality-formula", "completeness-5contamination",
        "--output-mimag-summary", str(mimag),
        "--output-cluster-definition", str(clusters),
    ])
    assert rc == 0
    mimag_content = open(mimag).read()
    assert "95.00\t1.00" in mimag_content
    # S1D.21 (comp 95) is rep because the injected report ordered it first
    assert open(clusters).read().splitlines()[0].startswith(GENOMES[0])
